"""Microbench + correctness check for the modality-SE stem-grad rewrite.

The r4 train-step roofline audit found the two largest off-roofline ops are
the fusions computing the modality-SE scale gradient: XLA must materialize
the stem conv's INPUT-grad (a 7x7 lhs_dilated transposed conv back to the
full-res raw volume, bf16[32,256,256,{6,14}]) solely so the autodiff chain
can reduce ``ds = sum_p x * dy`` — and that tiny-channel transposed-conv
emitter runs at 16-52% of its bound (multiply_reduce_fusion{,.1}: 3.07 +
2.28 ms of a ~161 ms step).

The rewrite: with ``z = conv(x * s, W)`` (s per-(batch,channel) scale),

    ds[b,c] = sum_{t,o} W[t,c,o] * Sx[b,t,c,o]
    dW[t,c,o] = sum_b  s[b,c]  * Sx[b,t,c,o]

where ``Sx`` is the PER-SAMPLE weight grad of the conv taken w.r.t. the
UNSCALED input x.  One grouped weight-grad contraction replaces BOTH the
transposed input-grad conv and the full-res multiply+reduce, and subsumes
the existing weight grad.  ``dx`` from this path is never needed (x is
the raw data leaf).

VERDICT (measured r4, v5e-1, jax 0.9/libtpu 0.0.34): **REJECTED.**
The algebra is correct (``--check`` passes, incl. under vmap) but XLA:TPU
cannot express a per-sample weight grad efficiently:

- ``vmap(linear_transpose(conv))`` batches the transposed conv by
  materializing a BLOCK-DIAGONAL rhs (bf16[B,Q,Q,B*O] = 2.1 GB at
  production geometry) and contracting the full B x B cross product —
  bwd-only 5.56 ms (DCE) / 10.02 ms (DWI) vs autodiff's 1.29 / 1.77 ms.
- Hand-building the grouped conv (``feature_group_count=B``, the
  canonical weight-grad dim numbers with the batch contraction split
  into B groups — see :func:`persample_wgrad_fgc`) compiles to the SAME
  block-diagonal group_count=1 conv: the TPU conv canonicalizer expands
  feature groups for this conv form, so the emitter always either sums
  over batch or pays the 32x masked expansion.  Measured identical
  (5.63 / 10.22 ms).

So the autodiff program (transposed input-grad conv + fused
multiply-reduce) stands as the best available formulation; its in-step
cost (multiply_reduce_fusion{,.1}: 5.35 ms/step, 16-52%% of bound) is
emitter/layout inefficiency XLA owns, not schedulable algorithm work —
consistent with the committed ~49%% MFU ceiling argument in README.

Usage::

    JAX_PLATFORMS=cpu python scripts/bench_stem_grad.py --check   # parity
    python scripts/bench_stem_grad.py                             # TPU timing
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
from jax import lax


def _conv(y, w, strides, padding):
    return lax.conv_general_dilated(
        y, w, window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def persample_wgrad(x, dz, w_spec, strides, padding):
    """Sx[b, t, u, c, o]: the stem conv's weight grad per batch sample,
    taken against the raw (unscaled) input.

    vmap-of-linear_transpose reference form.  MEASURED BAD on TPU: the
    conv batching rule materializes a block-diagonal rhs
    (bf16[B,Q,Q,B*O] — 2.1 GB at production geometry) and contracts the
    full B x B cross product; see :func:`persample_wgrad_fgc`."""
    def one(xb, gb):
        f = lambda w_: _conv(xb[None], w_, strides, padding)
        return jax.linear_transpose(f, w_spec)(gb[None])[0]
    return jax.vmap(one)(x, dz)


def persample_wgrad_fgc(x, dz, k, strides, padding):
    """Same Sx as a single feature_group_count=B grouped conv.

    The canonical XLA weight-grad conv contracts lhs-feature (=batch)
    against rhs-input-feature; keeping the per-sample axis just means
    splitting that contraction into B groups of 1 and letting each group
    write its own O-slice of the output features — no block-diagonal
    materialization, exactly the same FLOPs as the summed weight grad."""
    B, H, W, C = x.shape
    Q = dz.shape[1]
    O = dz.shape[-1]
    rhs = dz.transpose(1, 2, 0, 3).reshape(1, Q, Q, B * O)
    pads = []
    for ax in (0, 1):
        lo = padding[ax][0]
        hi = (Q - 1) * strides[ax] + k - x.shape[1 + ax] - lo
        pads.append((lo, hi))
    out = lax.conv_general_dilated(
        x, rhs, window_strides=(1, 1), padding=pads,
        rhs_dilation=strides,
        dimension_numbers=("CHWN", "IHWO", "HWNC"),
        feature_group_count=B)
    return out.reshape(k, k, C, B, O).transpose(3, 0, 1, 2, 4)


def make_scaled_stem_conv(strides, padding, use_fgc=True):
    @jax.custom_vjp
    def scaled_stem_conv(x, s, w):
        return _conv(x * s[:, None, None, :], w, strides, padding)

    def fwd(x, s, w):
        return scaled_stem_conv(x, s, w), (x, s, w)

    def bwd(res, dz):
        x, s, w = res
        if use_fgc:
            Sx = persample_wgrad_fgc(x, dz, w.shape[0], strides, padding)
        else:
            w_spec = jax.eval_shape(lambda: w)
            Sx = persample_wgrad(x, dz, w_spec, strides, padding)
        ds = jnp.einsum("hwco,bhwco->bc", w, Sx,
                        preferred_element_type=jnp.float32)
        dW = jnp.einsum("bc,bhwco->hwco", s, Sx,
                        preferred_element_type=jnp.float32)
        # x is the raw data leaf; its cotangent is never consumed (the
        # whole point is to avoid materializing the input grad).
        return (jnp.zeros_like(x), ds.astype(s.dtype), dW.astype(w.dtype))

    scaled_stem_conv.defvjp(fwd, bwd)
    return scaled_stem_conv


def _loss_ref(x, s, w, m, strides, padding):
    return jnp.vdot(_conv(x * s[:, None, None, :], w, strides, padding), m)


def _loss_new(x, s, w, m, strides, padding, fn):
    return jnp.vdot(fn(x, s, w), m)


def check(dtype=jnp.float32):
    key = jax.random.PRNGKey(0)
    for (B, H, C, O, k, stride, pad) in [
        (4, 32, 6, 16, 7, 2, 3),     # conv1-shaped
        (4, 32, 14, 16, 7, 2, 3),
        (2, 16, 5, 8, 3, 2, 1),      # deep-stem-shaped
        (2, 16, 3, 8, 3, 1, 1),
    ]:
        ks = jax.random.split(key, 4)
        x = jax.random.normal(ks[0], (B, H, H, C), dtype)
        s = jax.nn.sigmoid(jax.random.normal(ks[1], (B, C), dtype))
        w = jax.random.normal(ks[2], (k, k, C, O), dtype) * 0.1
        strides, padding = (stride, stride), ((pad, pad), (pad, pad))
        Ho = (H + 2 * pad - k) // stride + 1
        m = jax.random.normal(ks[3], (B, Ho, Ho, O), dtype)
        gs_ref, gw_ref = jax.grad(_loss_ref, argnums=(1, 2))(
            x, s, w, m, strides, padding)
        for use_fgc in (False, True):
            fn = make_scaled_stem_conv(strides, padding, use_fgc=use_fgc)

            z_ref = _conv(x * s[:, None, None, :], w, strides, padding)
            z_new = fn(x, s, w)
            assert jnp.allclose(z_ref, z_new), "forward mismatch"

            gs_new, gw_new = jax.grad(
                lambda x_, s_, w_: _loss_new(
                    x_, s_, w_, m, strides, padding, fn),
                argnums=(1, 2))(x, s, w)
            tol = 1e-4 if dtype == jnp.float32 else 5e-2
            assert jnp.allclose(gs_ref, gs_new, rtol=tol, atol=tol), (
                f"ds mismatch fgc={use_fgc}: "
                f"{jnp.abs(gs_ref - gs_new).max()}")
            assert jnp.allclose(gw_ref, gw_new, rtol=tol, atol=tol), (
                f"dW mismatch fgc={use_fgc}: "
                f"{jnp.abs(gw_ref - gw_new).max()}")

        fn = make_scaled_stem_conv(strides, padding, use_fgc=True)
        # vmap (the multifold path) over a leading fold axis
        K = 3
        xs = jnp.stack([x] * K)
        ss = jnp.stack([s] * K)
        ws = jnp.stack([w * (i + 1) for i in range(K)])
        gv = jax.vmap(lambda x_, s_, w_: jax.grad(
            lambda s__, w__: _loss_new(x_, s__, w__, m, strides, padding, fn),
            argnums=(0, 1))(s_, w_))(xs, ss, ws)
        g0 = jax.grad(
            lambda s_, w_: _loss_new(x, s_, w_, m, strides, padding, fn),
            argnums=(0, 1))(s, ws[1])
        assert jnp.allclose(gv[0][1], g0[0], rtol=tol, atol=tol)
        assert jnp.allclose(gv[1][1], g0[1], rtol=tol, atol=tol)
        print(f"  ok B={B} H={H} C={C} k={k} s={stride}")
    print("parity: PASS")


def bench():
    dtype = jnp.bfloat16
    results = {}
    for name, C in [("dce", 6), ("dwi", 14)]:
        B, H, O = 32, 256, 64
        strides, padding = (2, 2), ((3, 3), (3, 3))
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 4)
        x = jax.random.normal(ks[0], (B, H, H, C), dtype)
        s = jax.nn.sigmoid(jax.random.normal(ks[1], (B, C), dtype))
        w = jax.random.normal(ks[2], (7, 7, C, O), dtype) * 0.1
        m = jax.random.normal(ks[3], (B, H // 2, H // 2, O), dtype)
        fn_vmap = make_scaled_stem_conv(strides, padding, use_fgc=False)
        fn_fgc = make_scaled_stem_conv(strides, padding, use_fgc=True)

        grad_ref = jax.jit(jax.grad(
            lambda s_, w_: _loss_ref(x, s_, w_, m, strides, padding),
            argnums=(0, 1)))
        grad_vmap = jax.jit(jax.grad(
            lambda s_, w_: _loss_new(x, s_, w_, m, strides, padding, fn_vmap),
            argnums=(0, 1)))
        grad_fgc = jax.jit(jax.grad(
            lambda s_, w_: _loss_new(x, s_, w_, m, strides, padding, fn_fgc),
            argnums=(0, 1)))

        for label, g in [("autodiff", grad_ref), ("rw_vmap", grad_vmap),
                         ("rw_fgc", grad_fgc)]:
            out = g(s, w)
            jax.block_until_ready(out)
            n, t0 = 50, time.perf_counter()
            for _ in range(n):
                out = g(s, w)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / n * 1e3
            results[f"{name}_{label}"] = dt
            print(f"  {name} {label:9s} {dt:7.3f} ms")
        a, b = results[f"{name}_autodiff"], results[f"{name}_rw_fgc"]
        print(f"  {name} fgc speedup {a / b:.2f}x")
        ga, gb = grad_ref(s, w), grad_fgc(s, w)
        err = max(float(jnp.abs((ga[0] - gb[0]).astype(jnp.float32)).max()),
                  float(jnp.abs((ga[1] - gb[1]).astype(jnp.float32)).max()))
        print(f"  {name} max grad err vs autodiff (bf16): {err:.4g}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true", help="CPU parity check")
    args = ap.parse_args()
    if args.check:
        jax.config.update("jax_platforms", "cpu")
        check()
    else:
        bench()
