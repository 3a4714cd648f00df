"""On-chip microbench: fused SE Pallas kernel vs the XLA SEBlock.

Decides the SEBlock dispatch (models/layers.py ``fused=...``) by
measurement at the flagship serving geometries: the suffix SE sites run at
32 x 32 spatial with C in {128, 256, 512} (config.py ModelConfig.channels),
batch 128 (= fp serving B, and = the 4-view TTA batch at B=32), both plain
and under the 39-pass MC vmap that evals/predict.py uses.

Test data is generated ON DEVICE (jax.random, bf16) — the vmap operand at
C=512 is 5.2 GB, and host-side randn + tunnel transfer of that dwarfs the
measurement on this 1-core host.  Rows print as they complete so a timed-out
run still yields data.

Usage (real TPU, ~10-20 min incl. tunnel compiles):  python scripts/bench_se.py
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from dmf_tpu.models.layers import SEBlock  # noqa: E402
from dmf_tpu.ops.epilogue_pallas import se_epilogue  # noqa: E402
from dmf_tpu.ops.se_pallas import se_scale  # noqa: E402


def timeit(f, *args, iters=20):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    print(f"backend: {jax.default_backend()}  device: {jax.devices()[0]}",
          flush=True)
    B, H, W = 128, 32, 32
    P = 39  # lean MC passes in the tta_mc predictor
    print(f"{'C':>4} {'xla us':>9} {'fused us':>9} {'fused GB/s':>11} "
          f"{'xla GB/s*':>10} {'vmap39 xla ms':>14} {'vmap39 fused ms':>16}",
          flush=True)
    for C in (128, 256, 512):
        model = SEBlock(channels=C, reduction=2, dtype=jnp.bfloat16)
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)
        variables = model.init(jax.random.PRNGKey(0), x)
        p0 = variables["params"]["Dense_0"]
        p1 = variables["params"]["Dense_1"]

        xla = jax.jit(lambda v, t: model.apply(v, t)[0])
        fused = jax.jit(lambda t: se_scale(
            t, p0["kernel"], p0["bias"], p1["kernel"], p1["bias"])[0])
        t_x = timeit(xla, variables, x)
        t_f = timeit(fused, x)

        xp = jax.random.normal(jax.random.PRNGKey(1), (P, B, H, W, C),
                               jnp.bfloat16)
        vx = jax.jit(jax.vmap(lambda t: model.apply(variables, t)[0]))
        vf = jax.jit(jax.vmap(lambda t: se_scale(
            t, p0["kernel"], p0["bias"], p1["kernel"], p1["bias"])[0]))
        tv_x = timeit(vx, xp, iters=10)
        tv_f = timeit(vf, xp, iters=10)

        bytes_min = 2 * B * H * W * C * 2  # one read + one write, bf16
        print(f"{C:>4} {t_x * 1e6:>9.1f} {t_f * 1e6:>9.1f} "
              f"{bytes_min / t_f / 1e9:>11.0f} {bytes_min / t_x / 1e9:>10.0f} "
              f"{tv_x * 1e3:>14.2f} {tv_f * 1e3:>16.2f}", flush=True)
    print("* xla GB/s uses the fused-path byte count (2 passes) for an"
          " apples-to-apples effective rate; XLA actually moves ~2x that.")

    # Whole-epilogue comparison: out = SE(dropout(gelu(x + identity))) as
    # XLA ops vs the fused kernel (ops/epilogue_pallas.py) — the in-context
    # segment (XLA co-fuses the SE pool upstream; SE-alone is a wash)
    print(f"\nepilogue (residual+GELU+dropout+SE), B={B} {H}x{W}:")
    print(f"{'C':>4} {'mode':>8} {'xla us':>9} {'fused us':>9} "
          f"{'vmap39 xla ms':>14} {'vmap39 fused ms':>16}")
    for C in (128, 256, 512):
        model = SEBlock(channels=C, reduction=2, dtype=jnp.bfloat16)
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)
        idn = jax.random.normal(jax.random.PRNGKey(7), x.shape, jnp.bfloat16)
        variables = model.init(jax.random.PRNGKey(0), x)
        p0 = variables["params"]["Dense_0"]
        p1 = variables["params"]["Dense_1"]

        for mode, drop in (("eval", 0.0), ("mc", 0.4)):
            def xla_chain(t, i, r):
                y = jax.nn.gelu(t + i, approximate=False)
                if drop > 0:
                    keep = jax.random.bernoulli(r, 1.0 - drop, y.shape)
                    y = jnp.where(keep, y / (1.0 - drop), 0.0).astype(y.dtype)
                return model.apply(variables, y)[0]

            def fused_chain(t, i, r):
                return se_epilogue(t, i, p0["kernel"], p0["bias"],
                                   p1["kernel"], p1["bias"],
                                   drop_rate=drop, rng=r if drop else None)

            r = jax.random.PRNGKey(1)
            t_x = timeit(jax.jit(xla_chain), x, idn, r)
            t_f = timeit(jax.jit(fused_chain), x, idn, r)

            if drop > 0:  # rng-free eval vmap would be hoistable by XLA
                rs = jax.random.split(jax.random.PRNGKey(2), P)
                vx = jax.jit(jax.vmap(lambda rr: xla_chain(x, idn, rr)))
                vf = jax.jit(jax.vmap(lambda rr: fused_chain(x, idn, rr)))

                def _try(f, a):
                    # the axon tunnel 413s on very large compile payloads
                    # (seen: the C=512 vmap39 XLA baseline); keep going
                    try:
                        return f"{timeit(f, a, iters=10) * 1e3:.2f}"
                    except Exception as e:  # noqa: BLE001
                        return f"ERR({type(e).__name__})"

                vcols = f"{_try(vx, rs):>14} {_try(vf, rs):>16}"
            else:
                vcols = f"{'-':>14} {'-':>16}"
            print(f"{C:>4} {mode:>8} {t_x * 1e6:>9.1f} {t_f * 1e6:>9.1f} "
                  f"{vcols}", flush=True)


if __name__ == "__main__":
    main()
