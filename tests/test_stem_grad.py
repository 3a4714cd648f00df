"""Pin the algebra behind scripts/bench_stem_grad.py — the measured-and-
rejected modality-SE grad rewrite (r4).

The rewrite lost on the v5e (the TPU conv canonicalizer block-diagonalizes
per-sample weight grads; see the script docstring), but the identity it
rests on — ``ds = sum_{t,o} W * Sx`` / ``dW = sum_b s * Sx`` with Sx the
per-sample weight grad against the UNSCALED input — is the documented
reason the multiply_reduce fusions are emitter-bound rather than
algorithm-bound, so it must keep holding against autodiff.
"""

import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

_SCRIPT = os.path.join(os.path.dirname(__file__), os.pardir, "scripts",
                       "bench_stem_grad.py")


@pytest.fixture(scope="module")
def sg():
    spec = importlib.util.spec_from_file_location("bench_stem_grad", _SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("C,k,stride,pad", [(6, 7, 2, 3), (3, 3, 1, 1)])
@pytest.mark.parametrize("use_fgc", [False, True])
def test_rewrite_grads_match_autodiff(sg, C, k, stride, pad, use_fgc):
    B, H, O = 3, 16, 8
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    x = jax.random.normal(ks[0], (B, H, H, C))
    s = jax.nn.sigmoid(jax.random.normal(ks[1], (B, C)))
    w = jax.random.normal(ks[2], (k, k, C, O)) * 0.1
    strides, padding = (stride, stride), ((pad, pad), (pad, pad))
    Ho = (H + 2 * pad - k) // stride + 1
    m = jax.random.normal(ks[3], (B, Ho, Ho, O))
    fn = sg.make_scaled_stem_conv(strides, padding, use_fgc=use_fgc)

    np.testing.assert_allclose(
        np.asarray(fn(x, s, w)),
        np.asarray(sg._conv(x * s[:, None, None, :], w, strides, padding)),
        rtol=1e-6, atol=1e-6)

    gs_ref, gw_ref = jax.grad(sg._loss_ref, argnums=(1, 2))(
        x, s, w, m, strides, padding)
    gs_new, gw_new = jax.grad(
        lambda x_, s_, w_: sg._loss_new(x_, s_, w_, m, strides, padding, fn),
        argnums=(1, 2))(x, s, w)
    np.testing.assert_allclose(np.asarray(gs_new), np.asarray(gs_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_new), np.asarray(gw_ref),
                               rtol=1e-4, atol=1e-5)
