"""On-chip microbench: fused conv3x3+BN+GELU kernel vs the XLA chain.

Geometry defaults to the profiled neck_f1_conv1 outlier (B=128, 64^2,
128->128, bf16): XLA's EmitAllBatchInSublanes emitter measured ~2.7 ms vs
a ~1.0 ms conv roofline there (README "Performance status").  Usage:

    python scripts/bench_conv3x3.py [--batch 128] [--hw 64] [--ch 128]
                                    [--bt-budget MB]
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--hw", type=int, default=64)
    ap.add_argument("--ch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    from dmf_tpu.ops.conv3x3_pallas import conv3x3_bn_gelu

    rng = np.random.RandomState(0)
    B, H, C = args.batch, args.hw, args.ch
    x = jnp.asarray(rng.randn(B, H, H, C), jnp.bfloat16) * 0.5
    k = jnp.asarray(rng.randn(3, 3, C, C), jnp.float32) * 0.05
    b = jnp.asarray(rng.randn(C), jnp.float32) * 0.01
    g = jnp.asarray(rng.rand(C), jnp.float32) + 0.5
    beta = jnp.asarray(rng.randn(C), jnp.float32) * 0.01
    mu = jnp.asarray(rng.randn(C), jnp.float32) * 0.01
    var = jnp.asarray(rng.rand(C), jnp.float32) + 0.5

    @jax.jit
    def xla_chain(x):
        y = jax.lax.conv_general_dilated(
            x, k.astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        y = y + b
        y = (y - mu) / jnp.sqrt(var + 1e-5) * g + beta
        return jax.nn.gelu(y, approximate=False).astype(x.dtype)

    @jax.jit
    def kernel(x):
        return conv3x3_bn_gelu(x, k, b, g, beta, mu, var)

    flops = 2 * B * H * H * 9 * C * C

    # A bare jit boundary pins the input to the DEFAULT {3,2,1,0} layout,
    # which is pathological for XLA's batch-in-sublanes emitter (measured
    # 25.6 ms vs the 2.7 ms the same conv costs in-model) — so measure the
    # MARGINAL cost of a second stage behind an identical producer conv,
    # where XLA (or the kernel boundary) picks the interior layouts.
    @jax.jit
    def one(x):
        return xla_chain(x)

    @jax.jit
    def two_xla(x):
        return xla_chain(xla_chain(x))

    @jax.jit
    def xla_then_kernel(x):
        return kernel(xla_chain(x))

    def med_ms(fn):
        jax.block_until_ready(fn(x))
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(x))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) * 1e3

    t1 = med_ms(one)
    t2x = med_ms(two_xla)
    t2k = med_ms(xla_then_kernel)
    print(f"producer alone        {t1:8.3f} ms")
    for name, t in (("xla stage2", t2x - t1), ("pallas stage2", t2k - t1)):
        print(f"{name:20s} {t:8.3f} ms   "
              f"{flops / (max(t, 1e-6) * 1e-3) / 1e12:6.1f} TFLOP/s")
    ref = np.asarray(two_xla(x), np.float32)
    got = np.asarray(xla_then_kernel(x), np.float32)
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    print(f"stage2 rel-err pallas vs xla: {err:.4f}")


if __name__ == "__main__":
    main()
