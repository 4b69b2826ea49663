"""MXU utilization vs contraction depth K at UNet/CFM shapes (r4, VERDICT
r3 #8): is the UNet's 24% MXU utilization structural?

Slope-timed GEMMs (K-rep scan inside one jit), reporting achieved TFLOP/s
of USEFUL work:

  k-sweep     -- (768, K)@(K, 768) for K in {64, 128, 256, 512, 1024}:
                 the tile-pass model predicts utilization ~ K/128 capped
                 at the big-K ceiling (two-pass tiles at K=256 etc.)
  head-dot    -- batched per-head attention dot (B*H, T, 64)@(B*H, 64, T)
                 at the UNet's T=768, 16 CFG rows x 8 heads
  head-packed -- the 2-heads-per-128-lane block-diagonal packing VERDICT
                 asked to probe: (B*H/2, T, 128)@(B*H/2, 128, 2T), zeros in
                 the off-head blocks; same tile-pass count as head-dot (the
                 K gain is spent on doubled N), so the model predicts NO win
  ff1 / ff2   -- the UNet FF pair (T, 256)@(256, 1024), (T, 1024)@(1024, 256)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_mxu_k.py
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    def slope_time(make, arrs, k1=50, k2=150, iters=5):
        ts = {}
        for K in (k1, k2):
            fn = jax.jit(make(K))
            float(fn(*arrs))
            best = 1e9
            for _ in range(iters):
                t0 = time.time()
                float(fn(*arrs))
                best = min(best, time.time() - t0)
            ts[K] = best
        return (ts[k2] - ts[k1]) / (k2 - k1)

    def gemm_case(a, b, flops):
        def make(K):
            def f(a, b):
                def body(aa, i):
                    y = jnp.matmul(aa, b)
                    # additive runtime-valued epsilon: a multiplicative
                    # (1 + s*1e-30) factor ROUNDS TO EXACTLY 1.0 in bf16 and
                    # XLA folds+hoists the matmul out of the scan (measured:
                    # negative slopes) -- an add of a runtime value cannot
                    # be folded even though it is numerically ~0
                    s = jnp.mean(y, axis=-1, keepdims=True) * 1e-30
                    return aa + s[..., :1].astype(aa.dtype), None
                aa, _ = lax.scan(body, a, jnp.arange(K))
                return jnp.sum(aa.astype(jnp.float32))
            return f

        t = slope_time(make, (a, b))
        return round(t * 1e3, 4), round(flops / t / 1e12, 1)

    out = {}
    rng = np.random.default_rng(0)
    T = 768

    # batch 16 leading dim: a lone (768,K)@(K,768) is ~5-10 us -- below the
    # tunnel's slope noise even at 100 reps (measured: negative slopes)
    for k in (64, 128, 256, 512, 1024):
        a = jnp.asarray(rng.standard_normal((16, T, k)), jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((k, T)), jnp.bfloat16)
        ms, tf = gemm_case(a, b, 2 * 16 * T * k * T)
        out[f"k{k}"] = {"ms": ms, "tflops": tf}

    bh, d = 16 * 8, 64  # 16 CFG rows x 8 heads
    a = jnp.asarray(rng.standard_normal((bh, T, d)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((bh, d, T)), jnp.bfloat16)
    ms, tf = gemm_case(a, b, 2 * bh * T * d * T)
    out["head_dot"] = {"ms": ms, "tflops": tf}

    # block-diagonal 2-head packing: same useful FLOPs, K=128, N=2T
    a2 = jnp.asarray(rng.standard_normal((bh // 2, T, 2 * d)), jnp.bfloat16)
    b2np = np.zeros((bh // 2, 2 * d, 2 * T), np.float32)
    b2np[:, :d, :T] = rng.standard_normal((bh // 2, d, T))
    b2np[:, d:, T:] = rng.standard_normal((bh // 2, d, T))
    b2 = jnp.asarray(b2np, jnp.bfloat16)
    ms, tf = gemm_case(a2, b2, 2 * bh * T * d * T)  # useful FLOPs unchanged
    out["head_packed_bd"] = {"ms": ms, "tflops": tf}

    for name, (m, k, n) in {
        "ff1": (T, 256, 1024),
        "ff2": (T, 1024, 256),
    }.items():
        a = jnp.asarray(rng.standard_normal((16, m, k)), jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)
        ms, tf = gemm_case(a, b, 2 * 16 * m * k * n)
        out[name] = {"ms": ms, "tflops": tf}

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
