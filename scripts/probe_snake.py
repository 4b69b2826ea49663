"""HiFT snake-activation attack probe (r4, VERDICT r3 #7).

The vocoder (109 ms @b8/500 frames) is VPU-transcendental-bound at fp32
(snake sin^2, exp/sin head; bf16 measured perf-NEUTRAL). Candidates, each
slope-timed standalone on a vocoder-shaped tensor and A/B'd numerically:

  exact      -- x + sin(ax)^2/a (XLA sin: full range reduction + poly)
  halfangle  -- x + (1 - cos(2ax))/(2a)  (same transcendental count)
  poly       -- mod-1 range reduction + degree-4 polynomial in f^2 for
                sin^2(pi f): no transcendental, ~8 VPU ops

Prints per-variant ms + SNR vs exact. If poly wins on time and holds
>= 60 dB, it's a shippable swap; otherwise records the infeasibility.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_snake.py
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--elems", type=int, default=8 * 24000 * 128,
                    help="tensor size (default ~ one b8 resblock activation)")
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

    # coefficients: least-squares fit of sin^2(pi f)/f^2 as P(f^2), f in
    # [-0.5, 0.5] (exact series would need degree ~6; LSQ deg-4 hits ~1e-7)
    f = np.linspace(-0.5, 0.5, 20001)
    f = f[np.abs(f) > 1e-6]  # drop f=0 (0/0); P(0) limit is pi^2
    z = f * f
    target = (np.sin(np.pi * f) ** 2) / z
    A = np.stack([np.ones_like(z), z, z**2, z**3, z**4], axis=1)
    coef, *_ = np.linalg.lstsq(A, target, rcond=None)
    c0, c1, c2, c3, c4 = [float(c) for c in coef]

    def snake_exact(x, alpha, inv_a):
        return x + inv_a * jnp.sin(x * alpha) ** 2

    def snake_half(x, alpha, inv_a):
        return x + (0.5 * inv_a) * (1.0 - jnp.cos(2.0 * alpha * x))

    inv_pi = 1.0 / np.pi

    def snake_poly(x, alpha, inv_a):
        t = x * (alpha * inv_pi)
        fr = t - jnp.round(t)  # sin^2(pi t) == sin^2(pi fr), fr in [-.5,.5]
        zz = fr * fr
        p = c0 + zz * (c1 + zz * (c2 + zz * (c3 + zz * c4)))
        return x + inv_a * (zz * p)

    rng = np.random.default_rng(0)
    b, t, c = 8, args.elems // (8 * 128), 128
    x = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32) * 3.0)
    alpha = jnp.asarray(np.abs(rng.standard_normal(c)).astype(np.float32) + 0.5)
    inv_a = 1.0 / (alpha + 1e-9)

    # numeric check (vs float64 exact)
    x64 = np.asarray(x, np.float64)
    a64 = np.asarray(alpha, np.float64)
    exact64 = x64 + (np.sin(x64 * a64) ** 2) / (a64 + 1e-9)

    def snr(got):
        err = np.asarray(got, np.float64) - exact64
        return 10 * np.log10(np.sum(exact64**2) / max(np.sum(err**2), 1e-30))

    def slope_time(fn, k1=10, k2=30, iters=5):
        def make(K):
            def f(x, alpha, inv_a):
                def body(xx, i):
                    y = fn(xx, alpha, inv_a)
                    # keep reps dependent + bounded
                    return y * (0.3 + i * 1e-30), None
                y, _ = lax.scan(body, x, jnp.arange(K, dtype=jnp.float32))
                return jnp.sum(y)
            return jax.jit(f)

        ts = {}
        for K in (k1, k2):
            g = make(K)
            float(g(x, alpha, inv_a))
            best = 1e9
            for _ in range(iters):
                t0 = time.time()
                float(g(x, alpha, inv_a))
                best = min(best, time.time() - t0)
            ts[K] = best
        return (ts[k2] - ts[k1]) / (k2 - k1)

    out = {"elems": int(np.prod(x.shape))}
    for name, fn in [("exact", snake_exact), ("halfangle", snake_half),
                     ("poly", snake_poly)]:
        ms = slope_time(fn) * 1e3
        out[name] = {
            "ms": round(ms, 3),
            "snr_db": round(snr(fn(x, alpha, inv_a)), 1),
            "gelems_per_s": round(out["elems"] / (ms * 1e6), 1),
        }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
