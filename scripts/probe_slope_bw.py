"""Slope-based timing of the round-3 perf questions (this tunnel adds ~28 ms
per DISPATCH, r3 measurement; single-K in-jit repetition still embeds
overhead/K -- time at K and 2K and use the slope).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_slope_bw.py
"""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

def slope_time(make_fn, args, k1=10, k2=30, iters=5):
    """make_fn(K) -> jitted scalar fn; returns per-rep seconds via slope."""
    ts = {}
    for K in (k1, k2):
        fn = make_fn(K)
        float(fn(*args))
        best = 1e9
        for _ in range(iters):
            t0 = time.time()
            float(fn(*args))
            best = min(best, time.time() - t0)
        ts[K] = best
    return (ts[k2] - ts[k1]) / (k2 - k1)

# ---- 1. raw HBM read BW ----
n = 512 * 1024 * 1024
a = (lax.iota(jnp.float32, n) % 7.0).astype(jnp.bfloat16)

def mk_sum(K):
    def f(a):
        def body(c, _):
            # carry-dependent scalar defeats loop-invariant hoisting
            return jnp.sum((a * (1.0 + c * 1e-30)).astype(jnp.float32)) * 1e-9, None
        c, _ = lax.scan(body, 0.0, None, length=K)
        return c
    return jax.jit(f)

t = slope_time(mk_sum, (a,))
print(f"raw 1GB bf16 sum: {t*1e3:.3f} ms -> {1.0737/t:.0f} GB/s")
del a

# ---- 2. decode matmul chain (30 layers, rows sweep) ----
C, F, QKV, L = 1024, 4096, 3072, 30
def mkw(shape):
    return (lax.iota(jnp.float32, int(np.prod(shape))).reshape(shape) % 3.0 - 1.0).astype(jnp.bfloat16) * 0.01
layers = {"qkv": mkw((L, C, QKV)), "o": mkw((L, C, C)), "gu": mkw((L, C, 2*F)), "down": mkw((L, F, C))}
head = mkw((C, 8194))
tot = (L * (C*QKV + C*C + C*2*F + F*C) + C*8194) * 2 / 1e9

def mk_chain(R):
    def make(K):
        def f(x, layers, head):
            def step(x, _):
                def body(xx, lp):
                    qv = jnp.matmul(xx, lp["qkv"])[:, :C]
                    o = jnp.matmul(qv, lp["o"])
                    gu = jnp.matmul(xx + o, lp["gu"])
                    g, u = jnp.split(gu, 2, axis=-1)
                    y = jnp.matmul(jax.nn.silu(g) * u, lp["down"])
                    return xx + y * 1e-3, None
                x, _ = lax.scan(body, x, layers)
                lg = jnp.matmul(x, head)
                return x + jnp.mean(lg, axis=-1, keepdims=True).astype(x.dtype) * 1e-6, None
            x, _ = lax.scan(step, x, None, length=K)
            return jnp.sum(x.astype(jnp.float32))
        return jax.jit(f)
    return make

for R in (16, 64, 128):
    x = jnp.ones((R, C), jnp.bfloat16) * 0.01
    t = slope_time(mk_chain(R), (x, layers, head))
    print(f"decode matmul chain rows={R:4d}: {t*1e3:.3f} ms/step  {tot/t:.0f} GB/s")
