"""Skinny-GEMM weight-streaming bandwidth on v5e (decode-step shapes).

All variants run K=20 passes INSIDE one jit (a single eager dispatch on this
tunneled backend measured ~30 ms of overhead, swamping 1 GB of streaming).
Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_gemm_bw.py
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

C, F, QKV = 1024, 4096, 3072
L, K = 30, 20


def timeit(fn, *a, iters=5):
    float(fn(*a))
    best = 1e9
    for _ in range(iters):
        t0 = time.time()
        float(fn(*a))
        best = min(best, (time.time() - t0) / K)
    return best


def mk(key, shape):
    return (jax.lax.iota(jnp.float32, int(np.prod(shape))).reshape(shape) % 3.0 - 1.0).astype(jnp.bfloat16) * 0.01


k = jax.random.PRNGKey(0)

# 1) one giant GEMM (C x N = same ~1 GB), K reps inside one jit
N = 512 * 1024
w_big = mk(k, (C, N))


def rep_big(x, w):
    def body(xx, _):
        y = jnp.matmul(xx, w)
        return xx + jnp.mean(y, axis=-1, keepdims=True) * 1e-6, None

    x, _ = lax.scan(body, x, None, length=K)
    return jnp.sum(x.astype(jnp.float32))


gb = C * N * 2 / 1e9
for R in (16, 32, 64, 128):
    x = jnp.ones((R, C), jnp.bfloat16) * 0.01
    t = timeit(jax.jit(rep_big), x, w_big)
    print(f"single GEMM rows={R:4d}: {t*1e3:7.3f} ms/pass  {gb/t:5.0f} GB/s")

# 2) the real 4-GEMM 30-layer chain, K reps inside one jit
layers = {
    "qkv": mk(k, (L, C, QKV)),
    "o": mk(k, (L, C, C)),
    "gu": mk(k, (L, C, 2 * F)),
    "down": mk(k, (L, F, C)),
}
per_layer = (C * QKV + C * C + C * 2 * F + F * C) * 2
tot = L * per_layer / 1e9


def chain(x, layers):
    def step(x, _):
        def body(xx, lp):
            q = jnp.matmul(xx, lp["qkv"])[:, :C]
            o = jnp.matmul(q, lp["o"])
            gu = jnp.matmul(xx + o, lp["gu"])
            g, u = jnp.split(gu, 2, axis=-1)
            y = jnp.matmul(jax.nn.silu(g) * u, lp["down"])
            return xx + y * 1e-3, None

        x, _ = lax.scan(body, x, layers)
        return x, None

    x, _ = lax.scan(step, x, None, length=K)
    return jnp.sum(x.astype(jnp.float32))


for R in (16, 32, 64, 128):
    x = jnp.ones((R, C), jnp.bfloat16) * 0.01
    t = timeit(jax.jit(chain), x, layers)
    print(f"4-GEMM chain rows={R:4d}: {t*1e3:7.3f} ms/pass  {tot/t:5.0f} GB/s")

# 3) unrolled layers (no inner scan) -- does the layer scan cost BW?
def chain_unroll(x, layers):
    ls = [jax.tree.map(lambda a: a[i], layers) for i in range(L)]

    def step(x, _):
        for lp in ls:
            q = jnp.matmul(x, lp["qkv"])[:, :C]
            o = jnp.matmul(q, lp["o"])
            gu = jnp.matmul(x + o, lp["gu"])
            g, u = jnp.split(gu, 2, axis=-1)
            x = x + jnp.matmul(jax.nn.silu(g) * u, lp["down"]) * 1e-3
        return x, None

    x, _ = lax.scan(step, x, None, length=K)
    return jnp.sum(x.astype(jnp.float32))


for R in (16,):
    x = jnp.ones((R, C), jnp.bfloat16) * 0.01
    t = timeit(jax.jit(chain_unroll), x, layers)
    print(f"unrolled chain rows={R:4d}: {t*1e3:7.3f} ms/pass  {tot/t:5.0f} GB/s")
