"""Slope-timed decomposition of the T3 decode step (r3).

Parts, each K-repeated inside one jit and slope-timed at K in {10, 30}
(this tunnel adds ~28 ms per dispatch; single-K rates embed overhead/K):
  matmuls  -- probe_slope_bw.py: 1.53 ms/step @16 rows (671 GB/s)
  kernel   -- 30 chained flash_decode_layer_attention calls, (D,S) cache +
              SD tail, mid-decode state (cur_len 200 of S=384)
  full     -- the real t3 decode: taken from bench_decode (the 250-step
              while_loop amortizes dispatch overhead to ~0.1 ms/step)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_decode_parts.py
"""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

from chatterbox_tpu.ops.flash_decode import TAIL_W, flash_decode_layer_attention

L, H, S, D = 30, 16, 384, 64
CUR = 200


def slope_time(make_fn, args, k1=10, k2=30, iters=5):
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


rng = np.random.default_rng(0)
for b in (16, 64, 128):
    cache = jnp.asarray(rng.standard_normal((L, 2, b, H, D, S)), jnp.bfloat16)
    tail = jnp.asarray(rng.standard_normal((L, 2, b, H, TAIL_W, D)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((b, H, D)), jnp.bfloat16)
    kn = jnp.asarray(rng.standard_normal((b, H, D)), jnp.bfloat16)
    vn = jnp.asarray(rng.standard_normal((b, H, D)), jnp.bfloat16)
    prefix = jnp.asarray(np.full(b, 60), jnp.int32)
    mb = (CUR // TAIL_W) * TAIL_W

    def make(K):
        def f(cache, tail, q, kn, vn, prefix):
            def step(qq, _):
                def body(i, acc):
                    o = flash_decode_layer_attention(
                        cache, i, jnp.int32(CUR), prefix, jnp.int32(66),
                        acc, kn, vn, tail=tail, merge_base=jnp.int32(mb),
                        ds_layout=True,
                    )
                    return o.astype(qq.dtype)

                return lax.fori_loop(0, L, body, qq), None

            qq, _ = lax.scan(step, q, None, length=K)
            return jnp.sum(qq.astype(jnp.float32))

        return jax.jit(f)

    t = slope_time(make, (cache, tail, q, kn, vn, prefix))
    # bytes actually touched per step: live blocks only (ceil(CUR/s_blk))
    live_blocks = -(-CUR // 128)
    gb = L * 2 * b * H * D * (live_blocks * 128) * 2 / 1e9
    print(
        f"kernel chain rows={b:4d}: {t*1e3:7.3f} ms/step | live cache "
        f"{gb:.3f} GB -> {gb/t:.0f} GB/s"
    )
