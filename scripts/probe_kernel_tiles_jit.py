"""A/B flash-decode tile shapes with the layer loop INSIDE one jit.

The eager per-call sweep (probe_kernel_tiles.py) is dominated by remote
dispatch (~4.7 ms/call through the axon tunnel), hiding kernel-time deltas.
Here a single jitted graph chains 30 sequential layer calls (output feeds the
next query, so the calls cannot be parallelized away), matching how the real
decode step invokes the kernel. Timed over outer python iterations with a
scalar readback (block_until_ready is unreliable on this backend).
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

try:
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
except Exception:
    pass

from chatterbox_tpu.ops.flash_decode import flash_decode_layer_attention

l, h, s, d = 30, 16, 384, 64


@functools.partial(jax.jit, static_argnames=("s_blk", "rows"))
def step(cache, prefix, q, kn, vn, s_blk, rows):
    def body(i, qq):
        o = flash_decode_layer_attention(
            cache, i, jnp.int32(200), prefix, jnp.int32(66),
            qq, kn, vn, s_block=s_blk, rows_per_cell=rows,
        )
        return o.astype(qq.dtype)

    return lax.fori_loop(0, l, body, q)


rng = np.random.default_rng(0)
for b in (16, 64):
    cache = jnp.asarray(rng.standard_normal((l, 2, b, h, s, d)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((b, h, d)), jnp.bfloat16)
    kn = jnp.asarray(rng.standard_normal((b, h, d)), jnp.bfloat16)
    vn = jnp.asarray(rng.standard_normal((b, h, d)), jnp.bfloat16)
    prefix = jnp.asarray(np.full(b, 60), jnp.int32)

    for s_blk, rows in [(128, 4), (192, 4), (64, 8), (384, 2), (384, 4), (128, 2)]:
        if s % s_blk or b % rows:
            continue
        try:
            t0 = time.time()
            out = step(cache, prefix, q, kn, vn, s_blk, rows)
            _ = float(out[0, 0, 0])
            compile_s = time.time() - t0
            t0 = time.time()
            n = 20
            for _i in range(n):
                out = step(cache, prefix, q, kn, vn, s_blk, rows)
            _ = float(out[0, 0, 0])
            ms = 1000 * (time.time() - t0) / n
            print(
                f"b={b} s_blk={s_blk} rows={rows}: {ms:.2f} ms/30-layer-step "
                f"(compile {compile_s:.1f}s) out00={float(out[0,0,0]):.4f}",
                file=sys.stderr, flush=True,
            )
        except Exception as e:
            print(f"b={b} s_blk={s_blk} rows={rows}: FAIL {type(e).__name__}: "
                  f"{str(e)[:160]}", file=sys.stderr, flush=True)
