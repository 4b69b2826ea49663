"""A/B the flash-decode kernel's tile shapes on hardware.

Sweeps (s_block, rows_per_cell) over the decode-relevant grid and times 30
sequential layer calls (~ one T3 decode step's attention) at the b8 (16 CFG
rows) and b32 (64 rows) configs. Forces a scalar readback after the loop --
``block_until_ready`` can return before remote execution completes on this
backend (CLAUDE.md).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
except Exception:
    pass

from chatterbox_tpu.ops.flash_decode import flash_decode_layer_attention

l, h, s, d = 30, 16, 384, 64
rng = np.random.default_rng(0)

for b in (16, 64):
    cache = jnp.asarray(rng.standard_normal((l, 2, b, h, s, d)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((b, h, d)), jnp.bfloat16)
    kn = jnp.asarray(rng.standard_normal((b, h, d)), jnp.bfloat16)
    vn = jnp.asarray(rng.standard_normal((b, h, d)), jnp.bfloat16)
    prefix = jnp.asarray(np.full(b, 60), jnp.int32)

    for s_blk, rows in [(128, 4), (128, 8), (64, 8), (64, 16), (192, 4)]:
        if s % s_blk or b % rows:
            continue
        try:
            t0 = time.time()
            out = flash_decode_layer_attention(
                cache, jnp.int32(3), jnp.int32(200), prefix, jnp.int32(66),
                q, kn, vn, s_block=s_blk, rows_per_cell=rows,
            )
            _ = float(out[0, 0, 0])
            compile_s = time.time() - t0
            t0 = time.time()
            for i in range(30):
                out = flash_decode_layer_attention(
                    cache, jnp.int32(i), jnp.int32(200), prefix, jnp.int32(66),
                    q, kn, vn, s_block=s_blk, rows_per_cell=rows,
                )
            _ = float(out[0, 0, 0])
            ms = 1000 * (time.time() - t0)
            print(
                f"b={b} s_blk={s_blk} rows={rows}: {ms:.2f} ms/30calls "
                f"(compile {compile_s:.1f}s) out00={float(out[0,0,0]):.4f}",
                file=sys.stderr, flush=True,
            )
        except Exception as e:
            print(f"b={b} s_blk={s_blk} rows={rows}: FAIL {type(e).__name__}: "
                  f"{str(e)[:200]}", file=sys.stderr, flush=True)
