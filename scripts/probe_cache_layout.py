"""A/B the KV-cache layout on hardware: (L,2,B,H,S,D) vs (L,2,B,H,D,S).

The (S,D) layout puts D=64 on the 128-lane axis -> the HBM array is tile-
padded 2x (measured: the b64 decode graph OOMs at 20G). The (D,S) layout is
pad-free, halving cache reads, but the per-token write becomes a dynamic-
offset update on the LANE axis -- this probe measures whether XLA emits that
efficiently. One jitted step = 30 chained kernel layer calls + the step's
single all-layer cache write (exactly the decode step's cache traffic).
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

l, h, s, d = 30, 16, 512, 64


@functools.partial(jax.jit, static_argnames=("ds",), donate_argnums=(0,))
def step(cache, prefix, q, kn, vn, pos, ds):
    def body(i, qq):
        o = flash_decode_layer_attention(
            cache, i, pos + 1, prefix, jnp.int32(66),
            qq, kn, vn, ds_layout=ds,
        )
        return o.astype(qq.dtype)

    out = lax.fori_loop(0, l, body, q)
    # the step's cache write: all layers' new K/V at slot `pos`
    kv = jnp.broadcast_to(
        jnp.stack([kn, vn])[None], (l, 2) + kn.shape
    ).astype(cache.dtype)
    if ds:
        new = kv[..., None]  # (L,2,B,H,D,1)
        cache = lax.dynamic_update_slice(cache, new, (0, 0, 0, 0, 0, pos))
    else:
        new = kv[..., None, :]  # (L,2,B,H,1,D)
        cache = lax.dynamic_update_slice(cache, new, (0, 0, 0, 0, pos, 0))
    return out, cache


rng = np.random.default_rng(0)
for b in (16, 64):
    for ds in (False, True):
        shape = (l, 2, b, h, d, s) if ds else (l, 2, b, h, s, d)
        cache = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
        q = jnp.asarray(rng.standard_normal((b, h, d)), jnp.bfloat16)
        kn = jnp.asarray(rng.standard_normal((b, h, d)), jnp.bfloat16)
        vn = jnp.asarray(rng.standard_normal((b, h, d)), jnp.bfloat16)
        prefix = jnp.asarray(np.full(b, 60), jnp.int32)
        try:
            t0 = time.time()
            out, cache = step(cache, prefix, q, kn, vn, jnp.int32(200), ds)
            _ = float(out[0, 0, 0])
            compile_s = time.time() - t0
            t0 = time.time()
            n = 20
            for i in range(n):
                out, cache = step(cache, prefix, q, kn, vn, jnp.int32(201 + i), ds)
            _ = float(out[0, 0, 0])
            ms = 1000 * (time.time() - t0) / n
            print(
                f"b={b} ds={ds}: {ms:.2f} ms/step (30 layers + write; "
                f"compile {compile_s:.1f}s) out00={float(out[0,0,0]):.4f}",
                file=sys.stderr, flush=True,
            )
        except Exception as e:
            print(f"b={b} ds={ds}: FAIL {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr, flush=True)
