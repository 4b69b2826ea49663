"""Separate the decode step's two cache costs per layout: 30 chained kernel
reads vs the one all-layer cache write. Prints one line per (batch, layout,
part) to stderr as it goes (unbuffered)."""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

try:
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

from chatterbox_tpu.ops.flash_decode import flash_decode_layer_attention

l, h, s, d = 30, 16, 384, 64


@functools.partial(jax.jit, static_argnames=("ds",))
def read_step(cache, prefix, q, kn, vn, pos, ds):
    def body(i, qq):
        o = flash_decode_layer_attention(
            cache, i, pos + 1, prefix, jnp.int32(66), qq, kn, vn, ds_layout=ds,
        )
        return o.astype(qq.dtype)

    return lax.fori_loop(0, l, body, q)


@functools.partial(jax.jit, static_argnames=("ds",), donate_argnums=(0,))
def write_step(cache, kn, vn, pos, ds):
    kv = jnp.broadcast_to(jnp.stack([kn, vn])[None], (l, 2) + kn.shape).astype(cache.dtype)
    if ds:
        cache = lax.dynamic_update_slice(cache, kv[..., None], (0, 0, 0, 0, 0, pos))
    else:
        cache = lax.dynamic_update_slice(cache, kv[..., None, :], (0, 0, 0, 0, pos, 0))
    return cache


def bench(fn, out_probe, n=30):
    t0 = time.time()
    r = fn()
    out_probe(r)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        r = fn()
    out_probe(r)
    return 1000 * (time.time() - t0) / n, compile_s


rng = np.random.default_rng(0)
for b in (16, 128):
    q = jnp.asarray(rng.standard_normal((b, h, d)), jnp.bfloat16)
    kn = jnp.asarray(rng.standard_normal((b, h, d)), jnp.bfloat16)
    vn = jnp.asarray(rng.standard_normal((b, h, d)), jnp.bfloat16)
    prefix = jnp.asarray(np.full(b, 60), jnp.int32)
    for ds in (False, True):
        shape = (l, 2, b, h, d, s) if ds else (l, 2, b, h, s, d)
        try:
            cache = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
            ms, cs = bench(
                lambda: read_step(cache, prefix, q, kn, vn, jnp.int32(200), ds),
                lambda r: float(r[0, 0, 0]),
            )
            print(f"b={b} ds={ds} READ : {ms:7.2f} ms (compile {cs:.0f}s)",
                  file=sys.stderr, flush=True)
            state = {"c": cache}

            def wfn():
                state["c"] = write_step(state["c"], kn, vn, jnp.int32(200), ds)
                return state["c"]

            ms, cs = bench(wfn, lambda r: float(r[0, 0, 0, 0, 0, 0]))
            print(f"b={b} ds={ds} WRITE: {ms:7.2f} ms (compile {cs:.0f}s)",
                  file=sys.stderr, flush=True)
            del state, cache
        except Exception as e:
            print(f"b={b} ds={ds}: FAIL {type(e).__name__}: {str(e)[:160]}",
                  file=sys.stderr, flush=True)
