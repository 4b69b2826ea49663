"""Validate + time flash_cache_write_ds on hardware: numerics vs XLA
dynamic_update_slice, then per-call time for a chain of writes in one jit."""

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

from chatterbox_tpu.ops.flash_decode import flash_cache_merge_ds as flash_cache_write_ds

l, h, s, d = 30, 16, 384, 64
b = 16
rng = np.random.default_rng(0)
cache0 = jnp.asarray(rng.standard_normal((l, 2, b, h, d, s)), jnp.bfloat16)
new = jnp.asarray(rng.standard_normal((l, 2, b, h, d, 1)), jnp.bfloat16)

# numerics: kernel vs XLA at a few positions (incl. block boundaries)
for pos in (0, 5, 127, 128, 200, 383):
    got = flash_cache_write_ds(cache0, new, jnp.int32(pos))
    want = lax.dynamic_update_slice(cache0, new, (0, 0, 0, 0, 0, pos))
    ok = bool(jnp.all(got == want))
    print(f"pos={pos}: {'OK' if ok else 'MISMATCH'}", file=sys.stderr, flush=True)
    if not ok:
        diff = jnp.sum(got != want)
        print(f"  differing elements: {int(diff)}", file=sys.stderr, flush=True)
        sys.exit(1)


# timing: chain of 30 writes inside one jit (mirrors per-step in-loop use)
@jax.jit
def chain(cache, new):
    def body(i, c):
        return flash_cache_write_ds(c, new, jnp.int32(200))

    return lax.fori_loop(0, 30, body, cache)


out = chain(cache0, new)
_ = float(out[0, 0, 0, 0, 0, 0])
t0 = time.time()
n = 20
for _ in range(n):
    out = chain(out, new)
_ = float(out[0, 0, 0, 0, 0, 0])
ms = 1000 * (time.time() - t0) / n / 30
print(f"write kernel: {ms:.3f} ms/call (b={b} rows, chained x30)", file=sys.stderr, flush=True)
