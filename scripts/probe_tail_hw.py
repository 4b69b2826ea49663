"""Hardware numerics check for the SD-tail decode kernels: the tail-fold
attention and the W-column merge kernel, each vs an XLA reference."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

try:
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

from chatterbox_tpu.ops.flash_decode import (
    flash_cache_merge_ds,
    flash_decode_layer_attention,
)

rng = np.random.default_rng(0)
l, b, h, s, d, w = 3, 8, 16, 384, 64, 8

# --- merge kernel vs XLA dynamic_update_slice at several offsets ---
cache = jnp.asarray(rng.standard_normal((l, 2, b, h, d, s)), jnp.bfloat16)
cols = jnp.asarray(rng.standard_normal((l, 2, b, h, d, w)), jnp.bfloat16)
for pos in (0, 8, 120, 128, 256, 376):
    got = flash_cache_merge_ds(cache, cols, jnp.int32(pos))
    want = lax.dynamic_update_slice(cache, cols, (0, 0, 0, 0, 0, pos))
    ok = bool(jnp.all(got == want))
    print(f"merge pos={pos}: {'OK' if ok else 'MISMATCH ' + str(int(jnp.sum(got != want)))}",
          file=sys.stderr, flush=True)

# --- tail-fold attention vs XLA dense reference ---
sd_cache = jnp.asarray(rng.standard_normal((l, 2, b, h, s, d)), jnp.float32)
q = jnp.asarray(rng.standard_normal((b, h, d)), jnp.float32)
kn = jnp.asarray(rng.standard_normal((b, h, d)), jnp.float32)
vn = jnp.asarray(rng.standard_normal((b, h, d)), jnp.float32)
prefix = np.asarray(rng.integers(1, 90, b), np.int32)
cur, gap_end = 141, 100
mb = (cur // w) * w
tail = sd_cache[:, :, :, :, mb : mb + w, :]
ds_cache = jnp.swapaxes(sd_cache, -1, -2)

layer = 1
got = flash_decode_layer_attention(
    ds_cache, jnp.int32(layer), jnp.int32(cur), jnp.asarray(prefix),
    jnp.int32(gap_end), q, kn, vn, tail=tail, merge_base=jnp.int32(mb),
    ds_layout=True,
)
idx = np.arange(s)[None]
mask = jnp.asarray((idx < prefix[:, None]) | ((idx >= gap_end) & (idx < cur)))
k_all = jnp.concatenate([sd_cache[layer, 0], kn[:, :, None]], axis=2)
v_all = jnp.concatenate([sd_cache[layer, 1], vn[:, :, None]], axis=2)
mask_all = jnp.concatenate([mask, jnp.ones((b, 1), bool)], axis=1)
scale = 1.0 / np.sqrt(d)
logits = jnp.einsum("bhd,bhsd->bhs", q, k_all).astype(jnp.float32) * scale
logits = jnp.where(mask_all[:, None, :], logits, jnp.finfo(jnp.float32).min)
probs = jax.nn.softmax(logits, axis=-1)
ref = jnp.einsum("bhs,bhsd->bhd", probs, v_all.astype(jnp.float32))
err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref)))
print(f"tail attention max|err| = {err:.2e} ({'OK' if err < 1e-4 else 'BAD'})",
      file=sys.stderr, flush=True)
