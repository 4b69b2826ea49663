"""Standalone compile+run probe for the flash-decode kernel on hardware."""

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

l, b, h, s, d = 30, 16, 16, 384, 64
rng = np.random.default_rng(0)
cache = jnp.asarray(rng.standard_normal((l, 2, b, h, s, d)), jnp.bfloat16)
q = jnp.asarray(rng.standard_normal((b, h, d)), jnp.bfloat16)
kn = jnp.asarray(rng.standard_normal((b, h, d)), jnp.bfloat16)
vn = jnp.asarray(rng.standard_normal((b, h, d)), jnp.bfloat16)
prefix = jnp.asarray(np.full(b, 60), jnp.int32)

t0 = time.time()
out = flash_decode_layer_attention(
    cache, jnp.int32(3), jnp.int32(200), prefix, jnp.int32(66), q, kn, vn
)
out.block_until_ready()
print(f"compile+run {time.time()-t0:.1f}s ok, out[0,0,:3]={np.asarray(out[0,0,:3], np.float32)}", file=sys.stderr)

# steady-state timing: 30 sequential layer calls ~ one decode step's attention
t0 = time.time()
for i in range(30):
    out = flash_decode_layer_attention(
        cache, jnp.int32(i), jnp.int32(200), prefix, jnp.int32(66), q, kn, vn
    )
out.block_until_ready()
print(f"30 layer calls: {1000*(time.time()-t0):.1f} ms", file=sys.stderr)
