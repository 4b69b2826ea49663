"""Time the T3 prefill (b8 = 16 CFG rows, S_text bucket 64) on hardware.

PERFORMANCE.md listed prefill as "not yet profiled post-flash"; this probe
jits t3_generate with _prefill_only=True and times the steady state.
Returns scalars only (full-array readback rides the ~13 MB/s tunnel).
Run: PYTHONPATH=/root/repo python scripts/probe_prefill.py
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

from chatterbox_tpu.core.sampling import SamplingConfig
from chatterbox_tpu.models.t3.t3 import T3Config, init_t3, t3_generate
from chatterbox_tpu.models.t3.llama import fuse_qkv_params
from chatterbox_tpu.runtime.fast_init import synthetic_init
from chatterbox_tpu.runtime.precision import cast_floating_jit

B, TT = 8, 64
cfg = T3Config()
params = synthetic_init(lambda k: init_t3(k, cfg), dtype=jnp.bfloat16)
params = cast_floating_jit(params, jnp.bfloat16)
params = dict(params)
params["llama"] = jax.jit(fuse_qkv_params)(params["llama"])

rng = np.random.default_rng(0)
text = jnp.asarray(rng.integers(10, 200, (B, TT)), jnp.int32)
lens = jnp.full((B,), TT, jnp.int32)
spk = jnp.zeros((B, 256), jnp.bfloat16)
prompt = jnp.zeros((B, 150), jnp.int32)
emo = jnp.full((B,), 0.5, jnp.bfloat16)

@jax.jit
def prefill_only(p, text, lens, spk, prompt, emo):
    carry = t3_generate(
        p, cfg, text, lens, spk, prompt, emo,
        rng=jax.random.PRNGKey(0),
        sampling=SamplingConfig(cfg_weight=0.5),
        max_new_tokens=250,
        _prefill_only=True,
    )
    return jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda x: jnp.sum(jnp.abs(x).astype(jnp.float32)), carry),
    )

t0 = time.time()
s = float(prefill_only(params, text, lens, spk, prompt, emo))
print("compile+run", round(time.time() - t0, 2), s)
for _ in range(4):
    t0 = time.time()
    v = float(prefill_only(params, text, lens, spk, prompt, emo))
    print("prefill_s", round(time.time() - t0, 4))
