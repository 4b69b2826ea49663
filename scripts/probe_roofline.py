"""Decode-step roofline decomposition on hardware (VERDICT r2 #2).

Measures, each as ONE jitted scalar-returning chain (CLAUDE.md: full-array
readbacks ride the ~13 MB/s tunnel and swamp the number):

  A. matmul floor   -- the step's 30-layer qkv/o/gate_up/down chain + the
                       speech_head, nothing else: the pure weight-streaming
                       time. bytes = 1.03 GB bf16 -> t = bytes/BW at 100%.
  B. kernel floor   -- the flash-decode attention chain over 30 layers at a
                       given live length (reuses ops/flash_decode).
  C. full step      -- ms/token from the real t3_generate decode loop
                       (scripts/bench_decode.py measures this; re-measured
                       here at one config for a same-run comparison).

Glue = C - A - B: RMS norms, rope, CFG combine, sampling, penalties,
embedding + pos lookup, cache-tail dus, while_loop bookkeeping.

Run: PYTHONPATH=/root/repo python scripts/probe_roofline.py [--rows 16]
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from chatterbox_tpu.models.t3.llama import LlamaConfig, fuse_qkv_params, init_llama
from chatterbox_tpu.runtime.fast_init import synthetic_init

V5E_HBM_GBS = 819.0  # v5e peak HBM bandwidth
V5E_BF16_TFLOPS = 197.0

ap = argparse.ArgumentParser()
ap.add_argument("--rows", type=int, default=16, help="CFG rows (2x batch)")
ap.add_argument("--iters", type=int, default=6)
args = ap.parse_args()

cfg = LlamaConfig()
R = args.rows
params = synthetic_init(lambda k: init_llama(k, cfg), dtype=jnp.bfloat16)
params = jax.jit(fuse_qkv_params)(params)
head_w = synthetic_init(
    lambda k: {"w": jax.random.normal(k, (cfg.hidden_size, 8194), jnp.float32) * 0.02},
    dtype=jnp.bfloat16,
)

c, f = cfg.hidden_size, cfg.intermediate_size
L = cfg.num_hidden_layers
qkv_cols = (cfg.num_attention_heads + 2 * cfg.num_key_value_heads) * cfg.head_dim


def matmul_chain(layers, head, x, steps):
    """The decode step's matmuls only, scanned over layers, repeated for
    ``steps`` tokens (carry feeds forward so nothing is dead-code-eliminated)."""

    def one_step(x, _):
        def body(xx, lp):
            qkv = jnp.matmul(xx, lp["qkv"]["w"])  # (R, qkv_cols)
            a = qkv[:, : c]  # stand-in for attention output (same width)
            o = jnp.matmul(a, lp["o"]["w"])
            gu = jnp.matmul(xx + o, lp["gate_up"]["w"])
            g, u = jnp.split(gu, 2, axis=-1)
            y = jnp.matmul(jax.nn.silu(g) * u, lp["down"]["w"])
            return xx + y * 1e-3, None

        x, _ = lax.scan(body, x, layers)
        logits = jnp.matmul(x, head["w"])
        # fold the "sampled token" back in cheaply to chain the steps
        return x + jnp.mean(logits, axis=-1, keepdims=True) * 1e-6, None

    x, _ = lax.scan(one_step, x, None, length=steps)
    return jnp.sum(x.astype(jnp.float32))


STEPS = 30
x0 = jnp.ones((R, c), jnp.bfloat16) * 0.01
fn = jax.jit(matmul_chain, static_argnames=("steps",))

t0 = time.time()
float(fn(params["layers"], head_w, x0, STEPS))
print(f"matmul chain compile+run: {time.time()-t0:.1f}s")
best = 1e9
for _ in range(args.iters):
    t0 = time.time()
    float(fn(params["layers"], head_w, x0, STEPS))
    best = min(best, (time.time() - t0) / STEPS)
w_bytes = (
    L * (c * qkv_cols + c * c + c * 2 * f + f * c) + c * 8194
) * 2  # bf16
flops = 2 * R * w_bytes / 2
print(
    f"A. matmul floor: {best*1e3:.3f} ms/step | weights {w_bytes/1e9:.3f} GB "
    f"-> {w_bytes/best/1e9:.0f} GB/s = {w_bytes/best/1e9/V5E_HBM_GBS*100:.0f}% of v5e peak "
    f"({flops/best/1e12:.1f} TFLOP/s)"
)
print(f"   100%-BW floor would be {w_bytes/V5E_HBM_GBS/1e6:.2f} ms")
