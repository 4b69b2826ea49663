"""Precision policy: bf16 weights/activations on the MXU-heavy paths, fp32
where numerics gate quality.

Policy (tuned for TPU; the reference runs everything fp32 and its fp16
autocast experiment REGRESSED throughput +30% memory, BASELINE.md):
  - T3 llama + cond encoder: bf16 params/activations, fp32 logits + sampling
    chain + RMSNorm statistics (handled inside core/layers.rms_norm)
  - S3Gen conformer encoder + CFM UNet: bf16
  - HiFT vocoder + all DSP frontends: fp32 (iSTFT phase math and log-mel
    floors are precision-sensitive; the vocoder is a small fraction of FLOPs)
"""

import jax
import jax.numpy as jnp


def cast_floating(tree, dtype):
    """Cast floating-point leaves to dtype (ints/bools untouched)."""

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree.map(cast, tree)


def cast_floating_jit(tree, dtype):
    """One fused executable for the whole-pytree cast (eager per-leaf casts
    are pathologically slow on remote backends)."""
    return jax.jit(lambda t: cast_floating(t, dtype))(tree)


def apply_tts_precision(tts, dtype=jnp.bfloat16):
    """Cast a ChatterboxTTS instance's hot-path params in place."""
    tts.t3_params = cast_floating_jit(tts.t3_params, dtype)
    sp = dict(tts.s3gen_params)
    sp["flow"] = cast_floating_jit(sp["flow"], dtype)
    if sp.get("tokenizer") is not None:
        sp["tokenizer"] = cast_floating_jit(sp["tokenizer"], dtype)
    # hift + campplus stay fp32
    tts.s3gen_params = sp
    return tts
