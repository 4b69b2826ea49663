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

import os

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


def apply_tts_precision(tts, dtype=jnp.bfloat16, weight_quant=None):
    """Cast a ChatterboxTTS instance's hot-path params in place. On a single
    chip, also fuse the T3 q/k/v projections into one matmul per layer
    (equivalent to fp-reassociation precision; 3.90 vs 3.95 ms/step measured
    at 16 CFG rows). Meshed runs keep the canonical layout the sharding
    specs address.

    ``weight_quant`` (default: CHATTERBOX_W_QUANT env, off) additionally
    stores the T3 matmul-chain weights int8 with per-output-channel scales
    (llama.quantize_llama_weights): the decode step's dominant cost is
    streaming 1.02 GB of bf16 weights per token at ~87% of achievable HBM
    bandwidth, and the int8 form halves those bytes. Single-chip only (the
    sharding specs address the dense layout)."""
    tts.t3_params = cast_floating_jit(tts.t3_params, dtype)
    if weight_quant is None:
        weight_quant = os.environ.get("CHATTERBOX_W_QUANT", "0") == "1"
    if getattr(tts, "mesh", None) is None:
        from ..models.t3.llama import fuse_qkv_params, quantize_llama_weights

        t3p = dict(tts.t3_params)
        t3p["llama"] = jax.jit(fuse_qkv_params)(t3p["llama"])
        if weight_quant:
            t3p["llama"] = jax.jit(quantize_llama_weights)(t3p["llama"])
        tts.t3_params = t3p
    sp = dict(tts.s3gen_params)
    sp["flow"] = cast_floating_jit(sp["flow"], dtype)
    if sp.get("tokenizer") is not None:
        sp["tokenizer"] = cast_floating_jit(sp["tokenizer"], dtype)
    # hift + campplus stay fp32
    tts.s3gen_params = sp
    return tts
