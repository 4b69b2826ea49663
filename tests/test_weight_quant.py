"""int8 weight-only quantization of the T3 decode matmul chain
(llama.quantize_llama_weights): numerics gates for the CHATTERBOX_W_QUANT
runtime option. The perf claim (halving the decode step's dominant HBM
weight stream; 3.31 -> 2.63 ms/step) is measured on hardware --
scripts/bench_decode.py --wquant, recorded in docs/PERFORMANCE.md."""

import numpy as np

import jax
import jax.numpy as jnp

from chatterbox_tpu.models.t3.llama import (
    LlamaConfig,
    dequantize_llama_weights,
    fuse_qkv_params,
    init_llama,
    quantize_llama_weights,
)
from chatterbox_tpu.models.t3.t3 import T3Config, init_t3, t3_forward, t3_generate
from chatterbox_tpu.core.sampling import SamplingConfig

CFG = LlamaConfig(
    hidden_size=128, intermediate_size=256, num_hidden_layers=4,
    num_attention_heads=4, num_key_value_heads=4, head_dim=32,
)
TCFG = T3Config(llama=CFG)


def _snr_db(ref, got):
    ref = np.asarray(ref, np.float64)
    err = np.asarray(got, np.float64) - ref
    return 10.0 * np.log10(np.sum(ref**2) / max(np.sum(err**2), 1e-30))


def test_quantize_roundtrip_error_bound():
    """Dequantized weights match the original within the symmetric int8
    grid: |w - deq(w)| <= channel_absmax / 254 elementwise (plus bf16 cast
    error of the restored tensor)."""
    p = init_llama(jax.random.PRNGKey(0), CFG)
    q = quantize_llama_weights(fuse_qkv_params(p))
    assert "w8" in q["layers"]["qkv"] and q["layers"]["qkv"]["w8"].dtype == jnp.int8
    deq = dequantize_llama_weights(q, dtype=jnp.float32)
    w = np.asarray(fuse_qkv_params(p)["layers"]["qkv"]["w"])
    got = np.asarray(deq["layers"]["qkv"]["w"])
    ch_absmax = np.abs(w).max(axis=-2, keepdims=True)
    assert np.all(np.abs(got - w) <= ch_absmax / 254 + 1e-9)
    # norms / non-matmul leaves untouched
    assert "scale" in q["layers"]["input_ln"]


def test_forward_logits_snr_vs_dense():
    """Teacher-forced speech logits with int8 weights stay close to the
    dense bf16 model (the VERDICT r3 #2 quality gate)."""
    key = jax.random.PRNGKey(1)
    p = init_t3(key, TCFG, dtype=jnp.bfloat16)
    pq = dict(p)
    pq["llama"] = quantize_llama_weights(p["llama"])

    rng = np.random.default_rng(2)
    b, tt, ts = 2, 12, 16
    args = (
        jnp.asarray(rng.standard_normal((b, 256)).astype(np.float32)),
        jnp.asarray(rng.integers(0, 6561, (b, 150)).astype(np.int32)),
        jnp.full((b,), 0.5),
        jnp.asarray(rng.integers(1, 700, (b, tt)).astype(np.int32)),
        jnp.full((b,), tt, jnp.int32),
        jnp.asarray(rng.integers(0, 6561, (b, ts)).astype(np.int32)),
        jnp.full((b,), ts, jnp.int32),
    )
    _, dense = t3_forward(p, TCFG, *args)
    _, quant = t3_forward(pq, TCFG, *args)
    snr = _snr_db(dense.astype(jnp.float32), quant.astype(jnp.float32))
    assert snr >= 30.0, f"speech-logit SNR {snr:.1f} dB < 30"


def test_decode_loop_logits_snr():
    """The incremental decode path (prefill carry + pallas/XLA step) with
    int8 weights tracks the dense bf16 logits. Token-LEVEL parity is not a
    meaningful gate on RANDOM weights (near-flat logits have no argmax
    margins, so any perturbation flips tokens); on trained weights the
    margins dwarf the ~0.4% per-channel quant error that this SNR bounds."""
    key = jax.random.PRNGKey(3)
    p = init_t3(key, TCFG, dtype=jnp.bfloat16)
    pq = dict(p)
    pq["llama"] = quantize_llama_weights(fuse_qkv_params(p["llama"]))

    rng = np.random.default_rng(4)
    b, tt = 2, 10
    common = dict(
        text_tokens=jnp.asarray(rng.integers(1, 700, (b, tt)).astype(np.int32)),
        text_lens=jnp.full((b,), tt, jnp.int32),
        speaker_emb=jnp.asarray(rng.standard_normal((b, 256)).astype(np.float32)),
        prompt_tokens=jnp.asarray(rng.integers(0, 6561, (b, 150)).astype(np.int32)),
        emotion_adv=jnp.full((b,), 0.5),
        rng=jax.random.PRNGKey(5),
        sampling=SamplingConfig(greedy=True, min_new_tokens=11),
        max_new_tokens=12,
    )
    dense = t3_generate(p, TCFG, **common, _prefill_only=True)
    quant = t3_generate(pq, TCFG, **common, _prefill_only=True)
    snr0 = _snr_db(
        np.asarray(dense.last_logits, np.float32),
        np.asarray(quant.last_logits, np.float32),
    )
    assert snr0 >= 30.0, f"prefill logit SNR {snr0:.1f} dB < 30"

    # one incremental step from the SAME (dense) carry: isolates the
    # quantized decode-step compute (flash-decode cache read included)
    from chatterbox_tpu.models.t3.t3 import t3_generate_resume

    carry_d, _ = t3_generate_resume(
        p, TCFG, dense, common["text_lens"], common["sampling"], n_steps=1
    )
    carry_q, _ = t3_generate_resume(
        pq, TCFG, dense, common["text_lens"], common["sampling"], n_steps=1
    )
    # greedy + identical carry => both consumed the same sampled token
    np.testing.assert_array_equal(
        np.asarray(carry_d.tokens[:, 0]), np.asarray(carry_q.tokens[:, 0])
    )
    snr1 = _snr_db(
        np.asarray(carry_d.last_logits, np.float32),
        np.asarray(carry_q.last_logits, np.float32),
    )
    assert snr1 >= 25.0, f"decode-step logit SNR {snr1:.1f} dB < 25"


def test_pipeline_weight_quant_smoke():
    """apply_tts_precision(weight_quant=True) end to end: finite audio and
    a canonicalized (dense q/k/v) save_native checkpoint."""
    from chatterbox_tpu.pipeline.tts import ChatterboxTTS
    from chatterbox_tpu.runtime.precision import apply_tts_precision

    from test_pipeline import TINY_S3GEN, TINY_T3

    tts = ChatterboxTTS.from_random(seed=0, t3_cfg=TINY_T3, s3gen_cfg=TINY_S3GEN)
    apply_tts_precision(tts, weight_quant=True)
    layers = tts.t3_params["llama"]["layers"]
    assert "w8" in layers["qkv"]
    rng = np.random.default_rng(6)
    tts.prepare_conditionals((rng.standard_normal(24000) * 0.1).astype(np.float32))
    w = tts.generate("Quantized weights.", max_new_tokens=8, seed=1)
    assert np.isfinite(w).all() and w.shape[0] == 1

    import tempfile
    from pathlib import Path

    with tempfile.TemporaryDirectory() as td:
        tts.save_native(td)
        from chatterbox_tpu.checkpoint.pytree_io import load_params

        saved = load_params(Path(td) / "t3.jax.safetensors")
        ls = saved["llama"]["layers"]
        assert "q" in ls and "w" in ls["q"] and "qkv" not in ls
