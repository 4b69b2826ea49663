"""End-to-end pipeline tests (random weights, tiny configs): TTS text->wav,
VC wav->wav, conditionals round-trip, tokenizer, watermark, audio I/O."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chatterbox_tpu.models.s3gen.conformer import ConformerConfig
from chatterbox_tpu.models.s3gen.flow import FlowConfig
from chatterbox_tpu.models.s3gen.s3gen import S3GenConfig
from chatterbox_tpu.models.s3gen.unet import UNetConfig
from chatterbox_tpu.models.s3tokenizer import S3TokenizerConfig
from chatterbox_tpu.models.t3.llama import LlamaConfig
from chatterbox_tpu.models.t3.t3 import T3Config
from chatterbox_tpu.pipeline.tts import ChatterboxTTS, punc_norm
from chatterbox_tpu.pipeline.vc import ChatterboxVC

TINY_T3 = T3Config(
    llama=LlamaConfig(hidden_size=64, intermediate_size=128, num_hidden_layers=2,
                      num_attention_heads=2, num_key_value_heads=2, head_dim=32)
)
TINY_S3GEN = S3GenConfig(
    flow=FlowConfig(
        input_size=128,
        encoder=ConformerConfig(input_size=128, output_size=128, attention_heads=4,
                                linear_units=256, num_blocks=2, num_up_blocks=1),
        estimator=UNetConfig(channels=64, n_blocks=1, num_mid_blocks=2, num_heads=4),
    ),
    tokenizer=S3TokenizerConfig(n_state=64, n_head=4, n_layer=2),
)


@pytest.fixture(scope="module")
def tts():
    return ChatterboxTTS.from_random(seed=0, t3_cfg=TINY_T3, s3gen_cfg=TINY_S3GEN)


def test_punc_norm():
    assert punc_norm("") == "You need to add some text for me to talk."
    assert punc_norm("hello  world") == "Hello world."
    assert punc_norm("Hi there…") == "Hi there,"
    assert punc_norm("test;").endswith(",")


def test_tts_end_to_end(tts):
    rng = np.random.default_rng(0)
    ref_wav = (rng.standard_normal(2 * 24000) * 0.1).astype(np.float32)
    conds = tts.prepare_conditionals(ref_wav, exaggeration=0.5)
    assert conds.t3.speaker_emb.shape == (1, 256)
    assert conds.gen.prompt_feat.shape[1] == 2 * conds.gen.prompt_token.shape[1]

    wavs = tts.generate_batch(["Hello world.", "A somewhat longer test sentence."],
                              max_new_tokens=12, seed=3)
    assert len(wavs) == 2
    for w in wavs:
        assert w.ndim == 1 and len(w) > 0 and np.isfinite(w).all()
        assert len(w) % 960 == 0  # 2 mel frames * 480 per token


def test_tts_single_api(tts):
    if tts.conds is None:  # self-sufficient when run in isolation
        rng = np.random.default_rng(11)
        tts.prepare_conditionals((rng.standard_normal(24000) * 0.1).astype(np.float32))
    w = tts.generate("Short.", max_new_tokens=8, seed=1)
    assert w.ndim == 2 and w.shape[0] == 1
    # num_return_sequences full semantics (reference T3.inference, t3.py:215):
    # ALL k variants come back, sampled independently per row
    w3 = tts.generate("Short.", max_new_tokens=12, seed=1, num_return_sequences=3)
    assert w3.ndim == 2 and w3.shape[0] == 3
    assert not np.array_equal(w3[0], w3[1]) or not np.array_equal(w3[1], w3[2])


def test_conditionals_roundtrip(tts, tmp_path):
    rng = np.random.default_rng(1)
    conds = tts.prepare_conditionals((rng.standard_normal(24000) * 0.1).astype(np.float32))
    p = tmp_path / "conds.safetensors"
    conds.save(p)
    from chatterbox_tpu.pipeline.conditionals import Conditionals

    c2 = Conditionals.load(p)
    np.testing.assert_allclose(np.asarray(c2.t3.speaker_emb), np.asarray(conds.t3.speaker_emb), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(c2.gen.prompt_token), np.asarray(conds.gen.prompt_token))


def test_vc_end_to_end():
    vc = ChatterboxVC.from_random(seed=0, s3gen_cfg=TINY_S3GEN)
    rng = np.random.default_rng(2)
    target = (rng.standard_normal(24000) * 0.1).astype(np.float32)
    source = (rng.standard_normal(32000) * 0.1).astype(np.float32)  # 2s @16k
    vc.set_target_voice(target)
    out = vc.generate(source, seed=5)
    assert out.shape[0] == 1 and out.shape[1] > 0 and np.isfinite(out).all()


def test_vc_pipelined_equals_sequential():
    """generate_batches_pipelined must return exactly what per-batch
    generate_batch calls return (same seeds), just with overlapped collection."""
    vc = ChatterboxVC.from_random(seed=0, s3gen_cfg=TINY_S3GEN)
    rng = np.random.default_rng(4)
    vc.set_target_voice((rng.standard_normal(24000) * 0.1).astype(np.float32))
    batches = [
        [(rng.standard_normal(32000) * 0.1).astype(np.float32) for _ in range(2)]
        for _ in range(3)
    ]
    piped = vc.generate_batches_pipelined(batches, seed=7)
    for c, audios in enumerate(batches):
        direct = vc.generate_batch(audios, seed=7 + c)
        for a, b in zip(piped[c], direct):
            np.testing.assert_array_equal(a, b)


def test_watermark_roundtrip():
    from chatterbox_tpu.models.watermark import SpreadSpectrumWatermarker

    wm = SpreadSpectrumWatermarker()
    rng = np.random.default_rng(3)
    wav = (rng.standard_normal(24000) * 0.2).astype(np.float32)
    payload = rng.integers(0, 2, 16)
    marked = wm.apply_watermark(wav, watermark=payload)
    assert marked.shape == wav.shape
    # inaudible: tiny perturbation
    assert np.abs(marked - wav).max() < 0.05
    got = wm.get_payload(marked)
    assert (got == payload).mean() >= 0.9
    # presence API (upstream-perth semantics): default-marked audio -> 1.0
    assert wm.get_watermark(wm.apply_watermark(wav)) == 1.0


def test_audio_io_roundtrip(tmp_path):
    from chatterbox_tpu.pipeline.audio import load_wav, save_wav, trim_silence

    rng = np.random.default_rng(4)
    wav = (rng.standard_normal(12000) * 0.3).astype(np.float32)
    p = tmp_path / "x.wav"
    save_wav(p, wav, 24000)
    back = load_wav(p)
    np.testing.assert_allclose(back, np.clip(wav, -1, 1), atol=1e-3)
    # trim: silence-padded signal gets trimmed back
    padded = np.concatenate([np.zeros(4000, np.float32), wav, np.zeros(4000, np.float32)])
    trimmed = trim_silence(padded, top_db=20)
    assert len(trimmed) < len(padded)


def test_text_tokenizer_pure_python_matches_hf(tmp_path):
    import json

    spec = {
        "version": "1.0",
        "truncation": None,
        "padding": None,
        "post_processor": None,
        "model": {
            "type": "BPE",
            "dropout": None,
            "unk_token": "[UNK]",
            "continuing_subword_prefix": None,
            "end_of_word_suffix": None,
            "fuse_unk": False,
            "byte_fallback": False,
            "ignore_merges": False,
            "vocab": {"[UNK]": 0, "[START]": 1, "[STOP]": 2, "[SPACE]": 3,
                      "a": 4, "b": 5, "c": 6, "ab": 7, "abc": 8},
            "merges": ["a b", "ab c"],
        },
        "added_tokens": [
            {"id": i, "content": c, "special": True, "single_word": False,
             "lstrip": False, "rstrip": False, "normalized": False}
            for i, c in enumerate(["[UNK]", "[START]", "[STOP]", "[SPACE]"])
        ],
        "pre_tokenizer": None,
        "normalizer": None,
        "decoder": None,
    }
    p = tmp_path / "tokenizer.json"
    p.write_text(json.dumps(spec))
    from chatterbox_tpu.models.tokenizer import EnTokenizer

    hf = EnTokenizer(str(p), backend="hf")
    py = EnTokenizer(str(p), backend="python")
    for text in ["abc ab a", "b c abcabc", "a"]:
        assert hf.encode(text) == py.encode(text), text
        assert py.decode(py.encode(text)) == text


def test_watermark_in_graph_matches_standalone():
    from chatterbox_tpu.models.watermark import SpreadSpectrumWatermarker

    wm = SpreadSpectrumWatermarker()
    rng = np.random.default_rng(7)
    wav = (rng.standard_normal((2, 24000)) * 0.2).astype(np.float32)
    payload = rng.integers(0, 2, 16)
    ref = wm.apply_watermark(wav, watermark=payload)
    pattern = jnp.asarray(wm.band_pattern(payload))
    got = np.asarray(jax.jit(wm.apply_in_graph)(jnp.asarray(wav), pattern))
    np.testing.assert_allclose(got, ref, atol=1e-5)
    # and the fused output still decodes
    assert (wm.get_payload(got[0]) == payload).mean() >= 0.9


def test_pipelined_batches_match_sequential(tts):
    rng = np.random.default_rng(9)
    tts.prepare_conditionals((rng.standard_normal(24000) * 0.1).astype(np.float32))
    texts = ["One sentence here.", "Two sentences now."]
    seq = [
        tts.generate_batch(texts, max_new_tokens=16, seed=5 + i, device_chain=True)
        for i in range(2)
    ]
    piped = tts.generate_batches_pipelined([texts, texts], seed=5, max_new_tokens=16)
    for a_batch, b_batch in zip(seq, piped):
        for a, b in zip(a_batch, b_batch):
            np.testing.assert_allclose(a, b, atol=1e-4)


def test_oversized_batch_chunks_through_pipeline(tts):
    """Batches above max_device_batch split into HBM-sized chunks (the b64
    bench config: one decode graph per chunk) and re-join in order."""
    if tts.conds is None:
        rng = np.random.default_rng(12)
        tts.prepare_conditionals((rng.standard_normal(24000) * 0.1).astype(np.float32))
    texts = [f"Chunk test sentence {i}." for i in range(5)]
    old_cap = tts.max_device_batch
    try:
        tts.max_device_batch = 2
        got = tts.generate_batch(texts, max_new_tokens=12, seed=7)
        # equivalent sequential per-chunk runs (chunk c uses seed base+c)
        ref = []
        for c, j in enumerate(range(0, 5, 2)):
            ref.extend(
                tts.generate_batch(
                    texts[j : j + 2], max_new_tokens=12, seed=7 + c, device_chain=True
                )
            )
    finally:
        tts.max_device_batch = old_cap
    assert len(got) == 5
    for a, b in zip(got, ref):
        np.testing.assert_allclose(a, b, atol=1e-4)


def test_budget_batch_cap_text_bucket_and_kv_policy():
    """HBM batch caps account for the ACTUAL text bucket (a 512-token text
    batch carries a bigger KV cache than the 64-token anchors) and the int8
    KV auto-policy (on >= 500 tokens) halves the cache bytes it budgets."""
    t = ChatterboxTTS(t3_params={}, s3gen_params={}, ve_params={}, tokenizer=None)
    assert t.kv_quant is None  # default: auto policy
    assert not t._kv_quant_for(250) and t._kv_quant_for(500) and t._kv_quant_for(1000)
    t.kv_quant = False
    assert not t._kv_quant_for(1000)  # explicit flag wins
    # long texts shrink the cap at a fixed budget (never grow it)
    cap64 = t._budget_batch_cap(1000, pipelined=True, text_bucket=64)
    cap512 = t._budget_batch_cap(1000, pipelined=True, text_bucket=512)
    assert cap512 < cap64
    # the 512-text/1000-token corner stays under the b16@1000 OOM anchor
    # (8.6 GB bf16 cache at the 64 bucket OOM'd; 512-bucket rows are bigger)
    assert cap512 * 2 <= 16
    t.kv_quant = None  # auto int8 at 1000 tokens doubles the row budget
    assert t._budget_batch_cap(1000, pipelined=True, text_bucket=64) >= cap64
    # short budgets are unaffected by the auto policy (bf16 itemsize)
    assert t._budget_batch_cap(250, pipelined=True, text_bucket=64) >= cap64


def test_flow_steps_env_knob(monkeypatch):
    """CHATTERBOX_FLOW_STEPS overrides the CFM Euler step count (quality/
    speed knob, scripts/probe_flow_steps.py); unset keeps the reference 10."""
    t = ChatterboxTTS(t3_params={}, s3gen_params={}, ve_params={}, tokenizer=None)
    assert t.s3gen_cfg.flow.n_timesteps == 10  # reference default
    monkeypatch.setenv("CHATTERBOX_FLOW_STEPS", "6")
    t6 = ChatterboxTTS(t3_params={}, s3gen_params={}, ve_params={}, tokenizer=None)
    assert t6.s3gen_cfg.flow.n_timesteps == 6
    # the rest of the config (and nested estimator/encoder) is untouched
    assert t6.s3gen_cfg.flow.estimator == t.s3gen_cfg.flow.estimator
    assert t6.s3gen_cfg.tokenizer == t.s3gen_cfg.tokenizer


def test_flow_steps_env_knob_vc(monkeypatch):
    """The step-count knob covers VC too (same s3gen flow consumer)."""
    monkeypatch.setenv("CHATTERBOX_FLOW_STEPS", "6")
    vc = ChatterboxVC(s3gen_params={})
    assert vc.s3gen_cfg.flow.n_timesteps == 6


def test_flow_steps_env_validation(monkeypatch):
    """Invalid CHATTERBOX_FLOW_STEPS values fail loudly at construction
    (0/negative would degenerate the Euler solve to noise)."""
    for bad in ("0", "-3", "four"):
        monkeypatch.setenv("CHATTERBOX_FLOW_STEPS", bad)
        with pytest.raises(ValueError, match="CHATTERBOX_FLOW_STEPS"):
            ChatterboxTTS(t3_params={}, s3gen_params={}, ve_params={}, tokenizer=None)


def test_per_call_flow_steps_tier(tts):
    """flow_steps= overrides the CFM step count per call (the serving
    quality tier): same shapes/token stream, different mel numerics, and the
    default tier's executables stay cached (tiers coexist)."""
    conds_keys_before = set(tts._jit_s3gen)
    kw = dict(max_new_tokens=12, seed=11)
    base = tts.generate_batch(["Tier check sentence."], **kw)[0]
    turbo = tts.generate_batch(["Tier check sentence."], flow_steps=4, **kw)[0]
    again = tts.generate_batch(["Tier check sentence."], **kw)[0]
    # token stream (and therefore length) identical -- T3 is untouched
    assert len(base) == len(turbo)
    np.testing.assert_array_equal(base, again)  # default tier still intact
    assert not np.array_equal(base, turbo)  # CFM solve actually changed
    assert np.isfinite(turbo).all()
    # the tier landed as a separately-keyed executable, not a cache clear
    assert set(tts._jit_s3gen) > conds_keys_before
    with pytest.raises(ValueError):
        tts.generate_batch(["bad"], flow_steps=0, **kw)


def test_per_call_flow_steps_vc():
    """VC's per-call flow_steps knob (flow-dominated: the big serving win)."""
    vc = ChatterboxVC.from_random(seed=0, s3gen_cfg=TINY_S3GEN)
    rng = np.random.default_rng(0)
    vc.ref_dict = __import__("chatterbox_tpu.models.s3gen.s3gen", fromlist=["RefDict"]).RefDict(
        jnp.asarray(rng.integers(0, 6561, (1, 25)).astype(np.int32)),
        jnp.full((1,), 25, jnp.int32),
        jnp.asarray(rng.standard_normal((1, 50, 80)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((1, 192)).astype(np.float32)),
    )
    src = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    base = vc.generate_batch([src], seed=1)[0]
    fast = vc.generate_batch([src], seed=1, flow_steps=3)[0]
    assert len(base) == len(fast) and np.isfinite(fast).all()
    assert not np.array_equal(base, fast)


def test_pipeline_alignment_watchdog(tts):
    """alignment=True runs end-to-end through the pipeline (in-loop
    watchdog; XLA decode path) and yields valid audio."""
    wavs = tts.generate_batch(
        ["Alignment watchdog end to end.", "Second row."],
        max_new_tokens=12, seed=5, alignment=True,
    )
    assert len(wavs) == 2
    for w in wavs:
        assert w.ndim == 1 and len(w) > 0 and np.isfinite(w).all()
    # single-utterance API surface parity
    w1 = tts.generate("Alignment single.", max_new_tokens=12, seed=5, alignment=True)
    assert w1.shape[0] == 1 and np.isfinite(w1).all()
