"""First-weights-contact dress rehearsal for ``ChatterboxTTS.from_local``.

Builds a FULL reference-shaped artifact directory from the live reference
torch modules at the published sizes (T3 520M, S3Gen 264M incl. a
`tokenizer.`-prefixed S3TokenizerV2-shaped sub-dict, VoiceEncoder 1.4M):

    ve.safetensors  t3_cfg.safetensors  s3gen.safetensors
    tokenizer.json  conds.pt

then loads the set through BOTH pipelines -- the reference's own
``ChatterboxTTS.from_local`` (tts.py:128-165) and ours -- and asserts the
end-to-end generated waveforms allclose with all stochastic draws aligned
(greedy decode, shared CFM noise buffer, zeroed vocoder noise; watermarking
compared separately in test_pipeline.test_watermark_in_graph_matches_standalone).

This is the composed first-weights-contact path the per-stage golden tests
cannot see: safetensors read -> infer_s3gen_config -> convert_* (incl. the
weight-norm parametrizations and the tokenizer. prefix) -> conds.pt ->
real-format tokenizer.json -> generate.
"""

import gc
import json
import sys
import types
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

import diffusers_stub

diffusers_stub.register()

import ref_full_stubs

ref_full_stubs.register()

# perth stub: identity watermarker so the reference pipeline constructs
# (tts.py:6,126); watermark numerics are golden-tested separately
if "perth" not in sys.modules:
    _perth = types.ModuleType("perth")

    class _IdentityWatermarker:
        def apply_watermark(self, wav, sample_rate=None, watermark=None):
            return np.asarray(wav)

    _perth.PerthImplicitWatermarker = _IdentityWatermarker
    sys.modules["perth"] = _perth

from ref_loader import load_ref


def _exec_pkg_init(name: str):
    """Execute a reference package's real __init__.py inside ref_loader's
    stub module so `from .models.x import Y` re-exports resolve."""
    mod = sys.modules[name]
    init = Path(mod.__path__[0]) / "__init__.py"
    exec(compile(init.read_text(), str(init), "exec"), mod.__dict__)


def _load_ref_tts_module():
    """Import the reference's top-level tts.py with every dependency stubbed."""
    # leaf modules first (registers the stub packages)
    load_ref("chatterbox.models.t3.t3")
    load_ref("chatterbox.models.s3gen.s3gen")
    load_ref("chatterbox.models.s3tokenizer.s3tokenizer")
    load_ref("chatterbox.models.tokenizers.tokenizer")
    load_ref("chatterbox.models.voice_encoder.voice_encoder")
    for pkg in (
        "chatterbox.models.t3",
        "chatterbox.models.s3tokenizer",
        "chatterbox.models.s3gen",
        "chatterbox.models.tokenizers",
        "chatterbox.models.voice_encoder",
    ):
        if not hasattr(sys.modules[pkg], "__initialized_for_rehearsal__"):
            _exec_pkg_init(pkg)
            sys.modules[pkg].__initialized_for_rehearsal__ = True
    return load_ref("chatterbox.tts")


# a real-format HF-tokenizers BPE file covering the rehearsal text
# (vocab < 704 like the published tokenizer; ids 0-3 are the specials the
# reference relies on: [UNK]=0 doubles as stop_text_token padding)
def _write_tokenizer_json(path: Path):
    chars = list("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.,!?'\"-:;")
    vocab = {"[UNK]": 0, "[START]": 1, "[STOP]": 2, "[SPACE]": 3}
    for c in chars:
        vocab[c] = len(vocab)
    merges = ["h e", "t h", "he l"]
    for m in merges:
        vocab[m.replace(" ", "")] = len(vocab)
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
            "vocab": vocab,
            "merges": merges,
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
    path.write_text(json.dumps(spec))


PROMPT_LEN = 8  # s3gen prompt tokens (prompt_feat = 2x frames @50fps)
TEXT = "hello there, this is the dress rehearsal."
MAX_NEW = 16


@pytest.fixture(scope="module")
def artifact_dir(tmp_path_factory):
    """Full-size reference-shaped artifact set, built from the live torch
    reference modules with random (seeded) weights."""
    from safetensors.torch import save_file

    d = tmp_path_factory.mktemp("ckpt")
    ref_tts_mod = _load_ref_tts_module()

    torch.manual_seed(0)
    t3 = ref_tts_mod.T3()
    s3gen = ref_tts_mod.S3Gen()
    ve = ref_tts_mod.VoiceEncoder()

    def flat(m):
        return {k: v.detach().clone().contiguous() for k, v in m.state_dict().items()}

    save_file(flat(ve), str(d / "ve.safetensors"))
    save_file(flat(t3), str(d / "t3_cfg.safetensors"))
    save_file(flat(s3gen), str(d / "s3gen.safetensors"))
    _write_tokenizer_json(d / "tokenizer.json")

    # reference-format conds.pt (torch pickle of T3Cond.__dict__ + gen dict,
    # tts.py:91-103)
    g = torch.Generator().manual_seed(1)
    t3_cond = dict(
        speaker_emb=torch.randn(1, 256, generator=g) * 0.1,
        clap_emb=None,
        cond_prompt_speech_tokens=torch.randint(0, 6561, (1, 150), generator=g),
        cond_prompt_speech_emb=None,
        emotion_adv=0.5 * torch.ones(1, 1, 1),
    )
    gen = dict(
        prompt_token=torch.randint(0, 6561, (1, PROMPT_LEN), generator=g),
        prompt_token_len=torch.tensor([PROMPT_LEN]),
        prompt_feat=torch.randn(1, 2 * PROMPT_LEN, 80, generator=g) * 0.5,
        prompt_feat_len=None,
        embedding=torch.randn(1, 192, generator=g) * 0.2,
    )
    torch.save(dict(t3=t3_cond, gen=gen), d / "conds.pt")

    del t3, s3gen, ve
    gc.collect()
    return d


@pytest.fixture(scope="module")
def ref_wav(artifact_dir):
    """Golden waveform through the reference's OWN from_local + composed
    generate glue (tts.py:232-268) at a short token budget, greedy, with
    the vocoder's stochastic draws zeroed."""
    ref_tts_mod = _load_ref_tts_module()
    ref = ref_tts_mod.ChatterboxTTS.from_local(artifact_dir, device="cpu")

    text = ref_tts_mod.punc_norm(TEXT)
    text_tokens = ref.tokenizer.text_to_tokens(text)
    text_tokens = torch.cat([text_tokens, text_tokens], dim=0)  # CFG pair
    sot, eot = ref.t3.hp.start_text_token, ref.t3.hp.stop_text_token
    text_tokens = torch.nn.functional.pad(text_tokens, (1, 0), value=sot)
    text_tokens = torch.nn.functional.pad(text_tokens, (0, 1), value=eot)

    real_multinomial = torch.multinomial
    torch.multinomial = lambda probs, num_samples: probs.argmax(dim=-1, keepdim=True)
    real_uniform_sample = torch.distributions.uniform.Uniform.sample
    torch.distributions.uniform.Uniform.sample = (
        lambda self, sample_shape=torch.Size(): torch.zeros(sample_shape)
    )
    real_randn_like = torch.randn_like
    torch.randn_like = lambda x: torch.zeros_like(x)
    try:
        with torch.inference_mode():
            speech_tokens = ref.t3.inference(
                t3_cond=ref.conds.t3,
                text_tokens=text_tokens,
                max_new_tokens=MAX_NEW,
                temperature=0.8,
                cfg_weight=0.5,
                repetition_penalty=1.2,
                min_p=0.05,
                top_p=1.0,
            )
            speech_tokens = speech_tokens[0]
            speech_tokens = ref_tts_mod.drop_invalid_tokens(speech_tokens)
            speech_tokens = speech_tokens[speech_tokens < 6561]
            wav, _ = ref.s3gen.inference(
                speech_tokens=speech_tokens, ref_dict=ref.conds.gen
            )
    finally:
        torch.multinomial = real_multinomial
        torch.distributions.uniform.Uniform.sample = real_uniform_sample
        torch.randn_like = real_randn_like

    cfm_noise = ref.s3gen.flow.decoder.rand_noise.detach().numpy()
    tokens = speech_tokens.numpy()
    del ref
    gc.collect()
    return wav.squeeze(0).numpy(), tokens, cfm_noise


def test_from_local_generate_matches_reference(artifact_dir, ref_wav, monkeypatch):
    """THE dress rehearsal: our from_local over the same artifact set must
    produce the same waveform through the public generate() API."""
    from chatterbox_tpu.models.s3gen import s3gen as our_s3gen_mod
    from chatterbox_tpu.models.s3gen.hifigan import hift_generate as real_hift
    from chatterbox_tpu.pipeline.tts import ChatterboxTTS

    golden, ref_tokens, cfm_noise = ref_wav

    tts = ChatterboxTTS.from_local(artifact_dir)
    assert tts.conds is not None, "conds.pt must load"

    # align the stochastic sites with the reference run: same fixed CFM
    # noise buffer (flow_matching.py:191), zeroed vocoder noise, identity
    # watermark (the reference side ran the identity perth stub)
    tts._cfm_noise = jnp.asarray(cfm_noise.transpose(0, 2, 1))

    def zero_noise_hift(p, cfg, mel, rng=None, **kw):
        b, t, _ = mel.shape
        h = cfg.nb_harmonics + 1
        kw["phase_noise"] = jnp.zeros((b, h))
        kw["additive_noise"] = jnp.zeros((b, h, t * cfg.upsample_total))
        return real_hift(p, cfg, mel, **kw)

    monkeypatch.setattr(our_s3gen_mod, "hift_generate", zero_noise_hift)
    monkeypatch.setattr(tts, "_apply_watermark_device", lambda wav: wav)

    wav = tts.generate(TEXT, max_new_tokens=MAX_NEW, greedy=True)[0]

    # shape equality pins the clean token COUNT (wav_len = 960 * n_tokens);
    # the value check pins the stream content
    assert wav.shape == golden.shape, (wav.shape, golden.shape)
    diff = np.abs(wav - golden)
    # masked vocoding makes every sample except the final mel frame (480
    # samples = 20 ms) equal the exact-length reference run; the final frame
    # carries the documented O(1e-3) iSTFT / source-STFT boundary effects
    # (hift_decode docstring)
    assert float(diff[:-480].max()) < 5e-4, float(diff[:-480].max())
    assert float(diff.max()) < 2e-2, float(diff.max())


def test_from_local_weight_gv_spelling_loads_identically(artifact_dir):
    """The published checkpoint spells weight norm as `weight_g`/`weight_v`
    (old torch API); this reference code spells it
    `parametrizations.weight.original0/1` (hifigan.py:28). Both must convert
    to the same pytree."""
    from chatterbox_tpu.checkpoint.safetensors_io import (
        load_safetensors,
        save_safetensors,
    )
    from chatterbox_tpu.pipeline.tts import ChatterboxTTS

    sd = load_safetensors(artifact_dir / "s3gen.safetensors")
    renamed = {}
    for k, v in sd.items():
        k = k.replace(".parametrizations.weight.original0", ".weight_g")
        k = k.replace(".parametrizations.weight.original1", ".weight_v")
        renamed[k] = v
    assert any(k.endswith(".weight_g") for k in renamed), "rehearsal must cover weight_g/v"

    import shutil

    alt = artifact_dir.parent / "ckpt_gv"
    if alt.exists():
        shutil.rmtree(alt)
    alt.mkdir()
    for name in ("ve.safetensors", "t3_cfg.safetensors", "tokenizer.json", "conds.pt"):
        shutil.copy(artifact_dir / name, alt / name)
    save_safetensors(renamed, alt / "s3gen.safetensors")

    a = ChatterboxTTS.from_local(artifact_dir)
    b = ChatterboxTTS.from_local(alt)
    ja = jax.tree_util.tree_leaves(a.s3gen_params)
    jb = jax.tree_util.tree_leaves(b.s3gen_params)
    assert len(ja) == len(jb)
    for x, y in zip(ja, jb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_from_local_model_prefix_wrap(artifact_dir, tmp_path):
    """A t3_cfg.safetensors whose keys are uniformly `model.`-prefixed (the
    safetensors-representable form of the reference's "model" unwrap,
    tts.py:146-147) must load to the same pytree."""
    import shutil

    from chatterbox_tpu.checkpoint.safetensors_io import (
        load_safetensors,
        save_safetensors,
    )
    from chatterbox_tpu.pipeline.tts import ChatterboxTTS

    alt = tmp_path / "ckpt_wrap"
    alt.mkdir()
    for name in ("ve.safetensors", "s3gen.safetensors", "tokenizer.json", "conds.pt"):
        shutil.copy(artifact_dir / name, alt / name)
    sd = load_safetensors(artifact_dir / "t3_cfg.safetensors")
    save_safetensors({f"model.{k}": v for k, v in sd.items()}, alt / "t3_cfg.safetensors")

    a = ChatterboxTTS.from_local(artifact_dir)
    b = ChatterboxTTS.from_local(alt)
    for x, y in zip(
        jax.tree_util.tree_leaves(a.t3_params), jax.tree_util.tree_leaves(b.t3_params)
    ):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_converter_errors_name_the_offending_key(artifact_dir):
    """Dropping a required tensor must fail with the key name in the message
    (the from_local failure mode the rehearsal exists to de-risk)."""
    from chatterbox_tpu.checkpoint.safetensors_io import load_safetensors
    from chatterbox_tpu.models.s3gen.s3gen import S3GenConfig, convert_s3gen, infer_s3gen_config
    from chatterbox_tpu.models.t3.t3 import T3Config, convert_t3

    t3_sd = load_safetensors(artifact_dir / "t3_cfg.safetensors")
    victim = "tfmr.layers.7.self_attn.q_proj.weight"
    assert victim in t3_sd
    del t3_sd[victim]
    with pytest.raises(KeyError) as ei:
        convert_t3(t3_sd, T3Config())
    assert victim in str(ei.value)

    s3_sd = load_safetensors(artifact_dir / "s3gen.safetensors")
    victims = [k for k in s3_sd if "mel2wav" in k and k.endswith("original1")][:1]
    assert victims
    del s3_sd[victims[0]]
    with pytest.raises(KeyError) as ei:
        convert_s3gen(s3_sd, infer_s3gen_config(s3_sd, S3GenConfig()))
    assert victims[0].rsplit(".", 2)[0] in str(ei.value) or victims[0] in str(ei.value)
