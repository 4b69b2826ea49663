"""Parity tests for the conditioning path models: VoiceEncoder, CAMPPlus,
S3 tokenizer wrapper semantics (BASELINE config 2)."""

import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import importlib.machinery


def _stub(name):
    """Register a well-formed stub module (with __spec__, so later importlib
    machinery checks don't choke when the whole suite shares one process)."""
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    sys.modules[name] = mod
    return mod


# stub deps the reference modules import but don't use in forward paths
for _name in ["librosa", "librosa.filters", "librosa.effects"]:
    _stub(_name)
sys.modules["librosa"].filters = sys.modules["librosa.filters"]
sys.modules["librosa"].effects = sys.modules["librosa.effects"]
_ta = _stub("torchaudio")
_tac = _stub("torchaudio.compliance")
_tak = _stub("torchaudio.compliance.kaldi")
_ta.compliance = _tac
_tac.kaldi = _tak

from ref_loader import load_ref

from chatterbox_tpu.models.voice_encoder import (
    VoiceEncoderConfig,
    convert_voice_encoder,
    ve_embed_from_mels,
    ve_forward,
)
from chatterbox_tpu.models.s3gen.xvector import (
    CAMPPlusConfig,
    campplus_forward,
    convert_campplus,
    init_campplus,
)


@pytest.fixture(scope="module")
def ref_ve():
    vemod = load_ref("chatterbox.models.voice_encoder.voice_encoder")
    torch.manual_seed(0)
    m = vemod.VoiceEncoder()
    m.eval()
    return m


def test_ve_forward_parity(ref_ve):
    p = convert_voice_encoder(ref_ve.state_dict(), VoiceEncoderConfig())
    rng = np.random.default_rng(0)
    mels = rng.uniform(0, 1, (5, 160, 40)).astype(np.float32)
    with torch.no_grad():
        ref = ref_ve(torch.from_numpy(mels)).numpy()
    got = ve_forward(jax.tree.map(jnp.asarray, p), jnp.asarray(mels))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


def test_ve_windowed_inference_parity(ref_ve):
    cfg = VoiceEncoderConfig()
    p = jax.tree.map(jnp.asarray, convert_voice_encoder(ref_ve.state_dict(), cfg))
    rng = np.random.default_rng(1)
    t_mel = 401  # ~4s at 100 fps
    mels = rng.uniform(0, 1, (1, t_mel, 40)).astype(np.float32)
    with torch.no_grad():
        ref = ref_ve.inference(torch.from_numpy(mels), [t_mel], rate=1.3).numpy()
    got = ve_embed_from_mels(p, cfg, jnp.asarray(mels))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


@pytest.fixture(scope="module")
def ref_campplus():
    xv = load_ref("chatterbox.models.s3gen.xvector")
    torch.manual_seed(1)
    m = xv.CAMPPlus(memory_efficient=False)
    # randomize BN running stats so the test isn't trivially mean0/var1
    m.train()
    with torch.no_grad():
        for _ in range(3):
            m(torch.randn(2, 150, 80))
    m.eval()
    return m


def test_campplus_forward_parity(ref_campplus):
    cfg = CAMPPlusConfig()
    sd = {f"speaker_encoder.{k}": v for k, v in ref_campplus.state_dict().items()}
    p = convert_campplus(sd, cfg)
    rng = np.random.default_rng(2)
    feats = rng.standard_normal((2, 198, 80)).astype(np.float32)
    with torch.no_grad():
        ref = ref_campplus(torch.from_numpy(feats)).numpy()
    got = campplus_forward(p, cfg, jnp.asarray(feats))
    assert got.shape == ref.shape == (2, 192)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-3, rtol=1e-3)


def test_s3tokenizer_wrapper_semantics():
    from chatterbox_tpu.models.s3tokenizer import (
        S3TokenizerConfig,
        init_s3tokenizer,
        pad_to_token_multiple,
        s3_tokenize,
        drop_invalid_tokens,
    )

    cfg = S3TokenizerConfig(n_state=64, n_head=4, n_layer=2)
    p = init_s3tokenizer(jax.random.PRNGKey(0), cfg)
    wav = np.random.default_rng(3).standard_normal(16000 + 123).astype(np.float32) * 0.1
    padded = pad_to_token_multiple(wav)
    assert len(padded) % 640 == 0
    toks, lens = s3_tokenize(p, cfg, jnp.asarray(padded)[None])
    assert toks.shape[1] == len(padded) // 640  # 25 tokens/sec
    assert (np.asarray(toks) >= 0).all() and (np.asarray(toks) < 6561).all()
    # max_len truncation (s3tokenizer.py:112-113)
    toks2, _ = s3_tokenize(p, cfg, jnp.asarray(padded)[None], max_len=10)
    assert toks2.shape[1] == 10
    # drop_invalid_tokens slices SOS..EOS
    seq = np.array([6561, 5, 7, 6562, 9])
    np.testing.assert_array_equal(drop_invalid_tokens(seq), [5, 7])
