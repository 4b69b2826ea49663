"""Golden parity of the JAX S3TokenizerV2 encoder against the executable
torch cross-implementation (tests/torch_s3tok_ref.py), plus hardening tests
for the shape-driven auto-config converter (VERDICT r1 next-#2)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from torch_s3tok_ref import S3TokenizerV2Ref

from chatterbox_tpu.models.s3tokenizer import (
    S3TokenizerConfig,
    convert_s3tokenizer,
    detect_s3tok_prefix,
    s3_encode_mels,
    s3tok_config_from_sd,
)

SMALL = dict(n_mels=16, n_state=64, n_head=4, n_layer=2, kernel_size=7)


def make_ref(seed=0, **kw):
    cfg = {**SMALL, **kw}
    torch.manual_seed(seed)
    m = S3TokenizerV2Ref(**cfg)
    m.eval()
    return m, cfg


def to_jax_cfg(cfg):
    return S3TokenizerConfig(
        n_mels=cfg["n_mels"], n_state=cfg["n_state"], n_head=cfg["n_head"],
        n_layer=cfg["n_layer"], fsmn_kernel=cfg["kernel_size"],
    )


def test_encoder_token_parity_unmasked():
    m, cfg = make_ref()
    params = convert_s3tokenizer(m.state_dict(), to_jax_cfg(cfg), prefix="")
    rng = np.random.default_rng(0)
    mels = rng.standard_normal((2, cfg["n_mels"], 48)).astype(np.float32)
    with torch.no_grad():
        ref_tok, ref_lens = m.quantize(torch.from_numpy(mels))
        ref_hidden = m.encoder(torch.from_numpy(mels)).numpy()
    got_tok, got_lens = s3_encode_mels(
        params, to_jax_cfg(cfg), jnp.asarray(mels.transpose(0, 2, 1))
    )
    np.testing.assert_array_equal(np.asarray(got_tok), ref_tok.numpy())
    np.testing.assert_array_equal(np.asarray(got_lens), ref_lens.numpy())


def test_encoder_token_parity_masked_batch():
    """Ragged mel lengths: padded rows must match the torch ref with the
    same mask semantics (mask inside FSMN + attention)."""
    m, cfg = make_ref(seed=1)
    params = convert_s3tokenizer(m.state_dict(), to_jax_cfg(cfg), prefix="")
    rng = np.random.default_rng(1)
    mels = rng.standard_normal((3, cfg["n_mels"], 64)).astype(np.float32)
    lens = np.array([64, 40, 24], np.int64)
    for i, l in enumerate(lens):
        mels[i, :, l:] = 0.0
    with torch.no_grad():
        ref_tok, ref_lens = m.quantize(torch.from_numpy(mels), torch.from_numpy(lens))
    got_tok, got_lens = s3_encode_mels(
        params, to_jax_cfg(cfg), jnp.asarray(mels.transpose(0, 2, 1)),
        mel_lens=jnp.asarray(lens.astype(np.int32)),
    )
    np.testing.assert_array_equal(np.asarray(got_tok), ref_tok.numpy())
    np.testing.assert_array_equal(np.asarray(got_lens), ref_lens.numpy())


def test_autoconfig_infers_architecture_from_shapes():
    """n_layer/n_state/n_mels/fsmn kernel/fsq_dim all come from the state
    dict, not from defaults -- a perturbed layout must round-trip."""
    m, cfg = make_ref(seed=2, n_layer=3, n_state=96, n_mels=20, kernel_size=5)
    sd = {"tokenizer." + k: v for k, v in m.state_dict().items()}
    assert detect_s3tok_prefix(sd) == "tokenizer."
    inferred = s3tok_config_from_sd(sd)
    assert inferred.n_layer == 3
    assert inferred.n_state == 96
    assert inferred.n_mels == 20
    assert inferred.fsmn_kernel == 5
    assert inferred.fsq_dim == 8
    assert inferred.n_audio_ctx == 1500  # from the shipped positional buffer

    params, got_cfg = convert_s3tokenizer(sd)
    assert got_cfg == inferred
    # converted params actually run at the inferred config
    mels = np.zeros((1, 20, 16), np.float32)
    tok, _ = s3_encode_mels(params, got_cfg, jnp.asarray(mels.transpose(0, 2, 1)))
    with torch.no_grad():
        ref_tok, _ = m.quantize(torch.zeros(1, 20, 16))
    np.testing.assert_array_equal(np.asarray(tok), ref_tok.numpy())


def test_converter_rejects_unconsumed_keys():
    m, cfg = make_ref(seed=3)
    sd = dict(m.state_dict())
    sd["encoder.blocks.0.attn.mystery.weight"] = torch.zeros(4, 4)
    with pytest.raises(ValueError, match="NOT consumed"):
        convert_s3tokenizer(sd, to_jax_cfg(cfg), prefix="")
    # non-strict: converts, just warns
    convert_s3tokenizer(sd, to_jax_cfg(cfg), prefix="", strict=False)


def test_converter_rejects_wrong_positional_buffer():
    m, cfg = make_ref(seed=4)
    sd = dict(m.state_dict())
    sd["encoder.positional_embedding"] = torch.randn_like(
        sd["encoder.positional_embedding"]
    )
    with pytest.raises(ValueError, match="positional_embedding"):
        convert_s3tokenizer(sd, to_jax_cfg(cfg), prefix="")


def test_converter_missing_key_raises_keyerror():
    m, cfg = make_ref(seed=5)
    sd = dict(m.state_dict())
    del sd["encoder.ln_post.weight"]
    with pytest.raises(KeyError):
        convert_s3tokenizer(sd, to_jax_cfg(cfg), prefix="")
