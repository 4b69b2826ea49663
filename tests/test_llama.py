"""Parity of the JAX Llama backbone vs HF transformers LlamaModel
(the reference T3 backbone, t3/t3.py:44-45)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from chatterbox_tpu.models.t3.llama import (
    LlamaConfig,
    convert_llama,
    llama_decode_step,
    llama_prefill,
    rope_inv_freq,
)

# small config for fast tests; same structure as Llama_520M
SMALL = LlamaConfig(
    hidden_size=128,
    intermediate_size=256,
    num_hidden_layers=4,
    num_attention_heads=4,
    num_key_value_heads=4,
    head_dim=32,
)


def make_hf_model(cfg: LlamaConfig):
    from transformers import LlamaConfig as HFConfig
    from transformers import LlamaModel

    hf_cfg = HFConfig(
        vocab_size=8,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        head_dim=cfg.head_dim,
        max_position_embeddings=131072,
        rms_norm_eps=cfg.rms_norm_eps,
        rope_theta=cfg.rope_theta,
        rope_scaling=dict(
            factor=cfg.rope_scaling_factor,
            high_freq_factor=cfg.rope_high_freq_factor,
            low_freq_factor=cfg.rope_low_freq_factor,
            original_max_position_embeddings=cfg.rope_original_max_position,
            rope_type="llama3",
        ),
        attention_bias=False,
        mlp_bias=False,
        tie_word_embeddings=False,
        attn_implementation="sdpa",
    )
    torch.manual_seed(0)
    m = LlamaModel(hf_cfg)
    m.eval()
    return m


def test_rope_inv_freq_matches_hf():
    cfg = LlamaConfig()  # full 520M rope settings, head_dim 64
    m = make_hf_model(SMALL)
    # HF computes inv_freq on the fly; grab from the rotary module
    hf_inv = m.rotary_emb.inv_freq.numpy()
    got = rope_inv_freq(SMALL)
    np.testing.assert_allclose(got, hf_inv, rtol=1e-6)


def test_prefill_matches_hf():
    m = make_hf_model(SMALL)
    params = convert_llama({k: v for k, v in m.state_dict().items()}, SMALL, prefix="")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 10, SMALL.hidden_size)).astype(np.float32)
    with torch.no_grad():
        ref = m(inputs_embeds=torch.from_numpy(x)).last_hidden_state.numpy()
    pos = jnp.broadcast_to(jnp.arange(10), (2, 10))
    hidden, cache = llama_prefill(params, SMALL, jnp.asarray(x), pos, None, cache_len=16)
    np.testing.assert_allclose(np.asarray(hidden), ref, atol=2e-4, rtol=1e-3)
    assert cache.shape == (SMALL.num_hidden_layers, 2, 2, 4, 16, 32)


def test_decode_matches_hf_incremental():
    m = make_hf_model(SMALL)
    params = convert_llama({k: v for k, v in m.state_dict().items()}, SMALL, prefix="")
    rng = np.random.default_rng(1)
    b, t0, steps = 2, 6, 5
    x0 = rng.standard_normal((b, t0, SMALL.hidden_size)).astype(np.float32)
    xs = rng.standard_normal((b, steps, SMALL.hidden_size)).astype(np.float32)

    # HF: full forward over the whole sequence (ground truth)
    full = np.concatenate([x0, xs], axis=1)
    with torch.no_grad():
        ref = m(inputs_embeds=torch.from_numpy(full)).last_hidden_state.numpy()

    cache_len = 16
    pos = jnp.broadcast_to(jnp.arange(t0), (b, t0))
    hidden, cache = llama_prefill(params, SMALL, jnp.asarray(x0), pos, None, cache_len)
    np.testing.assert_allclose(np.asarray(hidden), ref[:, :t0], atol=2e-4, rtol=1e-3)

    for i in range(steps):
        cur = t0 + i
        posi = jnp.full((b, 1), cur, jnp.int32)
        len_mask = (jnp.arange(cache_len) <= cur)[None].repeat(b, 0)
        h, cache, _ = llama_decode_step(
            params, SMALL, jnp.asarray(xs[:, i : i + 1]), cache, jnp.int32(cur), posi, len_mask
        )
        np.testing.assert_allclose(
            np.asarray(h)[:, 0], ref[:, cur], atol=5e-4, rtol=1e-3,
            err_msg=f"step {i}",
        )


def test_prefill_respects_padding_mask():
    """Right-padded rows must produce the same outputs as their unpadded
    equivalents at the valid positions."""
    m = make_hf_model(SMALL)
    params = convert_llama({k: v for k, v in m.state_dict().items()}, SMALL, prefix="")
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 8, SMALL.hidden_size)).astype(np.float32)
    xp = np.concatenate([x, np.zeros((1, 4, SMALL.hidden_size), np.float32)], axis=1)
    pos = jnp.arange(12)[None]
    mask = jnp.asarray((np.arange(12) < 8)[None])
    h_pad, _ = llama_prefill(params, SMALL, jnp.asarray(xp), pos, mask, 16)
    h_ref, _ = llama_prefill(params, SMALL, jnp.asarray(x), jnp.arange(8)[None], None, 16)
    np.testing.assert_allclose(np.asarray(h_pad)[:, :8], np.asarray(h_ref), atol=1e-5)


def test_fused_qkv_equivalent():
    """fuse_qkv_params / unfuse_qkv_params roundtrip exactly; the fused
    matmul matches the canonical separate-q/k/v layout to fp-reassociation
    precision (the wider dot may accumulate in a different order)."""
    from chatterbox_tpu.models.t3.llama import (
        fuse_qkv_params,
        init_llama,
        unfuse_qkv_params,
    )

    params = init_llama(jax.random.PRNGKey(3), SMALL)
    fused = fuse_qkv_params(params)
    assert "qkv" in fused["layers"] and "q" not in fused["layers"]
    back = unfuse_qkv_params(fused, SMALL)
    for k in ("q", "k", "v"):
        np.testing.assert_array_equal(
            np.asarray(back["layers"][k]["w"]), np.asarray(params["layers"][k]["w"])
        )

    b, t0, cache_len = 2, 6, 16
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((b, t0, SMALL.hidden_size)).astype(np.float32))
    pos = jnp.broadcast_to(jnp.arange(t0), (b, t0))
    h1, c1 = llama_prefill(params, SMALL, x, pos, None, cache_len)
    h2, c2 = llama_prefill(fused, SMALL, x, pos, None, cache_len)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-5, rtol=1e-6)

    tok = jnp.asarray(rng.standard_normal((b, 1, SMALL.hidden_size)).astype(np.float32))
    posi = jnp.full((b, 1), t0, jnp.int32)
    len_mask = (jnp.arange(cache_len) <= t0)[None].repeat(b, 0)
    d1, _, _ = llama_decode_step(params, SMALL, tok, c1, jnp.int32(t0), posi, len_mask)
    d2, _, _ = llama_decode_step(fused, SMALL, tok, c2, jnp.int32(t0), posi, len_mask)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-5, rtol=1e-6)
