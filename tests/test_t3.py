"""Golden-parity of the JAX T3 (cond encoder + Llama + CFG decode loop)
against the reference torch T3 with a shrunk Llama backbone."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ref_loader import load_ref

from chatterbox_tpu.core.sampling import SamplingConfig
from chatterbox_tpu.models.t3.llama import LlamaConfig
from chatterbox_tpu.models.t3.t3 import (
    T3Config,
    convert_t3,
    t3_build_prefill,
    t3_cond_prefix,
    t3_forward,
    t3_generate,
)

HIDDEN = 128


@pytest.fixture(scope="module")
def ref_t3():
    t3_mod = load_ref("chatterbox.models.t3.t3")
    llama_cfgs = load_ref("chatterbox.models.t3.llama_configs")
    cond_mod = load_ref("chatterbox.models.t3.modules.cond_enc")
    perc_mod = load_ref("chatterbox.models.t3.modules.perceiver")

    tiny = dict(llama_cfgs.LLAMA_520M_CONFIG_DICT)
    tiny.update(hidden_size=HIDDEN, intermediate_size=256, num_hidden_layers=4,
                num_attention_heads=4, num_key_value_heads=4, head_dim=32)
    llama_cfgs.LLAMA_CONFIGS["tiny"] = tiny
    t3_mod.LLAMA_CONFIGS["tiny"] = tiny

    # Perceiver hard-codes 1024 dims; patch defaults for the tiny model
    orig_perceiver = perc_mod.Perceiver
    cond_mod.Perceiver = lambda: orig_perceiver(
        pre_attention_query_token=32, pre_attention_query_size=HIDDEN,
        embedding_dim=HIDDEN, num_attn_heads=4,
    )

    hp = t3_mod.T3Config()
    hp.llama_config_name = "tiny"
    torch.manual_seed(0)
    m = t3_mod.T3(hp)
    m.eval()
    return m


@pytest.fixture(scope="module")
def jcfg():
    return T3Config(
        llama=LlamaConfig(hidden_size=HIDDEN, intermediate_size=256, num_hidden_layers=4,
                          num_attention_heads=4, num_key_value_heads=4, head_dim=32)
    )


@pytest.fixture(scope="module")
def jparams(ref_t3, jcfg):
    return jax.tree.map(jnp.asarray, convert_t3(ref_t3.state_dict(), jcfg))


def _make_cond(ref_t3, rng):
    cond_mod = load_ref("chatterbox.models.t3.modules.cond_enc")
    speaker = rng.standard_normal((1, 256)).astype(np.float32)
    prompt = rng.integers(0, 6561, (1, 150))
    emotion = np.float32(0.5)
    t3_cond = cond_mod.T3Cond(
        speaker_emb=torch.from_numpy(speaker),
        cond_prompt_speech_tokens=torch.from_numpy(prompt),
        emotion_adv=emotion * torch.ones(1, 1, 1),
    )
    return t3_cond, speaker, prompt, emotion


def test_cond_prefix_parity(ref_t3, jcfg, jparams):
    rng = np.random.default_rng(0)
    t3_cond, speaker, prompt, emotion = _make_cond(ref_t3, rng)
    with torch.no_grad():
        ref = ref_t3.prepare_conditioning(t3_cond).numpy()
    got = t3_cond_prefix(
        jparams, jcfg, jnp.asarray(speaker), jnp.asarray(prompt), jnp.full((1,), emotion)
    )
    assert got.shape == ref.shape == (1, 34, HIDDEN)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4, rtol=1e-3)


def _ref_generate_greedy(ref_t3, t3_cond, text_tokens, monkeypatch, max_new, cfg_weight):
    """Run the reference inference loop with multinomial patched to argmax."""
    monkeypatch.setattr(
        torch, "multinomial",
        lambda probs, num_samples: probs.argmax(dim=-1, keepdim=True),
    )
    with torch.no_grad():
        out = ref_t3.inference(
            t3_cond=t3_cond,
            text_tokens=torch.from_numpy(text_tokens),
            max_new_tokens=max_new,
            temperature=0.8,
            cfg_weight=cfg_weight,
            repetition_penalty=1.2,
            min_p=0.05,
            top_p=1.0,
        )
    return out.numpy()


@pytest.mark.parametrize("cfg_weight", [0.5])
def test_greedy_token_parity(ref_t3, jcfg, jparams, monkeypatch, cfg_weight):
    rng = np.random.default_rng(1)
    t3_cond, speaker, prompt, emotion = _make_cond(ref_t3, rng)
    # text with SOT/EOT framing, duplicated for CFG like tts.py:237-243
    body = rng.integers(1, 704, (1, 12))
    text = np.concatenate([[[255]], body, [[0]]], axis=1).astype(np.int64)
    text2 = np.concatenate([text, text], axis=0)

    max_new = 24
    ref_tokens = _ref_generate_greedy(ref_t3, t3_cond, text2, monkeypatch, max_new, cfg_weight)

    res = t3_generate(
        jparams,
        jcfg,
        jnp.asarray(text.astype(np.int32)),
        jnp.asarray([text.shape[1]], np.int32),
        jnp.asarray(speaker),
        jnp.asarray(prompt),
        jnp.full((1,), emotion),
        jax.random.PRNGKey(0),
        SamplingConfig(cfg_weight=cfg_weight, greedy=True),
        max_new_tokens=max_new,
    )
    got = np.asarray(res.tokens)[0]
    ref = ref_tokens[0]
    n = min(len(ref), int(res.lengths[0]) + 1)
    np.testing.assert_array_equal(got[:n], ref[:n])


def test_padded_batch_matches_single(jcfg, jparams, ref_t3):
    """Ragged right-padded batch must reproduce the single-row result."""
    rng = np.random.default_rng(2)
    _, speaker, prompt, emotion = _make_cond(ref_t3, rng)
    body = rng.integers(1, 704, (1, 8))
    text = np.concatenate([[[255]], body, [[0]]], axis=1).astype(np.int32)  # len 10
    text_pad = np.concatenate([text, np.zeros((1, 5), np.int32)], axis=1)  # len 15 padded

    common = dict(
        speaker_emb=jnp.asarray(speaker),
        prompt_tokens=jnp.asarray(prompt),
        emotion_adv=jnp.full((1,), emotion),
        rng=jax.random.PRNGKey(0),
        sampling=SamplingConfig(greedy=True),
        max_new_tokens=12,
    )
    r1 = t3_generate(jparams, jcfg, jnp.asarray(text), jnp.asarray([10], np.int32), **common)
    r2 = t3_generate(jparams, jcfg, jnp.asarray(text_pad), jnp.asarray([10], np.int32), **common)
    np.testing.assert_array_equal(np.asarray(r1.tokens), np.asarray(r2.tokens))


def test_decode_impls_equivalent(jcfg, jparams, ref_t3):
    """The scan (read-only cache xs + explicit self-attention) and unrolled
    decode steps must produce identical token streams, with and without the
    alignment watchdog collecting layer attention."""
    rng = np.random.default_rng(3)
    _, speaker, prompt, emotion = _make_cond(ref_t3, rng)
    body = rng.integers(1, 704, (2, 9))
    text = np.concatenate([np.full((2, 1), 255), body, np.zeros((2, 1))], axis=1).astype(np.int32)
    import dataclasses

    cfg = dataclasses.replace(jcfg, alignment_layer=2)  # tiny model: 4 layers
    for alignment in (False, True):
        common = dict(
            speaker_emb=jnp.asarray(np.tile(speaker, (2, 1))),
            prompt_tokens=jnp.asarray(np.tile(prompt, (2, 1))),
            emotion_adv=jnp.full((2,), emotion),
            rng=jax.random.PRNGKey(0),
            sampling=SamplingConfig(greedy=True),
            max_new_tokens=10,
            alignment=alignment,
        )
        lens = jnp.asarray([11, 11], np.int32)
        rs = t3_generate(jparams, cfg, jnp.asarray(text), lens, decode_impl="scan", **common)
        ru = t3_generate(jparams, cfg, jnp.asarray(text), lens, decode_impl="unroll", **common)
        np.testing.assert_array_equal(np.asarray(rs.tokens), np.asarray(ru.tokens))


def test_forward_loss_runs(jcfg, jparams):
    batch = {
        "speaker_emb": jnp.zeros((2, 256)),
        "prompt_tokens": jnp.zeros((2, 150), jnp.int32),
        "emotion_adv": jnp.full((2,), 0.5),
        "text_tokens": jnp.zeros((2, 12), jnp.int32),
        "text_lens": jnp.asarray([12, 8], jnp.int32),
        "speech_tokens": jnp.zeros((2, 20), jnp.int32),
        "speech_lens": jnp.asarray([20, 15], jnp.int32),
    }
    from chatterbox_tpu.models.t3.t3 import t3_loss

    lt, ls = jax.jit(lambda p, b: t3_loss(p, jcfg, b))(jparams, batch)
    assert np.isfinite(float(lt)) and np.isfinite(float(ls))


def test_cache_quant_generate_agrees(jcfg, jparams, ref_t3):
    """The int8 KV cache (cache_quant=True) runs the same decode loop and
    keeps the greedy token stream identical on this tiny model (quantization
    noise is far below the logit gaps). A general-purpose guarantee is
    statistical, not exact -- this gates the plumbing, the A/B probe on
    hardware gates the numerics at full size."""
    rng = np.random.default_rng(21)
    _, speaker, prompt, emotion = _make_cond(ref_t3, rng)
    body = rng.integers(1, 704, (2, 9))
    text = np.concatenate(
        [np.full((2, 1), 255), body, np.zeros((2, 1))], axis=1
    ).astype(np.int32)
    common = dict(
        speaker_emb=jnp.asarray(np.tile(speaker, (2, 1))),
        prompt_tokens=jnp.asarray(np.tile(prompt, (2, 1))),
        emotion_adv=jnp.full((2,), emotion),
        rng=jax.random.PRNGKey(0),
        sampling=SamplingConfig(greedy=True, cfg_weight=0.5),
        max_new_tokens=12,
    )
    lens = jnp.asarray([11, 11], np.int32)
    r_bf = t3_generate(jparams, jcfg, jnp.asarray(text), lens, **common)
    r_q = t3_generate(
        jparams, jcfg, jnp.asarray(text), lens, cache_quant=True, **common
    )
    np.testing.assert_array_equal(np.asarray(r_bf.tokens), np.asarray(r_q.tokens))
