"""Tests for alignment-informed inference (hallucination watchdog)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chatterbox_tpu.models.t3.alignment import AlignState, alignment_step, init_align_state
from chatterbox_tpu.core.sampling import SamplingConfig
from chatterbox_tpu.models.t3.llama import LlamaConfig
from chatterbox_tpu.models.t3.t3 import T3Config, init_t3, t3_generate

EOS = 6562


def _mk_state(b=1, max_new=32, s=10):
    return init_align_state(b, max_new, s)


def test_eos_suppressed_until_text_end():
    s = 10
    state = _mk_state(s=s)
    text_lens = jnp.asarray([s], jnp.int32)
    # attention focused on early text -> position far from end -> EOS suppressed
    attn = jnp.zeros((1, s)).at[0, 1].set(1.0)
    logits = jnp.zeros((1, 8194))
    state, out = alignment_step(state, attn, text_lens, jnp.int32(0), logits, EOS)
    assert float(out[0, EOS]) <= -(2**14)
    assert float(out[0, 100]) == 0.0


def test_eos_forced_on_long_tail():
    s = 10
    max_new = 64
    state = _mk_state(max_new=max_new, s=s)
    text_lens = jnp.asarray([s], jnp.int32)
    logits = jnp.zeros((1, 8194))
    # drive to completion gradually (the discontinuity gate rejects jumps >= 7),
    # then park attention on the last text token
    for i in range(20):
        pos = min(i, s - 1)
        attn = jnp.zeros((1, s)).at[0, pos].set(1.0)
        state, out = alignment_step(state, attn, text_lens, jnp.int32(i), logits, EOS)
    # after completion, >= 10 frames stuck on final tokens -> long tail -> EOS forced
    assert bool(state.complete[0])
    assert float(out[0, EOS]) >= 2**14
    assert float(out[0, 5]) <= -(2**14)


def test_generate_with_alignment_runs():
    cfg = T3Config(
        alignment_layer=1,
        llama=LlamaConfig(hidden_size=64, intermediate_size=128, num_hidden_layers=2,
                          num_attention_heads=2, num_key_value_heads=2, head_dim=32),
    )
    p = init_t3(jax.random.PRNGKey(0), cfg)
    text = np.concatenate([[[255]], np.full((1, 6), 7), [[0]]], 1).astype(np.int32)
    res = t3_generate(
        p, cfg, jnp.asarray(text), jnp.asarray([8], np.int32),
        jnp.zeros((1, 256)), jnp.zeros((1, 150), jnp.int32), jnp.full((1,), 0.5),
        jax.random.PRNGKey(0), SamplingConfig(), max_new_tokens=16, alignment=True,
    )
    toks = np.asarray(res.tokens)
    assert toks.shape == (1, 16)
    assert (toks >= 0).all() and (toks < 8194).all()


def test_alignment_pallas_matches_xla_path():
    """r5: alignment rides the flash kernel (stats output + XLA text-window
    prob reconstruction). Greedy tokens must match the XLA attention path,
    and the collected text-window attention must agree closely."""
    cfg = T3Config(
        alignment_layer=1,
        llama=LlamaConfig(hidden_size=64, intermediate_size=128, num_hidden_layers=2,
                          num_attention_heads=2, num_key_value_heads=2, head_dim=32),
    )
    p = init_t3(jax.random.PRNGKey(0), cfg)
    text = np.concatenate([[[255]], np.full((1, 6), 7), [[0]]], 1).astype(np.int32)
    args = (
        p, cfg, jnp.asarray(text), jnp.asarray([8], np.int32),
        jnp.zeros((1, 256)), jnp.zeros((1, 150), jnp.int32), jnp.full((1,), 0.5),
        jax.random.PRNGKey(0),
    )
    kw = dict(sampling=SamplingConfig(greedy=True), max_new_tokens=12, alignment=True)
    res_k = t3_generate(*args, use_pallas=True, **kw)
    res_x = t3_generate(*args, use_pallas=False, **kw)
    np.testing.assert_array_equal(np.asarray(res_k.tokens), np.asarray(res_x.tokens))
    assert int(res_k.steps) == int(res_x.steps)
