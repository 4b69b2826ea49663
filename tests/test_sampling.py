"""Exact-parity tests of the sampling transforms vs HF logits processors
(the reference chains these per decode step, t3/t3.py:301-341)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from chatterbox_tpu.core.sampling import (
    apply_min_p,
    apply_repetition_penalty,
    apply_top_p,
    cfg_combine,
    sample_from_logits,
)

NEG = np.finfo(np.float32).min


def _masked_equal(got, ref):
    """Compare keeping -inf/min semantics."""
    got = np.asarray(got)
    ref = np.asarray(ref)
    inf_g = got <= NEG / 2
    inf_r = np.isneginf(ref) | (ref <= NEG / 2)
    np.testing.assert_array_equal(inf_g, inf_r)
    np.testing.assert_allclose(got[~inf_g], ref[~inf_r], atol=1e-5)


def test_min_p_matches_hf():
    from transformers.generation.logits_process import MinPLogitsWarper

    rng = np.random.default_rng(0)
    logits = rng.standard_normal((3, 200)).astype(np.float32) * 3
    warper = MinPLogitsWarper(min_p=0.05)
    ref = warper(None, torch.from_numpy(logits.copy())).numpy()
    got = apply_min_p(jnp.asarray(logits), 0.05)
    _masked_equal(got, ref)


@pytest.mark.parametrize("top_p", [0.9, 0.5, 0.99])
def test_top_p_matches_hf(top_p):
    from transformers.generation.logits_process import TopPLogitsWarper

    rng = np.random.default_rng(1)
    logits = rng.standard_normal((4, 300)).astype(np.float32) * 2
    warper = TopPLogitsWarper(top_p=top_p)
    ref = warper(None, torch.from_numpy(logits.copy())).numpy()
    got = apply_top_p(jnp.asarray(logits), top_p)
    _masked_equal(got, ref)


def test_repetition_penalty_matches_hf():
    from transformers.generation.logits_process import RepetitionPenaltyLogitsProcessor

    rng = np.random.default_rng(2)
    vocab = 100
    logits = rng.standard_normal((2, vocab)).astype(np.float32) * 2
    seen_ids = [np.array([3, 7, 7, 50]), np.array([0, 99])]
    proc = RepetitionPenaltyLogitsProcessor(penalty=1.2)
    ids = torch.nn.utils.rnn.pad_sequence(
        [torch.from_numpy(s) for s in seen_ids], batch_first=True, padding_value=3
    )
    # HF applies per-row on the gathered ids; emulate row-wise
    refs = []
    for i, s in enumerate(seen_ids):
        r = proc(torch.from_numpy(s)[None], torch.from_numpy(logits[i : i + 1].copy()))
        refs.append(r.numpy()[0])
    ref = np.stack(refs)
    seen_mask = np.zeros((2, vocab), bool)
    for i, s in enumerate(seen_ids):
        seen_mask[i, s] = True
    got = apply_repetition_penalty(jnp.asarray(logits), jnp.asarray(seen_mask), 1.2)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-6)


def test_cfg_combine():
    c = jnp.asarray([[1.0, 2.0]])
    u = jnp.asarray([[0.0, 4.0]])
    np.testing.assert_allclose(np.asarray(cfg_combine(c, u, 0.5)), [[1.5, 1.0]])


def test_sample_from_logits_is_inverse_cdf():
    logits = jnp.log(jnp.asarray([[0.1, 0.2, 0.3, 0.4]]))
    for u, expect in [(0.05, 0), (0.15, 1), (0.35, 2), (0.99, 3)]:
        tok = sample_from_logits(logits, jnp.asarray([u]))
        assert int(tok[0]) == expect, (u, int(tok[0]))


def test_sampling_statistics():
    """Sampled distribution matches softmax within tolerance."""
    import jax

    logits = jnp.asarray([[0.0, 1.0, 2.0]])
    probs = np.exp([0, 1, 2]) / np.exp([0, 1, 2]).sum()
    u = jax.random.uniform(jax.random.PRNGKey(0), (5000,))
    toks = np.asarray(
        jax.vmap(lambda uu: sample_from_logits(logits, uu[None])[0])(u)
    )
    emp = np.bincount(toks, minlength=3) / len(toks)
    np.testing.assert_allclose(emp, probs, atol=0.02)
