"""Pure-JAX logits transforms + categorical sampling for the decode scan.

Reimplements the HF logits processors the reference chains per decode step
(t3/t3.py:301-341): RepetitionPenaltyLogitsProcessor, MinPLogitsWarper,
TopPLogitsWarper, then softmax + multinomial. All are vocab-size-static ops
that XLA fuses into the decode step; the repetition penalty keeps a
(B, vocab) seen-token mask in the scan carry instead of a growing id list
(SURVEY.md §7 step 4).
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp

_NEG = jnp.finfo(jnp.float32).min


@dataclass(frozen=True)
class SamplingConfig:
    temperature: float = 0.8
    top_p: float = 1.0
    min_p: float = 0.05
    repetition_penalty: float = 1.2
    cfg_weight: float = 0.5
    greedy: bool = False  # do_sample=False equivalent (argmax after processing)
    min_new_tokens: int = 0  # suppress EOS before this many tokens (HF min_new_tokens)


def apply_repetition_penalty(logits, seen_mask, penalty):
    """HF semantics: seen & logit>0 -> logit/penalty; seen & logit<=0 -> logit*penalty."""
    if penalty == 1.0:
        return logits
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen_mask, penalized, logits)


def apply_min_p(logits, min_p):
    """Keep tokens with prob >= min_p * max_prob  <=>  logit >= max + ln(min_p)."""
    if min_p <= 0.0:
        return logits
    thresh = jnp.max(logits, axis=-1, keepdims=True) + jnp.log(min_p)
    return jnp.where(logits >= thresh, logits, _NEG)


def apply_top_p(logits, top_p):
    """Nucleus filtering, exact HF TopPLogitsWarper semantics (ascending sort,
    remove while cumulative prob <= 1 - top_p, always keep the best token)."""
    if top_p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)  # ascending
    cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    sorted_remove = cum <= (1.0 - top_p)
    # number of removed tokens from the bottom; removal threshold value
    n_remove = jnp.sum(sorted_remove, axis=-1, keepdims=True)
    # value of the smallest KEPT logit
    kth = jnp.take_along_axis(sorted_logits, n_remove, axis=-1)
    return jnp.where(logits >= kth, logits, _NEG)


def sample_from_logits(logits, u):
    """Inverse-CDF categorical sample given uniform draws u (B,).

    With identical uniform draws this reproduces any inverse-CDF sampler;
    greedy parity is covered by argmax when u -> 0.
    """
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # scale the draw by the actual cumsum total: f32 rounding can leave
    # cum[-1] slightly below 1, and a draw above it would make `cum < u`
    # all-True -> argmin returns index 0, emitting an arbitrary token that
    # may have zero (masked) probability
    u = u[:, None] * cum[:, -1:]
    return jnp.argmin(cum < u, axis=-1).astype(jnp.int32)


def cfg_combine(logits_cond, logits_uncond, cfg_weight):
    """Classifier-free guidance combine (t3.py:322-326)."""
    return logits_cond + cfg_weight * (logits_cond - logits_uncond)


def process_logits(logits, seen_mask, cfg: SamplingConfig):
    """Full per-step chain on CFG-combined logits, reference order
    (t3.py:330-337): temperature -> repetition penalty -> min_p -> top_p."""
    if cfg.temperature != 1.0:
        logits = logits / cfg.temperature
    logits = apply_repetition_penalty(logits, seen_mask, cfg.repetition_penalty)
    logits = apply_min_p(logits, cfg.min_p)
    logits = apply_top_p(logits, cfg.top_p)
    return logits
