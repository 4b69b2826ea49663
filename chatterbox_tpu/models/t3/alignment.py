"""Alignment-informed inference: online text-speech alignment integrity
checks driving EOS forcing/suppression.

Capability parity: reference t3/inference/alignment_stream_analyzer.py
(README.md:23 "alignment-informed inference"; constructed-but-disabled in the
reference pipeline, t3.py:260). The reference hooks layer-9 attention via a
torch forward hook and mutates python state per step; here the analyzer is a
pure function over a carried state pytree, fully inside the decode
``while_loop`` and vectorized over the batch (the reference is B=1-only).

Heuristics replicated from the reference (line refs in comments):
  - false start: no strong early-text activation yet          (l. 118-124)
  - completion: alignment position reached the last 3 tokens  (l. 126-129)
  - long tail: final-token activations persist >= 10 frames   (l. 131-136)
  - repetition: pre-final-token activations after completion  (l. 139)
  - discontinuity-gated position tracking (-4 < delta < 7)    (l. 113-116)
  - force EOS on long tail/repetition; suppress EOS until
    the alignment is near the text end                        (l. 141-151)
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

BIG = 2.0**15


class AlignState(NamedTuple):
    alignment: jnp.ndarray  # (B, max_new, S_text) accumulated attention rows
    text_position: jnp.ndarray  # (B,) int32
    started: jnp.ndarray  # (B,) bool
    complete: jnp.ndarray  # (B,) bool
    completed_at: jnp.ndarray  # (B,) int32 (max_new if not complete)


def init_align_state(b: int, max_new: int, s_text: int) -> AlignState:
    return AlignState(
        alignment=jnp.zeros((b, max_new, s_text), jnp.float32),
        text_position=jnp.zeros((b,), jnp.int32),
        started=jnp.zeros((b,), bool),
        complete=jnp.zeros((b,), bool),
        completed_at=jnp.full((b,), max_new, jnp.int32),
    )


def alignment_step(
    state: AlignState,
    attn_row: jnp.ndarray,  # (B, S_text) layer-9 head-mean attention of this step
    text_lens: jnp.ndarray,  # (B,) true text lengths (incl. SOT/EOT)
    step_i: jnp.ndarray,  # scalar int32 decode step
    logits: jnp.ndarray,  # (B, vocab) CFG-combined logits
    eos_idx: int,
):
    """One analyzer step: returns (new_state, possibly-modified logits)."""
    b, max_new, s = state.alignment.shape
    cols = jnp.arange(s)[None]  # (1, S)
    valid_text = cols < text_lens[:, None]

    # monotonic-ish masking keyed by frame index (reference l. 104)
    chunk = jnp.where(valid_text & (cols <= step_i + 1), attn_row, 0.0)
    alignment = jax.lax.dynamic_update_slice(state.alignment, chunk[:, None], (0, step_i, 0))

    cur_pos = jnp.argmax(chunk, axis=1).astype(jnp.int32)  # (B,)
    delta = cur_pos - state.text_position
    discontinuity = ~((delta > -4) & (delta < 7))
    text_position = jnp.where(discontinuity, state.text_position, cur_pos)

    rows = jnp.arange(max_new)[None, :, None]
    colsb = jnp.arange(s)[None, None, :]
    written = rows <= step_i

    # false start (reference l. 121): last-2 rows far-off-diagonal activations
    # or no strong activation in the first 4 text tokens yet
    last2 = (rows >= step_i - 1) & written
    lastcols2 = colsb >= (text_lens[:, None, None] - 2)
    tail_act = jnp.max(jnp.where(last2 & lastcols2, alignment, 0.0), axis=(1, 2))
    head_act = jnp.max(jnp.where(written & (colsb < 4), alignment, 0.0), axis=(1, 2))
    false_start = (~state.started) & ((tail_act > 0.1) | (head_act < 0.5))
    started = state.started | ~false_start

    complete = state.complete | (text_position >= text_lens - 3)
    completed_at = jnp.where(
        complete & (state.completed_at == max_new), step_i, state.completed_at
    )

    after_complete = (rows >= completed_at[:, None, None]) & written
    last3 = colsb >= (text_lens[:, None, None] - 3)
    # long tail (l. 136): any final-3-token column active >= 10 frames post-completion
    tail_mass = jnp.sum(jnp.where(after_complete & last3, alignment, 0.0), axis=1)  # (B, S)
    long_tail = complete & (jnp.max(tail_mass, axis=1) >= 10.0)
    # repetition (l. 139): row-max over pre-final tokens summed post-completion
    pre_final = valid_text[:, None, :] & (colsb < (text_lens[:, None, None] - 5))
    rep_rows = jnp.max(jnp.where(after_complete & pre_final, alignment, 0.0), axis=2)  # (B, T)
    repetition = complete & (jnp.sum(rep_rows, axis=1) > 5.0)

    force_eos = long_tail | repetition
    eos_onehot = jax.nn.one_hot(eos_idx, logits.shape[-1], dtype=logits.dtype)
    forced = -BIG * (1.0 - eos_onehot) + BIG * eos_onehot
    logits = jnp.where(force_eos[:, None], forced, logits)
    # suppress premature EOS (l. 150-151)
    suppress = cur_pos < (text_lens - 3)
    vocab_is_eos = jnp.arange(logits.shape[-1])[None] == eos_idx  # (1, V)
    logits = jnp.where((suppress & ~force_eos)[:, None] & vocab_is_eos, -BIG, logits)

    new_state = AlignState(alignment, text_position, started, complete, completed_at)
    return new_state, logits
