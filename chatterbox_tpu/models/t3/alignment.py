"""Alignment-informed inference: online text-speech alignment integrity
checks driving EOS forcing/suppression.

Capability parity: reference t3/inference/alignment_stream_analyzer.py
(README.md:23 "alignment-informed inference"; constructed-but-disabled in the
reference pipeline, t3.py:260). The reference hooks layer-9 attention via a
torch forward hook and accumulates the full (T_speech, S_text) alignment
matrix in python state; here the analyzer is a pure function over a carried
state pytree, fully inside the decode ``while_loop``, vectorized over the
batch (the reference is B=1-only), and -- round-2 redesign -- reduced to
O(B * S_text) RUNNING statistics: every reference heuristic only ever reads
the matrix through a running max/sum, so the (B, max_new, S_text) history
buffer (~16 MB of loop carry at B=8, 1000 steps, 512 text) is unnecessary.

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
    """Running-statistic equivalents of the reference's alignment matrix:

    - head_max:   max over all steps of max(chunk[:, :4])        (false start)
    - tail_prev:  previous step's max over the last-2 text cols  (false start)
    - tail_mass:  per-column sum of post-completion rows         (long tail)
    - rep_sum:    sum of per-row maxima over pre-final cols,
                  post-completion                                (repetition)
    """

    head_max: jnp.ndarray  # (B,) f32
    tail_prev: jnp.ndarray  # (B,) f32
    tail_mass: jnp.ndarray  # (B, S_text) f32
    rep_sum: jnp.ndarray  # (B,) f32
    text_position: jnp.ndarray  # (B,) int32
    started: jnp.ndarray  # (B,) bool
    complete: jnp.ndarray  # (B,) bool
    completed_at: jnp.ndarray  # (B,) int32 (sentinel if not complete)


def init_align_state(b: int, max_new: int, s_text: int) -> AlignState:
    """``max_new`` is kept for API compatibility; state size no longer
    depends on it."""
    return AlignState(
        head_max=jnp.zeros((b,), jnp.float32),
        tail_prev=jnp.zeros((b,), jnp.float32),
        tail_mass=jnp.zeros((b, s_text), jnp.float32),
        rep_sum=jnp.zeros((b,), jnp.float32),
        text_position=jnp.zeros((b,), jnp.int32),
        started=jnp.zeros((b,), bool),
        complete=jnp.zeros((b,), bool),
        completed_at=jnp.full((b,), jnp.iinfo(jnp.int32).max, jnp.int32),
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
    b, s = attn_row.shape
    cols = jnp.arange(s)[None]  # (1, S)
    valid_text = cols < text_lens[:, None]

    # monotonic-ish masking keyed by frame index (reference l. 104 keeps
    # cols <= curr_frame_pos). Our step 0 corresponds to the reference's
    # SECOND analyzer call (curr_frame_pos = step_i + 1): its first call
    # consumes the multi-row prefill chunk, which this in-loop design does
    # not see -- a known one-row shift in the running statistics (the
    # prefill rows only contribute through the same head/tail maxima the
    # first decode rows re-establish).
    chunk = jnp.where(valid_text & (cols <= step_i + 1), attn_row, 0.0)

    cur_pos = jnp.argmax(chunk, axis=1).astype(jnp.int32)  # (B,)
    delta = cur_pos - state.text_position
    discontinuity = ~((delta > -4) & (delta < 7))
    text_position = jnp.where(discontinuity, state.text_position, cur_pos)

    # false start (reference l. 121): strong last-2-col activation in the
    # last TWO rows (previous + current chunk), or weak first-4-col history
    lastcols2 = cols >= (text_lens[:, None] - 2)
    tail_cur = jnp.max(jnp.where(lastcols2, chunk, 0.0), axis=1)  # (B,)
    tail_act = jnp.maximum(state.tail_prev, tail_cur)
    head_max = jnp.maximum(state.head_max, jnp.max(jnp.where(cols < 4, chunk, 0.0), axis=1))
    false_start = (~state.started) & ((tail_act > 0.1) | (head_max < 0.5))
    started = state.started | ~false_start

    complete = state.complete | (text_position >= text_lens - 3)
    sentinel = jnp.iinfo(jnp.int32).max
    completed_at = jnp.where(
        complete & (state.completed_at == sentinel), step_i, state.completed_at
    )

    # post-completion accumulators: rows strictly AFTER the completion row
    # (reference A[completed_at:] with completed_at = len(A) at completion
    # excludes the completing row itself)
    post = complete & (step_i > completed_at)  # (B,)
    last3 = cols >= (text_lens[:, None] - 3)
    tail_mass = state.tail_mass + jnp.where(
        post[:, None] & last3, chunk, 0.0
    )  # (B, S) per-column sums
    long_tail = complete & (jnp.max(tail_mass, axis=1) >= 10.0)  # (l. 136)
    pre_final = valid_text & (cols < (text_lens[:, None] - 5))
    rep_sum = state.rep_sum + jnp.where(
        post, jnp.max(jnp.where(pre_final, chunk, 0.0), axis=1), 0.0
    )
    repetition = complete & (rep_sum > 5.0)  # (l. 139)

    force_eos = long_tail | repetition
    eos_onehot = jax.nn.one_hot(eos_idx, logits.shape[-1], dtype=logits.dtype)
    forced = -BIG * (1.0 - eos_onehot) + BIG * eos_onehot
    logits = jnp.where(force_eos[:, None], forced, logits)
    # suppress premature EOS (l. 150-151)
    suppress = cur_pos < (text_lens - 3)
    vocab_is_eos = jnp.arange(logits.shape[-1])[None] == eos_idx  # (1, V)
    logits = jnp.where((suppress & ~force_eos)[:, None] & vocab_is_eos, -BIG, logits)

    new_state = AlignState(
        head_max, tail_cur, tail_mass, rep_sum,
        text_position, started, complete, completed_at,
    )
    return new_state, logits
