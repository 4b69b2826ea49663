"""Pallas TPU kernel: single-token decode attention over a padded KV cache.

The T3 decode step's attention is a batched matvec+softmax+matvec over the
(B, H, S, D) cache -- pure HBM bandwidth. This kernel fuses the three ops and
the length masking into one VMEM-resident pass per (batch, head) grid cell
(S*D for the 520M config is ~145 KB bf16, far under the 16 MB VMEM budget, so
no inner streaming loop is needed; the grid pipelines HBM->VMEM copies across
cells).

Integration: opt-in via ``llama_decode_step(..., use_pallas=True)``; the
dense-XLA path stays the default and is the numerical reference
(tests/test_ops.py compares both; interpret mode on CPU).

Hardware A/B (v5e, 16 CFG rows, S=318, round 1): this kernel 12.5 ms/step vs
XLA dense 10.3 ms in the scanned decode -- the per-(batch, head) grid is too
fine for this problem size (256 tiny cells). The unrolled XLA decode step
(llama_decode_step_unrolled, 4.1 ms/step) is the production default; a
head-batched grid variant is the obvious next iteration.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _decode_attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref):
    """One (batch, head) cell. Block shapes:
    q (1,1,1,D), k/v (1,1,S,D), mask (B,S) [full; row-indexed], o (1,1,1,D)."""
    q = q_ref[0, 0].astype(jnp.float32)  # (1, D)
    k = k_ref[0, 0].astype(jnp.float32)  # (S, D)
    v = v_ref[0, 0].astype(jnp.float32)  # (S, D)
    scale = 1.0 / np.sqrt(q.shape[-1])
    scores = jnp.sum(k * q, axis=-1) * scale  # (S,) via VPU (D=64 lane dim)
    neg = jnp.finfo(jnp.float32).min
    bi = pl.program_id(0)
    scores = jnp.where(mask_ref[bi, :], scores, neg)
    m = jnp.max(scores)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e)  # (S,)
    o_ref[0, 0] = jnp.dot(
        probs[None, :], v, preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_decode_attention(q, k, v, len_mask, interpret=False):
    """q (B, H, 1, D), k/v (B, H, S, D), len_mask (B, S) bool -> (B, H, 1, D)."""
    b, h, _, d = q.shape
    s = k.shape[2]
    return pl.pallas_call(
        _decode_attn_kernel,
        grid=(b, h),
        in_specs=[
            pl.BlockSpec((1, 1, 1, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, s), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 1, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, 1, d), q.dtype),
        interpret=interpret,
    )(q, k, v, len_mask)
