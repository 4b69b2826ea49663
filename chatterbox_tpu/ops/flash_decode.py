"""Pallas TPU kernel: single-token decode attention reading the KV cache
straight from HBM, with the layer selected by a scalar-prefetched index.

Why this exists (round-2 redesign): the T3 decode step scans over layers with
the cache as a read-only ``lax.scan`` input; XLA materializes each layer's
(2, B, H, S, D) slice before the attention einsum -- one full cache copy per
token (~1.25 GB at 16 CFG rows, measured +1.5 ms/step on v5e). This kernel
makes the zero-copy read STRUCTURAL: the full (L, 2, B, H, S, D) cache stays
in HBM (``memory_space=ANY``), and the BlockSpec ``index_map`` uses the
prefetched layer index to DMA exactly layer i's (B_blk, H, S_blk, D) tiles
into VMEM, online-softmax-accumulated flash-style across S blocks.

The CURRENT token's K/V (not yet written to the cache) enter as separate
(B, H, D) operands and initialize the running max/denominator/accumulator at
the first S block -- softmax([cache logits; self logit]) without ever
concatenating on the padded S axis.

Round-1's per-(batch, head)-cell kernel lost to XLA dense (12.5 ms vs
10.3 ms scanned); this grid (B blocks x S blocks, all heads per cell) is the
"head-batched grid" follow-up VERDICT.md asked to A/B.

Equivalent reference computation: the decode-loop SDPA over
``past_key_values`` (reference t3/t3.py:319-367 / HF Llama sdpa).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_block(n: int, candidates) -> int:
    for c in candidates:
        if n % c == 0:
            return c
    return n


def _kernel(layer_ref, kc_ref, vc_ref, q_ref, kn_ref, vn_ref, mask_ref,
            o_ref, m_scr, l_scr, acc_scr):
    s_i = pl.program_id(1)
    n_s = pl.num_programs(1)
    scale = 1.0 / np.sqrt(q_ref.shape[-1])

    q = q_ref[...].astype(jnp.float32)  # (Bb, H, D)

    @pl.when(s_i == 0)
    def _init():
        # seed the online softmax with the current token's self-attention
        kn = kn_ref[...].astype(jnp.float32)
        m_scr[...] = jnp.sum(q * kn, axis=-1) * scale  # (Bb, H)
        l_scr[...] = jnp.ones_like(l_scr)
        acc_scr[...] = vn_ref[...].astype(jnp.float32)

    k = kc_ref[0, 0].astype(jnp.float32)  # (Bb, H, Sb, D)
    v = vc_ref[0, 0].astype(jnp.float32)
    logits = (
        jnp.einsum("bhd,bhsd->bhs", q, k, preferred_element_type=jnp.float32) * scale
    )
    neg = jnp.finfo(jnp.float32).min
    logits = jnp.where(mask_ref[...][:, None, :], logits, neg)

    m_prev, l_prev, acc_prev = m_scr[...], l_scr[...], acc_scr[...]
    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(logits - m_new[..., None])  # (Bb, H, Sb)
    m_scr[...] = m_new
    l_scr[...] = l_prev * alpha + jnp.sum(p, axis=-1)
    acc_scr[...] = acc_prev * alpha[..., None] + jnp.einsum(
        "bhs,bhsd->bhd", p, v, preferred_element_type=jnp.float32
    )

    @pl.when(s_i == n_s - 1)
    def _finish():
        o_ref[...] = (acc_scr[...] / l_scr[...][..., None]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("s_block", "interpret"))
def flash_decode_layer_attention(
    cache, layer_idx, q, k_new, v_new, mask, s_block: int = 64, interpret: bool = False
):
    """Decode attention for one layer against the full multi-layer cache.

    cache (L, 2, B, H, S, D) in HBM (any float dtype); layer_idx scalar int32;
    q / k_new / v_new (B, H, D); mask (B, S) bool = cache slots valid BEFORE
    this token (the write slot must be False). Returns (B, H, D) =
    softmax([masked cache logits; self logit]) @ [cache V; v_new], in q.dtype.

    S must be a multiple of ``s_block`` (t3_generate pads the cache length).
    """
    _, _, b, h, s, d = cache.shape
    assert s % s_block == 0, (s, s_block)
    b_blk = _pick_block(b, (16, 8, 4, 2, 1))
    grid = (b // b_blk, s // s_block)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, b_blk, h, s_block, d),
                lambda bi, si, lr: (lr[0], 0, bi, 0, si, 0),
            ),
            pl.BlockSpec(
                (1, 1, b_blk, h, s_block, d),
                lambda bi, si, lr: (lr[0], 1, bi, 0, si, 0),
            ),
            pl.BlockSpec((b_blk, h, d), lambda bi, si, lr: (bi, 0, 0)),
            pl.BlockSpec((b_blk, h, d), lambda bi, si, lr: (bi, 0, 0)),
            pl.BlockSpec((b_blk, h, d), lambda bi, si, lr: (bi, 0, 0)),
            pl.BlockSpec((b_blk, s_block), lambda bi, si, lr: (bi, si)),
        ],
        out_specs=pl.BlockSpec((b_blk, h, d), lambda bi, si, lr: (bi, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((b_blk, h), jnp.float32),
            pltpu.VMEM((b_blk, h), jnp.float32),
            pltpu.VMEM((b_blk, h, d), jnp.float32),
        ],
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, d), q.dtype),
        interpret=interpret,
    )(jnp.asarray([layer_idx], jnp.int32), cache, cache, q, k_new, v_new, mask)
