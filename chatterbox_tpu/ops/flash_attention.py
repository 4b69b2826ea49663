"""Pallas TPU kernel: fused self-attention for the S3Gen flow UNet.

The UNet's 56 transformer blocks at T~750, 16 CFG rows, 8 heads each
materialize a (B, H, T, T) f32 logits tensor in XLA (~288 MB per block,
write + read ~16 GB per UNet pass) -- the measured reason the flow stage
sits at ~35% MXU (PERFORMANCE.md r1). This kernel keeps the (Tq_blk, T)
logits tile in VMEM: QK^T -> masked softmax -> @V in one pass per
(batch, head, q-block) grid cell. No online-softmax accumulation is needed
because the full key length fits VMEM at these sequence lengths
(T <= ~2560 -> logits tile <= ~5 MB).

Mosaic-portability (this backend's older Mosaic, measured via
scripts/probe_ops.py): only row-form 2-D ops -- ``dot_general`` contracting
both last dims (transpose-rhs matmul) for QK^T, keepdims reductions,
(rows, 1)-broadcast arithmetic; no >2-D batched dots, no 1-D lane vectors.

Equivalent reference computation: diffusers Attention inside
BasicTransformerBlock (reference matcha/transformer.py:243-316, live config
s3gen.py:76-87).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl


def _pick_q_block(t: int, h_blk: int = 4, itemsize: int = 2) -> int:
    """Full-T q blocks win when they fit VMEM: (768, 4) measured 0.254 ms vs
    (256, 4) 0.286 at the live bf16 b8 shape (slope-timed, r3) -- fewer grid
    steps, bigger dots. VMEM estimate per cell: double-buffered q/k/v/out
    (h_blk heads, 64-wide) + the per-head (tq, t) f32 logits tile; 16 MB
    scoped limit, leave headroom (an f32 768-block run measured 17.3M and
    OOM'd compile)."""

    def fits(tq):
        qkvo = 2 * h_blk * (tq + 3 * t) * 64 * itemsize
        # ~3 live (tq, t) f32 tiles (logits, p, exp temp); 16 MB scoped VMEM
        return qkvo + 3 * tq * t * 4 <= 10_800_000

    if t <= 1024 and fits(t):
        return t
    for cand in (512, 256, 128):
        if t % cand == 0 and fits(cand):
            return cand
    return 128 if t % 128 == 0 else t


def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
    h_blk = q_ref.shape[1]
    scale = 1.0 / np.sqrt(q_ref.shape[-1])
    for hh in range(h_blk):  # static unroll over the cell's heads
        q = q_ref[0, hh]  # (Tq, D)
        k = k_ref[0, hh]  # (T, D)
        v = v_ref[0, hh]
        logits = (
            lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            * scale
        )  # (Tq, T)
        logits = logits + bias_ref[0, 0:1, :]  # (1, T) additive key bias
        m = jnp.max(logits, axis=1, keepdims=True)
        p = jnp.exp(logits - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        out = lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Tq, D)
        o_ref[0, hh] = (out / l).astype(o_ref.dtype)


def _packed_kernel(qkv_q_ref, qkv_k_ref, qkv_v_ref, bias_ref, o_ref, *, n_heads, d):
    """Per-cell: q block (tq, H*D) + full-length k/v (T, H*D), all three
    SLICES OF THE PACKED (B, T, 3*H*D) qkv array -- no head transpose ever
    materializes. Heads are 64-aligned lane VALUE slices (measured to lower
    on this Mosaic, r3 probe); per-head math is the same row-form 2-D
    dot/softmax as _kernel."""
    xq = qkv_q_ref[0]  # (tq, H*D)
    xk = qkv_k_ref[0]  # (T, H*D)
    xv = qkv_v_ref[0]
    bias = bias_ref[0, 0:1, :]  # (1, T)
    scale = 1.0 / np.sqrt(d)
    outs = []
    for hh in range(n_heads):
        sl = slice(hh * d, (hh + 1) * d)
        q = xq[:, sl]
        k = xk[:, sl]
        v = xv[:, sl]
        logits = (
            lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            * scale
            + bias
        )  # (tq, T)
        m = jnp.max(logits, axis=1, keepdims=True)
        p = jnp.exp(logits - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        out = lax.dot_general(
            (p / l).astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (tq, D)
        outs.append(out)
    o_ref[0] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


def _pick_q_block_packed(t: int, hd: int, itemsize: int) -> int:
    def fits(tq):
        kv = 2 * 2 * t * hd * itemsize  # double-buffered k/v blocks
        q_o = 2 * (tq * hd * itemsize * 2)
        return kv + q_o + 3 * tq * t * 4 <= 10_800_000

    if fits(t):
        return t
    for cand in (512, 256, 128):
        if t % cand == 0 and fits(cand):
            return cand
    return 128


@functools.partial(jax.jit, static_argnames=("n_heads", "interpret", "q_block"))
def flash_self_attention_packed(
    qkv, key_bias=None, n_heads: int = 8, interpret: bool = False, q_block: int = 0
):
    """Fused self-attention reading the PACKED projection output directly.

    qkv (B, T, 3*H*D) = the to_qkv GEMM output, T % 128 == 0; returns
    (B, T, H*D) ready for the output projection. Exact softmax, full
    (non-causal) attention with an additive (B, T) key bias.

    Why: the (B,T,H,D)->(B,H,T,D) head transposes around the unpacked
    kernel are physical HBM copies that cannot fuse across the custom-call
    boundary -- measured 1.2 ms/block at 64 CFG rows (~half the in-graph
    attention cost, and the source of the CFM's superlinear batch scaling).
    This kernel's operands are lane-dim BLOCKS of the qkv array itself
    (q cols [0, HD), k [HD, 2HD), v [2HD, 3HD)); heads are 64-aligned lane
    value slices in VMEM (measured to lower on this Mosaic, r3)."""
    b, t, chd = qkv.shape
    assert t % 128 == 0, t
    hd = chd // 3
    d = hd // n_heads
    tq = int(q_block) if q_block else _pick_q_block_packed(t, hd, qkv.dtype.itemsize)
    assert t % tq == 0, (t, tq)
    grid = (b, t // tq)

    if key_bias is None:
        key_bias = jnp.zeros((b, t), jnp.float32)
    bias3 = jnp.tile(key_bias.astype(jnp.float32)[:, None, :], (1, 8, 1))

    return pl.pallas_call(
        functools.partial(_packed_kernel, n_heads=n_heads, d=d),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tq, hd), lambda bi, qi: (bi, qi, 0)),
            pl.BlockSpec((1, t, hd), lambda bi, qi: (bi, 0, 1)),
            pl.BlockSpec((1, t, hd), lambda bi, qi: (bi, 0, 2)),
            pl.BlockSpec((1, 8, t), lambda bi, qi: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tq, hd), lambda bi, qi: (bi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t, hd), qkv.dtype),
        interpret=interpret,
    )(qkv, qkv, qkv, bias3)


@functools.partial(
    jax.jit, static_argnames=("interpret", "q_block", "heads_per_cell")
)
def flash_self_attention(
    q, k, v, key_bias=None, interpret: bool = False,
    q_block: int = 0, heads_per_cell: int = 1,
):
    """q, k, v (B, H, T, D) with T % 128 == 0; key_bias (B, T) additive f32
    (0 = keep, large negative = masked) or None. Returns (B, H, T, D) in
    q.dtype. Full (non-causal) attention, exact softmax per q row.

    ``q_block`` (0 = auto) and ``heads_per_cell`` set grid granularity:
    more heads per cell amortize grid-step overhead at the cost of VMEM
    (h_blk*(Tq+2T)*D*2 + Tq*T*4 logits bytes). Check numerics with
    scripts/probe_flash_attn_check.py and timing with
    scripts/probe_flash_attn_tiles.py before changing the call-site
    defaults (an earlier hb>1 sweep measured garbage: the BlockSpecs were
    1-head-wide while the grid shrank, leaving heads >= h//h_blk
    unwritten)."""
    b, h, t, d = q.shape
    assert t % 128 == 0, t
    h_blk = int(heads_per_cell)
    tq = int(q_block) if q_block else _pick_q_block(t, h_blk, q.dtype.itemsize)
    assert h % h_blk == 0 and t % tq == 0, (h, h_blk, t, tq)
    grid = (b, h // h_blk, t // tq)

    if key_bias is None:
        key_bias = jnp.zeros((b, t), jnp.float32)
    # tile to (B, 8, T) so the kernel's block read is static/aligned
    bias3 = jnp.tile(key_bias.astype(jnp.float32)[:, None, :], (1, 8, 1))

    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h_blk, tq, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, h_blk, t, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, h_blk, t, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 8, t), lambda bi, hi, qi: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h_blk, tq, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, t, d), q.dtype),
        interpret=interpret,
    )(q, k, v, bias3)


def _pick_relpos_q_block(t: int) -> int:
    """Largest 128-multiple divisor of t whose (tq, T) f32 logits stay
    within ~6 MB of scoped VMEM. At the conformer's 250-token bucket
    (T=768) this returns the full T (one q block -- the original shape);
    the long-form 1000-token bucket (T=2304) would need 2*21 MB of logits
    un-blocked and exceeded the 16 MB scoped-vmem limit at compile
    (measured r4: b8@1000 'Ran out of memory in memory space vmem')."""
    best = 128
    for tq in range(128, t + 1, 128):
        if t % tq == 0 and tq * t * 4 <= 6 * 1024 * 1024:
            best = tq
    return best


def _relpos_kernel(qu_ref, qh_ref, k_ref, sh_ref, v_ref, bias_ref, o_ref,
                   *, heads_per_cell, d, c, scale):
    """Conformer rel-pos attention, flash form (see
    flash_relpos_attention). Per head: scores = (q_u . k^T + qhat . shat^T)
    * scale + bias -- the ESPnet rel-shift term bd[t,s] = q_v . W_pos
    pe(t-s) decomposed EXACTLY into a rope-rotated C-wide query (qhat)
    against the absolute sinusoid table (shat); no (T, 2T-1) tensor and no
    shift exist anywhere."""
    bias = bias_ref[0, 0:1, :]  # (1, T)
    outs = []
    for hh in range(heads_per_cell):
        qu = qu_ref[0][:, hh * d : (hh + 1) * d]       # (Tq, D)
        qh = qh_ref[0][:, hh * c : (hh + 1) * c]       # (Tq, C)
        k = k_ref[0][:, hh * d : (hh + 1) * d]         # (T, D)
        v = v_ref[0][:, hh * d : (hh + 1) * d]
        sh = sh_ref[0]                                  # (T, C)
        ac = lax.dot_general(
            qu, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        bd = lax.dot_general(
            qh, sh.astype(qh.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        logits = (ac + bd) * scale + bias  # (Tq, T)
        m = jnp.max(logits, axis=1, keepdims=True)
        p = jnp.exp(logits - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        out = lax.dot_general(
            (p / l).astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append(out)
    o_ref[0] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("n_heads", "scale", "interpret", "heads_per_cell")
)
def flash_relpos_attention(
    q_u, q_hat, k, s_hat, v, key_bias, n_heads: int, scale: float,
    interpret: bool = False, heads_per_cell: int = 2,
):
    """ESPnet rel-pos self-attention (Transformer-XL style) fused in VMEM.

    q_u, k, v: (B, T, H*D) packed; q_hat: (B, T, H*C) the rope-decomposed
    bd query (C = model width); s_hat: (1, T, C) absolute sinusoid table
    (shared across heads); key_bias (B, T) additive f32. T % 128 == 0.
    Returns (B, T, H*D).

    Replaces the dense path's (B, H, T, T) ac + (B, H, T, 2T-1) bd
    materialization + rel-shift (conformer.py): the bd term is computed
    DIRECTLY as qhat @ shat^T inside the kernel via the exact sinusoid
    angle-addition decomposition (see rel_pos_attention_flash)."""
    b, t, hd = q_u.shape
    assert t % 128 == 0, t
    d = hd // n_heads
    c = q_hat.shape[-1] // n_heads
    h_blk = int(heads_per_cell)
    assert n_heads % h_blk == 0 and (h_blk * d) % 128 == 0, (n_heads, h_blk, d)
    # q rides a third grid dim so the per-cell (Tq, T) logits stay inside
    # scoped VMEM at long-form T (no change at T=768: tq == t there); K/V
    # and the sinusoid table stay full-T (qi innermost reuses them)
    tq = _pick_relpos_q_block(t)
    grid = (b, n_heads // h_blk, t // tq)
    bias3 = jnp.tile(key_bias.astype(jnp.float32)[:, None, :], (1, 8, 1))

    return pl.pallas_call(
        functools.partial(
            _relpos_kernel, heads_per_cell=h_blk, d=d, c=c, scale=scale
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tq, h_blk * d), lambda bi, hi, qi: (bi, qi, hi)),
            pl.BlockSpec((1, tq, h_blk * c), lambda bi, hi, qi: (bi, qi, hi)),
            pl.BlockSpec((1, t, h_blk * d), lambda bi, hi, qi: (bi, 0, hi)),
            pl.BlockSpec((1, t, c), lambda bi, hi, qi: (0, 0, 0)),
            pl.BlockSpec((1, t, h_blk * d), lambda bi, hi, qi: (bi, 0, hi)),
            pl.BlockSpec((1, 8, t), lambda bi, hi, qi: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, tq, h_blk * d), lambda bi, hi, qi: (bi, qi, hi)
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, hd), q_u.dtype),
        interpret=interpret,
    )(q_u, q_hat, k, s_hat, v, bias3)
