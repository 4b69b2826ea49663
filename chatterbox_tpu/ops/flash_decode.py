"""Pallas TPU kernel: single-token decode attention reading the KV cache
straight from HBM, layer-indexed and runtime-length-truncated.

Why this exists (round-2 redesign): the T3 decode step scans over layers with
the cache as a read-only ``lax.scan`` input; XLA materializes each layer's
(2, B, H, S, D) slice before the attention einsum -- one full cache copy per
token (~1.25 GB at 16 CFG rows, measured +1.5 ms/step on v5e). Worse, every
XLA variant (scanned or unrolled) must read the FULL padded cache each step,
live or not. This kernel fixes both structurally:

  1. **Zero-copy layer read**: the full (L, 2, B, H, S, D) cache stays in
     HBM; BlockSpec ``index_map``s use a scalar-prefetched layer index to DMA
     exactly layer i's (H, S_blk, D) tiles into VMEM.
  2. **Runtime truncation**: a prefetched scalar gives the number of LIVE
     S-blocks (cache slots < current length). The S index_map clamps beyond
     it, so trailing grid steps revisit the same block -- Pallas skips the
     re-DMA -- and ``pl.when`` skips their compute. Average traffic over a
     decode is ~(prefill + T/2) / S_max of the cache instead of 1.0.

The CURRENT token's K/V (not yet written to the cache) enter as separate
(B, H, D) operands and seed the online softmax at the first S block --
softmax([cache logits; self logit]) without concatenating on the S axis.

Validity is computed IN-KERNEL from scalars (no mask operand): slot i of row
b is attendable iff ``i < row_prefix[b]`` or ``gap_end <= i < cur_len`` --
exactly the T3 cache layout [cond; text (right-padded); BOS*; decoded...]
where only the text padding gap is invalid. A pure prefix mask is the
special case ``gap_end == cur_len``.

Mosaic-portability note: the compute uses only per-head 1-D/2-D ops
(lane-reductions, scalar max, ``p[None, :] @ v``) in a static H-loop --
batched >2-D dots and sublane<->lane relayouts do not lower on this
backend's Mosaic version (measured: dot_dimension_numbers parse failure and
"unsupported shape cast" respectively).

Round-1's per-(batch, head)-cell kernel lost to XLA dense (12.5 ms vs
10.3 ms scanned; grid too fine). Equivalent reference computation: the
decode-loop SDPA over ``past_key_values`` (reference t3/t3.py:319-367).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S_BLOCK = 128  # cache S tiling; DMA run per (h) = 16 KB bf16
TAIL_W = 8  # SD-tail length: tokens buffered between (D,S)-cache merges


def _kernel(scal_ref, prefix_ref, kc_ref, vc_ref, q_ref, kn_ref, vn_ref,
            *rest, ds_layout=False, tail_w=0, quant=False, interp=False,
            bd_heads=False, stats_out=False):
    rest = list(rest)
    sck_ref = scv_ref = None
    qp_ref = None
    ml_ref = None
    if bd_heads:
        qp_ref = rest[0]  # (b_blk, 1, H*D) packed q rows
        rest = rest[1:]
    if quant:
        sck_ref, scv_ref = rest[:2]
        rest = rest[2:]
    if tail_w:
        tk_ref, tv_ref = rest[:2]
        rest = rest[2:]
    pos_ref, o_ref = rest[0], rest[1]
    if stats_out:
        # second output: final online-softmax stats, (b_blk, h, 1, d)
        # broadcast like the scratches (m everywhere in even lanes is
        # overkill -- the whole (1, d) row carries m, a second row-broadcast
        # carries l via the last-dim split below). Lets XLA reconstruct
        # EXACT softmax probs for any cache slice (the alignment watchdog's
        # layer-9 text read) without a second attention pass.
        ml_ref = rest[2]
        m_scr, l_scr, acc_scr = rest[3:]
    else:
        m_scr, l_scr, acc_scr = rest[2:]
    b_i = pl.program_id(0)
    s_i = pl.program_id(1)
    n_s = pl.num_programs(1)
    n_live, cur_len, gap_end = scal_ref[1], scal_ref[2], scal_ref[3]
    # cache slots >= ds_end live in the tail operand, not the (D, S) cache
    ds_end = scal_ref[4] if tail_w else cur_len
    b_blk, h, d = q_ref.shape[0], q_ref.shape[1], q_ref.shape[3]
    scale = 1.0 / np.sqrt(d)
    neg = jnp.float32(jnp.finfo(jnp.float32).min)

    @pl.when(s_i == 0)
    def _init():
        # seed the online softmax with the current token's self-attention.
        # EVERYTHING per-head is row-form 2-D: (1, Sb)/(1, D) vectors,
        # keepdims reductions to (1, 1), transpose-rhs dot_general for QK^T
        # -- the only shapes this backend's Mosaic relayouts reliably
        # (lane-reductions to 1-D vectors and scalar extractions do not
        # lower; see scripts/probe_ops.py). m/l stats are (1, D)-broadcast.
        zero = jnp.zeros((1, d), jnp.float32)
        for rr in range(b_blk):
            for hh in range(h):
                q_h = q_ref[rr, hh].astype(jnp.float32)  # (1, D)
                kn_h = kn_ref[rr, hh].astype(jnp.float32)
                m0 = jnp.sum(q_h * kn_h, axis=1, keepdims=True) * scale  # (1, 1)
                m_scr[rr, hh] = zero + m0
                l_scr[rr, hh] = zero + 1.0
                acc_scr[rr, hh] = vn_ref[rr, hh].astype(jnp.float32)  # (1, D)
        if tail_w:
            # fold the SD-layout tail (last <=W tokens, not yet merged into
            # the (D,S) cache) into the running stats -- same row-form math
            # as an SD cache block, W lanes wide
            wpos = ds_end + lax.broadcasted_iota(jnp.int32, (1, tail_w), 1)
            for rr in range(b_blk):
                rp = prefix_ref[b_i * b_blk + rr]
                valid = (wpos < rp) | ((wpos >= gap_end) & (wpos < cur_len))
                bias = jnp.where(valid, 0.0, neg)  # (1, W)
                for hh in range(h):
                    kt_h = tk_ref[0, 0, rr, hh]  # (W, D)
                    vt_h = tv_ref[0, 0, rr, hh]
                    q_h = q_ref[rr, hh].astype(kt_h.dtype)
                    qk = lax.dot_general(
                        q_h, kt_h, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (1, W)
                    scores = qk * scale + bias
                    m_blk = jnp.max(scores, axis=1, keepdims=True)
                    p = jnp.exp(scores - m_blk)
                    l_blk = jnp.sum(p, axis=1, keepdims=True)
                    pv = lax.dot_general(
                        p.astype(vt_h.dtype), vt_h, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (1, D)
                    m_prev = m_scr[rr, hh]
                    m_new = jnp.maximum(m_prev, zero + m_blk)
                    alpha = jnp.exp(m_prev - m_new)
                    beta = jnp.exp((zero + m_blk) - m_new)
                    m_scr[rr, hh] = m_new
                    l_scr[rr, hh] = l_scr[rr, hh] * alpha + l_blk * beta
                    acc_scr[rr, hh] = acc_scr[rr, hh] * alpha + pv * beta

    def _accumulate_bd():
        # ALL-HEADS block-diagonal form (r3): replaces the per-head loop's
        # 2*h tiny single-row dots with 3 wide dots per row -- the per-head
        # loop was MXU-instruction-latency-bound (kernel measured 317 GB/s
        # vs its 545 GB/s DMA floor). Correctness: with q laid out
        # block-diagonally (row g of qbd holds q_g in lanes [g*d,(g+1)*d)),
        # qbd @ [k tiles stacked (h*d, Sb)] gives row g = q_g . k_g exactly
        # (zero rows contribute nothing); PV computes all (h, h*d) pairs,
        # the block-diag mask keeps own-head terms, and a {0,1} selector
        # matmul repacks (h, h*d) -> (h, d). All ops are 2-D row-form +
        # leading-dim value reshapes (probed to lower on this Mosaic).
        pos = pos_ref[0, 0:1, :]  # (1, Sb) int32 absolute slot indices
        sub = lax.broadcasted_iota(jnp.int32, (h, h * d), 0)
        lane = lax.broadcasted_iota(jnp.int32, (h, h * d), 1)
        bd = (lane // d == sub).astype(jnp.float32)  # (h, h*d)
        sel_dtype = kc_ref.dtype
        sel = (
            lax.broadcasted_iota(jnp.int32, (h * d, d), 0) % d
            == lax.broadcasted_iota(jnp.int32, (h * d, d), 1)
        ).astype(sel_dtype)  # (h*d, d) repack selector
        for rr in range(b_blk):
            rp = prefix_ref[b_i * b_blk + rr]
            valid = ((pos < rp) | ((pos >= gap_end) & (pos < cur_len))) & (pos < ds_end)
            bias = jnp.where(valid, 0.0, neg)  # (1, Sb) f32
            kf = kc_ref[0, 0, rr].reshape(h * d, -1)  # (H*D, Sb) stacked tiles
            vf = vc_ref[0, 0, rr].reshape(h * d, -1)
            qp = qp_ref[rr].astype(jnp.float32)  # (1, H*D)
            qbd = (bd * qp).astype(kf.dtype)  # (h, H*D) block-diagonal q
            logits = lax.dot_general(
                qbd, kf, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (h, Sb): row g = q_g . k_g
            scores = logits * scale + bias
            m_blk = jnp.max(scores, axis=1, keepdims=True)  # (h, 1)
            p = jnp.exp(scores - m_blk)
            l_blk = jnp.sum(p, axis=1, keepdims=True)  # (h, 1)
            allg = lax.dot_general(
                p.astype(vf.dtype), vf, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (h, H*D) all-pairs p_h . v_g
            pv = lax.dot_general(
                (allg * bd).astype(sel_dtype), sel,
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )  # (h, D) own-head rows repacked
            m_prev = m_scr[rr].reshape(h, d)
            m_new = jnp.maximum(m_prev, m_blk + jnp.zeros((h, d), jnp.float32))
            alpha = jnp.exp(m_prev - m_new)
            beta = jnp.exp((m_blk + jnp.zeros((h, d), jnp.float32)) - m_new)
            m_scr[rr] = m_new.reshape(h, 1, d)
            l_scr[rr] = (l_scr[rr].reshape(h, d) * alpha
                         + (l_blk + jnp.zeros((h, d), jnp.float32)) * beta).reshape(h, 1, d)
            acc_scr[rr] = (acc_scr[rr].reshape(h, d) * alpha + pv * beta).reshape(h, 1, d)

    def _accumulate():
        # validity from static tile-aligned position rows + SMEM scalars --
        # no dynamic vector loads (Mosaic rejects unaligned dynamic indices)
        pos = pos_ref[0, 0:1, :]  # (1, Sb) int32 absolute slot indices
        zero = jnp.zeros((1, d), jnp.float32)
        for rr in range(b_blk):  # static unroll: row-form 2-D ops only
            rp = prefix_ref[b_i * b_blk + rr]
            valid = ((pos < rp) | ((pos >= gap_end) & (pos < cur_len))) & (pos < ds_end)
            bias = jnp.where(valid, 0.0, neg)  # (1, Sb) f32
            if quant:
                sck_row = sck_ref[0, 0, rr]  # (H, Sb) f32 per-token K scales
                scv_row = scv_ref[0, 0, rr]
            for hh in range(h):
                k_h = kc_ref[0, 0, rr, hh]  # (Sb, D) or (D, Sb) cache dtype
                v_h = vc_ref[0, 0, rr, hh]
                if quant and interp:
                    # interpret mode (CPU tests): XLA rejects mixed-dtype
                    # dots -- dequantize the int8 tiles up front instead
                    k_h = k_h.astype(jnp.float32)
                    v_h = v_h.astype(jnp.float32)
                q_h = q_ref[rr, hh].astype(
                    jnp.float32 if quant else k_h.dtype
                )  # (1, D); int8 K keeps q in f32 (mixed f32 x i8 dot)
                if ds_layout:
                    # (D, S) cache tiles: S rides the 128-lane axis with no
                    # tile padding (D=64 lanes pad 2x). QK^T is a standard
                    # (1,D)@(D,Sb) matmul; PV contracts both lane dims.
                    qk = lax.dot_general(
                        q_h, k_h, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (1, Sb)
                else:
                    qk = lax.dot_general(
                        q_h, k_h, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (1, Sb): QK^T as a transpose-rhs matmul, no relayout
                if quant:
                    # per-token symmetric int8: k ~= k_i8 * scale_tok, so the
                    # scale folds into the logits as a (1, Sb) row multiply
                    qk = qk * sck_row[hh : hh + 1, :]
                scores = qk * scale + bias
                m_blk = jnp.max(scores, axis=1, keepdims=True)  # (1, 1)
                p = jnp.exp(scores - m_blk)  # (1, Sb)
                l_blk = jnp.sum(p, axis=1, keepdims=True)  # (1, 1)
                if quant:
                    # fold the V scales into the probs (row-form), keep the
                    # PV contraction as a mixed f32 x int8 dot
                    p_v = p * scv_row[hh : hh + 1, :]
                else:
                    p_v = p.astype(v_h.dtype)
                pv = lax.dot_general(
                    p_v, v_h,
                    (((1,), (1,)), ((), ())) if ds_layout else (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (1, D)
                m_prev = m_scr[rr, hh]  # (1, D) broadcast stats
                m_new = jnp.maximum(m_prev, zero + m_blk)
                alpha = jnp.exp(m_prev - m_new)
                beta = jnp.exp((zero + m_blk) - m_new)
                m_scr[rr, hh] = m_new
                l_scr[rr, hh] = l_scr[rr, hh] * alpha + l_blk * beta
                acc_scr[rr, hh] = acc_scr[rr, hh] * alpha + pv * beta

    pl.when(s_i < n_live)(_accumulate_bd if bd_heads else _accumulate)

    @pl.when(s_i == n_s - 1)
    def _finish():
        for rr in range(b_blk):
            for hh in range(h):
                o_ref[rr, hh] = (acc_scr[rr, hh] / l_scr[rr, hh]).astype(o_ref.dtype)
                if stats_out:
                    # m in lanes [0, d), l in lanes [d, 2d) -- a 64-aligned
                    # lane concat of the (1, d)-broadcast stats rows
                    ml_ref[rr, hh] = jnp.concatenate(
                        [m_scr[rr, hh], l_scr[rr, hh]], axis=1
                    ).astype(ml_ref.dtype)


def _merge_kernel(scal_ref, c_ref, n_ref, o_ref):
    """Masked read-modify-write of W lane columns of the (D, S) cache:
    o[:, off + j] = new[:, j] for j < W, o elsewhere = old. The column
    placement is a one-hot (W, Sb) matmul (exact: one term per output
    column); masks/selects are (1, Sb) row-form -- Mosaic-portable."""
    off = scal_ref[1]
    b_blk, h = c_ref.shape[2], c_ref.shape[3]
    s_b = c_ref.shape[-1]
    w = n_ref.shape[-1]
    lane = lax.broadcasted_iota(jnp.int32, (1, s_b), 1)
    mask = (lane >= off) & (lane < off + w)  # (1, Sb)
    col = lax.broadcasted_iota(jnp.int32, (w, s_b), 1)
    row = lax.broadcasted_iota(jnp.int32, (w, s_b), 0)
    sel = (col == row + off).astype(jnp.float32)  # (W, Sb) one-hot
    for rr in range(b_blk):
        for hh in range(h):
            old = c_ref[0, 0, rr, hh]  # (D, Sb)
            new = n_ref[0, 0, rr, hh].astype(jnp.float32)  # (D, W)
            scat = lax.dot_general(
                new, sel, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(old.dtype)  # (D, Sb)
            o_ref[0, 0, rr, hh] = jnp.where(mask, scat, old)


@functools.partial(jax.jit, static_argnames=("interpret", "s_block", "rows_per_cell"))
def flash_cache_merge_ds(cache, new_cols, pos, interpret: bool = False,
                         s_block: int = S_BLOCK, rows_per_cell=8):
    """Merge W consecutive K/V columns into the (L, 2, B, H, D, S) cache at
    slots [pos, pos+W) IN PLACE (the cache operand is aliased to the output).

    XLA's ``dynamic_update_slice`` at a dynamic LANE offset is not done in
    place inside a while_loop on this backend -- it materializes a full cache
    copy per call (measured: +3.4 ms at 16 CFG rows). This kernel RMWs only
    the (D, s_block) tile column containing the slots; amortized over W
    decode steps (the tail design, see flash_decode_layer_attention) the
    write cost is ~cache_bytes / (S/s_block) / W per token.

    cache (L,2,B,H,D,S); new_cols (L,2,B,H,D,W) with W <= s_block and
    [pos, pos+W) within one s_block (guaranteed when W | pos); pos int32.
    """
    if interpret:
        # interpret mode does not model aliasing: grid cells only write the
        # one touched S-block, so the rest of the output would be undefined.
        # The XLA update is numerically identical (and fine on CPU).
        return lax.dynamic_update_slice(
            cache, new_cols.astype(cache.dtype), (0, 0, 0, 0, 0, pos)
        )
    l, two, b, h, d, s = cache.shape
    s_blk = int(s_block)
    b_blk = int(rows_per_cell)
    while b % b_blk:
        b_blk //= 2
    scalars = jnp.stack(
        [jnp.asarray(pos // s_blk, jnp.int32), jnp.asarray(pos % s_blk, jnp.int32)]
    )
    grid = (l, two, b // b_blk)

    def c_map(li, ki, bi, sc):
        return (li, ki, bi, 0, 0, sc[0])

    def n_map(li, ki, bi, sc):
        return (li, ki, bi, 0, 0, 0)

    w = new_cols.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, b_blk, h, d, s_blk), c_map),
            pl.BlockSpec((1, 1, b_blk, h, d, w), n_map),
        ],
        out_specs=pl.BlockSpec((1, 1, b_blk, h, d, s_blk), c_map),
    )
    return pl.pallas_call(
        _merge_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(cache.shape, cache.dtype),
        input_output_aliases={1: 0},  # cache operand (after the scalar) -> out
        interpret=interpret,
    )(scalars, cache, new_cols.astype(cache.dtype))


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "s_block", "rows_per_cell", "ds_layout",
                     "return_stats"),
)
def flash_decode_layer_attention(
    cache, layer_idx, cur_len, row_prefix, gap_end, q, k_new, v_new,
    tail=None, merge_base=None, scales=None,
    interpret: bool = False, s_block: int = S_BLOCK, rows_per_cell=None,
    ds_layout: bool = False, return_stats: bool = False,
):
    """Decode attention for one layer against the full multi-layer cache.

    cache (L, 2, B, H, S, D) in HBM (any float dtype), S % s_block == 0 --
    or (L, 2, B, H, D, S) with ``ds_layout=True``, which puts S on the
    128-lane axis so the HBM array has NO tile padding (the (S, D) layout
    pads D 64->128: 2x memory and read bandwidth);
    layer_idx, cur_len scalars int32 (cur_len = 1 + max valid slot; S blocks
    past it are neither DMA'd nor computed); row_prefix (B,) int32 and
    gap_end scalar int32 define validity: slot i of row b is attended iff
    ``i < row_prefix[b]`` or ``gap_end <= i < cur_len`` (prefix-mask callers
    pass gap_end == cur_len). q / k_new / v_new (B, H, D) = current token.
    Returns (B, H, D) = softmax([valid cache logits; self logit]) @
    [cache V; v_new], in q.dtype.

    ``tail`` (L, 2, B, H, W, D) + ``merge_base`` (scalar int32, multiple of
    W): the last few tokens' K/V in SD layout (ds_layout only). Cache slots
    >= merge_base are read from the tail (slot merge_base + w) instead of
    the (D, S) cache; the caller appends each token to the tail with a cheap
    sublane-offset update and merges W columns at once into the (D, S) cache
    via ``flash_cache_merge_ds`` -- a per-step LANE-offset cache write is
    either a full XLA cache copy or a (D, 128)-column RMW, both measured
    slower than this split (scripts/probe_cache_write*.py).

    ``return_stats=True`` additionally returns the final online-softmax
    stats (m, l) as (B, H) f32 each: ``softmax_prob(slot s of head h) ==
    exp(score_h(s) - m[b, h]) / l[b, h]`` for ANY valid slot -- the exact
    global normalization over [all valid cache slots; tail; self]. The
    alignment watchdog uses this to reconstruct layer-9 text-slice
    attention with one tiny XLA matmul instead of abandoning the kernel
    for the 1.9x-slower XLA decode step (docs/PERFORMANCE.md r5).

    ``scales`` (L, 2, B, H, S) f32: per-token symmetric int8 quantization
    scales when the (D, S) cache is int8 (halves the dominant HBM traffic;
    k ~= k_i8 * scale). QK^T / PV run as mixed f32 x int8 dots with the K
    scale folded into the logits row and the V scale into the probs row --
    both (1, Sb) row-form multiplies, Mosaic-portable
    (scripts/probe_int8_cache.py). The bf16 tail keeps the most recent
    tokens (and the current token's self-attention) exact.
    """
    if ds_layout:
        _, _, b, h, d, s = cache.shape
    else:
        _, _, b, h, s, d = cache.shape
    s_blk = int(s_block)
    assert s % s_blk == 0 and s_blk % 8 == 0, (s, s_blk)
    assert tail is None or ds_layout, "the SD tail only pairs with the (D,S) cache"
    quant = cache.dtype == jnp.int8
    if quant:
        assert ds_layout and tail is not None and scales is not None, (
            "the int8 cache requires the (D,S) layout, the bf16 SD tail and "
            "per-token scales"
        )
    tail_w = 0 if tail is None else int(tail.shape[4])
    # rows per grid cell: amortizes grid-step overhead (measured ~45% of
    # kernel time at one row per cell); VMEM = b_blk * s_blk * h * d * 2B * 2.
    # 8 rows/cell measured best with the pad-free (D,S)+tail layout
    # (slope-timed r3: 1.554 vs 1.590 ms/step at 16 CFG rows, 12.07 vs
    # 12.79 at 128). The legacy (S,D) layout pads D to 128 lanes -- its
    # 8-row double-buffered blocks are 16.8 MB and OOM scoped VMEM.
    if rows_per_cell is not None:
        b_blk = int(rows_per_cell)
        assert b % b_blk == 0, (b, b_blk)
    else:
        cands = (8, 4, 2) if ds_layout else (4, 2)
        b_blk = next((c for c in cands if b % c == 0), 1)
    grid = (b // b_blk, s // s_blk)

    # absolute slot indices, pre-tiled (n_s, 8, s_blk) so the kernel's
    # block read is fully static/aligned (row 0 of each 8-row tile is used)
    positions = jnp.tile(
        jnp.arange(s, dtype=jnp.int32).reshape(s // s_blk, 1, s_blk), (1, 8, 1)
    )

    # live S-blocks: everything the kernel must read from the (D,S)/(S,D)
    # cache -- with a tail, slots >= merge_base come from the tail instead
    ds_end = cur_len if tail is None else merge_base
    n_live = (ds_end + s_blk - 1) // s_blk
    n_live = jnp.clip(n_live, 1, s // s_blk).astype(jnp.int32)
    scalars = jnp.stack(
        [
            jnp.asarray(layer_idx, jnp.int32),
            n_live,
            jnp.asarray(cur_len, jnp.int32),
            jnp.asarray(gap_end, jnp.int32),
            jnp.asarray(merge_base if tail is not None else cur_len, jnp.int32),
        ]
    )

    def kc_map(bi, si, lr, pr):
        return (lr[0], 0, bi, 0, jnp.minimum(si, lr[1] - 1), 0)

    def vc_map(bi, si, lr, pr):
        return (lr[0], 1, bi, 0, jnp.minimum(si, lr[1] - 1), 0)

    def row_map(bi, si, lr, pr):
        return (bi, 0, 0, 0)

    if ds_layout:
        cache_block = (1, 1, b_blk, h, d, s_blk)

        def kc_map(bi, si, lr, pr):  # noqa: F811 -- (D, S) minor dims
            return (lr[0], 0, bi, 0, 0, jnp.minimum(si, lr[1] - 1))

        def vc_map(bi, si, lr, pr):  # noqa: F811
            return (lr[0], 1, bi, 0, 0, jnp.minimum(si, lr[1] - 1))

    else:
        cache_block = (1, 1, b_blk, h, s_blk, d)

    # all-heads block-diagonal accumulate (see _kernel): ds-layout bf16 path
    # only; it needs q ALSO in packed (B, 1, H*D) layout (a free reshape)
    bd_heads = ds_layout and not quant and d % 8 == 0 and (h * d) % 128 == 0
    in_specs = [
        pl.BlockSpec(cache_block, kc_map),
        pl.BlockSpec(cache_block, vc_map),
        pl.BlockSpec((b_blk, h, 1, d), row_map),
        pl.BlockSpec((b_blk, h, 1, d), row_map),
        pl.BlockSpec((b_blk, h, 1, d), row_map),
    ]
    operands = [
        cache,
        cache,
        q[:, :, None],
        k_new[:, :, None],
        v_new[:, :, None],
    ]
    if bd_heads:
        in_specs.append(
            pl.BlockSpec((b_blk, 1, h * d), lambda bi, si, lr, pr: (bi, 0, 0))
        )
        operands.append(q.reshape(b, 1, h * d))
    if quant:
        # per-token scale rows, same S-block walk as the cache tiles
        def sck_map(bi, si, lr, pr):
            return (lr[0], 0, bi, 0, jnp.minimum(si, lr[1] - 1))

        def scv_map(bi, si, lr, pr):
            return (lr[0], 1, bi, 0, jnp.minimum(si, lr[1] - 1))

        sc_block = (1, 1, b_blk, h, s_blk)
        in_specs += [pl.BlockSpec(sc_block, sck_map), pl.BlockSpec(sc_block, scv_map)]
        operands += [scales, scales]
    if tail is not None:
        tail_block = (1, 1, b_blk, h, tail_w, d)

        def tk_map(bi, si, lr, pr):
            return (lr[0], 0, bi, 0, 0, 0)

        def tv_map(bi, si, lr, pr):
            return (lr[0], 1, bi, 0, 0, 0)

        in_specs += [pl.BlockSpec(tail_block, tk_map), pl.BlockSpec(tail_block, tv_map)]
        operands += [tail, tail]
    in_specs.append(pl.BlockSpec((1, 8, s_blk), lambda bi, si, lr, pr: (si, 0, 0)))
    operands.append(positions)

    out_specs = pl.BlockSpec((b_blk, h, 1, d), row_map)
    out_shape = jax.ShapeDtypeStruct((b, h, 1, d), q.dtype)
    if return_stats:
        out_specs = [
            out_specs,
            pl.BlockSpec((b_blk, h, 1, 2 * d), row_map),
        ]
        out_shape = [out_shape, jax.ShapeDtypeStruct((b, h, 1, 2 * d), jnp.float32)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((b_blk, h, 1, d), jnp.float32),
            pltpu.VMEM((b_blk, h, 1, d), jnp.float32),
            pltpu.VMEM((b_blk, h, 1, d), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, ds_layout=ds_layout, tail_w=tail_w, quant=quant,
            interp=interpret, bd_heads=bd_heads, stats_out=return_stats,
        ),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(scalars, jnp.asarray(row_prefix, jnp.int32), *operands)
    if return_stats:
        attn_out, ml = out
        return attn_out[:, :, 0], ml[:, :, 0, 0], ml[:, :, 0, d]
    return out[:, :, 0]
