"""Pallas kernel tests (interpret mode on CPU) vs the dense XLA reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chatterbox_tpu.ops.flash_decode import flash_decode_layer_attention


def _xla_ref(q, k_all, v_all, mask_all):
    """Dense attention over the already-appended sequence [cache; self]."""
    scale = 1.0 / np.sqrt(q.shape[-1])
    logits = jnp.einsum("bhd,bhsd->bhs", q, k_all).astype(jnp.float32) * scale
    logits = jnp.where(mask_all[:, None, :], logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhs,bhsd->bhd", probs, v_all.astype(jnp.float32)).astype(q.dtype)


def _valid_mask(s, row_prefix, gap_end, cur_len):
    idx = np.arange(s)[None]
    return jnp.asarray(
        (idx < np.asarray(row_prefix)[:, None]) | ((idx >= gap_end) & (idx < cur_len))
    )


def _ref_for(cache, layer, q, k_new, v_new, mask):
    k_all = jnp.concatenate([cache[layer, 0], k_new[:, :, None]], axis=2)
    v_all = jnp.concatenate([cache[layer, 1], v_new[:, :, None]], axis=2)
    mask_all = jnp.concatenate([mask, jnp.ones((mask.shape[0], 1), bool)], axis=1)
    return _xla_ref(q, k_all, v_all, mask_all)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("layer", [0, 2])
def test_flash_decode_layer_matches_xla(dtype, layer):
    rng = np.random.default_rng(0)
    l, b, h, s, d = 3, 4, 4, 256, 64
    cache = jnp.asarray(rng.standard_normal((l, 2, b, h, s, d)), dtype)
    q = jnp.asarray(rng.standard_normal((b, h, d)), dtype)
    k_new = jnp.asarray(rng.standard_normal((b, h, d)), dtype)
    v_new = jnp.asarray(rng.standard_normal((b, h, d)), dtype)
    # prefix-mask case: gap_end == cur_len, per-row prefixes
    prefix = np.array([100, 256, 1, 64], np.int32)
    cur = 256
    mask = _valid_mask(s, prefix, cur, cur)

    ref = _ref_for(cache, layer, q, k_new, v_new, mask)
    got = flash_decode_layer_attention(
        cache, jnp.int32(layer), jnp.int32(cur), jnp.asarray(prefix),
        jnp.int32(cur), q, k_new, v_new, interpret=True,
    )
    atol = 1e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=atol
    )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_flash_decode_ds_layout_matches_sd(dtype):
    """(L,2,B,H,D,S) transposed-cache variant == the (S,D) kernel (the DS
    layout keeps S on the 128-lane axis: no tile padding in HBM)."""
    rng = np.random.default_rng(3)
    l, b, h, s, d = 3, 4, 4, 256, 64
    cache = jnp.asarray(rng.standard_normal((l, 2, b, h, s, d)), dtype)
    q = jnp.asarray(rng.standard_normal((b, h, d)), dtype)
    kn = jnp.asarray(rng.standard_normal((b, h, d)), dtype)
    vn = jnp.asarray(rng.standard_normal((b, h, d)), dtype)
    prefix = np.array([30, 256, 1, 64], np.int32)
    cur, gap_end = 200, 180
    base = flash_decode_layer_attention(
        cache, jnp.int32(1), jnp.int32(cur), jnp.asarray(prefix),
        jnp.int32(gap_end), q, kn, vn, interpret=True,
    )
    got = flash_decode_layer_attention(
        jnp.swapaxes(cache, -1, -2), jnp.int32(1), jnp.int32(cur),
        jnp.asarray(prefix), jnp.int32(gap_end), q, kn, vn,
        interpret=True, ds_layout=True,
    )
    atol = 1e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(base, np.float32), atol=atol
    )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_flash_decode_ds_tail_matches_sd(dtype):
    """DS cache + SD tail (last W tokens not yet merged) == the plain SD
    kernel over the same logical slots. Slots >= merge_base in the DS cache
    are poisoned to prove the kernel reads them from the tail only."""
    rng = np.random.default_rng(7)
    l, b, h, s, d, w = 3, 4, 4, 256, 64, 8
    cache = jnp.asarray(rng.standard_normal((l, 2, b, h, s, d)), dtype)
    q = jnp.asarray(rng.standard_normal((b, h, d)), dtype)
    kn = jnp.asarray(rng.standard_normal((b, h, d)), dtype)
    vn = jnp.asarray(rng.standard_normal((b, h, d)), dtype)
    prefix = np.array([30, 140, 1, 64], np.int32)
    cur, gap_end = 141, 100  # merge_base = 136: tail holds slots [136, 141)
    mb = (cur // w) * w
    base = flash_decode_layer_attention(
        cache, jnp.int32(1), jnp.int32(cur), jnp.asarray(prefix),
        jnp.int32(gap_end), q, kn, vn, interpret=True,
    )
    tail = cache[:, :, :, :, mb : mb + w, :]
    # large-but-finite poison: masked slots are excluded via an additive
    # bias (flash convention), so they must not be NaN -- matching the real
    # cache, whose unmerged lanes hold zero padding or stale values
    poisoned = cache.at[:, :, :, :, mb:, :].set(1e4)
    got = flash_decode_layer_attention(
        jnp.swapaxes(poisoned, -1, -2), jnp.int32(1), jnp.int32(cur),
        jnp.asarray(prefix), jnp.int32(gap_end), q, kn, vn,
        tail=tail, merge_base=jnp.int32(mb), interpret=True, ds_layout=True,
    )
    atol = 1e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(base, np.float32), atol=atol
    )


def test_flash_decode_gap_and_truncation():
    """T3-shaped validity (interior text-padding gap) + runtime truncation:
    dead blocks may hold garbage (even non-finite) without leaking."""
    rng = np.random.default_rng(2)
    l, b, h, s, d = 2, 2, 4, 512, 64
    cache = rng.standard_normal((l, 2, b, h, s, d)).astype(np.float32)
    cur = 150  # live slots end here; blocks 2..3 are dead
    cache[:, :, :, :, 256:] = np.nan
    cache = jnp.asarray(cache)
    q = jnp.asarray(rng.standard_normal((b, h, d)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((b, h, d)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((b, h, d)), jnp.float32)
    prefix = np.array([40, 55], np.int32)  # cond+text per row
    gap_end = 70  # text bucket ends here; [70, cur) are BOS+decoded slots

    mask = _valid_mask(s, prefix, gap_end, cur)
    ref = _ref_for(jnp.nan_to_num(cache), 1, q, kn, vn, mask)
    got = flash_decode_layer_attention(
        cache, jnp.int32(1), jnp.int32(cur), jnp.asarray(prefix),
        jnp.int32(gap_end), q, kn, vn, interpret=True,
    )
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_flash_decode_inside_scan_matches_dense_decode():
    """Drive the kernel exactly as llama_decode_step does: scanned layers,
    dynamic layer index."""
    rng = np.random.default_rng(1)
    l, b, h, s, d = 2, 2, 4, 128, 32
    cache = jnp.asarray(rng.standard_normal((l, 2, b, h, s, d)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((b, h, d)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((b, h, d)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((b, h, d)), jnp.float32)
    prefix = np.array([50, 90], np.int32)
    cur = 90

    def body(_, lid):
        return None, flash_decode_layer_attention(
            cache, lid, jnp.int32(cur), jnp.asarray(prefix), jnp.int32(cur),
            q, kn, vn, interpret=True,
        )

    _, outs = jax.lax.scan(body, None, jnp.arange(l, dtype=jnp.int32))
    mask = _valid_mask(s, prefix, cur, cur)
    for lid in range(l):
        ref = _ref_for(cache, lid, q, kn, vn, mask)
        np.testing.assert_allclose(np.asarray(outs[lid]), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_flash_self_attention_matches_dense(dtype):
    from chatterbox_tpu.ops.flash_attention import flash_self_attention

    rng = np.random.default_rng(5)
    b, h, t, d = 2, 4, 256, 64
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), dtype)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), dtype)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), dtype)
    lens = np.array([200, 256])
    bias = jnp.where(np.arange(t)[None] < lens[:, None], 0.0, -1.0e10).astype(jnp.float32)

    scale = 1.0 / np.sqrt(d)
    logits = jnp.einsum("bhtd,bhsd->bhts", q, k).astype(jnp.float32) * scale
    logits = logits + bias[:, None, None, :]
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    ref = jnp.einsum("bhts,bhsd->bhtd", probs, v)

    got = flash_self_attention(q, k, v, bias, interpret=True)
    atol = 2e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32)[:, :, :200],
        np.asarray(ref, np.float32)[:, :, :200], atol=atol,
    )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_flash_self_attention_packed_matches_dense(dtype):
    """The packed kernel (qkv in (B, T, 3*H*D), heads as 64-aligned lane
    slices, no head transposes) must match dense attention."""
    from chatterbox_tpu.ops.flash_attention import flash_self_attention_packed

    rng = np.random.default_rng(6)
    b, h, t, d = 2, 4, 256, 64
    qkv = jnp.asarray(rng.standard_normal((b, t, 3 * h * d)), dtype)
    lens = np.array([200, 256])
    bias = jnp.where(np.arange(t)[None] < lens[:, None], 0.0, -1.0e10).astype(jnp.float32)

    def heads(x):
        return x.reshape(b, t, h, d).transpose(0, 2, 1, 3)

    q, k, v = (heads(qkv[:, :, i * h * d : (i + 1) * h * d]) for i in range(3))
    scale = 1.0 / np.sqrt(d)
    logits = jnp.einsum("bhtd,bhsd->bhts", q, k).astype(jnp.float32) * scale
    logits = logits + bias[:, None, None, :]
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    ref = jnp.einsum("bhts,bhsd->bhtd", probs, v).transpose(0, 2, 1, 3).reshape(b, t, h * d)

    got = flash_self_attention_packed(qkv, bias, n_heads=h, interpret=True)
    atol = 2e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32)[:, :200],
        np.asarray(ref, np.float32)[:, :200], atol=atol,
    )


def test_flash_decode_int8_cache_matches_bf16():
    """int8 (D,S) cache + per-token scales ~= the bf16 kernel: the scale
    folds into the logits (K) and probs (V) as row multiplies; the bf16 SD
    tail keeps recent tokens exact. Tolerance reflects int8 rounding (~1%
    relative on the attention output)."""
    from chatterbox_tpu.models.t3.llama import quantize_kv

    rng = np.random.default_rng(11)
    l, b, h, s, d, w = 3, 4, 4, 256, 64, 8
    cache = jnp.asarray(rng.standard_normal((l, 2, b, h, s, d)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((b, h, d)), jnp.bfloat16)
    kn = jnp.asarray(rng.standard_normal((b, h, d)), jnp.bfloat16)
    vn = jnp.asarray(rng.standard_normal((b, h, d)), jnp.bfloat16)
    prefix = np.array([30, 140, 1, 64], np.int32)
    cur, gap_end = 141, 100
    mb = (cur // w) * w
    tail = cache[:, :, :, :, mb : mb + w, :]
    base = flash_decode_layer_attention(
        jnp.swapaxes(cache, -1, -2), jnp.int32(1), jnp.int32(cur),
        jnp.asarray(prefix), jnp.int32(gap_end), q, kn, vn,
        tail=tail, merge_base=jnp.int32(mb), interpret=True, ds_layout=True,
    )
    q8, sc = quantize_kv(cache)
    got = flash_decode_layer_attention(
        jnp.swapaxes(q8, -1, -2), jnp.int32(1), jnp.int32(cur),
        jnp.asarray(prefix), jnp.int32(gap_end), q, kn, vn,
        tail=tail, merge_base=jnp.int32(mb), scales=sc,
        interpret=True, ds_layout=True,
    )
    got, base = np.asarray(got, np.float32), np.asarray(base, np.float32)
    rel = np.abs(got - base).max() / (np.abs(base).max() + 1e-9)
    assert rel < 2e-2, rel
    # round-trip sanity of the quantizer itself
    deq = np.asarray(q8, np.float32) * np.asarray(sc)[..., None]
    # half a quant step at gaussian absmax ~4.7: 4.7/127/2 ~= 0.019, plus
    # bf16 representation noise on the reference values
    np.testing.assert_allclose(deq, np.asarray(cache, np.float32), atol=0.03)


def test_flash_relpos_q_blocking_long_t():
    """flash_relpos_attention with T large enough that the q axis splits
    into multiple grid blocks (the long-form conformer bucket: an
    un-blocked (T, T) logits buffer exceeded the 16 MB scoped-vmem limit
    at T=2304, measured r4). Dense reference computed head by head."""
    from chatterbox_tpu.ops.flash_attention import (
        _pick_relpos_q_block,
        flash_relpos_attention,
    )

    t = 1280
    tq = _pick_relpos_q_block(t)
    assert tq < t and t % tq == 0, (tq, t)  # blocking actually engages
    assert _pick_relpos_q_block(768) == 768  # short bucket: one block

    rng = np.random.default_rng(3)
    b, h, d, c = 1, 2, 64, 128
    qu = jnp.asarray(rng.standard_normal((b, t, h * d)), jnp.float32) * 0.3
    qh = jnp.asarray(rng.standard_normal((b, t, h * c)), jnp.float32) * 0.1
    k = jnp.asarray(rng.standard_normal((b, t, h * d)), jnp.float32) * 0.3
    v = jnp.asarray(rng.standard_normal((b, t, h * d)), jnp.float32) * 0.3
    sh = jnp.asarray(rng.standard_normal((1, t, c)), jnp.float32) * 0.1
    bias = jnp.where(jnp.arange(t)[None] < t - 200, 0.0, -1e30).astype(jnp.float32)
    bias = jnp.tile(bias, (b, 1))
    scale = 1.0 / np.sqrt(d)

    got = flash_relpos_attention(
        qu, qh, k, sh, v, bias, n_heads=h, scale=scale, interpret=True
    )

    outs = []
    for hh in range(h):
        quh = qu[0, :, hh * d : (hh + 1) * d]
        qhh = qh[0, :, hh * c : (hh + 1) * c]
        kh = k[0, :, hh * d : (hh + 1) * d]
        vh = v[0, :, hh * d : (hh + 1) * d]
        logits = (quh @ kh.T + qhh @ sh[0].T) * scale + bias[0][None]
        p = jax.nn.softmax(logits, axis=-1)
        outs.append(p @ vh)
    ref = jnp.concatenate(outs, axis=-1)[None]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=2e-3)
