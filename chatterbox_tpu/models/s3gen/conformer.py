"""Upsample conformer token encoder (CosyVoice2 style) in functional JAX.

Parity targets: reference s3gen/transformer/upsample_encoder.py (6 blocks @
25 Hz -> x2 nearest upsample + causal conv -> 4 blocks @ 50 Hz),
attention.py:200-330 (ESPnet rel-pos attention with Transformer-XL rel-shift),
embedding.py EspnetRelPositionalEncoding, subsampling.py LinearNoSubsampling,
encoder_layer.py ConformerEncoderLayer (macaron/conv disabled in the live
config, s3gen.py:72-73).

TPU notes: the rel-shift is implemented as a static gather index instead of
the pad/reshape trick; everything else is dense matmul on (B, T, C).
"""

from dataclasses import dataclass
from functools import lru_cache
import numpy as np
import jax
import jax.numpy as jnp

from ...core.layers import layer_norm, leaky_relu, linear, merge_heads, split_heads


@dataclass(frozen=True)
class ConformerConfig:
    input_size: int = 512
    output_size: int = 512
    attention_heads: int = 8
    linear_units: int = 2048
    num_blocks: int = 6
    num_up_blocks: int = 4
    pre_lookahead_len: int = 3
    up_stride: int = 2
    ln_eps: float = 1e-12  # encoder_layer.py:145-146


@lru_cache(maxsize=None)
def _espnet_rel_pe(d_model: int, max_len: int) -> np.ndarray:
    """EspnetRelPositionalEncoding table: (1, 2*max_len-1, d) -- positive
    positions reversed, then negative (embedding.py:246-271)."""
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float64) * -(np.log(10000.0) / d_model))
    pe_pos = np.zeros((max_len, d_model))
    pe_neg = np.zeros((max_len, d_model))
    pe_pos[:, 0::2] = np.sin(position * div)
    pe_pos[:, 1::2] = np.cos(position * div)
    pe_neg[:, 0::2] = np.sin(-position * div)
    pe_neg[:, 1::2] = np.cos(-position * div)
    pe = np.concatenate([pe_pos[::-1], pe_neg[1:]], axis=0)[None]
    return pe.astype(np.float32)


def rel_pos_encoding(x: jnp.ndarray, d_model: int):
    """x (B, T, C) -> (x * sqrt(d), pos_emb (1, 2T-1, C))."""
    t = x.shape[1]
    pe = _espnet_rel_pe(d_model, max(t, 16))
    center = pe.shape[1] // 2
    pos = jnp.asarray(pe[:, center - t + 1 : center + t])
    # python-float scale: weak-typed, preserves bf16 activations
    return x * float(np.sqrt(d_model)), pos


def _rel_shift_bd(bd: jnp.ndarray) -> jnp.ndarray:
    """(B, H, T, 2T-1) -> (B, H, T, T): out[t, s] = bd[t, T-1 - t + s],
    via the reference pad/reshape trick (attention.py:225-247).

    Implemented as pad+reshape+slice rather than a take_along_axis gather:
    the axon backend's TPU runtime faults on the (B, H, T, 2T-1) gather at
    some lengths (measured: worker crash at T=150/300, fine at 375/750)."""
    b, h, t, _ = bd.shape
    padded = jnp.pad(bd, ((0, 0), (0, 0), (0, 0), (1, 0)))  # (B, H, T, 2T)
    padded = padded.reshape(b, h, 2 * t, t)
    rows = padded[:, :, 1:].reshape(b, h, t, 2 * t - 1)
    return rows[..., :t]


FLASH_ATTENTION = True  # module switch for A/B benchmarking


def _sinusoid_tables(t: int, c: int):
    """Absolute sinusoid angle tables for the rel-pos decomposition:
    (sin(w_i s), cos(w_i s)) for s in [0, t), w_i the ESPnet frequencies."""
    div = np.exp(np.arange(0, c, 2, dtype=np.float64) * -(np.log(10000.0) / c))
    ang = np.arange(t, dtype=np.float64)[:, None] * div[None]
    return np.sin(ang).astype(np.float32), np.cos(ang).astype(np.float32)


def rel_pos_attention_flash(p, x, n_heads, key_mask=None):
    """ESPnet rel-pos attention via the flash kernel -- EXACT rewrite.

    The dense path materializes ac (B,H,T,T) + bd (B,H,T,2T-1) f32 and
    rel-shifts bd. Identity (angle addition): with m = t - s,
    bd[t,s] = q_v[t] . (W_pos pe(m)) = sum_c qw[t,c] sinusoid_c(m)
            = qhat[t] . shat[s],
    where qw = q_v folded with the learned pos projection, qhat is qw
    rope-rotated by the QUERY position, and shat[s] = [sin(w s), cos(w s)]
    is the plain absolute table (r3; verified to 1.6e-7 against the
    pad/reshape rel-shift). W_pos's bias (if any) adds a per-row constant
    to every key -- softmax-invariant -- and is dropped. Everything stays
    PACKED (B, T, H*width): no head transposes around the kernel
    (ops/flash_attention.py layout lesson)."""
    b, t, c = x.shape
    d_k = c // n_heads
    q = linear(p["q"], x)  # (B, T, C) packed
    k = linear(p["k"], x)
    v = linear(p["v"], x)
    q_u = q + p["pos_bias_u"].reshape(-1)
    q_v = q + p["pos_bias_v"].reshape(-1)

    # fold the learned pos projection into the query: qw[b,t,h,cc] =
    # sum_d q_v[b,t,h,d] * W_pos[cc, h*D+d]  (W stored (in, out))
    w_pos = p["pos"]["w"].reshape(c, n_heads, d_k)  # (C, H, D)
    qw = jnp.einsum(
        "bthd,chd->bthc", q_v.reshape(b, t, n_heads, d_k), w_pos,
        preferred_element_type=jnp.float32,
    )  # (B, T, H, C)

    sin_t, cos_t = _sinusoid_tables(t, c)
    sin_t = jnp.asarray(sin_t)[None, :, None]  # (1, T, 1, C/2)
    cos_t = jnp.asarray(cos_t)[None, :, None]
    qe, qo = qw[..., 0::2], qw[..., 1::2]
    # rope rotation by the query position (verified formulas)
    qhat = jnp.stack(
        [-qe * cos_t + qo * sin_t, qe * sin_t + qo * cos_t], axis=-1
    ).reshape(b, t, n_heads * c)
    shat = jnp.stack([sin_t[0, :, 0], cos_t[0, :, 0]], axis=-1).reshape(1, t, c)

    from ...ops.flash_attention import flash_relpos_attention

    tp = -(-t // 128) * 128
    if tp != t:
        pad2 = ((0, 0), (0, tp - t), (0, 0))
        q_u, k, v, qhat, shat = (
            jnp.pad(a, pad2) for a in (q_u, k, v, qhat, shat)
        )
    bias = (
        jnp.where(key_mask, 0.0, -1.0e9).astype(jnp.float32)
        if key_mask is not None
        else jnp.zeros((b, t), jnp.float32)
    )
    bias = jnp.pad(bias, ((0, 0), (0, tp - t)), constant_values=-1.0e9)
    h_blk = next(
        (g for g in (2, 4, 8, 1) if n_heads % g == 0 and (g * d_k) % 128 == 0),
        None,
    )
    out = flash_relpos_attention(
        q_u.astype(x.dtype), qhat.astype(x.dtype), k.astype(x.dtype),
        shat, v.astype(x.dtype), bias,
        n_heads=n_heads, scale=1.0 / float(np.sqrt(d_k)),
        interpret=jax.default_backend() == "cpu", heads_per_cell=h_blk,
    )[:, :t]
    if key_mask is not None:
        # dense path zeroes pad-QUERY rows' probs; match by masking the out
        out = out * key_mask[..., None].astype(out.dtype)
    return linear(p["out"], out)


def rel_pos_attention(p, x, pos_emb, n_heads, key_mask=None):
    """RelPositionMultiHeadedAttention (self-attention case)."""
    d_k = x.shape[-1] // n_heads
    if FLASH_ATTENTION:
        h_ok = any(
            n_heads % g == 0 and (g * d_k) % 128 == 0 for g in (2, 4, 8, 1)
        )
        if h_ok and x.shape[-1] % 2 == 0:
            return rel_pos_attention_flash(p, x, n_heads, key_mask)
    q = split_heads(linear(p["q"], x), n_heads)  # (B, H, T, D)
    k = split_heads(linear(p["k"], x), n_heads)
    v = split_heads(linear(p["v"], x), n_heads)
    pp = split_heads(linear(p["pos"], pos_emb), n_heads)  # (1, H, 2T-1, D)

    q_u = q + p["pos_bias_u"][None, :, None, :]
    q_v = q + p["pos_bias_v"][None, :, None, :]
    ac = jnp.einsum("bhtd,bhsd->bhts", q_u, k, preferred_element_type=jnp.float32)
    bd = jnp.einsum("bhtd,xhsd->bhts", q_v, pp, preferred_element_type=jnp.float32)
    bd = _rel_shift_bd(bd)
    scores = (ac + bd) / np.sqrt(d_k)
    if key_mask is not None:
        neg = -1.0e9  # finite: keeps fully-masked (pad) query rows NaN-free
        scores = jnp.where(key_mask[:, None, None, :], scores, neg)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = jnp.where(key_mask[:, None, None, :], probs, 0.0)
    else:
        probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhts,bhsd->bhtd", probs.astype(v.dtype), v)
    return linear(p["out"], merge_heads(out))


def conformer_layer(p, x, pos_emb, cfg: ConformerConfig, key_mask=None):
    """Pre-norm MHA + FFN with swish (macaron/conv off)."""
    res = x
    y = layer_norm(p["norm_mha"], x, cfg.ln_eps)
    x = res + rel_pos_attention(p["attn"], y, pos_emb, cfg.attention_heads, key_mask)
    res = x
    y = layer_norm(p["norm_ff"], x, cfg.ln_eps)
    y = linear(p["ff_w2"], jax.nn.silu(linear(p["ff_w1"], y)))
    return res + y


def pre_lookahead(p, x, lookahead_len=3):
    """PreLookaheadLayer (upsample_encoder.py:66-96): right-pad lookahead conv
    (k = la+1) + leaky_relu(0.01) + causal conv k3, residual."""
    from ...core.layers import conv1d

    y = conv1d(p["conv1"], x, padding=(0, lookahead_len))
    y = leaky_relu(y, 0.01)  # F.leaky_relu default
    y = conv1d(p["conv2"], y, padding=(2, 0))
    return y + x


def upsample2_conv(p, x, stride=2):
    """Upsample1D (upsample_encoder.py:37-63): nearest x2, left-pad 2*stride,
    conv k = 2*stride+1."""
    from ...core.layers import conv1d

    y = jnp.repeat(x, stride, axis=1)
    return conv1d(p["conv"], y, padding=(stride * 2, 0))


def _embed(p, x, cfg):
    """LinearNoSubsampling + EspnetRelPositionalEncoding."""
    y = layer_norm(p["ln"], linear(p["linear"], x), 1e-5)
    return rel_pos_encoding(y, cfg.output_size)


def upsample_conformer_encoder(p, x, cfg: ConformerConfig = ConformerConfig(), key_mask=None):
    """(B, T, 512) token embeddings -> (B, 2T, 512).

    key_mask (B, T) bool marks valid tokens (the reference runs full-context
    with an all-true mask at B=1; ours supports right-padded batches).
    """
    y, pos = _embed(p["embed"], x, cfg)
    if key_mask is not None:
        # zero embedded pads so the lookahead conv sees the same zeros the
        # reference's right-padding provides at the sequence end
        y = y * key_mask[..., None]
    y = pre_lookahead(p["pre_lookahead"], y, cfg.pre_lookahead_len)
    for lp in p["encoders"]:
        y = conformer_layer(lp, y, pos, cfg, key_mask)

    y = upsample2_conv(p["up_layer"], y, cfg.up_stride)
    up_mask = None if key_mask is None else jnp.repeat(key_mask, cfg.up_stride, axis=1)
    y, pos = _embed(p["up_embed"], y, cfg)
    for lp in p["up_encoders"]:
        y = conformer_layer(lp, y, pos, cfg, up_mask)
    return layer_norm(p["after_norm"], y, 1e-5)


# ---------------------------------------------------------------------------
# init / convert
# ---------------------------------------------------------------------------


def _init_layer(key, cfg: ConformerConfig):
    c, f = cfg.output_size, cfg.linear_units
    ks = jax.random.split(key, 8)

    def lin(k, i, o, bias=True):
        p = {"w": jax.random.normal(k, (i, o)) * (1.0 / np.sqrt(i))}
        if bias:
            p["b"] = jnp.zeros((o,))
        return p

    return {
        "norm_mha": {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))},
        "norm_ff": {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))},
        "attn": {
            "q": lin(ks[0], c, c),
            "k": lin(ks[1], c, c),
            "v": lin(ks[2], c, c),
            "out": lin(ks[3], c, c),
            "pos": lin(ks[4], c, c, bias=False),
            "pos_bias_u": jax.random.normal(ks[5], (cfg.attention_heads, c // cfg.attention_heads)) * 0.02,
            "pos_bias_v": jax.random.normal(ks[6], (cfg.attention_heads, c // cfg.attention_heads)) * 0.02,
        },
        "ff_w1": lin(ks[7], c, f),
        "ff_w2": lin(jax.random.fold_in(key, 99), f, c),
    }


def init_upsample_conformer(key, cfg: ConformerConfig = ConformerConfig()):
    c = cfg.output_size
    ks = iter(jax.random.split(key, 32))

    def lin(k, i, o):
        return {"w": jax.random.normal(k, (i, o)) * (1.0 / np.sqrt(i)), "b": jnp.zeros((o,))}

    def conv(k, w, i, o):
        return {"w": jax.random.normal(k, (w, i, o)) * 0.02, "b": jnp.zeros((o,))}

    def embed(k):
        return {
            "linear": lin(k, cfg.input_size, c),
            "ln": {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))},
        }

    return {
        "embed": embed(next(ks)),
        "pre_lookahead": {
            "conv1": conv(next(ks), cfg.pre_lookahead_len + 1, c, c),
            "conv2": conv(next(ks), 3, c, c),
        },
        "encoders": [_init_layer(next(ks), cfg) for _ in range(cfg.num_blocks)],
        "up_layer": {"conv": conv(next(ks), cfg.up_stride * 2 + 1, c, c)},
        "up_embed": embed(next(ks)),
        "up_encoders": [_init_layer(next(ks), cfg) for _ in range(cfg.num_up_blocks)],
        "after_norm": {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))},
    }


def convert_upsample_conformer(sd, cfg: ConformerConfig = ConformerConfig(), prefix=""):
    from ...checkpoint import torch_convert as tc

    def _n(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    def layer(lp):
        return {
            "norm_mha": tc.layer_norm(sd, f"{lp}.norm_mha"),
            "norm_ff": tc.layer_norm(sd, f"{lp}.norm_ff"),
            "attn": {
                "q": tc.linear(sd, f"{lp}.self_attn.linear_q"),
                "k": tc.linear(sd, f"{lp}.self_attn.linear_k"),
                "v": tc.linear(sd, f"{lp}.self_attn.linear_v"),
                "out": tc.linear(sd, f"{lp}.self_attn.linear_out"),
                "pos": tc.linear(sd, f"{lp}.self_attn.linear_pos"),
                "pos_bias_u": jnp.asarray(_n(sd[f"{lp}.self_attn.pos_bias_u"])),
                "pos_bias_v": jnp.asarray(_n(sd[f"{lp}.self_attn.pos_bias_v"])),
            },
            "ff_w1": tc.linear(sd, f"{lp}.feed_forward.w_1"),
            "ff_w2": tc.linear(sd, f"{lp}.feed_forward.w_2"),
        }

    def embed(ep):
        return {
            "linear": tc.linear(sd, f"{ep}.out.0"),
            "ln": tc.layer_norm(sd, f"{ep}.out.1"),
        }

    return {
        "embed": embed(prefix + "embed"),
        "pre_lookahead": {
            "conv1": tc.conv1d(sd, prefix + "pre_lookahead_layer.conv1"),
            "conv2": tc.conv1d(sd, prefix + "pre_lookahead_layer.conv2"),
        },
        "encoders": [layer(f"{prefix}encoders.{i}") for i in range(cfg.num_blocks)],
        "up_layer": {"conv": tc.conv1d(sd, prefix + "up_layer.conv")},
        "up_embed": embed(prefix + "up_embed"),
        "up_encoders": [layer(f"{prefix}up_encoders.{i}") for i in range(cfg.num_up_blocks)],
        "after_norm": tc.layer_norm(sd, prefix + "after_norm"),
    }
