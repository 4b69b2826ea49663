"""From-scratch JAX Llama backbone for the T3 speech-token decoder.

Numerics-parity target: HF ``LlamaModel`` with the Llama_520M config
(reference t3/llama_configs.py: hidden 1024, 30 layers, 16 heads, head_dim 64,
FFN 4096, RMSNorm eps 1e-5, rope_theta 5e5 with llama3 scaling factor 8).

TPU-first design:
  - layer parameters are STACKED on a leading (n_layers,) axis and the block
    is applied with ``lax.scan`` -> one layer gets traced/compiled, 30 run.
  - the KV cache is a preallocated fixed-shape (2, L, B, H, T_max, D) array
    updated with ``lax.dynamic_update_slice`` inside the decode loop; no
    dynamic shapes anywhere (XLA requirement).
  - attention is dense XLA einsum (sequences here are <= ~3k); the decode
    step's 1-token attention is a pure HBM-bandwidth matvec which XLA already
    emits optimally -- measured against a Pallas variant in ops/.
  - sharding: weights carry a "model" axis on heads/ffn via
    parallel/sharding.py specs; everything here is pure function of params.
"""

from dataclasses import dataclass
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ...core.layers import rms_norm


@dataclass(frozen=True)
class LlamaConfig:
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 30
    num_attention_heads: int = 16
    num_key_value_heads: int = 16
    head_dim: int = 64
    rms_norm_eps: float = 1e-5
    rope_theta: float = 500000.0
    # llama3-style rope scaling (t3/llama_configs.py:23-30)
    rope_scaling_factor: float = 8.0
    rope_low_freq_factor: float = 1.0
    rope_high_freq_factor: float = 4.0
    rope_original_max_position: int = 8192


LLAMA_520M = LlamaConfig()


def rope_inv_freq(cfg: LlamaConfig) -> np.ndarray:
    """HF llama3 rope-scaling formula (transformers modeling_rope_utils)."""
    d = cfg.head_dim
    inv_freq = 1.0 / (cfg.rope_theta ** (np.arange(0, d, 2, dtype=np.float64) / d))
    low_wavelen = cfg.rope_original_max_position / cfg.rope_low_freq_factor
    high_wavelen = cfg.rope_original_max_position / cfg.rope_high_freq_factor
    wavelen = 2.0 * np.pi / inv_freq
    scaled = np.where(wavelen > low_wavelen, inv_freq / cfg.rope_scaling_factor, inv_freq)
    smooth = (cfg.rope_original_max_position / wavelen - cfg.rope_low_freq_factor) / (
        cfg.rope_high_freq_factor - cfg.rope_low_freq_factor
    )
    smoothed = (1.0 - smooth) * inv_freq / cfg.rope_scaling_factor + smooth * inv_freq
    is_medium = (wavelen >= high_wavelen) & (wavelen <= low_wavelen)
    return np.where(is_medium, smoothed, scaled).astype(np.float32)


def rope_cos_sin(cfg: LlamaConfig, positions: jnp.ndarray):
    """positions (B, T) -> cos, sin (B, T, head_dim) in HF half-rotate layout."""
    inv = jnp.asarray(rope_inv_freq(cfg))  # (D/2,)
    freqs = positions[..., None].astype(jnp.float32) * inv  # (B, T, D/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x):
    d = x.shape[-1] // 2
    return jnp.concatenate([-x[..., d:], x[..., :d]], axis=-1)


def apply_rope(q, k, cos, sin):
    """q,k: (B, H, T, D); cos,sin: (B, T, D). Keeps q/k dtype (bf16-safe)."""
    cos = cos[:, None].astype(q.dtype)
    sin = sin[:, None].astype(q.dtype)
    q = q * cos + _rotate_half(q) * sin
    k = k * cos + _rotate_half(k) * sin
    return q, k


def init_llama(key, cfg: LlamaConfig, dtype=jnp.float32):
    """Random-init stacked layer params (for benches/tests without weights)."""
    l, c, f = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
    hd = cfg.num_attention_heads * cfg.head_dim
    kvd = cfg.num_key_value_heads * cfg.head_dim
    ks = jax.random.split(key, 8)
    std = 0.02

    def w(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * std).astype(dtype)

    return {
        "layers": {
            "input_ln": {"scale": jnp.ones((l, c), dtype)},
            "q": {"w": w(ks[0], (l, c, hd))},
            "k": {"w": w(ks[1], (l, c, kvd))},
            "v": {"w": w(ks[2], (l, c, kvd))},
            "o": {"w": w(ks[3], (l, hd, c))},
            "post_ln": {"scale": jnp.ones((l, c), dtype)},
            "gate_up": {"w": w(ks[4], (l, c, 2 * f))},
            "down": {"w": w(ks[6], (l, f, c))},
        },
        "final_ln": {"scale": jnp.ones((c,), dtype)},
    }


def convert_llama(sd, cfg: LlamaConfig, prefix="tfmr."):
    """HF LlamaModel state dict -> stacked pytree."""
    import numpy as np

    def _n(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    def stack(fmt, transpose=True):
        ws = []
        for i in range(cfg.num_hidden_layers):
            w = _n(sd[fmt.format(i=i)])
            ws.append(w.T if transpose else w)
        return jnp.asarray(np.stack(ws))

    p = {
        "layers": {
            "input_ln": {"scale": stack(prefix + "layers.{i}.input_layernorm.weight", False)},
            "q": {"w": stack(prefix + "layers.{i}.self_attn.q_proj.weight")},
            "k": {"w": stack(prefix + "layers.{i}.self_attn.k_proj.weight")},
            "v": {"w": stack(prefix + "layers.{i}.self_attn.v_proj.weight")},
            "o": {"w": stack(prefix + "layers.{i}.self_attn.o_proj.weight")},
            "post_ln": {"scale": stack(prefix + "layers.{i}.post_attention_layernorm.weight", False)},
            "gate_up": {
                "w": jnp.concatenate(
                    [
                        stack(prefix + "layers.{i}.mlp.gate_proj.weight"),
                        stack(prefix + "layers.{i}.mlp.up_proj.weight"),
                    ],
                    axis=-1,
                )
            },
            "down": {"w": stack(prefix + "layers.{i}.mlp.down_proj.weight")},
        },
        "final_ln": {"scale": jnp.asarray(_n(sd[prefix + "norm.weight"]))},
    }
    return p


def _split_heads(x, n_heads, head_dim):
    b, t, _ = x.shape
    return x.reshape(b, t, n_heads, head_dim).transpose(0, 2, 1, 3)


def fuse_qkv_params(params):
    """Concatenate the q/k/v projection weights into one (l, c, 3*hd) matmul
    operand (H == KV heads here, so the three have equal width). One dot per
    layer instead of three: same bytes, fewer ops inside the decode scan
    (3.90 vs 3.95 ms/step at 16 CFG rows). Outputs match the separate-dot
    layout to fp-reassociation precision. Returns a NEW pytree; the
    canonical (converter/test/sharding/checkpoint) layout keeps separate
    q/k/v -- see unfuse_qkv_params."""
    layers = dict(params["layers"])
    if "qkv" in layers:
        return params
    layers["qkv"] = {
        "w": jnp.concatenate(
            [layers.pop("q")["w"], layers.pop("k")["w"], layers.pop("v")["w"]], axis=-1
        )
    }
    return {**params, "layers": layers}


def canonicalize_llama_params(params, cfg: LlamaConfig, dtype=jnp.bfloat16):
    """Restore the canonical dense separate-q/k/v layout from any runtime
    layout (fused qkv and/or int8-quantized weights): checkpoints, sharding
    specs and converters all address the canonical form."""
    return unfuse_qkv_params(dequantize_llama_weights(params, dtype), cfg)


def unfuse_qkv_params(params, cfg: LlamaConfig):
    """Inverse of fuse_qkv_params: restore the canonical separate q/k/v
    layout (converters, sharding specs and checkpoints use it)."""
    layers = dict(params["layers"])
    if "qkv" not in layers:
        return params
    w = layers.pop("qkv")["w"]
    hd = cfg.num_attention_heads * cfg.head_dim
    kvd = cfg.num_key_value_heads * cfg.head_dim
    layers["q"] = {"w": w[..., :hd]}
    layers["k"] = {"w": w[..., hd : hd + kvd]}
    layers["v"] = {"w": w[..., hd + kvd :]}
    return {**params, "layers": layers}


QUANT_WEIGHT_NAMES = ("qkv", "q", "k", "v", "o", "gate_up", "gate", "up", "down")


def quantize_llama_weights(params):
    """Weight-only int8 quantization of the decode matmul chain.

    Each projection weight (l, c, n) becomes {"w8": int8 (l, c, n),
    "scale": f32 (l, n)} with symmetric per-OUTPUT-channel scales
    (``w ~= w8 * scale[None, :]``). The matmuls dequantize in-register
    (``_wmat``): XLA fuses the int8->bf16 convert into the dot's operand
    read, so the decode step streams HALF the weight bytes from HBM -- the
    dominant per-step cost (1.53 ms of 3.33 at 87% of achievable HBM BW,
    docs/PERFORMANCE.md roofline). Norm scales, embeddings and heads stay
    bf16. Apply AFTER fuse_qkv_params; returns a new pytree."""

    def quant(wp):
        w = wp["w"].astype(jnp.float32)
        absmax = jnp.max(jnp.abs(w), axis=-2)  # reduce the input-channel dim
        scale = jnp.maximum(absmax / 127.0, 1e-12)
        w8 = jnp.clip(jnp.round(w / scale[..., None, :]), -127, 127)
        return {"w8": w8.astype(jnp.int8), "scale": scale}

    layers = dict(params["layers"])
    for name in QUANT_WEIGHT_NAMES:
        if name in layers and "w" in layers[name]:
            layers[name] = quant(layers[name])
    return {**params, "layers": layers}


def dequantize_llama_weights(params, dtype=jnp.bfloat16):
    """Inverse of quantize_llama_weights (up to int8 rounding): restore the
    dense {"w"} layout (checkpointing / sharding specs address it)."""
    layers = dict(params["layers"])
    for name in QUANT_WEIGHT_NAMES:
        if name in layers and "w8" in layers[name]:
            wp = layers[name]
            layers[name] = {
                "w": (
                    wp["w8"].astype(jnp.float32) * wp["scale"][..., None, :]
                ).astype(dtype)
            }
    return {**params, "layers": layers}


def _wmat(y, wp):
    """y @ W for a dense ({"w"}) or int8-quantized ({"w8","scale"}) weight.

    The quantized form computes in y.dtype (bf16 on the hot path) and scales
    the (tiny) output rows, not the weight: the convert rides the dot."""
    if "w8" in wp:
        out = jnp.matmul(y, wp["w8"].astype(y.dtype))
        return out * wp["scale"].astype(y.dtype)
    return jnp.matmul(y, wp["w"])


def _qkv(lp, y, h, kvh, d):
    """Project y -> per-head q, k, v (fused weight when present)."""
    if "qkv" in lp:
        qkv = _wmat(y, lp["qkv"])
        q, k, v = jnp.split(qkv, [h * d, (h + kvh) * d], axis=-1)
    else:
        q = _wmat(y, lp["q"])
        k = _wmat(y, lp["k"])
        v = _wmat(y, lp["v"])
    return _split_heads(q, h, d), _split_heads(k, kvh, d), _split_heads(v, kvh, d)


def _attn(q, k, v, mask_bias):
    """(B,H,T,D) x (B,H,S,D) dense attention with additive bias (B,1,T,S).

    Also returns the probs (for the alignment analyzer; DCE'd when unused)."""
    scale = 1.0 / np.sqrt(q.shape[-1])
    logits = jnp.einsum("bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale + mask_bias
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhts,bhsd->bhtd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(v.dtype)
    return out, probs


def _layer(cfg: LlamaConfig, lp, x, cos, sin, mask_bias, cache_kv=None, cache_pos=None):
    """One decoder layer. Returns (y, (k, v)) where k/v cover this call's
    tokens (prefill) or the updated full cache (decode)."""
    h, d = cfg.num_attention_heads, cfg.head_dim
    res = x
    y = rms_norm(lp["input_ln"], x, cfg.rms_norm_eps)
    q, k, v = _qkv(lp, y, h, cfg.num_key_value_heads, d)
    q, k = apply_rope(q, k, cos, sin)

    if cache_kv is not None:
        ck, cv = cache_kv
        ck = lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, 0, cache_pos, 0))
        cv = lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, 0, cache_pos, 0))
        k_all, v_all = ck, cv
        new_kv = (ck, cv)
    else:
        k_all, v_all = k, v
        new_kv = (k, v)

    a, probs = _attn(q, k_all.astype(q.dtype), v_all.astype(q.dtype), mask_bias)
    a = a.transpose(0, 2, 1, 3).reshape(x.shape[0], x.shape[1], h * d)
    x = res + _wmat(a, lp["o"])

    res = x
    y = rms_norm(lp["post_ln"], x, cfg.rms_norm_eps)
    y = _mlp(lp, y)
    x = res + _wmat(y, lp["down"])
    return x, new_kv, probs


def _mlp(lp, y):
    """SiLU-gated MLP; gate/up fused into one matmul when available."""
    if "gate_up" in lp:
        gu = _wmat(y, lp["gate_up"])
        g, u = jnp.split(gu, 2, axis=-1)
        return jax.nn.silu(g) * u
    return jax.nn.silu(_wmat(y, lp["gate"])) * _wmat(y, lp["up"])


def quantize_kv(kv, axis=-1):
    """Per-token symmetric int8 quantization along the head-dim axis.

    kv (..., D) float -> (int8 values, f32 scales with ``axis`` reduced):
    ``kv ~= values * scales[..., None]``. Scales floor at a tiny epsilon so
    all-zero (padding) tokens stay exactly zero instead of dividing by 0.
    """
    absmax = jnp.max(jnp.abs(kv.astype(jnp.float32)), axis=axis)
    scale = jnp.maximum(absmax / 127.0, 1e-8)
    q = jnp.round(kv.astype(jnp.float32) / jnp.expand_dims(scale, axis))
    return jnp.clip(q, -127, 127).astype(jnp.int8), scale


def llama_prefill(
    params,
    cfg: LlamaConfig,
    inputs_embeds: jnp.ndarray,
    positions: jnp.ndarray,
    attn_mask: Optional[jnp.ndarray],
    cache_len: int,
    ds_layout: bool = False,
    cache_quant: bool = False,
):
    """Full-sequence causal forward, writing a fresh KV cache of size cache_len.

    inputs_embeds (B, T, C); positions (B, T) int32; attn_mask (B, T) bool
    (True = real token) or None. Returns (hidden (B,T,C), cache (L,2,B,Hkv,S,D)).

    ``ds_layout=True`` emits the cache as (L,2,B,Hkv,D,S) instead: S rides
    the 128-lane axis so the HBM array carries NO tile padding (the (S,D)
    layout pads D=64 to 128 lanes -- 2x memory and read bandwidth). Only the
    Pallas flash-decode step consumes this layout (ops/flash_decode.py).

    ``cache_quant=True`` (ds_layout only) stores the main cache int8 with
    per-token scales -- (cache int8, scales (L,2,B,H,S) f32, tail bf16) --
    halving the decode loop's dominant HBM read. The SD tail (the most
    recent <=W tokens) stays full precision.
    """
    assert not (cache_quant and not ds_layout), "int8 cache requires ds_layout"
    b, t, c = inputs_embeds.shape
    cos, sin = rope_cos_sin(cfg, positions)
    neg = jnp.finfo(jnp.float32).min
    causal = jnp.tril(jnp.ones((t, t), bool))[None, None]  # (1,1,T,T)
    keep = causal
    if attn_mask is not None:
        keep = keep & attn_mask[:, None, None, :]
    bias = jnp.where(keep, 0.0, neg).astype(jnp.float32)

    def body(x, lp):
        y, kv, _ = _layer(cfg, lp, x, cos, sin, bias)
        return y, jnp.stack(kv)  # (2, B, H, T, D)

    x, kvs = lax.scan(body, inputs_embeds, params["layers"])
    hidden = rms_norm(params["final_ln"], x, cfg.rms_norm_eps)
    # write into the fixed-size cache; layout (L, 2, B, H, S, D) is exactly
    # what the decode-step layer scan consumes -- no per-step transposes
    pad = cache_len - t
    if ds_layout:
        from ...ops.flash_decode import TAIL_W

        # (D, S) main cache + SD tail holding the trailing partial W-group
        # (slots [mb0, t); the flash kernel reads slots >= merge_base from
        # the tail; see flash_decode_layer_attention)
        mb0 = (t // TAIL_W) * TAIL_W
        tail = jnp.pad(
            kvs[:, :, :, :, mb0:, :],
            ((0, 0),) * 4 + ((0, TAIL_W - (t - mb0)), (0, 0)),
        )
        if cache_quant:
            q8, sc = quantize_kv(kvs)  # (L,2,B,H,T,D) i8, (L,2,B,H,T) f32
            cache = jnp.pad(
                q8.transpose(0, 1, 2, 3, 5, 4), ((0, 0),) * 5 + ((0, pad),)
            )
            scales = jnp.pad(
                sc, ((0, 0),) * 4 + ((0, pad),), constant_values=1.0
            )
            return hidden, (cache, scales, tail)
        kvs = kvs.transpose(0, 1, 2, 3, 5, 4)  # (L, 2, B, H, D, T)
        cache = jnp.pad(kvs, ((0, 0),) * 5 + ((0, pad),))
        return hidden, (cache, tail)
    cache = jnp.pad(kvs, ((0, 0), (0, 0), (0, 0), (0, 0), (0, pad), (0, 0)))
    return hidden, cache


def llama_decode_step(
    params,
    cfg: LlamaConfig,
    x: jnp.ndarray,
    cache: jnp.ndarray,
    cache_pos: jnp.ndarray,
    positions: jnp.ndarray,
    attn_len_mask: jnp.ndarray,
    collect_attn_layer: Optional[int] = None,
    unroll: int = 1,
    pallas_valid: Optional[tuple] = None,
    ds_layout: bool = False,
    attn_slice: Optional[tuple] = None,
):
    """One-token incremental forward (scan-over-layers, read-only cache).

    x (B, 1, C); cache (L, 2, B, Hkv, S, D); cache_pos scalar int32 (write
    index); positions (B, 1) rope positions; attn_len_mask (B, S) bool =
    which cache slots are valid *after* this token is written.
    Returns (hidden (B, 1, C), new cache, attn) where attn is the
    head-mean attention (B, S) of layer ``collect_attn_layer`` (None if not
    requested) -- feeds the alignment analyzer (alignment.py).

    On the Pallas path, attention collection stays on the FAST kernel: the
    kernel returns its final online-softmax stats (m, l) and the probs for
    the ``attn_slice`` window (the text region -- required there) are
    reconstructed exactly as ``exp(q . k_text * scale - m) / l`` with one
    small XLA matmul against layer ``collect_attn_layer``'s cache columns,
    under a ``lax.cond`` so only that one layer pays the read. Positions
    outside [attn_slice) return 0. (The r4 design abandoned the kernel for
    the whole XLA step when alignment was on: 6.27 vs 3.31 ms/step.)

    TPU design note: the cache is threaded as a read-only ``lax.scan`` INPUT
    (xs) so each layer's slice fuses straight into the attention einsum with
    no gather copy, and the current token attends to itself EXPLICITLY (its
    slot in the read-only cache is stale and masked off); the scan emits only
    the (L, 2, B, H, 1, D) new-KV slices, written back in ONE small
    dynamic_update_slice after the scan. This matches the unrolled step's
    HBM traffic with a 30x smaller trace (the round-1 carry-based scan's
    dynamic gather materialized a full per-layer cache copy each token:
    10.3 ms vs 4.1 ms unrolled at 16 CFG rows).
    """
    cos, sin = rope_cos_sin(cfg, positions)
    tail = None
    merge_base = None
    scales = None
    if ds_layout:
        from ...ops.flash_decode import flash_cache_merge_ds

        if len(cache) == 3:  # int8 main cache + per-token scales + bf16 tail
            cache, scales, tail = cache
        else:
            cache, tail = cache  # (L,2,B,H,D,S) main + (L,2,B,H,W,D) SD tail
        tail_w = tail.shape[4]
        merge_base = (cache_pos // tail_w) * tail_w
    s = cache.shape[-1] if ds_layout else cache.shape[-2]
    neg = jnp.finfo(jnp.float32).min
    # cache slots valid BEFORE this token; the write slot is stale -> mask off
    cache_mask = attn_len_mask & (jnp.arange(s)[None] != cache_pos)
    bias = jnp.where(cache_mask[:, None, None, :], 0.0, neg).astype(jnp.float32)

    h_heads, d = cfg.num_attention_heads, cfg.head_dim
    scale = 1.0 / np.sqrt(d)

    def one_layer(lp, xx, ckv=None, lid=None):
        """Per-layer step. ``ckv`` (2,B,H,S,D) = read-only cache slice (XLA
        attention path); ``lid`` = layer index for the Pallas kernel path,
        which reads layer lid's tiles straight out of the full HBM cache
        (ops/flash_decode.py) -- no per-layer slice ever materializes."""
        res = xx
        y = rms_norm(lp["input_ln"], xx, cfg.rms_norm_eps)
        q, k, v = _qkv(lp, y, h_heads, cfg.num_key_value_heads, d)
        q, k = apply_rope(q, k, cos, sin)
        if lid is not None:
            from ...ops.flash_decode import flash_decode_layer_attention

            row_prefix, gap_end = pallas_valid
            want_stats = collect_attn_layer is not None
            out = flash_decode_layer_attention(
                cache, lid, cache_pos, row_prefix, gap_end,
                q[:, :, 0], k[:, :, 0], v[:, :, 0],
                tail=tail, merge_base=merge_base, scales=scales,
                interpret=jax.default_backend() == "cpu",
                ds_layout=ds_layout, return_stats=want_stats,
            )  # (B, H, D) [+ stats (B, H) m, l]
            if want_stats:
                a4, st_m, st_l = out
                assert attn_slice is not None, (
                    "pallas alignment collection needs the attn_slice window"
                )
                assert scales is None, (
                    "alignment text-read assumes a non-quantized cache"
                )
                lo, hi = attn_slice
                bq = xx.shape[0]

                def _text_probs(_):
                    # exact layer-lid probs over the text window from the
                    # kernel's global softmax stats; only this one layer
                    # pays the cache-column read (lax.cond)
                    if ds_layout:  # (L, 2, B, H, D, S)
                        kt = lax.dynamic_slice(
                            cache, (lid, 0, 0, 0, 0, lo),
                            (1, 1, bq, cfg.num_key_value_heads, d, hi - lo),
                        )[0, 0]  # (B, H, D, T)
                        logits = jnp.einsum(
                            "bhd,bhdt->bht", q[:, :, 0], kt.astype(q.dtype),
                            preferred_element_type=jnp.float32,
                        )
                    else:  # (L, 2, B, H, S, D)
                        kt = lax.dynamic_slice(
                            cache, (lid, 0, 0, 0, lo, 0),
                            (1, 1, bq, cfg.num_key_value_heads, hi - lo, d),
                        )[0, 0]  # (B, H, T, D)
                        logits = jnp.einsum(
                            "bhd,bhtd->bht", q[:, :, 0], kt.astype(q.dtype),
                            preferred_element_type=jnp.float32,
                        )
                    p = jnp.exp(logits * scale - st_m[..., None]) / jnp.maximum(
                        st_l[..., None], 1e-30
                    )
                    pos = lo + jnp.arange(hi - lo)
                    p = jnp.where(
                        pos[None, None, :] < row_prefix[:, None, None], p, 0.0
                    )
                    return jnp.mean(p, axis=1)  # (B, T) head-mean

                attn_t = lax.cond(
                    lid == collect_attn_layer,
                    _text_probs,
                    lambda _: jnp.zeros((bq, hi - lo), jnp.float32),
                    operand=None,
                )
                attn_mean = jnp.zeros((bq, s), jnp.float32).at[:, lo:hi].set(attn_t)
            else:
                a4 = out
                attn_mean = None
            a = a4.reshape(xx.shape[0], 1, h_heads * d)
        else:
            ck = ckv[0].astype(q.dtype)
            cv = ckv[1].astype(q.dtype)
            # softmax over [cache logits (masked); self logit] == full attention
            logits_c = (
                jnp.einsum("bhtd,bhsd->bhts", q, ck, preferred_element_type=jnp.float32)
                * scale
                + bias
            )
            logit_self = (
                jnp.sum(q * k, axis=-1, keepdims=True).astype(jnp.float32) * scale
            )  # (B, H, 1, 1)
            probs = jax.nn.softmax(
                jnp.concatenate([logits_c, logit_self], axis=-1), axis=-1
            )  # (B, H, 1, S+1)
            a = jnp.einsum(
                "bhts,bhsd->bhtd",
                probs[..., :s].astype(cv.dtype),
                cv,
                preferred_element_type=jnp.float32,
            ).astype(v.dtype) + probs[..., s:].astype(v.dtype) * v
            a = a.transpose(0, 2, 1, 3).reshape(xx.shape[0], xx.shape[1], h_heads * d)
            attn_mean = jnp.mean(probs[:, :, 0, :s], axis=1)  # (B, S) head-mean
        xx = res + _wmat(a, lp["o"])
        res = xx
        y = rms_norm(lp["post_ln"], xx, cfg.rms_norm_eps)
        y = _mlp(lp, y)
        xx = res + _wmat(y, lp["down"])
        kv_dtype = tail.dtype if ds_layout else cache.dtype
        return xx, jnp.stack([k, v]).astype(kv_dtype), attn_mean

    n_layers = cfg.num_hidden_layers
    assert n_layers % unroll == 0, (n_layers, unroll)
    groups = n_layers // unroll
    pallas_mode = pallas_valid is not None
    assert not (ds_layout and not pallas_mode), (
        "the (D, S) cache layout is only consumed by the Pallas decode path"
    )

    grouped_params = jax.tree.map(
        lambda w: w.reshape((groups, unroll) + w.shape[1:]), params["layers"]
    )

    if pallas_mode:
        collect = collect_attn_layer is not None

        def body(xx, inp):
            lp_g, lid_g = inp
            kvs, attns = [], []
            for j in range(unroll):
                lp = jax.tree.map(lambda w: w[j], lp_g)
                xx, kv, attn_mean = one_layer(lp, xx, lid=lid_g[j])
                kvs.append(kv)
                if collect:
                    attns.append(attn_mean)
            out = (jnp.stack(kvs), jnp.stack(attns)) if collect else jnp.stack(kvs)
            return xx, out

        layer_ids = jnp.arange(n_layers, dtype=jnp.int32).reshape(groups, unroll)
        if collect:
            x, (new_kvs, attns) = lax.scan(body, x, (grouped_params, layer_ids))
        else:
            x, new_kvs = lax.scan(body, x, (grouped_params, layer_ids))
            attns = jnp.zeros((groups, unroll, x.shape[0], s), jnp.float32)
    else:

        def body(xx, inp):
            lp_g, ckv_g = inp  # group of `unroll` layers (leading axis U)
            kvs, attns = [], []
            for j in range(unroll):
                lp = jax.tree.map(lambda w: w[j], lp_g)
                xx, kv, attn_mean = one_layer(lp, xx, ckv=ckv_g[j])
                kvs.append(kv)
                attns.append(attn_mean)
            return xx, (jnp.stack(kvs), jnp.stack(attns))

        grouped_cache = cache.reshape((groups, unroll) + cache.shape[1:])
        x, (new_kvs, attns) = lax.scan(body, x, (grouped_params, grouped_cache))
    # single tiny write: all layers' new K/V at cache_pos
    new_kvs = new_kvs.reshape((n_layers,) + new_kvs.shape[2:])
    if ds_layout:
        # append to the SD tail (cheap in-place sublane update); every W-th
        # token, merge the now-full tail into the (D, S) cache as one
        # W-column RMW (a per-step lane-offset write is a full cache copy
        # in XLA -- measured in scripts/probe_cache_write*.py)
        new_tail = lax.dynamic_update_slice(
            tail, new_kvs, (0, 0, 0, 0, cache_pos % tail_w, 0)
        )
        interp = jax.default_backend() == "cpu"
        if scales is not None:

            def _merge(cs):
                c, sc = cs
                # quantize the W merged columns per token (tail stays bf16;
                # the scales array updates via a plain XLA dynamic slice --
                # it is ~1/128 the cache's size, so the lane-offset copy
                # that is prohibitive on the cache is noise here)
                q8, sc_w = quantize_kv(new_tail)  # i8 (...,W,D), f32 (...,W)
                c = flash_cache_merge_ds(
                    c, q8.transpose(0, 1, 2, 3, 5, 4), merge_base,
                    interpret=interp,
                )
                sc = lax.dynamic_update_slice(
                    sc, sc_w, (0, 0, 0, 0, merge_base)
                )
                return (c, sc)

            new_cache, new_scales = lax.cond(
                (cache_pos + 1) % tail_w == 0, _merge, lambda cs: cs,
                (cache, scales),
            )
            new_cache = (new_cache, new_scales, new_tail)
        else:

            def _merge(c):
                cols = new_tail.transpose(0, 1, 2, 3, 5, 4)  # (L,2,B,H,D,W)
                return flash_cache_merge_ds(c, cols, merge_base, interpret=interp)

            new_cache = lax.cond(
                (cache_pos + 1) % tail_w == 0, _merge, lambda c: c, cache
            )
            new_cache = (new_cache, new_tail)
    else:
        new_cache = lax.dynamic_update_slice(cache, new_kvs, (0, 0, 0, 0, cache_pos, 0))
    hidden = rms_norm(params["final_ln"], x, cfg.rms_norm_eps)
    attn = None
    if collect_attn_layer is not None:
        attns = attns.reshape((n_layers,) + attns.shape[2:])
        attn = attns[collect_attn_layer]
    return hidden, new_cache, attn


def llama_decode_step_unrolled(
    params,
    cfg: LlamaConfig,
    x: jnp.ndarray,
    cache: jnp.ndarray,
    cache_pos: jnp.ndarray,
    positions: jnp.ndarray,
    attn_len_mask: jnp.ndarray,
    collect_attn_layer: Optional[int] = None,
):
    """Unrolled-layer decode step: identical numerics to llama_decode_step.

    Static layer indices let XLA slice the cache/weights in place instead of
    the scanned version's dynamic gather, which materializes a full per-layer
    cache copy each step -- at large batch the gather traffic dominates
    (measured: B=32 throughput flat vs B=8 with the scanned step). Trades
    ~30x trace size (slower compile, cached per bucket) for ~2x less HBM
    traffic per token.
    """
    h_heads, d = cfg.num_attention_heads, cfg.head_dim
    cos, sin = rope_cos_sin(cfg, positions)
    neg = jnp.finfo(jnp.float32).min
    bias = jnp.where(attn_len_mask[:, None, None, :], 0.0, neg).astype(jnp.float32)

    attn_out = None
    for i in range(cfg.num_hidden_layers):
        lp = jax.tree.map(lambda w: w[i], params["layers"])
        res = x
        y = rms_norm(lp["input_ln"], x, cfg.rms_norm_eps)
        q, k, v = _qkv(lp, y, h_heads, cfg.num_key_value_heads, d)
        q, k = apply_rope(q, k, cos, sin)
        new_kv = jnp.stack([k, v]).astype(cache.dtype)  # (2, B, H, 1, D)
        cache = lax.dynamic_update_slice(
            cache, new_kv[None], (i, 0, 0, 0, cache_pos, 0)
        )
        a, probs = _attn(q, cache[i, 0].astype(q.dtype), cache[i, 1].astype(q.dtype), bias)
        a = a.transpose(0, 2, 1, 3).reshape(x.shape[0], x.shape[1], h_heads * d)
        x = res + _wmat(a, lp["o"])
        res = x
        y = rms_norm(lp["post_ln"], x, cfg.rms_norm_eps)
        y = _mlp(lp, y)
        x = res + _wmat(y, lp["down"])
        if collect_attn_layer == i:
            attn_out = jnp.mean(probs[:, :, 0, :], axis=1)

    hidden = rms_norm(params["final_ln"], x, cfg.rms_norm_eps)
    return hidden, cache, attn_out
