"""Functional NN building blocks: pure ``apply(params, x)`` functions over
parameter pytrees (nested dicts of jnp arrays).

Design: this framework is inference-first and conversion-heavy (all shipped
weights come from torch checkpoints), so modules are plain functions instead
of a stateful module system -- the checkpoint converter emits exactly these
pytrees, `jax.jit`/`pjit` trace them directly, and sharding is annotated on
the pytree leaves.

Layout conventions (chosen for TPU/XLA):
  - sequences: (B, T, C)    -- channels-last so matmuls hit the MXU tiled on C
  - conv weights: (W, Cin, Cout)   ("WIO")
  - linear weights: (Cin, Cout)
  - torch -> jax weight transposition happens once, in the checkpoint
    converter (chatterbox_tpu/checkpoint/torch_convert.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def linear(p, x):
    y = jnp.matmul(x, p["w"])
    if "b" in p:
        y = y + p["b"]
    return y


def embedding(p, ids):
    return jnp.take(p["w"], ids, axis=0)


def layer_norm(p, x, eps=1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mean) * lax.rsqrt(var + eps)
    if p is not None:
        y = y * p["scale"] + p["bias"]
    return y


def rms_norm(p, x, eps=1e-5):
    # matches HF LlamaRMSNorm: compute in fp32, scale after
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    y = (x32 * lax.rsqrt(var + eps)).astype(dt)
    return y * p["scale"]


def group_norm(p, x, num_groups, eps=1e-5):
    """GroupNorm over (B, T, C) with channel groups (torch GroupNorm parity)."""
    b, t, c = x.shape
    xg = x.reshape(b, t, num_groups, c // num_groups)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.var(xg, axis=(1, 3), keepdims=True)
    xg = (xg - mean) * lax.rsqrt(var + eps)
    y = xg.reshape(b, t, c)
    return y * p["scale"] + p["bias"]


def batch_norm(p, x, eps=1e-5):
    """Inference-mode BatchNorm using running stats; x (..., C)."""
    inv = lax.rsqrt(p["var"] + eps)
    y = (x - p["mean"]) * inv
    if "scale" in p:
        y = y * p["scale"] + p["bias"]
    return y


def conv1d(p, x, stride=1, padding=0, dilation=1, groups=1):
    """1-D conv on (B, T, C) with weight (W, Cin/groups, Cout).

    ``padding`` is symmetric int or explicit (lo, hi) tuple ("torch style").
    """
    if isinstance(padding, int):
        padding = (padding, padding)
    x = x.astype(p["w"].dtype)  # weights define compute precision
    y = lax.conv_general_dilated(
        x,
        p["w"],
        window_strides=(stride,),
        padding=(padding,),
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        preferred_element_type=x.dtype,
    )
    if "b" in p:
        y = y + p["b"]
    return y


def causal_conv1d(p, x, dilation=1):
    """Left-padded conv, matching reference decoder.py:71-97 CausalConv1d."""
    w = p["w"].shape[0]
    pad = (w - 1) * dilation
    return conv1d(p, x, padding=(pad, 0), dilation=dilation)


def conv_transpose1d(p, x, stride, padding=0):
    """ConvTranspose1d on (B, T, C); weight stored (W, Cin, Cout).

    Equivalent to torch ConvTranspose1d(Cin, Cout, W, stride, padding):
    out_len = (T-1)*stride + W - 2*padding. Implemented as an input-dilated
    conv with the spatially-flipped kernel, which XLA lowers to one MXU conv.
    """
    w = p["w"].shape[0]
    kern = jnp.flip(p["w"], axis=0)
    pad = (w - 1 - padding, w - 1 - padding)
    x = x.astype(kern.dtype)  # weights define compute precision
    y = lax.conv_general_dilated(
        x,
        kern,
        window_strides=(1,),
        padding=(pad,),
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=x.dtype,
    )
    if "b" in p:
        y = y + p["b"]
    return y


def conv2d(p, x, stride=(1, 1), padding=(0, 0)):
    """2-D conv on (B, H, W, C) with weight (KH, KW, Cin, Cout)."""
    if isinstance(padding, int):
        padding = (padding, padding)
    pads = tuple((pp, pp) if isinstance(pp, int) else pp for pp in padding)
    x = x.astype(p["w"].dtype)
    y = lax.conv_general_dilated(
        x,
        p["w"],
        window_strides=stride,
        padding=pads,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )
    if "b" in p:
        y = y + p["b"]
    return y


# ---------------------------------------------------------------------------
# activations
# ---------------------------------------------------------------------------


def snake(p, x):
    """Snake activation x + sin^2(a x)/a with per-channel alpha; x (B,T,C).

    Mirrors reference hifigan.py:34-84 (linear-scale alpha)."""
    alpha = p["alpha"]
    return x + (1.0 / (alpha + 1e-9)) * jnp.sin(x * alpha) ** 2


# least-squares fit of sin^2(pi f) / f^2 as a degree-4 polynomial in f^2 on
# f in [-1/2, 1/2]: max abs error of the reconstructed sin^2 is 4.5e-6
# (~133 dB SNR measured end to end, scripts/probe_snake.py)
_SNAKE_POLY = (
    9.869599831501965,
    -32.468686165908665,
    42.69306392165783,
    -29.692025709511967,
    11.062041862215489,
)
_INV_PI = 0.3183098861837907


def snake_fast(p, x):
    """snake() via mod-1 range reduction + a polynomial for sin^2 -- no
    transcendentals, so the VPU runs it 7.8x faster than the jnp.sin form
    (258.8 vs 33.0 Gelem/s measured on v5e, scripts/probe_snake.py) at
    133 dB SNR. The vocoder is VPU-transcendental-bound (snake is most of
    its activation work), which makes this the HiFT speed lever VERDICT r3
    #7 asked for. Exact for |alpha*x| < 2^23 * pi (f32 round)."""
    alpha = p["alpha"]
    c0, c1, c2, c3, c4 = _SNAKE_POLY
    t = x * (alpha * _INV_PI)
    f = t - jnp.round(t)  # sin^2(pi t) == sin^2(pi f), f in [-1/2, 1/2]
    z = f * f
    sin2 = z * (c0 + z * (c1 + z * (c2 + z * (c3 + z * c4))))
    return x + (1.0 / (alpha + 1e-9)) * sin2


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def leaky_relu(x, negative_slope=0.1):
    return jnp.where(x >= 0, x, x * negative_slope)


# ---------------------------------------------------------------------------
# attention (dense XLA path; the Pallas flash kernel lives in ops/)
# ---------------------------------------------------------------------------


def sdpa(q, k, v, mask=None, scale=None):
    """Scaled dot-product attention. q,k,v: (B, H, T, D). mask: bool or bias.

    bool mask: True = attend. float mask: additive bias.
    """
    d = q.shape[-1]
    if scale is None:
        scale = 1.0 / np.sqrt(d)
    logits = jnp.einsum("bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if mask is not None:
        if mask.dtype == jnp.bool_:
            logits = jnp.where(mask, logits, jnp.finfo(logits.dtype).min)
        else:
            logits = logits + mask
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhts,bhsd->bhtd", probs, v, preferred_element_type=jnp.float32).astype(
        v.dtype
    )


def split_heads(x, n_heads):
    b, t, c = x.shape
    return x.reshape(b, t, n_heads, c // n_heads).transpose(0, 2, 1, 3)


def merge_heads(x):
    b, h, t, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * d)


# ---------------------------------------------------------------------------
# LSTM as lax.scan (reference VoiceEncoder uses cuDNN LSTM; voice_encoder.py:126)
# ---------------------------------------------------------------------------


def lstm(p_layers, x):
    """Multi-layer LSTM over (B, T, C). p_layers: list of dicts with
    w_ih (Cin, 4H), w_hh (H, 4H), b (4H,) [= b_ih + b_hh folded].

    Gate order matches torch: [i, f, g, o]. Returns (output, last_hidden list).
    """
    b = x.shape[0]

    def layer(xs, p):
        hdim = p["w_hh"].shape[0]
        # precompute input projections for the whole sequence in one matmul
        xproj = jnp.matmul(xs, p["w_ih"]) + p["b"]  # (B, T, 4H)

        def step(carry, xp):
            h, c = carry
            gates = xp + jnp.matmul(h, p["w_hh"])
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
            g = jnp.tanh(g)
            c = f * c + i * g
            h = o * jnp.tanh(c)
            return (h, c), h

        init = (
            jnp.zeros((b, hdim), x.dtype),
            jnp.zeros((b, hdim), x.dtype),
        )
        (h_last, _), ys = lax.scan(step, init, xproj.transpose(1, 0, 2))
        return ys.transpose(1, 0, 2), h_last

    hs = []
    for p in p_layers:
        x, h_last = layer(x, p)
        hs.append(h_last)
    return x, hs
