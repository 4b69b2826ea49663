"""Causal 1-D UNet -- the CFM velocity estimator of S3Gen.

Parity targets: reference s3gen/decoder.py (ConditionalDecoder with the live
config from s3gen.py:76-87: in 320, out 80, causal, channels [256], 4
transformer blocks x (1 down + 12 mid + 1 up) stages, 8 heads x 64) plus the
matcha building blocks (matcha/decoder.py SinusoidalPosEmb/TimestepEmbedding,
matcha/transformer.py BasicTransformerBlock with diffusers Attention/GELU-FF).

With channels=[256] and causal=True the "down/up sample" convs are stride-1
causal convs, so every stage runs at full mel rate -- a flat residual
transformer-conv hybrid that XLA fuses well on (B, T, C).
"""

from dataclasses import dataclass
import numpy as np
import jax
import jax.numpy as jnp

from ...core.layers import causal_conv1d, conv1d, layer_norm, linear, merge_heads, mish, split_heads


@dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 320  # packed [x; mu; spks; cond] = 4 * 80
    out_channels: int = 80
    channels: int = 256
    n_blocks: int = 4
    num_mid_blocks: int = 12
    num_heads: int = 8
    attention_head_dim: int = 64

    @property
    def time_embed_dim(self) -> int:
        return self.channels * 4


def sinusoidal_pos_emb(t: jnp.ndarray, dim: int, scale: float = 1000.0) -> jnp.ndarray:
    """matcha/decoder.py:14-29."""
    half = dim // 2
    emb = np.log(10000.0) / (half - 1)
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb)
    ang = scale * t[:, None] * freqs[None]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def _causal_block(p, x, mask):
    """CausalBlock1D: causal conv k3 -> LayerNorm -> Mish (decoder.py:48-61)."""
    y = causal_conv1d(p["conv"], x * mask)
    y = mish(layer_norm(p["ln"], y, 1e-5))
    return y * mask


def _causal_resnet(p, x, mask, t_emb):
    """CausalResnetBlock1D (decoder.py:64-68, matcha/decoder.py:46-61)."""
    h = _causal_block(p["block1"], x, mask)
    h = h + linear(p["mlp"], mish(t_emb))[:, None]
    h = _causal_block(p["block2"], h, mask)
    return h + conv1d(p["res_conv"], x * mask)


FLASH_ATTENTION = True  # module switch for A/B benchmarking


def _attn(p, x, n_heads, key_bias=None, use_flash=None):
    """diffusers Attention: qkv no bias, out bias; scale 1/sqrt(head_dim).

    QKV projections are fused into one matmul (better MXU tiling at these
    small channel counts); converters emit the fused "to_qkv" weight.

    Default path is the PACKED Pallas kernel (ops/flash_attention.py): it
    consumes the to_qkv GEMM output directly in (B, T, 3*H*D) layout and
    emits (B, T, H*D) for to_out -- no (B,H,T,D) head transposes, which are
    physical HBM copies across the custom-call boundary (measured
    1.2 ms/block at 64 CFG rows, the source of the CFM's superlinear batch
    scaling in r2). The dense XLA fallback materializes (B, H, T, T) f32
    logits -- ~16 GB of HBM round-trips per UNet pass at T=750/16 rows, the
    measured r1 bottleneck."""
    if use_flash is None:
        use_flash = FLASH_ATTENTION
    inner = p["to_qkv"]["w"].shape[1] // 3 if "to_qkv" in p else 0
    if use_flash and inner % 128 == 0:
        from ...ops.flash_attention import flash_self_attention_packed

        t = x.shape[1]
        tp = -(-t // 128) * 128
        qkv = linear(p["to_qkv"], x)
        if tp != t:
            qkv = jnp.pad(qkv, ((0, 0), (0, tp - t), (0, 0)))
        bias = (
            key_bias.astype(jnp.float32)
            if key_bias is not None
            else jnp.zeros((x.shape[0], t), jnp.float32)
        )
        bias = jnp.pad(bias, ((0, 0), (0, tp - t)), constant_values=-1.0e10)
        out = flash_self_attention_packed(
            qkv, bias, n_heads=n_heads,
            interpret=jax.default_backend() == "cpu",
        )[:, :t]
        return linear(p["to_out"], out)
    if "to_qkv" in p:
        qkv = linear(p["to_qkv"], x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = (split_heads(t, n_heads) for t in (q, k, v))
    else:
        q = split_heads(linear(p["to_q"], x), n_heads)
        k = split_heads(linear(p["to_k"], x), n_heads)
        v = split_heads(linear(p["to_v"], x), n_heads)
    if use_flash:
        from ...ops.flash_attention import flash_self_attention

        t = x.shape[1]
        tp = -(-t // 128) * 128
        pad = ((0, 0), (0, 0), (0, tp - t), (0, 0))
        bias = (
            key_bias.astype(jnp.float32)
            if key_bias is not None
            else jnp.zeros((x.shape[0], t), jnp.float32)
        )
        bias = jnp.pad(bias, ((0, 0), (0, tp - t)), constant_values=-1.0e10)
        # 4 heads per grid cell: ~10% faster than 1 on v5e (tile sweep,
        # ops/flash_attention.py); divides both the live h=8 and tiny h=4
        hpc = 4 if n_heads % 4 == 0 else 1
        out = flash_self_attention(
            jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad), bias,
            interpret=jax.default_backend() == "cpu", heads_per_cell=hpc,
        )[:, :, :t]
    else:
        scale = 1.0 / np.sqrt(q.shape[-1])
        logits = jnp.einsum("bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32) * scale
        if key_bias is not None:
            logits = logits + key_bias[:, None, None, :]
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhts,bhsd->bhtd", probs, v)
    return linear(p["to_out"], merge_heads(out))


def _transformer_block(p, x, cfg: UNetConfig, key_bias=None):
    """BasicTransformerBlock, plain-LayerNorm path (matcha/transformer.py:243-316)."""
    x = x + _attn(p["attn"], layer_norm(p["norm1"], x, 1e-5), cfg.num_heads, key_bias)
    y = layer_norm(p["norm3"], x, 1e-5)
    y = linear(p["ff_out"], jax.nn.gelu(linear(p["ff_in"], y), approximate=False))
    return x + y


def unet_forward(p, cfg: UNetConfig, x, mu, spks, cond, t, mask=None):
    """Velocity estimate.

    x, mu, cond: (B, T, 80); spks: (B, 80); t: (B,) in [0,1];
    mask: (B, T) bool or None. Returns (B, T, 80).
    """
    b, tt, _ = x.shape
    if mask is None:
        mask_c = jnp.ones((b, tt, 1), x.dtype)
        key_bias = None
    else:
        mask_c = mask[..., None].astype(x.dtype)
        key_bias = (1.0 - mask.astype(jnp.float32)) * -1.0e10  # mask_to_bias (decoder.py:25-33)

    # the sinusoid needs an fp32 t (bf16 t quantizes to O(1)-radian phase
    # errors at scale=1000); the resulting O(1) embedding values then cast
    # harmlessly to the activation dtype so the MLP/resnet chain stays bf16
    t_emb = sinusoidal_pos_emb(t.astype(jnp.float32), cfg.in_channels).astype(x.dtype)
    t_emb = linear(p["time_mlp2"], jax.nn.silu(linear(p["time_mlp1"], t_emb)))

    h = jnp.concatenate(
        [x, mu, jnp.broadcast_to(spks[:, None], (b, tt, spks.shape[-1])), cond], axis=-1
    )

    # down stage
    h = _causal_resnet(p["down_resnet"], h, mask_c, t_emb)
    for bp in p["down_tf"]:
        h = _transformer_block(bp, h, cfg, key_bias)
    skip = h
    h = causal_conv1d(p["down_conv"], h * mask_c)

    # mid stages
    for mp in p["mid"]:
        h = _causal_resnet(mp["resnet"], h, mask_c, t_emb)
        for bp in mp["tf"]:
            h = _transformer_block(bp, h, cfg, key_bias)

    # up stage (skip concat on channels)
    h = jnp.concatenate([h, skip], axis=-1)
    h = _causal_resnet(p["up_resnet"], h, mask_c, t_emb)
    for bp in p["up_tf"]:
        h = _transformer_block(bp, h, cfg, key_bias)
    h = causal_conv1d(p["up_conv"], h * mask_c)

    h = _causal_block(p["final_block"], h, mask_c)
    out = conv1d(p["final_proj"], h * mask_c)
    return out * mask_c


# ---------------------------------------------------------------------------
# init / convert
# ---------------------------------------------------------------------------


def _init_tf_block(key, cfg: UNetConfig):
    c = cfg.channels
    inner = cfg.num_heads * cfg.attention_head_dim
    ff_inner = 4 * c
    ks = jax.random.split(key, 6)

    def lin(k, i, o, bias=True):
        p = {"w": jax.random.normal(k, (i, o)) * (1.0 / np.sqrt(i))}
        if bias:
            p["b"] = jnp.zeros((o,))
        return p

    return {
        "norm1": {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))},
        "norm3": {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))},
        "attn": {
            "to_qkv": lin(ks[0], c, 3 * inner, bias=False),
            "to_out": lin(ks[3], inner, c),
        },
        "ff_in": lin(ks[4], c, ff_inner),
        "ff_out": lin(ks[5], ff_inner, c),
    }


def _init_resnet(key, cin, cout, temb_dim):
    ks = jax.random.split(key, 4)

    def conv(k, w, i, o):
        return {"w": jax.random.normal(k, (w, i, o)) * (1.0 / np.sqrt(w * i)), "b": jnp.zeros((o,))}

    def block(k, i, o):
        return {
            "conv": conv(k, 3, i, o),
            "ln": {"scale": jnp.ones((o,)), "bias": jnp.zeros((o,))},
        }

    return {
        "block1": block(ks[0], cin, cout),
        "block2": block(ks[1], cout, cout),
        "mlp": {"w": jax.random.normal(ks[2], (temb_dim, cout)) * 0.02, "b": jnp.zeros((cout,))},
        "res_conv": conv(ks[3], 1, cin, cout),
    }


def init_unet(key, cfg: UNetConfig = UNetConfig()):
    c, te = cfg.channels, cfg.time_embed_dim
    ks = iter(jax.random.split(key, 256))

    def conv(k, w, i, o):
        return {"w": jax.random.normal(k, (w, i, o)) * (1.0 / np.sqrt(w * i)), "b": jnp.zeros((o,))}

    return {
        "time_mlp1": {"w": jax.random.normal(next(ks), (cfg.in_channels, te)) * 0.02, "b": jnp.zeros((te,))},
        "time_mlp2": {"w": jax.random.normal(next(ks), (te, te)) * 0.02, "b": jnp.zeros((te,))},
        "down_resnet": _init_resnet(next(ks), cfg.in_channels, c, te),
        "down_tf": [_init_tf_block(next(ks), cfg) for _ in range(cfg.n_blocks)],
        "down_conv": conv(next(ks), 3, c, c),
        "mid": [
            {
                "resnet": _init_resnet(next(ks), c, c, te),
                "tf": [_init_tf_block(next(ks), cfg) for _ in range(cfg.n_blocks)],
            }
            for _ in range(cfg.num_mid_blocks)
        ],
        "up_resnet": _init_resnet(next(ks), 2 * c, c, te),
        "up_tf": [_init_tf_block(next(ks), cfg) for _ in range(cfg.n_blocks)],
        "up_conv": conv(next(ks), 3, c, c),
        "final_block": {
            "conv": conv(next(ks), 3, c, c),
            "ln": {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))},
        },
        "final_proj": conv(next(ks), 1, c, cfg.out_channels),
    }


def convert_unet(sd, cfg: UNetConfig = UNetConfig(), prefix=""):
    """Map reference ConditionalDecoder state dict (decoder.py) to our pytree."""
    from ...checkpoint import torch_convert as tc

    def resnet(rp):
        return {
            "block1": {"conv": tc.conv1d(sd, f"{rp}.block1.block.0"), "ln": tc.layer_norm(sd, f"{rp}.block1.block.2")},
            "block2": {"conv": tc.conv1d(sd, f"{rp}.block2.block.0"), "ln": tc.layer_norm(sd, f"{rp}.block2.block.2")},
            "mlp": tc.linear(sd, f"{rp}.mlp.1"),
            "res_conv": tc.conv1d(sd, f"{rp}.res_conv"),
        }

    def tf(bp):
        return {
            "norm1": tc.layer_norm(sd, f"{bp}.norm1"),
            "norm3": tc.layer_norm(sd, f"{bp}.norm3"),
            "attn": {
                "to_qkv": {
                    "w": np.concatenate(
                        [
                            tc.linear(sd, f"{bp}.attn1.to_q")["w"],
                            tc.linear(sd, f"{bp}.attn1.to_k")["w"],
                            tc.linear(sd, f"{bp}.attn1.to_v")["w"],
                        ],
                        axis=1,
                    )
                },
                "to_out": tc.linear(sd, f"{bp}.attn1.to_out.0"),
            },
            "ff_in": tc.linear(sd, f"{bp}.ff.net.0.proj"),
            "ff_out": tc.linear(sd, f"{bp}.ff.net.2"),
        }

    p = {
        "time_mlp1": tc.linear(sd, prefix + "time_mlp.linear_1"),
        "time_mlp2": tc.linear(sd, prefix + "time_mlp.linear_2"),
        "down_resnet": resnet(prefix + "down_blocks.0.0"),
        "down_tf": [tf(f"{prefix}down_blocks.0.1.{i}") for i in range(cfg.n_blocks)],
        "down_conv": tc.conv1d(sd, prefix + "down_blocks.0.2"),
        "mid": [
            {
                "resnet": resnet(f"{prefix}mid_blocks.{m}.0"),
                "tf": [tf(f"{prefix}mid_blocks.{m}.1.{i}") for i in range(cfg.n_blocks)],
            }
            for m in range(cfg.num_mid_blocks)
        ],
        "up_resnet": resnet(prefix + "up_blocks.0.0"),
        "up_tf": [tf(f"{prefix}up_blocks.0.1.{i}") for i in range(cfg.n_blocks)],
        "up_conv": tc.conv1d(sd, prefix + "up_blocks.0.2"),
        "final_block": {
            "conv": tc.conv1d(sd, prefix + "final_block.block.0"),
            "ln": tc.layer_norm(sd, prefix + "final_block.block.2"),
        },
        "final_proj": tc.conv1d(sd, prefix + "final_proj"),
    }
    return jax.tree.map(jnp.asarray, p)
