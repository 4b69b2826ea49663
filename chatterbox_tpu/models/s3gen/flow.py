"""Token->mel flow: conformer encoder + OT conditional flow matching.

Parity targets: reference s3gen/flow.py:175-282 (CausalMaskedDiffWithXvec),
s3gen/flow_matching.py (CausalConditionalCFM: cosine t-schedule, 10 Euler
steps, inference CFG rate 0.7, fixed pre-sampled noise buffer) and
s3gen/configs.py CFM_PARAMS.

TPU-first: the 10-step Euler loop is a ``lax.scan`` over one fused estimator
call per step; the CFG pair [cond; uncond-zeroed] rides a doubled batch axis
through a single UNet invocation (flow_matching.py:95-116 builds the same
batch-2 explicitly). Batching is first-class: every shape carries (B, ...)
with masks instead of the reference's B=1 asserts (flow.py:250).
"""

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ...core.layers import embedding, linear
from .conformer import (
    ConformerConfig,
    convert_upsample_conformer,
    init_upsample_conformer,
    upsample_conformer_encoder,
)
from .unet import UNetConfig, convert_unet, init_unet, unet_forward


@dataclass(frozen=True)
class FlowConfig:
    vocab_size: int = 6561
    input_size: int = 512
    output_size: int = 80
    spk_embed_dim: int = 192
    token_mel_ratio: int = 2
    pre_lookahead_len: int = 3
    n_timesteps: int = 10
    inference_cfg_rate: float = 0.7
    sigma_min: float = 1e-6
    training_cfg_rate: float = 0.2
    encoder: ConformerConfig = field(default_factory=ConformerConfig)
    estimator: UNetConfig = field(default_factory=UNetConfig)


def init_flow(key, cfg: FlowConfig = FlowConfig()):
    ks = jax.random.split(key, 4)
    return {
        "input_embedding": {"w": jax.random.normal(ks[0], (cfg.vocab_size, cfg.input_size)) * 0.02},
        "spk_embed_affine": {
            "w": jax.random.normal(ks[1], (cfg.spk_embed_dim, cfg.output_size)) * 0.02,
            "b": jnp.zeros((cfg.output_size,)),
        },
        "encoder": init_upsample_conformer(ks[2], cfg.encoder),
        "encoder_proj": {
            "w": jax.random.normal(ks[3], (cfg.encoder.output_size, cfg.output_size)) * 0.02,
            "b": jnp.zeros((cfg.output_size,)),
        },
        "estimator": init_unet(jax.random.fold_in(key, 7), cfg.estimator),
    }


def convert_flow(sd, cfg: FlowConfig = FlowConfig(), prefix="flow."):
    from ...checkpoint import torch_convert as tc

    return {
        "input_embedding": tc.embedding(sd, prefix + "input_embedding"),
        "spk_embed_affine": tc.linear(sd, prefix + "spk_embed_affine_layer"),
        "encoder": convert_upsample_conformer(sd, cfg.encoder, prefix + "encoder."),
        "encoder_proj": tc.linear(sd, prefix + "encoder_proj"),
        "estimator": convert_unet(sd, cfg.estimator, prefix + "decoder.estimator."),
    }


def cosine_t_span(n_timesteps: int) -> np.ndarray:
    """flow_matching.py:215-217."""
    t = np.linspace(0.0, 1.0, n_timesteps + 1)
    return (1.0 - np.cos(t * 0.5 * np.pi)).astype(np.float32)


def solve_euler(p, cfg: FlowConfig, z, mu, spks, cond, mask=None):
    """Fixed Euler ODE solver with batch-2 CFG (flow_matching.py:72-123).

    z, mu, cond: (B, T, 80); spks: (B, 80). Returns (B, T, 80).
    """
    t_span = cosine_t_span(cfg.n_timesteps)
    b = z.shape[0]
    r = cfg.inference_cfg_rate
    mask2 = None if mask is None else jnp.concatenate([mask, mask], axis=0)
    # the CFG pair's mu/spks/cond are loop-invariant: build them once
    mu_in = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0)
    spks_in = jnp.concatenate([spks, jnp.zeros_like(spks)], axis=0)
    cond_in = jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)

    def step(x, ts):
        # (t, dt) stay fp32: casting them to the bf16 activation dtype
        # quantizes t by ~2^-9, which the sinusoidal time embedding
        # (scale=1000) amplifies to O(1)-radian phase errors in its
        # high-frequency components -- every CFM step would condition on a
        # wrong timestep on TPU while fp32 CPU parity tests see nothing
        t_cur, dt = ts
        x_in = jnp.concatenate([x, x], axis=0)
        t_in = jnp.full((2 * b,), t_cur, jnp.float32)
        v = unet_forward(p["estimator"], cfg.estimator, x_in, mu_in, spks_in, cond_in, t_in, mask2)
        v_cond, v_uncond = v[:b], v[b:]
        dphi = (1.0 + r) * v_cond - r * v_uncond
        return x + (dt * dphi).astype(x.dtype), None

    ts = jnp.stack(
        [jnp.asarray(t_span[:-1]), jnp.asarray(np.diff(t_span))], axis=1
    ).astype(jnp.float32)
    x, _ = lax.scan(step, z, ts)
    return x


def flow_inference(
    p,
    cfg: FlowConfig,
    token: jnp.ndarray,
    token_len: jnp.ndarray,
    prompt_token: jnp.ndarray,
    prompt_token_len: jnp.ndarray,
    prompt_feat: jnp.ndarray,
    embedding_vec: jnp.ndarray,
    noise: jnp.ndarray,
):
    """Tokens -> mel (B, T_mel_total, 80) plus a (B, T_mel_total) valid mask.

    Mirrors flow.py:236-282 generalized to batches:
      token (B, T) right-padded, token_len (B,); prompt_token (B, P);
      prompt_feat (B, 2P, 80) mels of the prompt; embedding_vec (B, 192)
      x-vector; noise (B, T_mel_total, 80) the pre-sampled CFM noise
      (reference slices a fixed randn buffer, flow_matching.py:213).
    Output rows are valid up to 2*(P + token_len); the generated part starts
    at 2*P.
    """
    b = token.shape[0]
    pdt = p["input_embedding"]["w"].dtype
    prompt_feat = prompt_feat.astype(pdt)
    noise = noise.astype(pdt)
    # xvec projection (flow.py:252-253)
    emb = embedding_vec / jnp.linalg.norm(embedding_vec, axis=-1, keepdims=True)
    spks = linear(p["spk_embed_affine"], emb.astype(pdt))  # (B, 80)

    # concat prompt + generated tokens, embed with pad mask
    full_token = jnp.concatenate([prompt_token, token], axis=1)  # (B, P+T)
    total_len = prompt_token_len + token_len  # (B,)
    tmask = jnp.arange(full_token.shape[1])[None] < total_len[:, None]
    tok_emb = embedding(p["input_embedding"], jnp.clip(full_token, min=0))
    tok_emb = tok_emb * tmask[..., None]

    # token encoder @25Hz -> x2 -> @50Hz
    h = upsample_conformer_encoder(p["encoder"], tok_emb, cfg.encoder, key_mask=tmask)
    h = linear(p["encoder_proj"], h)  # (B, 2(P+T), 80)

    mel_len1 = prompt_feat.shape[1]  # 2P (static)
    t_mel = h.shape[1]
    # conds: prompt mels then zeros (flow.py:267-270)
    conds = jnp.concatenate(
        [prompt_feat, jnp.zeros((b, t_mel - mel_len1, cfg.output_size), h.dtype)], axis=1
    )
    mel_mask = jnp.arange(t_mel)[None] < (cfg.token_mel_ratio * total_len)[:, None]

    # run the solver at a 128-multiple T: the UNet's flash-attention pads to
    # the 128-lane block anyway, so padding ONCE here turns the per-block
    # q/k/v pad + out slice (4 copies x 56 blocks x 10 steps of ~12 MB) into
    # identity ops. Valid-region numerics are unchanged: convs are causal
    # (never read rightward pads) and padded keys are mask-biased out.
    tp = -(-t_mel // 128) * 128
    if tp != t_mel:
        pad_t = ((0, 0), (0, tp - t_mel), (0, 0))
        h = jnp.pad(h, pad_t)
        conds = jnp.pad(conds, pad_t)
        mask_p = jnp.pad(mel_mask, ((0, 0), (0, tp - t_mel)))
        noise_p = jnp.pad(noise[:, :t_mel], pad_t) if noise.shape[1] < tp else noise[:, :tp]
        mel = solve_euler(p, cfg, noise_p, h, spks, conds, mask=mask_p)[:, :t_mel]
    else:
        mel = solve_euler(p, cfg, noise[:, :t_mel], h, spks, conds, mask=mel_mask)
    return mel.astype(jnp.float32), mel_mask  # vocoder runs fp32 (flow.py:282 .float())
