"""S3Gen composite: speech tokens + reference voice -> 24 kHz waveform.

Parity target: reference s3gen/s3gen.py (S3Token2Mel / S3Token2Wav):
``embed_ref`` builds {prompt_token, prompt_feat, embedding} from a reference
wav; ``inference`` = flow (tokens -> mel) + HiFT (mel -> wav) + 20 ms
trim-fade (s3gen.py:232-236, 293-296).

TPU-first: fully batched with masks (the reference asserts B=1), all
stochastic sites injected, one jit region per stage.
"""

from dataclasses import dataclass, field
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ...constants import S3GEN_SR, S3_SR
from ...core import dsp
from ...core.resample import resample
from ..s3tokenizer import S3TokenizerConfig, init_s3tokenizer, s3_tokenize
from .flow import FlowConfig, convert_flow, flow_inference, init_flow
from .hifigan import HiFTConfig, convert_hift, hift_generate, init_hift
from .xvector import CAMPPlusConfig, campplus_embed_wav, convert_campplus, init_campplus


@dataclass(frozen=True)
class S3GenConfig:
    flow: FlowConfig = field(default_factory=FlowConfig)
    hift: HiFTConfig = field(default_factory=lambda: HiFTConfig(sampling_rate=S3GEN_SR))
    campplus: CAMPPlusConfig = field(default_factory=CAMPPlusConfig)
    tokenizer: S3TokenizerConfig = field(default_factory=S3TokenizerConfig)
    trim_n: int = S3GEN_SR // 50  # 20 ms fade (s3gen.py:233)


def flow_steps_from_env(cfg: S3GenConfig) -> S3GenConfig:
    """Apply the CHATTERBOX_FLOW_STEPS env override (CFM Euler step count;
    the reference hardcodes 10, flow_matching.py:215). Quality/speed knob:
    measured curve in docs/PERFORMANCE.md (scripts/probe_flow_steps.py).
    No-op unless the env var is set -- both TTS and VC pipelines call this
    at construction so the knob covers every flow consumer."""
    import os
    from dataclasses import replace

    n = os.environ.get("CHATTERBOX_FLOW_STEPS")
    if not n:
        return cfg
    try:
        steps = int(n)
    except ValueError:
        raise ValueError(
            f"CHATTERBOX_FLOW_STEPS must be an integer >= 1, got {n!r}"
        ) from None
    if steps < 1:
        raise ValueError(
            f"CHATTERBOX_FLOW_STEPS must be >= 1 (a zero/negative Euler step "
            f"count degenerates the CFM solve), got {steps}"
        )
    if steps != cfg.flow.n_timesteps:
        return replace(cfg, flow=replace(cfg.flow, n_timesteps=steps))
    return cfg


class RefDict(NamedTuple):
    """Precomputed reference-voice conditioning (s3gen.py:151-157)."""

    prompt_token: jnp.ndarray  # (B, P) int32
    prompt_token_len: jnp.ndarray  # (B,)
    prompt_feat: jnp.ndarray  # (B, 2P, 80)
    embedding: jnp.ndarray  # (B, 192)


def init_s3gen(key, cfg: S3GenConfig = S3GenConfig()):
    ks = jax.random.split(key, 4)
    return {
        "flow": init_flow(ks[0], cfg.flow),
        "hift": init_hift(ks[1], cfg.hift),
        "campplus": init_campplus(ks[2], cfg.campplus),
        "tokenizer": init_s3tokenizer(ks[3], cfg.tokenizer),
    }


def infer_s3gen_config(sd, cfg: S3GenConfig = None) -> S3GenConfig:
    """Adapt the static config to the checkpoint where shapes can tell us
    more: the tokenizer subtree's architecture is inferred from its tensor
    shapes (models/s3tokenizer.s3tok_config_from_sd) so real-weights layout
    drift surfaces at load, not as silently-wrong tokens."""
    import dataclasses

    from ..s3tokenizer import s3tok_config_from_sd

    cfg = cfg or S3GenConfig()
    if any(k.startswith("tokenizer.") for k in sd):
        cfg = dataclasses.replace(cfg, tokenizer=s3tok_config_from_sd(sd, "tokenizer."))
    return cfg


def convert_s3gen(sd, cfg: S3GenConfig = S3GenConfig()):
    """Map the reference s3gen.safetensors state dict (strict=False in the
    reference, tts.py:152-154) into our pytree. The tokenizer lives in the
    same checkpoint under 'tokenizer.'."""
    from ..s3tokenizer import convert_s3tokenizer

    p = {
        "flow": convert_flow(sd, cfg.flow, prefix="flow."),
        "hift": convert_hift(sd, cfg.hift, prefix="mel2wav."),
        "campplus": convert_campplus(sd, cfg.campplus, prefix="speaker_encoder."),
    }
    try:
        p["tokenizer"] = convert_s3tokenizer(sd, cfg.tokenizer, prefix="tokenizer.")
    except KeyError:
        # checkpoint variant without tokenizer weights; caller must supply
        p["tokenizer"] = None
    return p


def embed_ref(p, cfg: S3GenConfig, ref_wav: jnp.ndarray, ref_sr: int) -> RefDict:
    """(B, T) reference wav -> RefDict. Mirrors s3gen.py:107-157.

    The mel/token 2:1 length reconciliation (s3gen.py:144-149) is preserved:
    prompt tokens are truncated to mel_frames // 2.
    """
    ref_wav = jnp.atleast_2d(ref_wav)
    wav24 = ref_wav if ref_sr == S3GEN_SR else resample(ref_wav, ref_sr, S3GEN_SR)
    wav16 = resample(ref_wav, ref_sr, S3_SR)

    mels = dsp.s3gen_mel_spectrogram(wav24).transpose(0, 2, 1)  # (B, T_mel, 80)
    xvec = campplus_embed_wav(p["campplus"], cfg.campplus, wav16)
    tokens, token_lens = s3_tokenize(p["tokenizer"], cfg.tokenizer, wav16)
    n_tok = min(mels.shape[1] // 2, tokens.shape[1])
    tokens = tokens[:, :n_tok]
    mels = mels[:, : 2 * n_tok]
    token_lens = jnp.minimum(token_lens, n_tok)
    return RefDict(tokens.astype(jnp.int32), token_lens, mels, xvec)


def s3gen_wav(
    p,
    cfg: S3GenConfig,
    speech_tokens: jnp.ndarray,
    token_lens: jnp.ndarray,
    ref: RefDict,
    noise_mel: jnp.ndarray,
    rng: jax.Array = None,
    phase_noise=None,
    additive_noise=None,
    hift_dtype=None,
):
    """Tokens -> (wav (B, T_wav), wav_lens (B,), source).

    noise_mel: (B, 2*(P+T), 80) CFM noise (the reference slices a fixed
    randn buffer; pass the same buffer for allclose parity).
    hift_dtype: vocoder conv-trunk compute dtype (see hift_decode); None
    keeps the fully-fp32 reference-parity path.
    """
    mel, mel_mask = flow_inference(
        p["flow"],
        cfg.flow,
        speech_tokens,
        token_lens,
        ref.prompt_token,
        ref.prompt_token_len,
        ref.prompt_feat,
        ref.embedding,
        noise_mel,
    )
    mel_len1 = ref.prompt_feat.shape[1]
    gen_mel = mel[:, mel_len1:]  # (B, 2T, 80)
    wav, source = hift_generate(
        p["hift"], cfg.hift, gen_mel, rng=rng, phase_noise=phase_noise,
        additive_noise=additive_noise, compute_dtype=hift_dtype,
        # masked vocoding: rows are right-padded to the token bucket, and
        # the vocoder's non-causal convs otherwise bleed pad-region junk
        # back into the tail of each row's valid audio (see hift_decode)
        n_valid=(2 * token_lens).astype(jnp.int32),
    )
    # trim-fade the first 20 ms (s3gen.py:232-236, 293-296)
    n = cfg.trim_n
    fade = jnp.concatenate(
        [jnp.zeros((n,)), (jnp.cos(jnp.linspace(np.pi, 0.0, n)) + 1.0) / 2.0]
    )
    wav = wav.at[:, : 2 * n].multiply(fade[None])
    wav_lens = (token_lens * 2 * 480).astype(jnp.int32)
    return wav, wav_lens, source
