"""GE2E-style voice encoder for T3 speaker conditioning.

Parity target: reference voice_encoder/voice_encoder.py (3-layer LSTM(256) ->
Linear(256) -> ReLU -> L2 norm; windowed partials of 160 mel frames at rate
1.3 averaged into utterance embeddings) with the 40-mel amp frontend from
core/dsp.ve_mel_spectrogram.

TPU-first: the LSTM runs as a ``lax.scan`` (core/layers.lstm); partial
windows are gathered with a static index matrix so the whole conditioning
path jits (BASELINE config 2).
"""

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..core.dsp import ve_mel_spectrogram
from ..core.layers import linear, lstm


@dataclass(frozen=True)
class VoiceEncoderConfig:
    num_mels: int = 40
    sample_rate: int = 16000
    speaker_embed_size: int = 256
    hidden_size: int = 256
    num_layers: int = 3
    partial_frames: int = 160
    default_rate: float = 1.3
    min_coverage: float = 0.8


def init_voice_encoder(key, cfg: VoiceEncoderConfig = VoiceEncoderConfig()):
    ks = jax.random.split(key, 2 + cfg.num_layers)
    layers = []
    cin = cfg.num_mels
    for i in range(cfg.num_layers):
        k1, k2 = jax.random.split(ks[i])
        s = 1.0 / np.sqrt(cfg.hidden_size)
        layers.append(
            {
                "w_ih": jax.random.uniform(k1, (cin, 4 * cfg.hidden_size), minval=-s, maxval=s),
                "w_hh": jax.random.uniform(k2, (cfg.hidden_size, 4 * cfg.hidden_size), minval=-s, maxval=s),
                "b": jnp.zeros((4 * cfg.hidden_size,)),
            }
        )
        cin = cfg.hidden_size
    return {
        "lstm": layers,
        "proj": {
            "w": jax.random.normal(ks[-1], (cfg.hidden_size, cfg.speaker_embed_size)) * 0.02,
            "b": jnp.zeros((cfg.speaker_embed_size,)),
        },
    }


def convert_voice_encoder(sd, cfg: VoiceEncoderConfig = VoiceEncoderConfig(), prefix=""):
    from ..checkpoint import torch_convert as tc

    return {
        "lstm": tc.lstm(sd, prefix + "lstm", cfg.num_layers),
        "proj": tc.linear(sd, prefix + "proj"),
    }


def ve_forward(p, mels: jnp.ndarray) -> jnp.ndarray:
    """(N, 160, 40) partial mels -> (N, 256) L2-normed embeddings
    (voice_encoder.py:139-160)."""
    _, hs = lstm(p["lstm"], mels)
    raw = jax.nn.relu(linear(p["proj"], hs[-1]))
    return raw / jnp.linalg.norm(raw, axis=1, keepdims=True)


def frame_step(cfg: VoiceEncoderConfig, rate=None) -> int:
    """voice_encoder.py:70-82."""
    if rate is None:
        return int(np.round(cfg.partial_frames * 0.5))
    return int(np.round((cfg.sample_rate / rate) / cfg.partial_frames))


def num_wins(n_frames: int, step: int, cfg: VoiceEncoderConfig) -> int:
    """voice_encoder.py:54-67."""
    win = cfg.partial_frames
    n_wins, remainder = divmod(max(n_frames - win + step, 0), step)
    if n_wins == 0 or (remainder + (win - step)) / win >= cfg.min_coverage:
        n_wins += 1
    return n_wins


def ve_embed_from_mels(
    p, cfg: VoiceEncoderConfig, mels: jnp.ndarray, n_valid_windows=None
) -> jnp.ndarray:
    """(B, T_mel, 40) mels -> (B, 256) utterance embeddings: windowed partials
    at rate 1.3, mean + L2-norm (voice_encoder.py:162-199).

    ``n_valid_windows`` (B,) limits the window average for zero-padded rows
    (lets callers bucket wav lengths while keeping exact semantics)."""
    t_mel = mels.shape[1]
    step = frame_step(cfg, cfg.default_rate)
    n = num_wins(t_mel, step, cfg)
    target = cfg.partial_frames + step * (n - 1)
    if target > t_mel:
        mels = jnp.pad(mels, ((0, 0), (0, target - t_mel), (0, 0)))
    idx = np.arange(n)[:, None] * step + np.arange(cfg.partial_frames)[None, :]
    partials = mels[:, idx]  # (B, N, 160, 40)
    b = partials.shape[0]
    flat = partials.reshape(b * n, cfg.partial_frames, cfg.num_mels)
    embeds = ve_forward(p, flat).reshape(b, n, -1)
    if n_valid_windows is None:
        raw = jnp.mean(embeds, axis=1)
    else:
        wmask = (jnp.arange(n)[None] < n_valid_windows[:, None])[..., None]
        raw = jnp.sum(embeds * wmask, axis=1) / jnp.maximum(
            n_valid_windows[:, None], 1
        ).astype(embeds.dtype)
    return raw / jnp.linalg.norm(raw, axis=1, keepdims=True)


def ve_embed_utterance(p, cfg: VoiceEncoderConfig, wav16: jnp.ndarray) -> jnp.ndarray:
    """(B, T) 16 kHz wav -> (B, 256) utterance embeddings, mirroring
    embeds_from_wavs -> embeds_from_mels (voice_encoder.py:246-274)."""
    mels = ve_mel_spectrogram(wav16).transpose(0, 2, 1)  # (B, T_mel, 40)
    return ve_embed_from_mels(p, cfg, mels)


def ve_embed_from_wavs(
    p,
    cfg: VoiceEncoderConfig,
    wavs,
    sample_rate: int,
    trim_top_db: float = 20.0,
) -> jnp.ndarray:
    """Arbitrary-rate host wavs -> (B, 256) embeddings: the full
    ``VoiceEncoder.embeds_from_wavs`` surface (voice_encoder.py:246-274).

    Resamples to 16 kHz with the kaiser_fast filter design when needed
    (voice_encoder.py:262 — dormant in the reference's live TTS pipeline,
    which feeds 16 kHz audio at tts.py:198), then trims silence at
    ``trim_top_db`` (voice_encoder.py:267) before the mel/partials path.

    Host-side parity API only: each wav is embedded at its exact trimmed
    length, so every distinct length triggers a fresh trace/compile of the
    mel+LSTM path. Do NOT feed this from the serving path — the batched TTS
    path buckets wav lengths and masks via ``ve_embed_from_mels``'s
    ``n_valid_windows`` instead.
    """
    import numpy as np

    from ..core.resample import resample
    from ..pipeline.audio import trim_silence

    if isinstance(wavs, np.ndarray) and wavs.ndim == 1:
        wavs = [wavs]
    outs = []
    for wav in wavs:
        wav = np.asarray(wav, np.float32).reshape(-1)
        if sample_rate != cfg.sample_rate:
            wav = np.asarray(resample(jnp.asarray(wav), sample_rate, cfg.sample_rate, quality="kaiser_fast"))
        if trim_top_db:
            wav = trim_silence(wav, top_db=trim_top_db)
        outs.append(ve_embed_utterance(p, cfg, jnp.asarray(wav)[None])[0])
    return jnp.stack(outs)
