"""Host-side audio I/O: WAV read/write (stdlib) + resample + silence trim.

Replaces the reference's librosa.load / librosa.effects.trim host DSP
(tts.py:184-186, voice_encoder.py:262-267) without the librosa dependency.
"""

import wave
from pathlib import Path

import numpy as np

from ..core.resample import resample as _resample_jax


def load_wav(path, target_sr: int = None) -> np.ndarray:
    """Read a PCM WAV file -> float32 mono in [-1, 1], optionally resampled.

    Uses the C++ decoder (chatterbox_tpu/native) when available; stdlib
    ``wave`` otherwise."""
    try:
        from ..native import wav_decode

        res = wav_decode(Path(path).read_bytes())
    except Exception:
        res = None
    if res is not None:
        x, sr = res
        if target_sr is not None and sr != target_sr:
            x = np.asarray(_resample_jax(x, sr, target_sr))
        return x.astype(np.float32)
    with wave.open(str(path), "rb") as f:
        sr = f.getframerate()
        n = f.getnframes()
        ch = f.getnchannels()
        width = f.getsampwidth()
        raw = f.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    elif width == 1:
        x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    elif width == 3:
        b = np.frombuffer(raw, np.uint8).reshape(-1, 3)
        x = (
            (b[:, 0].astype(np.int32) | (b[:, 1].astype(np.int32) << 8) | (b[:, 2].astype(np.int32) << 16))
            << 8
        ) >> 8
        x = x.astype(np.float32) / 8388608.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    if target_sr is not None and sr != target_sr:
        x = np.asarray(_resample_jax(x, sr, target_sr))
    return x.astype(np.float32)


def save_wav(path, wav: np.ndarray, sr: int):
    wav = np.asarray(wav).reshape(-1)
    with wave.open(str(path), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes((np.clip(wav, -1, 1) * 32767).astype(np.int16).tobytes())


def trim_silence(wav: np.ndarray, top_db: float = 20.0, frame_length: int = 2048, hop: int = 512):
    """librosa.effects.trim equivalent: strip leading/trailing frames more
    than top_db below the peak RMS (voice_encoder.py:267)."""
    if len(wav) < frame_length:
        return wav
    pad = frame_length // 2
    xp = np.pad(wav, (pad, pad), mode="constant")
    n_frames = 1 + (len(xp) - frame_length) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(frame_length)[None, :]
    rms = np.sqrt(np.mean(xp[idx] ** 2, axis=1) + 1e-12)
    db = 20.0 * np.log10(rms / (rms.max() + 1e-12) + 1e-12)
    keep = np.nonzero(db > -top_db)[0]
    if len(keep) == 0:
        return wav
    start = max(0, keep[0] * hop - pad)
    end = min(len(wav), keep[-1] * hop + frame_length - pad)
    return wav[start:end]
