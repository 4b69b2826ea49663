"""Kaldi-compatible log-mel fbank for the CAMPPlus x-vector frontend.

Mirrors ``torchaudio.compliance.kaldi.fbank(wave, num_mel_bins=80)`` with
torchaudio defaults (reference xvector.py:45-58):
  sample_frequency 16000, frame 25 ms / shift 10 ms, snip_edges=True,
  remove_dc_offset, preemphasis 0.97 (first sample replicated), povey window
  (hann^0.85), round-to-power-of-two FFT (512), power spectrum, HTK-mel
  triangular banks [20 Hz, nyquist], log(max(x, eps)).

Implemented as framing (strided slice) + fused matmuls so the whole
conditioning path jits onto the device.
"""

from functools import lru_cache

import numpy as np
import jax.numpy as jnp
from jax import lax

_EPS = 1.1920928955078125e-07  # float32 epsilon, torchaudio's log floor


def _povey_window(n: int) -> np.ndarray:
    k = np.arange(n, dtype=np.float64)
    hann = 0.5 - 0.5 * np.cos(2.0 * np.pi * k / (n - 1))
    return hann**0.85


def _hz_to_htk_mel(f):
    return 1127.0 * np.log(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


@lru_cache(maxsize=None)
def _kaldi_mel_banks(num_bins: int, n_fft: int, sr: int, low_freq: float = 20.0, high_freq: float = 0.0):
    """Kaldi mel banks, shape (num_bins, n_fft//2 + 1).

    Kaldi computes bins over fft bins 0..n_fft/2-1 (excludes nyquist); we emit
    a column of zeros for the nyquist bin to keep shapes aligned.
    """
    if high_freq <= 0.0:
        high_freq = sr / 2.0 + high_freq
    fft_bin_width = sr / n_fft
    mel_low = _hz_to_htk_mel(low_freq)
    mel_high = _hz_to_htk_mel(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)
    bins = np.zeros((num_bins, n_fft // 2 + 1))
    fft_freqs = fft_bin_width * np.arange(n_fft // 2)
    mel_freqs = _hz_to_htk_mel(fft_freqs)
    for m in range(num_bins):
        left, center, right = (
            mel_low + m * mel_delta,
            mel_low + (m + 1) * mel_delta,
            mel_low + (m + 2) * mel_delta,
        )
        up = (mel_freqs - left) / (center - left)
        down = (right - mel_freqs) / (right - center)
        bins[m, : n_fft // 2] = np.clip(np.minimum(up, down), 0.0, None)
    return bins.astype(np.float32)


def kaldi_fbank(wave: jnp.ndarray, num_mel_bins: int = 80, sr: int = 16000) -> jnp.ndarray:
    """(B, T) 16 kHz waveform (float, torch scale [-1,1] * 32768 NOT applied --
    torchaudio kaldi multiplies by 32768 internally only if int; reference
    passes float wav directly) -> (B, frames, num_mel_bins) log-mel.

    Note: absolute input scaling only shifts the log output by a constant per
    frame; CAMPPlus mean-normalizes over time (xvector.py:51), cancelling it.
    """
    wave = jnp.atleast_2d(wave)
    frame_len, frame_shift = int(0.025 * sr), int(0.010 * sr)
    n_fft = 1 << (frame_len - 1).bit_length()  # 512 for 400

    b, t = wave.shape
    m = 1 + (t - frame_len) // frame_shift  # snip_edges=True
    starts = np.arange(m) * frame_shift
    idx = starts[:, None] + np.arange(frame_len)[None, :]
    frames = wave[:, idx]  # (B, M, frame_len)

    # remove DC offset
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    # preemphasis with first sample replicated (kaldi semantics)
    prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
    frames = frames - 0.97 * prev
    # povey window
    frames = frames * jnp.asarray(_povey_window(frame_len), dtype=frames.dtype)

    # power spectrum via DFT matmul on the zero-padded frame
    n_freq = n_fft // 2 + 1
    n = np.arange(frame_len)[:, None]
    k = np.arange(n_freq)[None, :]
    ang = 2.0 * np.pi * k * n / n_fft  # zero-padding == truncated DFT basis
    cos_m = jnp.asarray(np.cos(ang).astype(np.float32))
    sin_m = jnp.asarray(np.sin(ang).astype(np.float32))
    re = jnp.einsum("bmf,fk->bmk", frames, cos_m, preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST)
    im = jnp.einsum("bmf,fk->bmk", frames, sin_m, preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST)
    power = re**2 + im**2

    banks = jnp.asarray(_kaldi_mel_banks(num_mel_bins, n_fft, sr))
    mel = jnp.einsum("bmk,nk->bmn", power, banks, preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST)
    return jnp.log(jnp.maximum(mel, _EPS))
