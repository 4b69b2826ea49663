"""STFT / iSTFT and mel frontends as pure jit-able JAX functions.

TPU-first design notes
----------------------
The reference computes STFTs with cuFFT via ``torch.stft`` (hifigan.py:396-410,
s3tokenizer.py:156-160) and mels via librosa filterbank matmuls. On TPU the
FLOPs live on the MXU, so we express the STFT as a *strided convolution with a
windowed-DFT kernel* (and the iSTFT as its transpose): one
``lax.conv_general_dilated`` per transform, which XLA tiles directly onto the
systolic array. The FFT sizes here (16 / 400 / 1920) are far too small for an
FFT to win over a dense matmul on the MXU.

All functions use (B, T) waveforms and return (B, frames, freq) spectra
("time-major, channels-last"), the layout XLA prefers for fusing the
downstream mel matmul + log into the conv epilogue.
"""

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def hann_window(n: int, periodic: bool = True) -> np.ndarray:
    """``torch.hann_window`` / ``scipy.get_window('hann', n, fftbins=True)``."""
    if periodic:
        k = np.arange(n)
        return (0.5 - 0.5 * np.cos(2.0 * np.pi * k / n)).astype(np.float32)
    k = np.arange(n)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * k / (n - 1))).astype(np.float32)


@lru_cache(maxsize=None)
def _dft_kernels(n_fft: int, win_key) -> np.ndarray:
    """Windowed-DFT conv kernel, shape (n_fft, 1, 2*F) with F = n_fft//2 + 1.

    Output channel c<F is Re(X_c), channel F+c is Im(X_c), matching
    ``torch.stft``'s convention  X_k = sum_n x_n e^{-2 pi i k n / N}.
    """
    window = np.asarray(win_key, dtype=np.float64)
    n_freq = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_freq)[None, :]
    ang = 2.0 * np.pi * k * n / n_fft
    real = np.cos(ang) * window[:, None]
    imag = -np.sin(ang) * window[:, None]
    kern = np.concatenate([real, imag], axis=1)[:, None, :]  # (W, I=1, O=2F)
    return kern.astype(np.float32)


def _reflect_pad(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    return jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")


def stft(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    window: np.ndarray,
    center: bool = True,
    pad_mode: str = "reflect",
):
    """STFT of (B, T) -> (real, imag), each (B, frames, n_fft//2+1).

    Matches ``torch.stft(..., win_length=n_fft, normalized=False,
    onesided=True)``. ``center=True`` reflect-pads by n_fft//2 like torch.
    """
    assert x.ndim == 2, f"expected (B, T), got {x.shape}"
    if center:
        assert pad_mode == "reflect"
        x = _reflect_pad(x, n_fft // 2)
    kern = jnp.asarray(_dft_kernels(n_fft, tuple(np.asarray(window, np.float32))))
    out = lax.conv_general_dilated(
        x[:, :, None].astype(jnp.float32),
        kern,
        window_strides=(hop_length,),
        padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )  # (B, frames, 2F)
    n_freq = n_fft // 2 + 1
    return out[..., :n_freq], out[..., n_freq:]


@lru_cache(maxsize=None)
def _idft_kernels(n_fft: int, win_key) -> np.ndarray:
    """Inverse-DFT frame-synthesis matrix, (2F, n_fft), windowed.

    frame_n = window_n * (1/N) * sum_k w_k * (Re_k cos(2 pi k n/N) - Im_k sin(.))
    with w_k = 1 for k in {0, N/2} else 2 (one-sided hermitian expansion).
    """
    window = np.asarray(win_key, dtype=np.float64)
    n_freq = n_fft // 2 + 1
    k = np.arange(n_freq)[:, None]
    n = np.arange(n_fft)[None, :]
    ang = 2.0 * np.pi * k * n / n_fft
    wk = np.full((n_freq, 1), 2.0)
    wk[0] = 1.0
    if n_fft % 2 == 0:
        wk[-1] = 1.0
    real_m = wk * np.cos(ang) / n_fft
    imag_m = -wk * np.sin(ang) / n_fft
    m = np.concatenate([real_m, imag_m], axis=0)  # (2F, n_fft)
    m = m * window[None, :]
    return m.astype(np.float32)


@lru_cache(maxsize=None)
def _ola_envelope(n_fft: int, hop_length: int, frames: int, win_key) -> np.ndarray:
    """Sum of squared windows (the iSTFT normalization denominator)."""
    window = np.asarray(win_key, dtype=np.float64)
    total = (frames - 1) * hop_length + n_fft
    env = np.zeros(total)
    w2 = window**2
    for t in range(frames):
        env[t * hop_length : t * hop_length + n_fft] += w2
    return np.maximum(env, 1e-11).astype(np.float32)


def istft(
    real: jnp.ndarray,
    imag: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    window: np.ndarray,
    center: bool = True,
):
    """Inverse STFT of (B, frames, F) -> (B, T). Matches ``torch.istft``.

    Overlap-add runs as a transposed convolution (``lhs_dilation=hop``) so the
    synthesis matmul also lands on the MXU.
    """
    b, frames, n_freq = real.shape
    assert n_freq == n_fft // 2 + 1
    win_key = tuple(np.asarray(window, np.float32))
    m = jnp.asarray(_idft_kernels(n_fft, win_key))  # (2F, n_fft)
    spec = jnp.concatenate([real, imag], axis=-1)  # (B, frames, 2F)
    frames_td = jnp.einsum(
        "btf,fn->btn", spec.astype(jnp.float32), m, preferred_element_type=jnp.float32
    )  # (B, frames, n_fft) windowed time-domain frames

    # overlap-add as a transposed conv: treat the n_fft frame samples as input
    # channels and scatter each to its time offset with an identity kernel
    # (y[t*hop + w] += frames[t, w], i.e. ConvTranspose1d(n_fft, 1, n_fft, hop)
    # with weight[c, 0, w] = delta(c == w)).
    from .layers import conv_transpose1d

    eye = jnp.asarray(np.eye(n_fft, dtype=np.float32)[:, :, None])  # (W, Cin=n_fft, Cout=1)
    y = conv_transpose1d({"w": eye}, frames_td, stride=hop_length, padding=0)[..., 0]
    # (B, (frames-1)*hop + n_fft)

    env = jnp.asarray(_ola_envelope(n_fft, hop_length, frames, win_key))
    y = y / env
    if center:
        half = n_fft // 2
        y = y[:, half : y.shape[1] - half]
    return y


# ---------------------------------------------------------------------------
# librosa-compatible (slaney) mel filterbank
# ---------------------------------------------------------------------------


def _hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    mel = 3.0 * f / 200.0
    min_log_hz = 1000.0
    min_log_mel = 15.0
    logstep = np.log(6.4) / 27.0
    with np.errstate(divide="ignore"):
        log_mel = min_log_mel + np.log(np.maximum(f, 1e-30) / min_log_hz) / logstep
    return np.where(f >= min_log_hz, log_mel, mel)


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f = 200.0 * m / 3.0
    min_log_hz = 1000.0
    min_log_mel = 15.0
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), f)


@lru_cache(maxsize=None)
def mel_filterbank(sr: int, n_fft: int, n_mels: int, fmin: float = 0.0, fmax=None) -> np.ndarray:
    """librosa.filters.mel (htk=False, norm='slaney') -> (n_mels, 1 + n_fft//2)."""
    if fmax is None:
        fmax = sr / 2.0
    n_freq = 1 + n_fft // 2
    fftfreqs = np.linspace(0.0, sr / 2.0, n_freq)
    mel_pts = np.linspace(_hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax), n_mels + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


# ---------------------------------------------------------------------------
# The three mel frontends of the pipeline
# ---------------------------------------------------------------------------


def s3gen_mel_spectrogram(y: jnp.ndarray) -> jnp.ndarray:
    """24 kHz target-mel frontend -> (B, 80, frames), frames = T // 480.

    Mirrors reference utils/mel.py:33-81: n_fft 1920, hop 480, hann, reflect
    pad (n_fft-hop)/2 on both sides, center=False, mag = sqrt(re^2+im^2+1e-9),
    slaney mel 0..8000 Hz, log(clamp(x, 1e-5)).
    """
    y = jnp.atleast_2d(y)
    n_fft, hop = 1920, 480
    y = _reflect_pad(y, (n_fft - hop) // 2)
    re, im = stft(y, n_fft, hop, hann_window(n_fft), center=False)
    mag = jnp.sqrt(re**2 + im**2 + 1e-9)
    mel_w = jnp.asarray(mel_filterbank(24000, n_fft, 80, 0.0, 8000.0))
    mel = jnp.einsum("btf,mf->bmt", mag, mel_w, preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST)
    return jnp.log(jnp.clip(mel, min=1e-5))


def ve_mel_spectrogram(y: jnp.ndarray) -> jnp.ndarray:
    """VoiceEncoder 16 kHz mel frontend -> (B, 40, frames).

    Mirrors reference voice_encoder/melspec.py:26-64 with VoiceEncConfig:
    librosa.stft(n_fft 400, hop 160, win 400, center=True, reflect),
    |S|^2, slaney mel 40 (fmin 0, fmax 8000), no log ("amp" mel_type).
    librosa uses a *symmetric* hann window zero-padded to n_fft; win_size ==
    n_fft here so it is just the symmetric (fftbins=False? no: librosa
    get_window default fftbins=True) periodic hann -- identical to torch.
    """
    y = jnp.atleast_2d(y)
    re, im = stft(y, 400, 160, hann_window(400), center=True)
    power = re**2 + im**2
    mel_w = jnp.asarray(mel_filterbank(16000, 400, 40, 0.0, 8000.0))
    return jnp.einsum("btf,mf->bmt", power, mel_w, preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST)


def s3tok_log_mel_spectrogram(y: jnp.ndarray) -> jnp.ndarray:
    """S3 tokenizer 16 kHz whisper-style 128-mel frontend -> (B, 128, frames).

    Mirrors reference s3tokenizer/s3tokenizer.py:128-168: torch.stft(400, 160,
    hann, center=True), drop last frame, |S|^2, slaney mel 128 (fmin 0, fmax
    nyquist), log10 clamp 1e-10, floor at max-8, (x+4)/4.
    """
    y = jnp.atleast_2d(y)
    re, im = stft(y, 400, 160, hann_window(400), center=True)
    re, im = re[:, :-1], im[:, :-1]  # reference drops the final frame
    power = re**2 + im**2
    mel_w = jnp.asarray(mel_filterbank(16000, 400, 128))
    mel = jnp.einsum("btf,mf->bmt", power, mel_w, preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST)
    log_spec = jnp.log10(jnp.clip(mel, min=1e-10))
    log_spec = jnp.maximum(log_spec, jnp.max(log_spec, axis=(1, 2), keepdims=True) - 8.0)
    return (log_spec + 4.0) / 4.0
