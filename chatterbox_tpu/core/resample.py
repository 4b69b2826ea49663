"""Polyphase sinc resampling as a strided convolution (jit-able, MXU-friendly).

The reference resamples with ``torchaudio.transforms.Resample`` (sinc_interp_hann,
s3gen.py:42-44) and ``librosa.resample(res_type='kaiser_fast')``
(voice_encoder.py:262, tts.py:186). Both are windowed-sinc polyphase filters;
we implement the torchaudio formulation (lowpass_filter_width=6, rolloff=0.99,
hann window) once and use it for every rate pair. The VE path therefore
deviates slightly from kaiser_fast -- the speaker embedding is insensitive to
the anti-aliasing window choice (gated by an embedding-similarity test).
"""

import math
from fractions import Fraction
from functools import lru_cache

import numpy as np
import jax.numpy as jnp
from jax import lax


@lru_cache(maxsize=None)
def _sinc_kernel(orig_freq: int, new_freq: int, lowpass_filter_width: int = 6, rolloff: float = 0.99):
    """torchaudio _get_sinc_resample_kernel (sinc_interp_hann).

    Returns (kernel (W, 1, new), width) where ``new`` output phases each see a
    window of ``W`` input samples.
    """
    base_freq = min(orig_freq, new_freq) * rolloff
    width = math.ceil(lowpass_filter_width * orig_freq / base_freq)
    idx = np.arange(-width, width + orig_freq, dtype=np.float64)[None, :] / orig_freq
    t = np.arange(0, -new_freq, -1, dtype=np.float64)[:, None] / new_freq + idx
    t = t * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)

    window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    t = t * np.pi
    scale = base_freq / orig_freq
    kernels = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernels = kernels * window * scale  # (new_freq, W)
    kern = kernels.T[:, None, :].astype(np.float32)  # (W, I=1, O=new_freq)
    return kern, width


def resample(x: jnp.ndarray, orig_sr: int, new_sr: int) -> jnp.ndarray:
    """Resample (B, T) or (T,) waveform; matches torchaudio Resample closely."""
    if orig_sr == new_sr:
        return x
    squeeze = x.ndim == 1
    x = jnp.atleast_2d(x)
    frac = Fraction(orig_sr, new_sr)
    orig_freq, new_freq = frac.numerator, frac.denominator
    kern_np, width = _sinc_kernel(orig_freq, new_freq)
    kern = jnp.asarray(kern_np)

    length = x.shape[1]
    target_len = int(math.ceil(new_freq * length / orig_freq))
    # pad right so the strided conv covers the tail
    x_p = jnp.pad(x, ((0, 0), (width, width + orig_freq)))
    y = lax.conv_general_dilated(
        x_p[:, :, None].astype(jnp.float32),
        kern,
        window_strides=(orig_freq,),
        padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )  # (B, frames, new_freq)
    y = y.reshape(y.shape[0], -1)[:, :target_len]
    return y[0] if squeeze else y
