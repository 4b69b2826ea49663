"""Polyphase sinc resampling as a strided convolution (jit-able, MXU-friendly).

Reference resample sites and the filters they use:

- ``torchaudio.transforms.Resample`` (sinc_interp_hann, lowpass_filter_width 6,
  rolloff 0.99) for 24k->16k inside S3Gen's ``embed_ref`` (s3gen.py:42-44) —
  the ``window="hann"`` path here is a literal port of that kernel design.
- ``librosa.resample`` with the librosa>=0.10 *default* ``res_type``
  ("soxr_hq") for the 24k->16k conditioning wav (tts.py:186). soxr is not
  reimplementable bit-exactly offline; the hann path stands in (both are
  windowed-sinc anti-aliasing filters, and the downstream consumers — S3
  tokenizer mel + VoiceEncoder — are gated by embedding-similarity tests).
- ``librosa.resample(res_type="kaiser_fast")`` inside
  ``VoiceEncoder.embeds_from_wavs`` (voice_encoder.py:262). NOTE: in the live
  TTS pipeline this branch is DORMANT — ``embeds_from_wavs`` is called with
  already-16 kHz audio (tts.py:198) so librosa never resamples there. It only
  runs for direct API calls with non-16k input, which
  ``ve_embed_from_wavs`` mirrors using the ``quality="kaiser_fast"`` path:
  the same filter design as resampy's kaiser_fast (num_zeros 16, rolloff
  0.85, Kaiser beta 8.5555), but with taps evaluated from the continuous
  windowed sinc instead of resampy's 2^precision-entry interpolated table.
"""

import math
from fractions import Fraction
from functools import lru_cache

import numpy as np
import jax.numpy as jnp
from jax import lax

# resampy filter designs (resampy/filters.py): (num_zeros, rolloff, beta).
# resampy's table `interp_win = rolloff * sinc(rolloff*x) * kaiser(x, beta)`
# over |x| <= num_zeros maps onto the torchaudio kernel parametrization below
# via t = rolloff * x, i.e. clip limit lowpass_filter_width = num_zeros *
# rolloff and window argument t / lowpass_filter_width = x / num_zeros.
_KAISER_DESIGNS = {
    "kaiser_fast": (16, 0.85, 8.555504641634386),
    "kaiser_best": (64, 0.9475, 14.769656459379492),
}


@lru_cache(maxsize=None)
def _sinc_kernel(
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: float = 6.0,
    rolloff: float = 0.99,
    window: str = "hann",
    beta: float = 0.0,
):
    """torchaudio _get_sinc_resample_kernel (sinc_interp_hann), generalized
    with a continuous-Kaiser window option.

    Returns (kernel (W, 1, new), width) where ``new`` output phases each see a
    window of ``W`` input samples.
    """
    base_freq = min(orig_freq, new_freq) * rolloff
    width = math.ceil(lowpass_filter_width * orig_freq / base_freq)
    idx = np.arange(-width, width + orig_freq, dtype=np.float64)[None, :] / orig_freq
    t = np.arange(0, -new_freq, -1, dtype=np.float64)[:, None] / new_freq + idx
    t = t * base_freq
    t_raw = t
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)

    if window == "hann":
        win = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    elif window == "kaiser":
        # continuous Kaiser: I0(beta*sqrt(1-u^2))/I0(beta), u = t/clip-limit.
        # Unlike hann, the Kaiser window is NONZERO at its support edge, so
        # taps outside the support must be zeroed (clipping would hold the
        # boundary value across the kernel's rectangular-grid corners).
        u = t / lowpass_filter_width
        win = np.i0(beta * np.sqrt(np.maximum(1.0 - u * u, 0.0))) / np.i0(beta)
        win = np.where(np.abs(t_raw) < lowpass_filter_width, win, 0.0)
    else:  # pragma: no cover - guarded by callers
        raise ValueError(f"unknown window {window!r}")
    t = t * np.pi
    scale = base_freq / orig_freq
    kernels = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernels = kernels * win * scale  # (new_freq, W)
    kern = kernels.T[:, None, :].astype(np.float32)  # (W, I=1, O=new_freq)
    return kern, width


def resample(x: jnp.ndarray, orig_sr: int, new_sr: int, quality: str = "hann") -> jnp.ndarray:
    """Resample (B, T) or (T,) waveform.

    quality="hann" matches torchaudio Resample defaults; "kaiser_fast" /
    "kaiser_best" use the resampy filter designs of the same name (librosa
    res_type), with exact continuous tap evaluation.
    """
    if orig_sr == new_sr:
        return x
    squeeze = x.ndim == 1
    x = jnp.atleast_2d(x)
    frac = Fraction(orig_sr, new_sr)
    orig_freq, new_freq = frac.numerator, frac.denominator
    if quality in _KAISER_DESIGNS:
        num_zeros, rolloff, beta = _KAISER_DESIGNS[quality]
        kern_np, width = _sinc_kernel(
            orig_freq, new_freq, num_zeros * rolloff, rolloff, "kaiser", beta
        )
    elif quality == "hann":
        kern_np, width = _sinc_kernel(orig_freq, new_freq)
    else:
        raise ValueError(f"unknown resample quality {quality!r}")
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
