"""Perth-style implicit audio watermarking (apply + extract).

Capability parity: the reference watermarks EVERY output waveform with
``perth.PerthImplicitWatermarker`` (tts.py:126,271; vc.py:29,103) and exposes
``get_watermark`` for verification (README.md:89-108).

The upstream Perth network is an external dependency with its own shipped
weights (not in the chatterbox checkpoints and not fetchable offline), so this
module provides the same API with two engines:
  - ``NeuralWatermarker``: a JAX implicit watermarker with the same shape of
    architecture (STFT-magnitude-domain encoder/decoder conv nets); weights
    random-init by default, loadable from a converted Perth checkpoint when
    available (`convert_perth`).
  - ``SpreadSpectrumWatermarker`` (default): a deterministic, weightless
    spread-spectrum watermark in the 2-9 kHz band that round-trips reliably
    and is inaudible at the default strength -- keeping the "always
    watermarked" capability contract intact without upstream weights.
    Note: extraction needs audible content in the band (the multiplicative
    modulation has nothing to act on in near-silence); ~1 s of ordinary
    speech decodes the 16-bit payload at >=90% accuracy.
"""

from dataclasses import dataclass
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..core import dsp
from ..core.layers import conv1d


@dataclass(frozen=True)
class WatermarkConfig:
    n_fft: int = 512
    hop: int = 128
    # +-0.65 dB static magnitude ripple: perceptually transparent, ~2.5 sigma
    # per bit for blind extraction on 1 s of white noise (worst case; speech
    # integrates better) -- validated in test_watermark_roundtrip
    strength: float = 0.075
    band_lo: int = 40  # bins (~1.9 kHz at 24 kHz sr)
    band_hi: int = 200  # bins (~9.4 kHz)
    payload_bits: int = 16
    seed: int = 0x5EED


@lru_cache(maxsize=None)
def _pn_sequence(cfg_seed: int, bits: int, band: int) -> np.ndarray:
    """Pseudo-noise basis: one pattern per payload bit over the band.

    Rows are mutually orthonormal (zero bit cross-talk) and orthogonal to the
    all-ones vector (immune to per-frame loudness normalization), scaled to
    unit RMS per entry."""
    rng = np.random.default_rng(cfg_seed)
    g = np.concatenate([np.ones((1, band)), rng.standard_normal((bits, band))])
    q, _ = np.linalg.qr(g.T)  # columns orthonormal
    return (q[:, 1 : bits + 1].T * np.sqrt(band)).astype(np.float32)


class SpreadSpectrumWatermarker:
    """Deterministic spread-spectrum watermarker (default engine).

    Device work is jitted (cached per input shape) -- eager DSP ops are
    pathologically slow on remote/tunneled backends."""

    def __init__(self, cfg: WatermarkConfig = WatermarkConfig()):
        self.cfg = cfg
        self._jit_apply = {}
        self._jit_extract = {}

    def band_pattern(self, watermark=None) -> np.ndarray:
        """The (band,) log-magnitude modulation pattern for a payload --
        lets pipelines fuse the watermark into their synthesis graph
        (apply_in_graph)."""
        cfg = self.cfg
        pn = _pn_sequence(cfg.seed, cfg.payload_bits, cfg.band_hi - cfg.band_lo)
        if watermark is None:
            payload = np.ones(cfg.payload_bits, np.float32)
        else:
            payload = np.asarray(watermark, np.float32) * 2 - 1
        return (payload @ pn) / np.sqrt(cfg.payload_bits)

    def apply_in_graph(self, wav, pattern):
        """Jit-traceable watermark application on (B, T) device arrays.

        Same numerics as apply_watermark (pads to a hop multiple in-graph)."""
        cfg = self.cfg
        t_len = wav.shape[-1]
        pad = (-t_len) % cfg.hop
        x = jnp.pad(wav.astype(jnp.float32), ((0, 0), (0, pad)))
        win = dsp.hann_window(cfg.n_fft)
        re, im = dsp.stft(x, cfg.n_fft, cfg.hop, win)
        mag = jnp.sqrt(re**2 + im**2 + 1e-12)
        scale = 1.0 + cfg.strength * pattern[None, None, :]
        mag_band = mag[..., cfg.band_lo : cfg.band_hi] * scale
        ratio = mag_band / mag[..., cfg.band_lo : cfg.band_hi]
        re = re.at[..., cfg.band_lo : cfg.band_hi].multiply(ratio)
        im = im.at[..., cfg.band_lo : cfg.band_hi].multiply(ratio)
        y = dsp.istft(re, im, cfg.n_fft, cfg.hop, win)
        y = jnp.pad(y, ((0, 0), (0, max(0, t_len - y.shape[-1]))))[:, :t_len]
        return y

    def _apply_fn(self):
        cfg = self.cfg

        @jax.jit
        def apply(x, pattern):
            win = dsp.hann_window(cfg.n_fft)
            re, im = dsp.stft(x, cfg.n_fft, cfg.hop, win)
            mag = jnp.sqrt(re**2 + im**2 + 1e-12)
            scale = 1.0 + cfg.strength * pattern[None, None, :]
            mag_band = mag[..., cfg.band_lo : cfg.band_hi] * scale
            ratio = mag_band / mag[..., cfg.band_lo : cfg.band_hi]
            re = re.at[..., cfg.band_lo : cfg.band_hi].multiply(ratio)
            im = im.at[..., cfg.band_lo : cfg.band_hi].multiply(ratio)
            return dsp.istft(re, im, cfg.n_fft, cfg.hop, win)

        return apply

    def apply_watermark(self, wav, watermark=None, sample_rate: int = 24000):
        """wav (T,) or (B, T) float32 -> watermarked, same shape/length."""
        cfg = self.cfg
        squeeze = np.ndim(wav) == 1
        x = np.atleast_2d(np.asarray(wav, np.float32))
        t_len = x.shape[-1]
        pad = (-t_len) % cfg.hop  # frame-align so the iSTFT covers the tail
        x = np.pad(x, ((0, 0), (0, pad)))
        band = cfg.band_hi - cfg.band_lo
        pn = _pn_sequence(cfg.seed, cfg.payload_bits, band)
        if watermark is None:
            payload = np.ones(cfg.payload_bits, np.float32)
        else:
            payload = np.asarray(watermark, np.float32) * 2 - 1
        # unit-RMS band pattern (rows orthonormal)
        pattern = (payload @ pn) / np.sqrt(cfg.payload_bits)
        fn = self._jit_apply.setdefault(x.shape, self._apply_fn())
        y = np.asarray(fn(jnp.asarray(x), jnp.asarray(pattern)))
        y = np.pad(y, ((0, 0), (0, max(0, t_len - y.shape[-1]))))[:, :t_len]
        return y[0] if squeeze else y

    def get_watermark(self, wav, sample_rate: int = 24000):
        """Extract the payload correlation -> bit array (payload_bits,)."""
        cfg = self.cfg
        x = np.atleast_2d(np.asarray(wav, np.float32))
        pn = _pn_sequence(cfg.seed, cfg.payload_bits, cfg.band_hi - cfg.band_lo)

        def build():
            @jax.jit
            def extract(xx):
                win = dsp.hann_window(cfg.n_fft)
                re, im = dsp.stft(xx, cfg.n_fft, cfg.hop, win)
                mag = jnp.sqrt(re**2 + im**2 + 1e-12)
                band = jnp.log(mag[..., cfg.band_lo : cfg.band_hi] + 1e-9)
                resid = band - jnp.mean(band, axis=-1, keepdims=True)
                return jnp.einsum("btf,kf->k", resid, jnp.asarray(pn))

            return extract

        fn = self._jit_extract.setdefault(x.shape, build())
        corr = np.asarray(fn(jnp.asarray(x)))
        return (corr > 0).astype(np.int32)


class NeuralWatermarker:
    """Perth-architecture-shaped neural watermarker (encoder/decoder conv
    stacks on log-magnitude STFT). Weights are random-init unless a converted
    Perth checkpoint is supplied; with random weights apply() is a no-op-level
    perturbation and extraction accuracy is chance."""

    def __init__(self, params=None, cfg: WatermarkConfig = WatermarkConfig()):
        self.cfg = cfg
        if params is None:
            params = self.init(jax.random.PRNGKey(cfg.seed))
        self.params = params

    def init(self, key):
        cfg = self.cfg
        f = cfg.n_fft // 2 + 1
        ks = jax.random.split(key, 6)

        def conv(k, w, i, o):
            return {"w": jax.random.normal(k, (w, i, o)) * 0.02, "b": jnp.zeros((o,))}

        return {
            "enc": [conv(ks[0], 3, f, 256), conv(ks[1], 3, 256, 256), conv(ks[2], 3, 256, f)],
            "dec": [conv(ks[3], 3, f, 256), conv(ks[4], 3, 256, 256), conv(ks[5], 3, 256, cfg.payload_bits)],
        }

    def _net(self, layers, x):
        for i, lp in enumerate(layers):
            x = conv1d(lp, x, padding=1)
            if i < len(layers) - 1:
                x = jax.nn.gelu(x)
        return x

    def apply_watermark(self, wav, watermark=None, sample_rate: int = 24000):
        cfg = self.cfg
        squeeze = np.ndim(wav) == 1
        x = jnp.atleast_2d(jnp.asarray(wav, jnp.float32))
        t_len = x.shape[-1]
        x = jnp.pad(x, ((0, 0), (0, (-t_len) % cfg.hop)))
        win = dsp.hann_window(cfg.n_fft)
        re, im = dsp.stft(x, cfg.n_fft, cfg.hop, win)
        logmag = jnp.log(jnp.sqrt(re**2 + im**2) + 1e-6)
        delta = jnp.tanh(self._net(self.params["enc"], logmag))
        scale = jnp.exp(cfg.strength * delta)
        re, im = re * scale, im * scale
        y = dsp.istft(re, im, cfg.n_fft, cfg.hop, win)
        y = jnp.pad(y, ((0, 0), (0, max(0, t_len - y.shape[-1]))))[:, :t_len]
        y = np.asarray(y)
        return y[0] if squeeze else y

    def get_watermark(self, wav, sample_rate: int = 24000):
        cfg = self.cfg
        x = jnp.atleast_2d(jnp.asarray(wav, jnp.float32))
        win = dsp.hann_window(cfg.n_fft)
        re, im = dsp.stft(x, cfg.n_fft, cfg.hop, win)
        logmag = jnp.log(jnp.sqrt(re**2 + im**2) + 1e-6)
        logits = jnp.mean(self._net(self.params["dec"], logmag), axis=(0, 1))
        return (np.asarray(logits) > 0).astype(np.int32)


def PerthImplicitWatermarker(cfg: WatermarkConfig = WatermarkConfig()):
    """Factory matching the reference's constructor name (tts.py:126)."""
    return SpreadSpectrumWatermarker(cfg)
