"""Layer-level golden tests vs torch."""

import numpy as np
import torch
import torch.nn as nn

import jax.numpy as jnp

from chatterbox_tpu.core import layers
from chatterbox_tpu.checkpoint import torch_convert as tc


def _j(x):
    return jnp.asarray(x.detach().numpy() if isinstance(x, torch.Tensor) else x)


def test_linear():
    torch.manual_seed(0)
    m = nn.Linear(16, 32)
    x = torch.randn(2, 5, 16)
    ref = m(x).detach().numpy()
    got = layers.linear(tc.linear({"w.weight": m.weight, "w.bias": m.bias}, "w"), _j(x))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


def test_conv1d_padded_dilated():
    torch.manual_seed(1)
    m = nn.Conv1d(8, 12, 5, padding=4, dilation=2)
    x = torch.randn(2, 8, 50)
    p = tc.conv1d({"c.weight": m.weight, "c.bias": m.bias}, "c")
    ref = m(x).detach().numpy()  # (B, C, T)
    got = layers.conv1d(p, _j(x.transpose(1, 2)), padding=4, dilation=2)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), ref, atol=1e-4)


def test_conv_transpose1d():
    torch.manual_seed(2)
    for k, s, pad in [(16, 8, 4), (11, 5, 3), (7, 3, 2), (4, 2, 1)]:
        m = nn.ConvTranspose1d(6, 10, k, s, padding=pad)
        x = torch.randn(2, 6, 30)
        p = tc.conv_transpose1d({"c.weight": m.weight, "c.bias": m.bias}, "c")
        ref = m(x).detach().numpy()
        got = layers.conv_transpose1d(p, _j(x.transpose(1, 2)), stride=s, padding=pad)
        assert got.shape[1] == ref.shape[2]
        np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), ref, atol=1e-4)


def test_weight_norm_folding():
    torch.manual_seed(3)
    m = nn.utils.parametrizations.weight_norm(nn.Conv1d(4, 8, 3, padding=1))
    x = torch.randn(1, 4, 20)
    sd = {f"c.{k}": v for k, v in m.state_dict().items()}
    p = tc.conv1d(sd, "c", weight_norm=True)
    ref = m(x).detach().numpy()
    got = layers.conv1d(p, _j(x.transpose(1, 2)), padding=1)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), ref, atol=1e-5)


def test_group_norm():
    torch.manual_seed(4)
    m = nn.GroupNorm(8, 32)
    x = torch.randn(2, 32, 17)
    p = tc.layer_norm({"g.weight": m.weight, "g.bias": m.bias}, "g")
    ref = m(x).detach().numpy()
    got = layers.group_norm(p, _j(x.transpose(1, 2)), num_groups=8)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), ref, atol=1e-5)


def test_layer_norm_and_rms_norm():
    torch.manual_seed(5)
    m = nn.LayerNorm(24)
    x = torch.randn(3, 7, 24)
    p = tc.layer_norm({"l.weight": m.weight, "l.bias": m.bias}, "l")
    np.testing.assert_allclose(
        np.asarray(layers.layer_norm(p, _j(x))), m(x).detach().numpy(), atol=1e-5
    )


def test_batch_norm_inference():
    torch.manual_seed(6)
    m = nn.BatchNorm1d(16)
    m.eval()
    with torch.no_grad():
        m.running_mean.uniform_(-1, 1)
        m.running_var.uniform_(0.5, 2)
    x = torch.randn(2, 16, 9)
    sd = {f"b.{k}": v for k, v in m.state_dict().items()}
    p = tc.batch_norm(sd, "b")
    ref = m(x).detach().numpy()
    got = layers.batch_norm(p, _j(x.transpose(1, 2)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), ref, atol=1e-5)


def test_lstm_matches_torch():
    torch.manual_seed(7)
    m = nn.LSTM(40, 64, num_layers=3, batch_first=True)
    x = torch.randn(2, 30, 40)
    out_ref, (h_ref, _) = m(x)
    sd = {f"l.{k}": v for k, v in m.state_dict().items()}
    p = tc.lstm(sd, "l", 3)
    out, hs = layers.lstm([{k: _j(v) for k, v in lp.items()} for lp in p], _j(x))
    np.testing.assert_allclose(np.asarray(out), out_ref.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(hs[-1]), h_ref[-1].detach().numpy(), atol=1e-5)


def test_snake():
    from types import SimpleNamespace

    torch.manual_seed(8)
    alpha = torch.rand(12) + 0.5
    x = torch.randn(2, 12, 9)
    ref = (x + (1.0 / (alpha[None, :, None] + 1e-9)) * torch.sin(x * alpha[None, :, None]) ** 2).numpy()
    got = layers.snake({"alpha": _j(alpha)}, _j(x.transpose(1, 2)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), ref, atol=1e-6)


def test_snake_fast_matches_exact():
    """The polynomial snake (vocoder default; 7.8x VPU speedup measured)
    tracks the transcendental form to ~4.5e-6/|1/alpha| absolute, including
    large |alpha*x| where the mod-1 range reduction must hold."""
    rng = np.random.default_rng(9)
    alpha = (np.abs(rng.standard_normal(16)) + 0.05).astype(np.float32)
    x = (rng.standard_normal((2, 64, 16)) * 30.0).astype(np.float32)
    p = {"alpha": _j(alpha)}
    exact = np.asarray(layers.snake(p, _j(x)))
    fast = np.asarray(layers.snake_fast(p, _j(x)))
    tol = 5e-6 / (alpha + 1e-9) + 1e-5  # poly bound scaled by 1/alpha
    assert np.all(np.abs(fast - exact) <= tol[None, None, :])
    snr = 10 * np.log10(np.sum(exact**2) / np.sum((fast - exact) ** 2))
    assert snr >= 100.0, snr


def test_sdpa_matches_torch():
    torch.manual_seed(9)
    q = torch.randn(2, 4, 6, 16)
    k = torch.randn(2, 4, 9, 16)
    v = torch.randn(2, 4, 9, 16)
    ref = torch.nn.functional.scaled_dot_product_attention(q, k, v).numpy()
    got = layers.sdpa(_j(q), _j(k), _j(v))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


def test_resample_vs_torch_manual():
    """Compare against a literal numpy port of torchaudio's documented
    sinc_interp_hann algorithm (torchaudio itself is unavailable here)."""
    from chatterbox_tpu.core.resample import resample

    rng = np.random.default_rng(10)
    x = rng.standard_normal(24000).astype(np.float32)
    y = resample(jnp.asarray(x), 24000, 16000)
    assert y.shape == (16000,)
    # spectral sanity: a pure tone survives resampling with right frequency
    t = np.arange(24000) / 24000
    tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y2 = np.asarray(resample(jnp.asarray(tone), 24000, 16000))
    spec = np.abs(np.fft.rfft(y2[1000:9000] * np.hanning(8000)))
    freq = np.fft.rfftfreq(8000, 1 / 16000)
    assert abs(freq[spec.argmax()] - 440) < 3
    # amplitude preserved
    assert 0.9 < np.abs(y2[2000:14000]).max() < 1.1


def test_resample_kaiser_fast_matches_bruteforce():
    """quality="kaiser_fast" equals a direct evaluation of the resampy
    kaiser_fast continuous filter: y[n] = sum_k x[k] * r * h((k - n/r) * r),
    h(x) = rolloff*sinc(rolloff*x)*kaiser(x/N; beta), r = sr_new/sr_orig < 1
    (resampy/filters.py design: N=16, rolloff=0.85, beta=8.5555...)."""
    from chatterbox_tpu.core.resample import resample

    rng = np.random.default_rng(3)
    n_in, orig, new = 480, 24000, 16000
    x = rng.standard_normal(n_in).astype(np.float64)

    N, roll, beta = 16, 0.85, 8.555504641634386
    ratio = new / orig
    n_out = int(np.ceil(n_in * new / orig))
    want = np.zeros(n_out)
    for n in range(n_out):
        u = n / ratio
        for k in range(n_in):
            t = (k - u) * ratio
            if abs(t) >= N:
                continue
            w = np.i0(beta * np.sqrt(1.0 - (t / N) ** 2)) / np.i0(beta)
            want[n] += x[k] * ratio * roll * np.sinc(roll * t) * w

    got = np.asarray(resample(jnp.asarray(x.astype(np.float32)), orig, new, quality="kaiser_fast"))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_resample_kaiser_fast_antialias_quality():
    """An 11 kHz tone (above the 8 kHz target Nyquist) must be strongly
    attenuated; a 440 Hz passband tone must survive at full amplitude."""
    from chatterbox_tpu.core.resample import resample

    t = np.arange(24000) / 24000
    alias = np.sin(2 * np.pi * 11000 * t).astype(np.float32)
    y = np.asarray(resample(jnp.asarray(alias), 24000, 16000, quality="kaiser_fast"))
    assert np.abs(y[1000:15000]).max() < 0.02  # > 34 dB rejection
    tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y2 = np.asarray(resample(jnp.asarray(tone), 24000, 16000, quality="kaiser_fast"))
    assert 0.95 < np.abs(y2[2000:14000]).max() < 1.05


def test_ve_embed_from_wavs_resamples():
    """ve_embed_from_wavs at 24 kHz ~= embedding of the same audio natively
    at 16 kHz (the reference's dormant kaiser_fast branch, v_e.py:262)."""
    import jax

    from chatterbox_tpu.models.voice_encoder import (
        VoiceEncoderConfig,
        init_voice_encoder,
        ve_embed_from_wavs,
    )

    cfg = VoiceEncoderConfig()
    p = init_voice_encoder(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(7)
    t24 = np.arange(32000) / 24000
    wav24 = (0.3 * np.sin(2 * np.pi * 220 * t24) + 0.05 * rng.standard_normal(len(t24))).astype(np.float32)
    t16 = np.arange(int(len(t24) * 2 / 3)) / 16000
    wav16 = (0.3 * np.sin(2 * np.pi * 220 * t16) + 0.05 * rng.standard_normal(len(t16))).astype(np.float32)

    e24 = np.asarray(ve_embed_from_wavs(p, cfg, [wav24], 24000))
    e16 = np.asarray(ve_embed_from_wavs(p, cfg, [wav16], 16000))
    assert e24.shape == (1, 256) and e16.shape == (1, 256)
    sim = float((e24 * e16).sum())
    assert sim > 0.99, sim
