"""Golden-parity tests for the JAX HiFT vocoder against the reference torch
implementation (importable: hifigan.py depends only on torch/numpy/scipy)."""

import importlib.util
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp


def load_ref_module(name, path):
    """Import a reference .py file standalone (the package __init__ fails on
    missing deps; these module files only need torch/numpy/scipy)."""
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod

from chatterbox_tpu.models.s3gen.hifigan import (
    HiFTConfig,
    convert_hift,
    f0_predict,
    hift_decode,
    hift_generate,
    init_hift,
)

CFG = HiFTConfig()


@pytest.fixture(scope="module")
def ref_model():
    base = "/root/reference/src/chatterbox/models/s3gen"
    f0_mod = load_ref_module("ref_f0_predictor", f"{base}/f0_predictor.py")
    hifi_mod = load_ref_module("ref_hifigan", f"{base}/hifigan.py")
    ConvRNNF0Predictor = f0_mod.ConvRNNF0Predictor
    HiFTGenerator = hifi_mod.HiFTGenerator

    torch.manual_seed(0)
    m = HiFTGenerator(
        sampling_rate=24000,
        upsample_rates=[8, 5, 3],
        upsample_kernel_sizes=[16, 11, 7],
        source_resblock_kernel_sizes=[7, 7, 11],
        source_resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5], [1, 3, 5]],
        f0_predictor=ConvRNNF0Predictor(),
    )
    m.eval()
    return m


@pytest.fixture(scope="module")
def params(ref_model):
    return convert_hift(ref_model.state_dict(), CFG)


def test_f0_predictor_parity(ref_model, params):
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, 80, 20)).astype(np.float32)
    with torch.no_grad():
        ref = ref_model.f0_predictor(torch.from_numpy(mel)).numpy()
    got = f0_predict(params["f0_predictor"], jnp.asarray(mel.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4, rtol=1e-4)


def test_decode_parity(ref_model, params):
    """hift_decode vs reference decode() -- the fully deterministic path."""
    rng = np.random.default_rng(1)
    t = 16
    mel = rng.standard_normal((1, 80, t)).astype(np.float32) * 0.5
    source = (rng.standard_normal((1, 1, t * 480)) * 0.1).astype(np.float32)
    with torch.no_grad():
        ref = ref_model.decode(torch.from_numpy(mel), torch.from_numpy(source)).numpy()
    got = hift_decode(params, CFG, jnp.asarray(mel.transpose(0, 2, 1)), jnp.asarray(source[:, 0]))
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-3, rtol=1e-3)


def test_full_inference_parity_zero_noise(ref_model, params, monkeypatch):
    """Full vocoder parity with all stochastic draws forced to zero."""
    rng = np.random.default_rng(2)
    t = 12
    mel = (rng.standard_normal((1, 80, t)) * 0.5).astype(np.float32)

    monkeypatch.setattr(
        torch.distributions.uniform.Uniform,
        "sample",
        lambda self, sample_shape: torch.zeros(sample_shape),
    )
    monkeypatch.setattr(torch, "randn_like", lambda x: torch.zeros_like(x))
    with torch.no_grad():
        ref_wav, ref_src = ref_model.inference(torch.from_numpy(mel))

    got_wav, got_src = hift_generate(
        params,
        CFG,
        jnp.asarray(mel.transpose(0, 2, 1)),
        phase_noise=jnp.zeros((1, 9)),
        additive_noise=jnp.zeros((1, 9, t * 480)),
    )
    np.testing.assert_allclose(np.asarray(got_src), ref_src[:, 0].numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_wav), ref_wav.numpy(), atol=5e-3)


def test_generate_with_rng_runs():
    key = jax.random.PRNGKey(0)
    p = init_hift(key, CFG)
    mel = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 80)) * 0.3
    wav, src = jax.jit(lambda p, m, k: hift_generate(p, CFG, m, rng=k))(p, mel, key)
    assert wav.shape == (2, 8 * 480)
    assert np.isfinite(np.asarray(wav)).all()


def test_bf16_trunk_close_to_fp32():
    """compute_dtype=bf16 runs the conv trunk in bf16 with the sine source,
    source STFT and exp/sin/iSTFT head kept fp32 -- output must stay within
    ~bf16 output quantization of the fp32 vocoder (the whole-vocoder bf16
    cast measured 4 dB SNR on TPU and is rejected; this split measured
    ~44 dB)."""
    cfg = HiFTConfig()
    p = init_hift(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(5)
    mel = jnp.asarray(rng.standard_normal((2, 12, 80)).astype(np.float32) * 0.3)
    h = cfg.nb_harmonics + 1
    pn = jnp.asarray(rng.uniform(-np.pi, np.pi, (2, h)).astype(np.float32))
    an = jnp.asarray(rng.standard_normal((2, h, 12 * cfg.upsample_total)).astype(np.float32))
    w32, _ = hift_generate(p, cfg, mel, phase_noise=pn, additive_noise=an)
    w16, _ = hift_generate(
        p, cfg, mel, phase_noise=pn, additive_noise=an, compute_dtype=jnp.bfloat16
    )
    w32 = np.asarray(w32, np.float32)
    w16 = np.asarray(w16, np.float32)
    snr = 10 * np.log10((w32**2).mean() / max(((w32 - w16) ** 2).mean(), 1e-20))
    assert snr > 25.0, snr


def test_padded_masked_matches_exact():
    """Masked vocoding (n_valid) on a right-padded batch must reproduce each
    row's exact-length vocoding: the vocoder's convs are not causal, so
    without masking the pad region's junk bleeds back into the tail of the
    valid audio (the from_local dress rehearsal measured O(signal)
    contamination over the last ~0.2 s). Residual deviation is confined to
    the final mel frame (480 samples): iSTFT overlap-add straddling the
    boundary plus the source-STFT reflect-vs-zeros edge (see hift_decode)."""
    key = jax.random.PRNGKey(3)
    p = init_hift(key, CFG)
    rng = np.random.default_rng(5)
    t_valid, t_pad = 14, 32
    mel_v = (rng.standard_normal((1, t_valid, 80)) * 0.5).astype(np.float32)
    mel_p = np.zeros((1, t_pad, 80), np.float32)
    mel_p[:, :t_valid] = mel_v
    # junk in the pad region must not leak into the valid samples
    mel_p[:, t_valid:] = rng.standard_normal((1, t_pad - t_valid, 80)) * 3.0

    zeros = dict(
        phase_noise=jnp.zeros((1, 9)),
    )
    exact, _ = hift_generate(
        p, CFG, jnp.asarray(mel_v),
        additive_noise=jnp.zeros((1, 9, t_valid * 480)), **zeros,
    )
    padded, _ = hift_generate(
        p, CFG, jnp.asarray(mel_p),
        additive_noise=jnp.zeros((1, 9, t_pad * 480)),
        n_valid=jnp.asarray([t_valid], jnp.int32), **zeros,
    )
    n = t_valid * 480
    exact = np.asarray(exact)[0]
    padded = np.asarray(padded)[0, :n]
    diff = np.abs(padded - exact)
    scale = float(np.abs(exact).max()) + 1e-9
    # measured: body 1e-8, final-frame 3.4e-7 vs signal scale 8e-5
    assert float(diff[:-480].max()) / scale < 1e-3, (diff[:-480].max(), scale)
    assert float(diff.max()) / scale < 2e-2, (diff.max(), scale)
    # pad region of the masked run produces (clipped) bounded output only
    # and the unmasked run is genuinely contaminated (the test has teeth)
    unmasked, _ = hift_generate(
        p, CFG, jnp.asarray(mel_p),
        additive_noise=jnp.zeros((1, 9, t_pad * 480)), **zeros,
    )
    un_diff = np.abs(np.asarray(unmasked)[0, :n] - exact)
    assert float(un_diff[:-480].max()) / scale > 1.0  # measured ~2.3x scale
