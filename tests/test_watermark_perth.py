"""PerthNetImplicit: golden parity vs the executable torch cross-impl,
checkpoint-converter hardening, and presence-API behavior on speech-shaped
and near-silent signals (VERDICT r1 next-#3 / weak-#5)."""

import numpy as np
import pytest
import torch

import jax

from torch_perth_ref import PerthNetImplicitRef

from chatterbox_tpu.models.watermark import (
    PerthImplicitWatermarker,
    PerthNetImplicit,
    SpreadSpectrumWatermarker,
    convert_perth,
)


def make_ref(seed=0, **kw):
    torch.manual_seed(seed)
    m = PerthNetImplicitRef(**{"n_bins": 129, "hidden": 32, "n_layers": 3, **kw})
    m.eval()
    return m


def _speech_like(n, seed=0, level=0.2):
    """Harmonic + noise signal with speech-ish spectral tilt."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 24000.0
    f0 = 120 + 30 * np.sin(2 * np.pi * 2.3 * t)
    x = sum(np.sin(2 * np.pi * k * np.cumsum(f0) / 24000.0) / k for k in range(1, 9))
    x = x + 0.15 * rng.standard_normal(n)
    env = 0.5 + 0.5 * np.sin(2 * np.pi * 3.1 * t) ** 2
    return (level * env * x / np.abs(x).max()).astype(np.float32)


def test_encoder_decoder_parity_vs_torch():
    m = make_ref()
    params, meta = convert_perth(m.state_dict())
    assert meta["n_bins"] == 129 and meta["n_fft"] == 256

    rng = np.random.default_rng(0)
    frames = rng.standard_normal((2, 129, 40)).astype(np.float32)  # (B, F, T)
    with torch.no_grad():
        ref_delta = m.ripple(torch.from_numpy(frames)).numpy()
        ref_logit = m.presence_logit(torch.from_numpy(frames)).numpy()

    wm = PerthNetImplicit(params, meta)
    got_delta = np.asarray(
        wm._stack(params["encoder"], np.transpose(frames, (0, 2, 1)), final_tanh=True)
    ).transpose(0, 2, 1)
    got_out = np.asarray(
        wm._stack(params["decoder"], np.transpose(frames, (0, 2, 1)), final_tanh=False)
    )
    got_logit = got_out.mean(axis=(1, 2))
    np.testing.assert_allclose(got_delta, ref_delta, atol=1e-5)
    np.testing.assert_allclose(got_logit, ref_logit, atol=1e-5)


def test_convert_perth_unwraps_and_accounts():
    m = make_ref(seed=1)
    sd = {"module." + k: v for k, v in m.state_dict().items()}
    with pytest.raises(ValueError, match="NOT consumed"):
        convert_perth({"model": {**sd, "mystery.running_stat": torch.zeros(4)}})
    params, meta = convert_perth({"model": sd})
    assert len(params["encoder"]) == 3 and len(params["decoder"]) == 3

    sd2 = dict(m.state_dict())
    del sd2["encoder.layers.0.weight"], sd2["encoder.layers.0.bias"]
    params2, _ = convert_perth(sd2)
    assert len(params2["encoder"]) == 2  # stack rebuilt from what exists


def test_checkpoint_file_roundtrip(tmp_path):
    m = make_ref(seed=2)
    p = tmp_path / "perth.pth"
    torch.save({"model": m.state_dict()}, p)
    wm = PerthNetImplicit.from_checkpoint(str(p))
    x = _speech_like(8000, seed=2)
    y = wm.apply_watermark(x)
    assert y.shape == x.shape and np.isfinite(y).all()
    # factory returns the neural engine when a checkpoint is supplied
    eng = PerthImplicitWatermarker(checkpoint=str(p))
    assert isinstance(eng, PerthNetImplicit)
    # ... and the weightless fallback otherwise
    assert isinstance(PerthImplicitWatermarker(), SpreadSpectrumWatermarker)


def test_presence_api_on_speech_and_silence():
    """Spread-spectrum default engine: presence 1.0 on marked speech-shaped
    audio, 0.0 on unmarked; near-silence yields no false positive."""
    wm = PerthImplicitWatermarker()
    speech = _speech_like(24000, seed=3)
    marked = wm.apply_watermark(speech)
    assert wm.get_watermark(marked) == 1.0
    assert wm.get_watermark(speech) == 0.0
    assert np.abs(marked - speech).max() < 0.06  # imperceptible-level ripple

    near_silence = _speech_like(24000, seed=4, level=1e-4)
    # documented behavior: multiplicative watermark has nothing to act on in
    # near-silence; extraction must not claim presence on unmarked silence
    assert wm.get_watermark(near_silence) == 0.0


def test_pipeline_with_perth_engine(tmp_path):
    """The batched pipeline watermark path must work with BOTH engines
    (spread-spectrum fuses in-graph; neural applies its own jit)."""
    import jax.numpy as jnp

    from chatterbox_tpu.pipeline.tts import ChatterboxTTS
    from test_pipeline import TINY_S3GEN, TINY_T3

    m = make_ref(seed=7)
    ckpt = tmp_path / "perth.pth"
    torch.save({"model": m.state_dict()}, ckpt)

    tts = ChatterboxTTS.from_random(seed=0, t3_cfg=TINY_T3, s3gen_cfg=TINY_S3GEN)
    tts.watermarker = PerthNetImplicit.from_checkpoint(str(ckpt))
    rng = np.random.default_rng(5)
    tts.prepare_conditionals((rng.standard_normal(24000) * 0.1).astype(np.float32))
    wavs = tts.generate_batch(["Neural watermark test."], max_new_tokens=8, seed=1,
                              device_chain=True)
    assert len(wavs) == 1 and np.isfinite(wavs[0]).all() and len(wavs[0]) > 0
