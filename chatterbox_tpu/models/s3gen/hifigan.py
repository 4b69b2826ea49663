"""HiFT-GAN vocoder (NSF source-filter + iSTFT head) in functional JAX.

Capability parity with reference hifigan.py:286-474 (HiFTGenerator with the
S3Gen config from s3gen.py:223-230: upsample 8*5*3, iSTFT n_fft 16 / hop 4)
and f0_predictor.py:19-55 (ConvRNNF0Predictor).

TPU-first notes:
  - everything is (B, T, C) channels-last; all convs are single
    ``lax.conv_general_dilated`` calls that XLA maps onto the MXU
  - the iSTFT head is a dense synthesis matmul + transposed conv (core/dsp.py)
  - all stochastic sites (sine phase, source noise) take explicit inputs so a
    fixed seed reproduces the reference bit pattern (SURVEY.md §7 hard part 1)
"""

from dataclasses import dataclass
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ...core import dsp
from ...core.layers import (
    conv1d,
    conv_transpose1d,
    leaky_relu,
    linear,
    snake,
)


@dataclass(frozen=True)
class HiFTConfig:
    in_channels: int = 80
    base_channels: int = 512
    nb_harmonics: int = 8
    sampling_rate: int = 24000
    nsf_alpha: float = 0.1
    nsf_sigma: float = 0.003
    nsf_voiced_threshold: float = 10.0
    upsample_rates: Tuple[int, ...] = (8, 5, 3)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 11, 7)
    istft_n_fft: int = 16
    istft_hop_len: int = 4
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3
    source_resblock_kernel_sizes: Tuple[int, ...] = (7, 7, 11)
    source_resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3
    lrelu_slope: float = 0.1
    audio_limit: float = 0.99
    f0_cond_channels: int = 512

    @property
    def upsample_total(self) -> int:
        return int(np.prod(self.upsample_rates)) * self.istft_hop_len  # 480

    @property
    def source_down_specs(self):
        """(kernel, stride, padding) of each source_downs conv (hifigan.py:351-363)."""
        rates = [1] + list(self.upsample_rates[::-1][:-1])
        cum = np.cumprod(rates)[::-1]
        specs = []
        for u in cum:
            u = int(u)
            if u == 1:
                specs.append((1, 1, 0))
            else:
                specs.append((u * 2, u, u // 2))
        return specs


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _conv_init(key, w, cin, cout, std=0.01):
    return {
        "w": jax.random.normal(key, (w, cin, cout), jnp.float32) * std,
        "b": jnp.zeros((cout,), jnp.float32),
    }


def _resblock_init(key, ch, kernel, dilations):
    keys = jax.random.split(key, 2 * len(dilations))
    return {
        "convs1": [_conv_init(keys[2 * i], kernel, ch, ch) for i in range(len(dilations))],
        "convs2": [_conv_init(keys[2 * i + 1], kernel, ch, ch) for i in range(len(dilations))],
        "alphas1": [{"alpha": jnp.ones((ch,), jnp.float32)} for _ in dilations],
        "alphas2": [{"alpha": jnp.ones((ch,), jnp.float32)} for _ in dilations],
    }


def init_hift(key, cfg: HiFTConfig = HiFTConfig()):
    ks = iter(jax.random.split(key, 64))
    p = {}
    n_fft2 = cfg.istft_n_fft + 2
    p["conv_pre"] = _conv_init(next(ks), 7, cfg.in_channels, cfg.base_channels)
    p["ups"] = []
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        cin = cfg.base_channels // (2**i)
        cout = cfg.base_channels // (2 ** (i + 1))
        p["ups"].append(_conv_init(next(ks), k, cin, cout))
    p["source_downs"] = []
    p["source_resblocks"] = []
    for i, ((k, s, pad), rk, rd) in enumerate(
        zip(cfg.source_down_specs, cfg.source_resblock_kernel_sizes, cfg.source_resblock_dilation_sizes)
    ):
        ch = cfg.base_channels // (2 ** (i + 1))
        p["source_downs"].append(_conv_init(next(ks), k, n_fft2, ch))
        p["source_resblocks"].append(_resblock_init(next(ks), ch, rk, rd))
    p["resblocks"] = []
    for i in range(len(cfg.upsample_rates)):
        ch = cfg.base_channels // (2 ** (i + 1))
        for k, d in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
            p["resblocks"].append(_resblock_init(next(ks), ch, k, d))
    p["conv_post"] = _conv_init(next(ks), 7, ch, n_fft2)
    # NSF source merge: Linear(harmonics+1 -> 1)
    p["m_source_linear"] = {
        "w": jax.random.normal(next(ks), (cfg.nb_harmonics + 1, 1), jnp.float32) * 0.1,
        "b": jnp.zeros((1,), jnp.float32),
    }
    # ConvRNNF0Predictor
    f0 = {"convs": [], "classifier": None}
    cin = cfg.in_channels
    for _ in range(5):
        f0["convs"].append(_conv_init(next(ks), 3, cin, cfg.f0_cond_channels, std=0.05))
        cin = cfg.f0_cond_channels
    f0["classifier"] = {
        "w": jax.random.normal(next(ks), (cfg.f0_cond_channels, 1), jnp.float32) * 0.05,
        "b": jnp.zeros((1,), jnp.float32),
    }
    p["f0_predictor"] = f0
    return p


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _len_mask(lens, t, dtype=jnp.float32):
    """(B,) valid lengths -> (B, t, 1) {0,1} mask."""
    return (jnp.arange(t)[None, :] < lens[:, None]).astype(dtype)[..., None]


def f0_predict(p, mel: jnp.ndarray, n_valid: jnp.ndarray = None) -> jnp.ndarray:
    """(B, T, 80) mel -> (B, T) f0 in Hz. Mirrors f0_predictor.py:52-55.

    ``n_valid`` (B,): when rows are right-padded, zero each conv's output in
    the pad region so conv windows near a row's boundary read zeros --
    exactly what the reference's exact-length run sees from conv zero
    padding (bias junk in the pad region otherwise bleeds back into the
    last ~5 valid frames)."""
    x = mel
    m = None if n_valid is None else _len_mask(n_valid, mel.shape[1], mel.dtype)
    if m is not None:
        x = x * m
    for cp in p["convs"]:
        x = jax.nn.elu(conv1d(cp, x, padding=1))
        if m is not None:
            x = x * m
    return jnp.abs(linear(p["classifier"], x)[..., 0])


def sine_source(
    cfg: HiFTConfig,
    f0_up: jnp.ndarray,
    phase_noise: jnp.ndarray,
    additive_noise: jnp.ndarray,
    f0_cum_init: jnp.ndarray = None,
) -> jnp.ndarray:
    """SineGen + harmonic merge inputs. f0_up: (B, L) upsampled f0 @ output rate.

    phase_noise: (B, H+1) uniform(-pi, pi) random initial phases (index 0 is
    forced to 0 like the reference, hifigan.py:214).
    additive_noise: (B, H+1, L) standard normal.
    f0_cum_init: (B,) cumulative f0 integral (in cycles, sum f0/sr) BEFORE
    this segment -- harmonic k continues at phase 2*pi*k*f0_cum_init, giving
    exact sine continuity for chunked/streaming vocoding
    (pipeline/streaming.py). None = segment starts at phase 0 (reference
    behavior, full-utterance path).
    Returns per-harmonic sine+noise source (B, L, H+1). Mirrors
    hifigan.py:200-231.
    """
    h = cfg.nb_harmonics + 1
    mult = (jnp.arange(1, h + 1, dtype=jnp.float32) / cfg.sampling_rate)[None, :, None]
    f_mat = f0_up[:, None, :] * mult  # (B, H+1, L)
    cum = jnp.cumsum(f_mat, axis=-1)
    if f0_cum_init is not None:
        k = jnp.arange(1, h + 1, dtype=jnp.float32)[None, :, None]
        cum = cum + (f0_cum_init[:, None, None] % 1.0) * k
    theta = 2.0 * np.pi * (cum % 1.0)
    phase = phase_noise.at[:, 0].set(0.0)[:, :, None]
    sines = cfg.nsf_alpha * jnp.sin(theta + phase)
    uv = (f0_up > cfg.nsf_voiced_threshold).astype(jnp.float32)[:, None, :]
    noise_amp = uv * cfg.nsf_sigma + (1.0 - uv) * cfg.nsf_alpha / 3.0
    src = sines * uv + noise_amp * additive_noise
    return src.transpose(0, 2, 1)  # (B, L, H+1)


# snake implementation switch: the polynomial form is 7.8x faster on the
# VPU at 133 dB SNR vs the jnp.sin form (scripts/probe_snake.py) -- far
# above the 40 dB quality gate, so it is the default; set False to force
# the transcendental-exact form (e.g. for bit-level torch comparisons).
FAST_SNAKE = True


def _resblock(p, x, kernel, dilations, snake_act=None, mask=None):
    """``mask`` (B, T, 1): zero the pad region after each conv so dilated
    windows near a row's valid boundary read zeros (= the exact-length
    run's conv zero padding). snake(0) == 0, so only conv biases need it."""
    if snake_act is None:
        from ...core.layers import snake_fast

        snake_act = snake_fast if FAST_SNAKE else snake
    for c1, c2, a1, a2, d in zip(p["convs1"], p["convs2"], p["alphas1"], p["alphas2"], dilations):
        xt = snake_act(a1, x)
        pad = (kernel * d - d) // 2
        xt = conv1d(c1, xt, padding=pad, dilation=d)
        if mask is not None:
            xt = xt * mask
        xt = snake_act(a2, xt)
        xt = conv1d(c2, xt, padding=(kernel - 1) // 2)
        if mask is not None:
            xt = xt * mask
        x = xt + x
    return x


def hift_decode(
    p, cfg: HiFTConfig, mel: jnp.ndarray, source: jnp.ndarray,
    compute_dtype=None, n_valid: jnp.ndarray = None,
) -> jnp.ndarray:
    """(B, T, 80) mel + (B, T*480) merged source -> (B, T*480) waveform.

    Deterministic part of the vocoder; mirrors hifigan.py:412-444.

    ``n_valid`` (B,) valid mel frames per row (None = all): masked vocoding
    for right-padded batches. The vocoder's convs are NOT causal, so junk
    mel frames in the pad region otherwise bleed backwards into the tail of
    the valid audio (measured: O(signal) contamination over the last ~0.2 s
    at the 64-token bucket). Zeroing every conv's pad-region output makes
    each row's valid samples equal its exact-length vocoding -- a conv
    window crossing the boundary then reads zeros, exactly what exact-length
    conv zero-padding provides -- except (a) the last <=~n_fft output
    samples (iSTFT overlap-add straddles the boundary) and (b) an O(1e-3)
    source-STFT edge effect (center=True reflect padding mirrors real
    samples in the exact run vs zeros here); both measured in
    tests/test_hifigan.py::test_padded_masked_matches_exact.

    ``compute_dtype=jnp.bfloat16`` runs the conv trunk (upsamples +
    resblocks -- the vocoder's FLOPs) in bf16 while keeping every
    phase-sensitive stage fp32: the sine-source path upstream, the source
    STFT, and the conv_post -> exp(mag)/sin(phase) -> iSTFT head. A
    whole-vocoder bf16 cast measured 4 dB SNR (CLAUDE.md) -- the damage is
    in the phase math, not the trunk (split: 37-44 dB SNR). MEASURED
    PERF-NEUTRAL on v5e (101.6 fp32 vs 103.1 ms bf16 at b8/500 frames,
    scripts/probe_hift_precision.py): the vocoder is VPU/transcendental-
    bound (snake sin^2, exp/sin head), not MXU-bound, so the default stays
    fp32 and the knob exists for memory-constrained configs only.
    """
    win = dsp.hann_window(cfg.istft_n_fft)
    s_re, s_im = dsp.stft(source, cfg.istft_n_fft, cfg.istft_hop_len, win, center=True)
    s_stft = jnp.concatenate([s_re, s_im], axis=-1)  # (B, T*120+1, 18)

    t_mel = mel.shape[1]
    masks = None
    if n_valid is not None:
        # per-resolution valid lengths: mel (T), stage outputs (8T, 40T,
        # 120T+1 after the reflect-prepend), source STFT frames (120T+1)
        stage_mult = np.cumprod(cfg.upsample_rates)  # 8, 40, 120
        masks = {
            "mel": _len_mask(n_valid, t_mel, mel.dtype),
            "stft": _len_mask(
                n_valid * int(stage_mult[-1]) + 1, s_stft.shape[1], mel.dtype
            ),
            "stages": [],
        }
        for i, m in enumerate(stage_mult):
            extra = 1 if i == len(cfg.upsample_rates) - 1 else 0
            masks["stages"].append(
                _len_mask(n_valid * int(m) + extra, t_mel * int(m) + extra, mel.dtype)
            )
        mel = mel * masks["mel"]
        s_stft = s_stft * masks["stft"]

    if compute_dtype is not None:
        from ...runtime.precision import cast_floating

        trunk = {
            k: cast_floating(p[k], compute_dtype)
            for k in ("conv_pre", "ups", "source_downs", "source_resblocks", "resblocks")
        }
        p = {**p, **trunk}
        mel = mel.astype(compute_dtype)
        s_stft = s_stft.astype(compute_dtype)

    x = conv1d(p["conv_pre"], mel, padding=3)
    if masks is not None:
        x = x * masks["mel"].astype(x.dtype)
    num_kernels = len(cfg.resblock_kernel_sizes)
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        sm = None if masks is None else masks["stages"][i]
        x = leaky_relu(x, cfg.lrelu_slope)
        x = conv_transpose1d(p["ups"][i], x, stride=u, padding=(k - u) // 2)
        if i == len(cfg.upsample_rates) - 1:
            # reflection_pad (1, 0) on the time axis (hifigan.py:378,422)
            x = jnp.concatenate([x[:, 1:2], x], axis=1)
        if sm is not None:
            x = x * sm.astype(x.dtype)
        dk, ds, dpad = cfg.source_down_specs[i]
        si = conv1d(p["source_downs"][i], s_stft, stride=ds, padding=dpad)
        if sm is not None:
            si = si * sm[:, : si.shape[1]].astype(si.dtype)
        si = _resblock(
            p["source_resblocks"][i],
            si,
            cfg.source_resblock_kernel_sizes[i],
            cfg.source_resblock_dilation_sizes[i],
            mask=None if sm is None else sm[:, : si.shape[1]],
        )
        x = x + si[:, : x.shape[1]]
        xs = None
        for j in range(num_kernels):
            r = _resblock(
                p["resblocks"][i * num_kernels + j],
                x,
                cfg.resblock_kernel_sizes[j],
                cfg.resblock_dilation_sizes[j],
                mask=sm,
            )
            xs = r if xs is None else xs + r
        x = xs / num_kernels

    x = leaky_relu(x, 0.01)  # F.leaky_relu default slope (hifigan.py:437)
    x = x.astype(p["conv_post"]["w"].dtype)  # head back to fp32 (no-op when full-precision)
    x = conv1d(p["conv_post"], x, padding=3)
    n_freq = cfg.istft_n_fft // 2 + 1
    magnitude = jnp.clip(jnp.exp(x[..., :n_freq]), max=1e2)
    phase = jnp.sin(x[..., n_freq:])  # reference applies sin (hifigan.py:440)
    re = magnitude * jnp.cos(phase)
    im = magnitude * jnp.sin(phase)
    if masks is not None:
        # pad-region frames hold exp(0)=1 junk after masking upstream; zero
        # the synthesized spectra so OLA only leaks into the <= n_fft
        # samples that straddle the valid boundary
        fm = masks["stages"][-1].astype(re.dtype)
        re, im = re * fm, im * fm
    wav = dsp.istft(
        re,
        im,
        cfg.istft_n_fft,
        cfg.istft_hop_len,
        win,
        center=True,
    )
    return jnp.clip(wav, -cfg.audio_limit, cfg.audio_limit)


def hift_generate(
    p,
    cfg: HiFTConfig,
    mel: jnp.ndarray,
    rng: jax.Array = None,
    phase_noise: jnp.ndarray = None,
    additive_noise: jnp.ndarray = None,
    f0_cum_init: jnp.ndarray = None,
    return_f0: bool = False,
    compute_dtype=None,
    n_valid: jnp.ndarray = None,
):
    """Full vocoder: (B, T, 80) mel -> ((B, T*480) wav, (B, T*480) source).

    Randomness is injected either via ``rng`` (a jax PRNG key) or explicitly
    via (phase_noise, additive_noise) for bit-parity testing. Mirrors
    hifigan.py:462-474 `inference` (without streaming cache_source, which is
    dormant in the pipeline -- s3gen.py:251). ``compute_dtype``: see
    hift_decode (f0 prediction and the sine source always stay fp32).
    ``n_valid`` (B,) valid mel frames: masked vocoding for right-padded
    batches (see hift_decode) -- each row's valid samples then equal its
    exact-length vocoding instead of being contaminated by pad-region junk
    through the non-causal conv stacks.
    """
    b, t, _ = mel.shape
    f0 = f0_predict(p["f0_predictor"], mel, n_valid=n_valid)  # (B, T)
    ups = cfg.upsample_total
    f0_up = jnp.repeat(f0, ups, axis=1)  # nearest upsample (B, T*480)
    h = cfg.nb_harmonics + 1
    if phase_noise is None:
        k1, k2 = jax.random.split(rng)
        phase_noise = jax.random.uniform(k1, (b, h), minval=-np.pi, maxval=np.pi)
        additive_noise = jax.random.normal(k2, (b, h, t * ups))
    src_h = sine_source(cfg, f0_up, phase_noise, additive_noise, f0_cum_init)  # (B, L, H+1)
    source = jnp.tanh(linear(p["m_source_linear"], src_h))[..., 0]  # (B, L)
    if n_valid is not None:
        # zero the pad-region source (tanh(bias) + pad-noise junk) before
        # its STFT feeds the fusion path
        source = source * _len_mask(n_valid * ups, source.shape[1], source.dtype)[..., 0]
    wav = hift_decode(p, cfg, mel, source, compute_dtype=compute_dtype, n_valid=n_valid)
    if return_f0:
        return wav, source, f0
    return wav, source


# ---------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------


def convert_hift(sd, cfg: HiFTConfig = HiFTConfig(), prefix: str = ""):
    """Map the reference HiFTGenerator state dict into our pytree.

    ``prefix`` is e.g. "mel2wav." when converting from the full s3gen
    checkpoint. Folds weight-norm (hifigan.py:331-379, f0_predictor.py:29-47).
    """
    from ...checkpoint import torch_convert as tc

    def P(name):
        return f"{prefix}{name}"

    p = {}
    p["conv_pre"] = tc.conv1d(sd, P("conv_pre"), weight_norm=True)
    p["ups"] = [
        tc.conv_transpose1d(sd, P(f"ups.{i}"), weight_norm=True)
        for i in range(len(cfg.upsample_rates))
    ]

    def res(prefix_r, n):
        return {
            "convs1": [tc.conv1d(sd, f"{prefix_r}.convs1.{i}", weight_norm=True) for i in range(n)],
            "convs2": [tc.conv1d(sd, f"{prefix_r}.convs2.{i}", weight_norm=True) for i in range(n)],
            "alphas1": [
                {"alpha": np.asarray(_t(sd[f"{prefix_r}.activations1.{i}.alpha"]))} for i in range(n)
            ],
            "alphas2": [
                {"alpha": np.asarray(_t(sd[f"{prefix_r}.activations2.{i}.alpha"]))} for i in range(n)
            ],
        }

    def _t(x):
        return x.detach().cpu().numpy() if hasattr(x, "detach") else x

    p["source_downs"] = [
        tc.conv1d(sd, P(f"source_downs.{i}")) for i in range(len(cfg.upsample_rates))
    ]
    p["source_resblocks"] = [
        res(P(f"source_resblocks.{i}"), len(cfg.source_resblock_dilation_sizes[i]))
        for i in range(len(cfg.upsample_rates))
    ]
    n_res = len(cfg.resblock_kernel_sizes) * len(cfg.upsample_rates)
    p["resblocks"] = [
        res(P(f"resblocks.{i}"), len(cfg.resblock_dilation_sizes[i % 3])) for i in range(n_res)
    ]
    p["conv_post"] = tc.conv1d(sd, P("conv_post"), weight_norm=True)
    p["m_source_linear"] = tc.linear(sd, P("m_source.l_linear"))
    f0p = {"convs": [], "classifier": None}
    for i in range(5):
        f0p["convs"].append(tc.conv1d(sd, P(f"f0_predictor.condnet.{2 * i}"), weight_norm=True))
    f0p["classifier"] = tc.linear(sd, P("f0_predictor.classifier"))
    p["f0_predictor"] = f0p
    return jax.tree.map(jnp.asarray, p)
