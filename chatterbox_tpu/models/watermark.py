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

        Same numerics as apply_watermark (pads to a hop multiple in-graph).
        The band modulation is a direct complex-magnitude scale: multiplying
        re/im by (1 + strength*pattern) scales |S| by exactly that factor."""
        cfg = self.cfg
        t_len = wav.shape[-1]
        pad = (-t_len) % cfg.hop
        x = jnp.pad(wav.astype(jnp.float32), ((0, 0), (0, pad)))
        win = dsp.hann_window(cfg.n_fft)
        re, im = dsp.stft(x, cfg.n_fft, cfg.hop, win)
        scale = 1.0 + cfg.strength * pattern[None, None, :]
        re = re.at[..., cfg.band_lo : cfg.band_hi].multiply(scale)
        im = im.at[..., cfg.band_lo : cfg.band_hi].multiply(scale)
        y = dsp.istft(re, im, cfg.n_fft, cfg.hop, win)
        y = jnp.pad(y, ((0, 0), (0, max(0, t_len - y.shape[-1]))))[:, :t_len]
        return y

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
        fn = self._jit_apply.get(x.shape)
        if fn is None:
            # one jitted body shared with the fused pipeline path; trimming
            # to t_len happens on host (the graph pads to a hop multiple)
            fn = jax.jit(self.apply_in_graph)
            self._jit_apply[x.shape] = fn
        y = np.asarray(fn(jnp.asarray(x), jnp.asarray(pattern)))
        y = np.pad(y, ((0, 0), (0, max(0, t_len - y.shape[-1]))))[:, :t_len]
        return y[0] if squeeze else y

    def get_payload(self, wav, sample_rate: int = 24000):
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

    def get_watermark(self, wav, sample_rate: int = 24000) -> float:
        """Presence detection, API-matching upstream perth (README.md:89-108):
        returns 1.0 (watermarked) or 0.0. The default apply embeds the
        all-ones payload; presence = >= 75% of its bits decode positive
        (chance level on unmarked audio is a fair coin per bit)."""
        bits = self.get_payload(wav, sample_rate)
        return 1.0 if float(np.mean(bits)) >= 0.75 else 0.0


def convert_perth(sd, strict: bool = True):
    """torch Perth checkpoint -> (params, meta) for PerthNetImplicit.

    The published checkpoint's exact topology cannot be verified offline, so
    this converter REBUILDS the net from the state dict instead of assuming
    one (same defense as convert_s3tokenizer): container unwrap ('model' /
    'state_dict' / 'module.' wrappers), then the 'encoder.*' and 'decoder.*'
    conv/linear stacks in natural index order, with every consumed key
    tracked and leftovers raising (strict). The executable semantics the
    stacks are applied with live in tests/torch_perth_ref.py and are
    golden-tested in tests/test_watermark_perth.py.
    """
    import re as _re

    def _np(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    # unwrap nested containers
    for wrap in ("model", "state_dict", "network"):
        if wrap in sd and not hasattr(sd[wrap], "shape"):
            sd = sd[wrap]
    sd = {k[len("module."):] if k.startswith("module.") else k: v for k, v in sd.items()}

    consumed = set()

    def build_stack(group):
        weight_keys = [
            k for k in sd
            if k.startswith(group + ".") and k.endswith("weight")
            and getattr(sd[k], "ndim", len(getattr(sd[k], "shape", ()))) >= 2
        ]

        def order(k):
            return [int(x) for x in _re.findall(r"\d+", k)]

        layers = []
        for wk in sorted(weight_keys, key=order):
            w = _np(sd[wk])
            consumed.add(wk)
            p = {}
            if w.ndim == 3:  # torch Conv1d (Cout, Cin, W) -> (W, Cin, Cout)
                p["w"] = np.transpose(w, (2, 1, 0)).astype(np.float32)
                kind = "conv"
            elif w.ndim == 2:  # Linear (Cout, Cin) -> (Cin, Cout)
                p["w"] = w.T.astype(np.float32)
                kind = "linear"
            else:
                raise ValueError(f"unsupported weight rank for {wk}: {w.shape}")
            bk = wk[: -len("weight")] + "bias"
            if bk in sd:
                p["b"] = _np(sd[bk]).astype(np.float32)
                consumed.add(bk)
            layers.append({"kind": kind, **p})
        if not layers:
            raise KeyError(f"no '{group}.*weight' conv/linear keys in checkpoint")
        return layers

    enc = build_stack("encoder")
    dec = build_stack("decoder")
    unconsumed = sorted(k for k in sd if k not in consumed)
    if unconsumed and strict:
        raise ValueError(
            f"convert_perth: {len(unconsumed)} checkpoint keys NOT consumed "
            f"(layout drift?): {unconsumed[:20]}"
        )

    n_bins = enc[0]["w"].shape[1]
    meta = {
        "n_fft": (n_bins - 1) * 2,
        "n_bins": n_bins,
        "unconsumed": unconsumed,
    }
    return {"encoder": enc, "decoder": dec}, meta


def load_perth_checkpoint(path):
    """Load a torch-pickle Perth checkpoint file -> (params, meta)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return convert_perth(sd)


class PerthNetImplicit:
    """Perth-implicit neural watermarker (JAX port).

    Applies an encoder-predicted, tanh-bounded log-magnitude ripple to the
    STFT of the audio (phase preserved) and detects its presence with a
    decoder conv stack (sigmoid over a global-mean logit), matching the
    upstream API: ``get_watermark`` returns 1.0 / 0.0 (reference
    README.md:89-108). Semantics stated executably in
    tests/torch_perth_ref.py; the net topology itself is rebuilt from the
    checkpoint by ``convert_perth``.
    """

    def __init__(self, params, meta=None, strength: float = 0.15):
        self.params = params
        n_bins = params["encoder"][0]["w"].shape[1]
        self.n_fft = (meta or {}).get("n_fft", (n_bins - 1) * 2)
        self.hop = self.n_fft // 4
        self.strength = strength
        self._jit = {}

    @classmethod
    def from_checkpoint(cls, path):
        params, meta = load_perth_checkpoint(path)
        return cls(params, meta)

    def _stack(self, layers, x, final_tanh):
        """x (B, T, F) frames; generic sequential stack (leaky_relu 0.2
        between layers, as stated in torch_perth_ref)."""
        for i, lp in enumerate(layers):
            last = i == len(layers) - 1
            if lp["kind"] == "conv":
                w = lp["w"].shape[0]
                x = conv1d(lp, x, padding=(w - 1) // 2)
            else:
                x = x @ lp["w"] + lp.get("b", 0.0)
            if not last:
                x = jax.nn.leaky_relu(x, 0.2)
        return jnp.tanh(x) if final_tanh else x

    def _logmag(self, x):
        win = dsp.hann_window(self.n_fft)
        re, im = dsp.stft(x, self.n_fft, self.hop, win)
        return re, im, jnp.log(jnp.sqrt(re**2 + im**2) + 1e-6)

    def apply_watermark(self, wav, watermark=None, sample_rate: int = 24000):
        squeeze = np.ndim(wav) == 1
        x = np.atleast_2d(np.asarray(wav, np.float32))
        t_len = x.shape[-1]
        key = ("apply", x.shape)
        fn = self._jit.get(key)
        if fn is None:

            @jax.jit
            def fn(xx):
                xx = jnp.pad(xx, ((0, 0), (0, (-t_len) % self.hop)))
                re, im, logmag = self._logmag(xx)
                delta = self._stack(self.params["encoder"], logmag, final_tanh=True)
                scale = jnp.exp(self.strength * delta)
                y = dsp.istft(re * scale, im * scale, self.n_fft, self.hop,
                              dsp.hann_window(self.n_fft))
                return y

            self._jit[key] = fn
        y = np.asarray(fn(jnp.asarray(x)))
        y = np.pad(y, ((0, 0), (0, max(0, t_len - y.shape[-1]))))[:, :t_len]
        return y[0] if squeeze else y

    def presence_logit(self, wav):
        x = np.atleast_2d(np.asarray(wav, np.float32))
        key = ("extract", x.shape)
        fn = self._jit.get(key)
        if fn is None:

            @jax.jit
            def fn(xx):
                _, _, logmag = self._logmag(xx)
                out = self._stack(self.params["decoder"], logmag, final_tanh=False)
                return jnp.mean(out, axis=(1, 2))  # (B,) global-mean logit

            self._jit[key] = fn
        return np.asarray(fn(jnp.asarray(x)))

    def get_watermark(self, wav, sample_rate: int = 24000) -> float:
        return float(jax.nn.sigmoid(self.presence_logit(wav)[0]) > 0.5)


def PerthImplicitWatermarker(
    cfg: WatermarkConfig = WatermarkConfig(), checkpoint=None
):
    """Factory matching the reference's constructor name (tts.py:126).

    Returns the neural Perth engine when a converted checkpoint is available
    (``checkpoint`` arg, $CHATTERBOX_PERTH_CKPT, or perth.pth next to the
    package); otherwise the weightless spread-spectrum engine keeps the
    always-watermarked capability contract."""
    import os
    from pathlib import Path

    cand = checkpoint or os.environ.get("CHATTERBOX_PERTH_CKPT")
    if cand is None:
        default = Path(__file__).resolve().parent.parent / "perth.pth"
        cand = str(default) if default.exists() else None
    if cand is not None:
        return PerthNetImplicit.from_checkpoint(cand)
    return SpreadSpectrumWatermarker(cfg)
