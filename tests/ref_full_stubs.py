"""Stubs that let the FULL reference pipeline modules import offline.

The reference `s3gen.py`, `voice_encoder.py` and `s3tokenizer.py` import
`librosa`, `torchaudio` and the external `s3tokenizer` package -- none of
which are installed here. This registers minimal stand-ins so the live
reference torch modules can be instantiated end-to-end (for the from_local
dress rehearsal) without touching the reference's runtime behavior on the
paths we exercise:

- ``librosa``: only ``filters.mel`` is served (used at S3Tokenizer init,
  s3tokenizer.py:39-43, and lazily by the mel frontends), backed by our
  slaney implementation (golden-tested vs torch.stft in test_dsp).
- ``torchaudio``: imported at s3gen.py:19 but only used by ``get_resampler``
  inside ``embed_ref`` (s3gen.py:129-135), which the rehearsal never calls.
- ``s3tokenizer``: ``model_v2.S3TokenizerV2``/``ModelConfig`` and
  ``utils.padding`` (s3tokenizer.py:7-11), backed by the executable torch
  cross-implementation in tests/torch_s3tok_ref.py at the full published
  size, so `S3Gen()`'s state dict carries a real `tokenizer.`-prefixed
  S3TokenizerV2-shaped sub-dict.
"""

import importlib.machinery
import sys
import types
from dataclasses import dataclass

import numpy as np
import torch

from chatterbox_tpu.core.dsp import mel_filterbank


def _module(name):
    """A stub module with a real __spec__ (transformers probes optional deps
    via importlib.util.find_spec, which raises on spec-less sys.modules
    entries)."""
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return mod


def _make_librosa():
    librosa = _module("librosa")
    filters = _module("librosa.filters")

    def mel(*, sr, n_fft, n_mels=128, fmin=0.0, fmax=None, **kw):
        return mel_filterbank(sr, n_fft, n_mels, fmin=fmin, fmax=fmax).astype(
            np.float32
        )

    filters.mel = mel
    librosa.filters = filters
    sys.modules["librosa.filters"] = filters
    return librosa


def _make_torchaudio():
    ta = _module("torchaudio")
    transforms = _module("torchaudio.transforms")

    class Resample:
        def __init__(self, orig_freq, new_freq):
            raise NotImplementedError(
                "torchaudio stub: the dress rehearsal never resamples "
                "(embed_ref is not exercised on the reference side)"
            )

    transforms.Resample = Resample
    ta.transforms = transforms
    ta.__path__ = []  # mark as a package: xvector.py:12 imports a submodule
    compliance = _module("torchaudio.compliance")
    compliance.__path__ = []
    kaldi = _module("torchaudio.compliance.kaldi")

    def fbank(*a, **kw):
        raise NotImplementedError(
            "torchaudio stub: CAMPPlus.inference (Kaldi fbank) is not "
            "exercised on the reference side of the rehearsal"
        )

    kaldi.fbank = fbank
    compliance.kaldi = kaldi
    ta.compliance = compliance
    sys.modules["torchaudio.transforms"] = transforms
    sys.modules["torchaudio.compliance"] = compliance
    sys.modules["torchaudio.compliance.kaldi"] = kaldi
    return ta


def _make_s3tokenizer():
    import torch_s3tok_ref as s3ref  # tests dir is on sys.path under pytest

    pkg = _module("s3tokenizer")
    model_v2 = _module("s3tokenizer.model_v2")
    utils = _module("s3tokenizer.utils")

    @dataclass
    class ModelConfig:
        n_mels: int = 128
        n_audio_state: int = 1280
        n_audio_head: int = 20
        n_audio_layer: int = 6

    class S3TokenizerV2(s3ref.S3TokenizerV2Ref):
        """Full-size (published "speech_tokenizer_v2_25hz" shape) tokenizer.

        The reference wrapper subclasses this with `super().__init__(name)`
        (s3tokenizer.py:22-37) and calls `.quantize(mels, mel_lens)` plus
        `.device` in forward (s3tokenizer.py:110-122).
        """

        def __init__(self, name: str = "speech_tokenizer_v2_25hz"):
            super().__init__(
                n_mels=128, n_state=1280, n_head=20, n_layer=6, kernel_size=11
            )

        @property
        def device(self):
            return next(self.parameters()).device

    def padding(mels):
        """List of (F, Ti) mels -> ((B, F, Tmax), (B,) int64 lens)."""
        lens = torch.tensor([m.shape[-1] for m in mels], dtype=torch.long)
        tmax = int(lens.max())
        out = torch.zeros(len(mels), mels[0].shape[0], tmax, dtype=mels[0].dtype)
        for i, m in enumerate(mels):
            out[i, :, : m.shape[-1]] = m
        return out, lens

    model_v2.S3TokenizerV2 = S3TokenizerV2
    model_v2.ModelConfig = ModelConfig
    utils.padding = padding
    pkg.model_v2 = model_v2
    pkg.utils = utils
    sys.modules["s3tokenizer.model_v2"] = model_v2
    sys.modules["s3tokenizer.utils"] = utils
    return pkg


def register():
    """Idempotently register the offline stand-ins (no-ops if the real
    packages are somehow present)."""
    if "librosa" not in sys.modules:
        sys.modules["librosa"] = _make_librosa()
    else:
        # another test module may have pre-registered a BARE librosa stub
        # (e.g. test_conditioning, whose reference imports never call
        # filters.mel); the suite shares one process, so repair it instead
        # of leaving `from librosa.filters import mel` to fail on order
        filters = getattr(sys.modules["librosa"], "filters", None)
        if filters is not None and not hasattr(filters, "mel"):
            filters.mel = _make_librosa().filters.mel
    if "torchaudio" not in sys.modules:
        sys.modules["torchaudio"] = _make_torchaudio()
    else:
        ta = sys.modules["torchaudio"]
        if not hasattr(ta, "transforms"):
            full = _make_torchaudio()
            ta.transforms = full.transforms
            sys.modules["torchaudio.transforms"] = full.transforms
        if not hasattr(ta, "__path__"):
            ta.__path__ = []  # xvector.py:12 imports a submodule
    if "s3tokenizer" not in sys.modules:
        sys.modules["s3tokenizer"] = _make_s3tokenizer()
