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


def _mel(*, sr, n_fft, n_mels=128, fmin=0.0, fmax=None, **kw):
    return mel_filterbank(sr, n_fft, n_mels, fmin=fmin, fmax=fmax).astype(
        np.float32
    )


def _make_librosa():
    librosa = _module("librosa")
    filters = _module("librosa.filters")
    filters.mel = _mel
    librosa.filters = filters
    sys.modules["librosa.filters"] = filters
    return librosa


def _make_transforms():
    transforms = _module("torchaudio.transforms")

    class Resample:
        def __init__(self, orig_freq, new_freq):
            raise NotImplementedError(
                "torchaudio stub: the dress rehearsal never resamples "
                "(embed_ref is not exercised on the reference side)"
            )

    transforms.Resample = Resample
    return transforms


def _make_compliance():
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
    return compliance, kaldi


def _make_torchaudio():
    ta = _module("torchaudio")
    ta.__path__ = []  # mark as a package: xvector.py:12 imports a submodule
    ta.transforms = _make_transforms()
    compliance, kaldi = _make_compliance()
    ta.compliance = compliance
    sys.modules["torchaudio.transforms"] = ta.transforms
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
        # of leaving `from librosa.filters import mel` to fail on order.
        # Patch the EXISTING module objects in place (creating filters only
        # if absent) so attribute access and import-by-name keep resolving
        # to the same object.
        librosa = sys.modules["librosa"]
        filters = sys.modules.get("librosa.filters") or getattr(
            librosa, "filters", None
        )
        if filters is None:
            filters = _module("librosa.filters")
        if not hasattr(filters, "mel"):
            filters.mel = _mel
        librosa.filters = filters
        sys.modules["librosa.filters"] = filters
    if "torchaudio" not in sys.modules:
        sys.modules["torchaudio"] = _make_torchaudio()
    else:
        # same identity rule for a pre-registered torchaudio stub: every
        # submodule ends up as ONE object reachable both as an attribute
        # and via sys.modules, whichever of the two already existed
        ta = sys.modules["torchaudio"]
        if not hasattr(ta, "__path__"):
            ta.__path__ = []  # xvector.py:12 imports a submodule
        transforms = getattr(ta, "transforms", None) or sys.modules.get(
            "torchaudio.transforms"
        )
        if transforms is None:
            transforms = _make_transforms()
        ta.transforms = transforms
        sys.modules["torchaudio.transforms"] = transforms
        compliance = getattr(ta, "compliance", None) or sys.modules.get(
            "torchaudio.compliance"
        )
        if compliance is None or not hasattr(compliance, "kaldi"):
            compliance, kaldi = _make_compliance()
        else:
            kaldi = compliance.kaldi
        if not hasattr(compliance, "__path__"):
            compliance.__path__ = []
        ta.compliance = compliance
        sys.modules["torchaudio.compliance"] = compliance
        sys.modules["torchaudio.compliance.kaldi"] = kaldi
    if "s3tokenizer" not in sys.modules:
        sys.modules["s3tokenizer"] = _make_s3tokenizer()
