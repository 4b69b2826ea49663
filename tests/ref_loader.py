"""Load modules from the read-only reference tree (/root/reference) for
golden-parity testing WITHOUT executing package __init__ files (which import
unavailable deps like librosa/torchaudio/diffusers/perth).

We register stub package modules with real __path__ entries so the normal
import machinery resolves leaf modules and their relative imports.
"""

import importlib
import sys
import types

REF_ROOT = "/root/reference/src"

_PACKAGES = {
    "chatterbox": f"{REF_ROOT}/chatterbox",
    "chatterbox.models": f"{REF_ROOT}/chatterbox/models",
    "chatterbox.models.t3": f"{REF_ROOT}/chatterbox/models/t3",
    "chatterbox.models.t3.modules": f"{REF_ROOT}/chatterbox/models/t3/modules",
    "chatterbox.models.t3.inference": f"{REF_ROOT}/chatterbox/models/t3/inference",
    "chatterbox.models.s3gen": f"{REF_ROOT}/chatterbox/models/s3gen",
    "chatterbox.models.s3gen.transformer": f"{REF_ROOT}/chatterbox/models/s3gen/transformer",
    "chatterbox.models.s3gen.matcha": f"{REF_ROOT}/chatterbox/models/s3gen/matcha",
    "chatterbox.models.s3gen.utils": f"{REF_ROOT}/chatterbox/models/s3gen/utils",
    "chatterbox.models.voice_encoder": f"{REF_ROOT}/chatterbox/models/voice_encoder",
    "chatterbox.models.tokenizers": f"{REF_ROOT}/chatterbox/models/tokenizers",
}


def _ensure_stub_packages():
    for name, path in _PACKAGES.items():
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__path__ = [path]
            mod.__package__ = name
            sys.modules[name] = mod
    # chatterbox.models.utils is a real module (AttrDict); import it normally
    if "chatterbox.models.utils" not in sys.modules:
        importlib.import_module("chatterbox.models.utils")


def load_ref(dotted: str):
    """Import e.g. 'chatterbox.models.t3.t3' from the reference tree."""
    _ensure_stub_packages()
    return importlib.import_module(dotted)
