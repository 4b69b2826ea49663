"""ctypes loader + bindings for the C++ native runtime library.

Builds native/csrc/chatterbox_native.cpp on first use with g++ (cached next
to the source); callers must handle ``native_available() == False`` (pure-
Python fallbacks exist for every function -- audio.py, tokenizer.py,
safetensors_io.py).
"""

import ctypes
import logging
import subprocess
import threading
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

_REPO_ROOT = Path(__file__).resolve().parents[2]
_SRC = _REPO_ROOT / "native" / "csrc" / "chatterbox_native.cpp"
_SO = _REPO_ROOT / "native" / "build" / "libchatterbox_native.so"

_lib = None
_tried = False
_lock = threading.Lock()


def _build() -> bool:
    _SO.parent.mkdir(parents=True, exist_ok=True)
    try:
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", str(_SRC), "-o", str(_SO)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception as e:
        logger.warning("native build failed (%s); using pure-Python fallbacks", e)
        return False


def get_lib():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            if not _SRC.exists() or not _build():
                return None
        try:
            lib = ctypes.CDLL(str(_SO))
        except OSError as e:
            logger.warning("native load failed: %s", e)
            return None
        # signatures
        lib.cbx_wav_decode.restype = ctypes.c_int
        lib.cbx_wav_decode.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_size_t),
        ]
        lib.cbx_wav_encode_pcm16.restype = ctypes.c_int
        lib.cbx_wav_encode_pcm16.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_size_t,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_size_t),
        ]
        lib.cbx_bpe_create.restype = ctypes.c_void_p
        lib.cbx_bpe_create.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.c_char_p,
            ctypes.c_int32,
            ctypes.c_char_p,
            ctypes.c_int32,
            ctypes.c_int32,
        ]
        lib.cbx_bpe_destroy.argtypes = [ctypes.c_void_p]
        lib.cbx_bpe_encode.restype = ctypes.c_int32
        lib.cbx_bpe_encode.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
        ]
        lib.cbx_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def wav_decode(data: bytes):
    """bytes -> (float32 mono array, sample_rate) or None on failure."""
    lib = get_lib()
    if lib is None:
        return None
    out = ctypes.POINTER(ctypes.c_float)()
    sr = ctypes.c_int32()
    n = ctypes.c_size_t()
    rc = lib.cbx_wav_decode(data, len(data), ctypes.byref(out), ctypes.byref(sr), ctypes.byref(n))
    if rc != 0:
        return None
    arr = np.ctypeslib.as_array(out, shape=(n.value,)).copy()
    lib.cbx_free(out)
    return arr, sr.value


def wav_encode_pcm16(x: np.ndarray, sr: int):
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.float32)
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = ctypes.c_size_t()
    rc = lib.cbx_wav_encode_pcm16(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x), sr, ctypes.byref(out), ctypes.byref(n)
    )
    if rc != 0:
        return None
    data = bytes(np.ctypeslib.as_array(out, shape=(n.value,)))
    lib.cbx_free(out)
    return data


class NativeBPE:
    """C++ greedy-merge BPE over a parsed tokenizer.json spec."""

    def __init__(self, spec: dict):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        model = spec["model"]
        vocab = model["vocab"]
        tokens = list(vocab.keys())
        ids = np.asarray([vocab[t] for t in tokens], np.int32)
        merges = model.get("merges", [])
        merge_lines = "\n".join(m if isinstance(m, str) else " ".join(m) for m in merges)
        specials = [t["content"] for t in spec.get("added_tokens", [])]
        unk = vocab.get("[UNK]", -1)
        self._h = lib.cbx_bpe_create(
            "\n".join(tokens).encode("utf-8"),
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(tokens),
            merge_lines.encode("utf-8"),
            len(merges),
            "\n".join(specials).encode("utf-8"),
            len(specials),
            unk,
        )

    def encode(self, text: str):
        buf = (ctypes.c_int32 * 4096)()
        n = self._lib.cbx_bpe_encode(self._h, text.encode("utf-8"), buf, 4096)
        if n > 4096:
            buf = (ctypes.c_int32 * n)()
            n = self._lib.cbx_bpe_encode(self._h, text.encode("utf-8"), buf, n)
        return [int(buf[i]) for i in range(n)]

    def __del__(self):
        try:
            self._lib.cbx_bpe_destroy(self._h)
        except Exception:
            pass
