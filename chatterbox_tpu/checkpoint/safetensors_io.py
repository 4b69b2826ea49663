"""Self-contained safetensors reader/writer (no Rust dependency).

The reference loads checkpoints through the Rust ``safetensors`` crate
(tts.py:139-153). The format is trivial -- an 8-byte LE header length, a JSON
header mapping names to {dtype, shape, data_offsets}, then raw little-endian
tensor bytes -- so the TPU build reads it with numpy memory-mapping, feeding
``jax.device_put`` without a torch/Rust detour.
"""

import json
import struct

import numpy as np

_DTYPES = {
    "F64": np.float64,
    "F32": np.float32,
    "F16": np.float16,
    "BF16": None,  # handled specially below
    "I64": np.int64,
    "I32": np.int32,
    "I16": np.int16,
    "I8": np.int8,
    "U8": np.uint8,
    "BOOL": np.bool_,
}

_TO_ST_DTYPE = {
    np.dtype(np.float64): "F64",
    np.dtype(np.float32): "F32",
    np.dtype(np.float16): "F16",
    np.dtype(np.int64): "I64",
    np.dtype(np.int32): "I32",
    np.dtype(np.int16): "I16",
    np.dtype(np.int8): "I8",
    np.dtype(np.uint8): "U8",
    np.dtype(np.bool_): "BOOL",
}


def _bf16_to_f32(raw: np.ndarray) -> np.ndarray:
    """View uint16 bf16 payload as float32 (zero-extend mantissa)."""
    u32 = raw.astype(np.uint32) << 16
    return u32.view(np.float32)


def load_safetensors(path, to_float32_bf16=True):
    """Load a .safetensors file -> dict[name, np.ndarray]."""
    with open(path, "rb") as f:
        (header_len,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(header_len).decode("utf-8"))
        data_start = 8 + header_len
    buf = np.memmap(path, dtype=np.uint8, mode="r", offset=data_start)
    out = {}
    for name, meta in header.items():
        if name == "__metadata__":
            continue
        dt, shape = meta["dtype"], meta["shape"]
        lo, hi = meta["data_offsets"]
        raw = buf[lo:hi]
        if dt == "BF16":
            arr = _bf16_to_f32(np.frombuffer(raw.tobytes(), dtype=np.uint16))
            if not to_float32_bf16:
                import jax.numpy as jnp  # lazy: keep numpy-only path importable

                arr = arr.astype(jnp.bfloat16)
        else:
            arr = np.frombuffer(raw.tobytes(), dtype=_DTYPES[dt])
        out[name] = arr.reshape(shape)
    return out


def save_safetensors(tensors, path, metadata=None):
    """Write dict[name, np.ndarray] to a .safetensors file."""
    header = {}
    if metadata:
        header["__metadata__"] = {str(k): str(v) for k, v in metadata.items()}
    offset = 0
    blobs = []
    for name, arr in tensors.items():
        arr = np.ascontiguousarray(arr)
        if arr.dtype not in _TO_ST_DTYPE:
            arr = arr.astype(np.float32)
        nbytes = arr.nbytes
        header[name] = {
            "dtype": _TO_ST_DTYPE[arr.dtype],
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + nbytes],
        }
        offset += nbytes
        blobs.append(arr.tobytes())
    hjson = json.dumps(header).encode("utf-8")
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        for b in blobs:
            f.write(b)
