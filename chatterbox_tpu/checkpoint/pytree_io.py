"""Native pytree checkpointing: save/load converted JAX params as
safetensors so serving never repeats the torch-layout conversion.

Keys are slash-joined tree paths; lists encode their index. This is the
framework's own checkpoint format (the torch converter is the one-time
import path, SURVEY.md §5 checkpoint/resume).
"""

import numpy as np
import jax
import jax.numpy as jnp

from .safetensors_io import load_safetensors, save_safetensors


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}#{i}/"))
    elif tree is None:
        out[prefix.rstrip("/") + "/@none"] = np.zeros((0,), np.float32)
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def _unflatten(flat):
    root = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def convert(node):
        if not isinstance(node, dict):
            return node
        if "@none" in node:
            return None
        keys = list(node.keys())
        if keys and all(k.startswith("#") for k in keys):
            idx = sorted(keys, key=lambda k: int(k[1:]))
            return [convert(node[k]) for k in idx]
        return {k: convert(v) for k, v in node.items()}

    return convert(root)


def save_params(params, path, metadata=None):
    save_safetensors(_flatten(params), path, metadata=metadata)


def load_params(path, device_put=True):
    tree = _unflatten(load_safetensors(path))
    if device_put:
        tree = jax.tree.map(jnp.asarray, tree)
    return tree
