"""Device mesh + GSPMD sharding specs for multi-chip execution.

Design (SURVEY.md §2.3): utterance batches are data-parallel over the "data"
axis; T3's attention heads / FFN are tensor-sharded over the "model" axis
(optional -- 520M in bf16 fits one chip, so model=1 replicates). XLA inserts
the collectives (psum for o/down projections' contracted axes) from the
sharding annotations; per-decode-step CFG combine + sampling stay local
because logits are materialized replicated after the speech_head matmul.

Multi-host: call ``jax.distributed.initialize()`` per host before
``make_mesh`` -- the mesh spans all processes' devices; data-axis sharding
then rides DCN across hosts, model-axis stays intra-slice on ICI.
"""

from typing import Optional, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Tuple[int, int]] = None, devices=None) -> Mesh:
    """Create a ("data", "model") mesh. Default: all devices on data."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    assert shape[0] * shape[1] == n, f"mesh {shape} != {n} devices"
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, ("data", "model"))


def t3_param_specs(params) -> dict:
    """PartitionSpec pytree for T3 params: heads/FFN sharded on "model".

    Stacked llama layers have a leading (n_layers,) axis -> specs shift by 1.
    """

    def spec_for(path: str):
        # q/k/v: (L, C, H*D) shard output heads; o: (L, H*D, C) shard input
        if "llama.layers" in path:
            if path.endswith((".q.w", ".k.w", ".v.w", ".gate_up.w")):
                return P(None, None, "model")
            if path.endswith((".o.w", ".down.w")):
                return P(None, "model", None)
        if path.endswith(("text_head.w", "speech_head.w")):
            return P(None, "model")  # vocab-sharded head
        return P()  # replicated

    def walk(tree, path=""):
        if isinstance(tree, dict):
            return {k: walk(v, f"{path}.{k}" if path else k) for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            t = [walk(v, f"{path}.{i}") for i, v in enumerate(tree)]
            return type(tree)(t) if not isinstance(tree, tuple) else tuple(t)
        return spec_for(path)

    return walk(params)


def shard_params(params, mesh: Mesh, specs=None):
    """Place a parameter pytree onto the mesh with the given specs."""
    if specs is None:
        specs = jax.tree.map(lambda _: P(), params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def data_sharding(mesh: Mesh):
    """Sharding for batch-leading arrays (split over "data")."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
