"""Training driver: optimizer loop + resumable native checkpoints.

The reference ships loss functions but no trainer (SURVEY.md §0.6 — T3
forward/loss at t3/t3.py:110-201, CFM loss at flow_matching.py:146-185, no
optimizer loop anywhere). This drives `train_step.make_t3_train_step` with
a checkpoint/resume cycle the reference never had: params + optimizer state
+ step counter serialize to one safetensors file, so a killed run restarts
bit-identically (gated by tests/test_checkpoint.py resume-equivalence).

Serialization walks `jax.tree_util.tree_leaves` order against a
freshly-initialized state template, so optax's namedtuple chain states
(ScaleByAdamState etc.) need no bespoke (de)serialization and checkpoints
stay valid as long as (config, optimizer) match. Leaves restore onto the
template's shardings via `jax.device_put`, so resuming under a mesh keeps
dp/tp layouts.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..checkpoint.safetensors_io import load_safetensors, save_safetensors
from ..models.t3.t3 import T3Config
from .train_step import make_t3_train_step


class T3Trainer:
    """Minimal stateful wrapper over the pure jitted train step."""

    def __init__(self, cfg: T3Config, params, learning_rate: float = 1e-4, donate: bool = True):
        self.cfg = cfg
        init_state, train_step = make_t3_train_step(cfg, learning_rate)
        self.params = params
        self.opt_state = init_state(params)
        self.step_num = 0
        # params/opt_state are replaced each step; donation keeps one copy live
        self._step = jax.jit(train_step, donate_argnums=(0, 1) if donate else ())

    def step(self, batch):
        self.params, self.opt_state, metrics = self._step(self.params, self.opt_state, batch)
        self.step_num += 1
        return {k: float(v) for k, v in metrics.items()}

    # -- checkpoint / resume ------------------------------------------------

    def _state(self):
        return (self.params, self.opt_state)

    def save(self, path):
        leaves = jax.tree_util.tree_leaves(self._state())
        tensors = {f"leaf_{i:05d}": np.asarray(x) for i, x in enumerate(leaves)}
        tensors["__step__"] = np.asarray(self.step_num, np.int64)
        save_safetensors(tensors, path, metadata={"kind": "t3_train_state"})

    def load(self, path):
        """Restore params/opt_state/step saved by `save` into this trainer.

        The trainer must be constructed with the same config + optimizer;
        leaves are matched by tree order and cast onto the template leaf's
        dtype and sharding (bf16 leaves round-trip through f32 on disk).
        """
        tensors = load_safetensors(path)
        self.step_num = int(np.asarray(tensors.pop("__step__")).reshape(-1)[0])
        template = self._state()
        leaves, treedef = jax.tree_util.tree_flatten(template)
        if len(leaves) != len(tensors):
            raise ValueError(
                f"checkpoint has {len(tensors)} leaves, state needs {len(leaves)} "
                "(config/optimizer mismatch?)"
            )
        restored = []
        for i, tmpl in enumerate(leaves):
            arr = tensors[f"leaf_{i:05d}"]
            tmpl_shape = np.shape(tmpl)
            # the reader returns 0-d tensors as shape (1,); accept that one quirk
            # but otherwise require exact shapes (size-only checks let a config
            # change silently reshape into the wrong layout)
            shapes_ok = arr.shape == tmpl_shape or (
                tmpl_shape == () and arr.shape == (1,)
            )
            if not shapes_ok:
                raise ValueError(
                    f"checkpoint leaf {i} has shape {arr.shape}, "
                    f"state needs {tmpl_shape}"
                )
            arr = np.reshape(arr, np.shape(tmpl))
            dtype = getattr(tmpl, "dtype", None)
            arr = jnp.asarray(arr, dtype)
            sharding = getattr(tmpl, "sharding", None)
            if sharding is not None:
                arr = jax.device_put(arr, sharding)
            restored.append(arr)
        self.params, self.opt_state = jax.tree_util.tree_unflatten(treedef, restored)

    @classmethod
    def resume(cls, path, cfg: T3Config, params_template, learning_rate: float = 1e-4):
        t = cls(cfg, params_template, learning_rate)
        t.load(path)
        return t
