"""Sharded T3 training step (adamw) for multi-chip execution.

The reference has no trainer; this provides the full jit-able training step
the multi-chip dryrun exercises: data-parallel batch over the "data" mesh
axis, tensor-parallel T3 weights over "model" (parallel/sharding.py), optax
adamw state sharded like the params.
"""


import jax
import optax

from ..models.t3.t3 import T3Config, t3_loss


def make_t3_train_step(cfg: T3Config, learning_rate: float = 1e-4):
    opt = optax.adamw(learning_rate)

    def init_state(params):
        return opt.init(params)

    def train_step(params, opt_state, batch):
        def loss_fn(p):
            lt, ls = t3_loss(p, cfg, batch)
            return lt + ls, (lt, ls)

        (loss, (lt, ls)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "loss_text": lt, "loss_speech": ls}

    return init_state, train_step
