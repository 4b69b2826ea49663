"""Cheap synthetic parameter initialization for benchmarking.

Proper random init (jax.random threefry) of ~800M parameters compiles/runs
pathologically slowly through the tunneled-TPU remote-compile path (observed
~7 min). Benchmarks only need *finite, non-degenerate, value-independent*
weights, so this generates each leaf deterministically from an iota-based
pseudo-noise function -- a handful of trivially-compiled ops per leaf, no
PRNG. Never used for real inference (checkpoints) or tests (which use
torch-converted or jax.random weights on CPU).
"""

import numpy as np
import jax
import jax.numpy as jnp


def _synth_leaf(shape, dtype, salt, std):
    n = int(np.prod(shape)) if shape else 1
    i = jax.lax.iota(jnp.float32, max(n, 1))
    # low-cost whitened pseudo-noise: irrational-stride sine
    x = jnp.sin(i * 12.9898 + salt * 78.233) * 43758.5453
    x = (x - jnp.floor(x)) * 2.0 - 1.0  # uniform-ish in [-1, 1]
    return (x.reshape(shape) * (std * 1.7)).astype(dtype)


def synthetic_like(tree, dtype=None):
    """Fill a shape/dtype pytree (e.g. from jax.eval_shape) with synthetic
    values. Heuristic scale: 1/sqrt(fan_in) for >=2D leaves, ~N(0, 0.02) for
    1D, ones for norm-like scale vectors (name-agnostic: 1D leaves whose
    reference init is 1 still work at 0.02 for throughput purposes)."""
    leaves, treedef = jax.tree.flatten(tree)
    out = []
    for idx, leaf in enumerate(leaves):
        shape = leaf.shape
        ldt = dtype or leaf.dtype
        if not jnp.issubdtype(leaf.dtype, jnp.floating):
            out.append(jnp.zeros(shape, leaf.dtype))
            continue
        if len(shape) >= 2:
            fan_in = int(np.prod(shape[:-1]))
            std = 1.0 / np.sqrt(max(fan_in, 1))
        else:
            std = 0.02
        out.append(_synth_leaf(shape, ldt, float(idx % 97), std))
    return jax.tree.unflatten(treedef, out)


def synthetic_init(init_fn, dtype=None):
    """eval_shape the init fn, then fill synthetically (one small jit)."""
    shapes = jax.eval_shape(init_fn, jax.random.PRNGKey(0))
    return jax.jit(lambda: synthetic_like(shapes, dtype))()
