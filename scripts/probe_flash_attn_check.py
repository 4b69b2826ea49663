"""Elementwise hardware check: flash_self_attention heads_per_cell>1 vs the
heads=1 grid (bit-identical math expected; any divergence = miscompile)."""

import json

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from chatterbox_tpu.ops.flash_attention import flash_self_attention

    b, h, t, d = 16, 8, 768, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32)).astype(jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32)).astype(jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32)).astype(jnp.bfloat16)
    bias = jnp.zeros((b, t), jnp.float32)
    bias = bias.at[:, 700:].set(-1e10)  # exercise the mask too

    base = np.asarray(
        flash_self_attention(q, k, v, bias, q_block=256, heads_per_cell=1).astype(jnp.float32)
    )
    for hb in (2, 4, 8):
        out = np.asarray(
            flash_self_attention(q, k, v, bias, q_block=256, heads_per_cell=hb).astype(
                jnp.float32
            )
        )
        print(json.dumps({
            "heads": hb,
            "max_abs_diff": float(np.max(np.abs(out - base))),
            "mean_abs": float(np.mean(np.abs(base))),
        }), flush=True)


if __name__ == "__main__":
    main()
