"""Tile sweep for the UNet flash self-attention kernel at the live shape
(16 CFG rows, 8 heads, T=768 padded, D=64, bf16): q_block x heads_per_cell.
Prints one JSON line per variant."""

import json
import sys
import time

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

    ref = None
    for tq, hb in [(256, 4), (768, 1), (768, 2), (768, 4), (768, 8), (384, 4), (384, 8), (256, 8), (128, 8)]:
        try:
            fn = jax.jit(
                lambda q, k, v, bias, tq=tq, hb=hb: jnp.sum(
                    flash_self_attention(
                        q, k, v, bias, q_block=tq, heads_per_cell=hb
                    ).astype(jnp.float32)
                )
            )
            out = float(fn(q, k, v, bias))
            if ref is None:
                ref = out
            t0 = time.time()
            n = 20
            for _ in range(n):
                r = fn(q, k, v, bias)
            float(r)
            ms = 1000 * (time.time() - t0) / n
            print(json.dumps({"q_block": tq, "heads": hb, "ms": round(ms, 3),
                              "sum_rel_err": abs(out - ref) / (abs(ref) + 1e-9)}))
        except Exception as e:
            print(json.dumps({"q_block": tq, "heads": hb, "error": str(e)[:200]}))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
