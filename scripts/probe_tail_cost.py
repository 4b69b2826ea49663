"""Slope-timed cost of the decode loop's SD-tail append + amortized 8-step
merge RMW (r5 follow-up to probe_boundary.py: the step residual after
matmuls/kernel/glue/boundaries is ~0.49 ms; this prices the cache-write
slice of it).

Chains K reps of exactly what the decode step does after the layer scan:
  new_tail = dynamic_update_slice(tail, new_kvs, (0,0,0,0, i % 8, 0))
  cache    = cond((i+1) % 8 == 0, merge W columns via flash_cache_merge_ds,
                  identity)
with the write position advancing per rep so every 8th rep pays the merge
(the amortized schedule the real loop runs).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_tail_cost.py
"""

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=16)
    ap.add_argument("--s", type=int, default=384)
    ap.add_argument("--k1", type=int, default=16)
    ap.add_argument("--k2", type=int, default=48)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--no-merge", action="store_true",
                    help="tail append only (splits the two costs)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from chatterbox_tpu.models.t3.llama import LlamaConfig
    from chatterbox_tpu.ops.flash_decode import TAIL_W, flash_cache_merge_ds

    def log(m):
        print(f"[tail-cost] {m}", file=sys.stderr, flush=True)

    cfg = LlamaConfig()
    rows, h, d, L = args.rows, cfg.num_attention_heads, cfg.head_dim, cfg.num_hidden_layers
    s = args.s
    interp = args.cpu
    rng = np.random.default_rng(0)
    kv0 = jnp.asarray(rng.standard_normal((L, 2, rows, h, 1, d)) * 0.05, jnp.bfloat16)

    def make(K):
        def f(kv, eps):
            # cache/tail created INSIDE the jit (like the real decode's
            # prefill output): the loop state lives in place with no
            # cross-call donation issues; iota-seeded, RNG-free
            def synth(shape):
                n = int(np.prod(shape))
                v = lax.broadcasted_iota(jnp.int32, (n,), 0) % 251
                return ((v.astype(jnp.float32) - 125.0) * 4e-4).astype(
                    jnp.bfloat16
                ).reshape(shape)

            cache = synth((L, 2, rows, h, d, s))
            tail = synth((L, 2, rows, h, TAIL_W, d))
            def rep(carry, i):
                cache, tail = carry
                kv_i = kv + (eps * (i + 1).astype(jnp.float32) * 1e-30).astype(kv.dtype)
                tail = lax.dynamic_update_slice(
                    tail, kv_i, (0, 0, 0, 0, i % TAIL_W, 0)
                )
                merge_base = (i // TAIL_W) * TAIL_W % (s - TAIL_W)

                def _merge(c):
                    cols = tail.transpose(0, 1, 2, 3, 5, 4)
                    return flash_cache_merge_ds(c, cols, merge_base, interpret=interp)

                if not args.no_merge:
                    cache = lax.cond((i + 1) % TAIL_W == 0, _merge, lambda c: c, cache)
                return (cache, tail), None

            (cache, tail), _ = lax.scan(rep, (cache, tail), jnp.arange(K))
            return jnp.sum(tail.astype(jnp.float32)) + jnp.sum(cache[0, 0, 0, 0, 0, :8].astype(jnp.float32))

        return f

    eps = jnp.float32(1e-6)
    ts = {}
    for K in (args.k1, args.k2):
        fn = jax.jit(make(K))
        t0 = time.time()
        float(fn(kv0, eps))
        log(f"K={K}: compile+run {time.time() - t0:.1f}s")
        best = 1e9
        for _ in range(args.iters):
            t0 = time.time()
            float(fn(kv0, eps))
            best = min(best, time.time() - t0)
        ts[K] = best
    ms = 1000.0 * (ts[args.k2] - ts[args.k1]) / (args.k2 - args.k1)
    print(json.dumps({
        "rows": rows, "s": s, "no_merge": bool(args.no_merge),
        "tail_ms_per_step": round(ms, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
