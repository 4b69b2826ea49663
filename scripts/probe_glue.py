"""Slope-timed decomposition of the T3 decode step GLUE (r4, VERDICT r3 #3).

The step @16 CFG rows measures 3.33 ms = matmuls 1.53 + kernel 1.03 + glue
~0.77 (docs/PERFORMANCE.md). This probe times the glue's components
standalone, each K-repeated with a sequential dependency inside one jit
(slope at K in {20, 60}; the tunnel adds ~28-35 ms/dispatch):

  norms     -- 60 chained rms_norm on (2B, 1, 1024) bf16 (2 per layer)
  rope      -- 30 chained apply_rope on q,k (2B, H, 1, D) + one cos/sin
  head      -- speech_head matmul (2B, 1024) @ (1024, 8194) bf16
  sampling  -- cfg_combine + process_logits + inverse-CDF sample + the
               seen/tokens scatters (the real per-step chain)
  embed     -- next-token speech_emb gather + pos emb + CFG concat

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_glue.py
"""

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=16, help="CFG rows (= 2*batch)")
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

    from chatterbox_tpu.core.layers import rms_norm
    from chatterbox_tpu.core.sampling import (
        SamplingConfig,
        cfg_combine,
        process_logits,
        sample_from_logits,
    )
    from chatterbox_tpu.models.t3.llama import LlamaConfig, apply_rope, rope_cos_sin

    cfg = LlamaConfig()
    rows, c = args.rows, cfg.hidden_size
    h, d = cfg.num_attention_heads, cfg.head_dim
    vocab = 8194
    rng = np.random.default_rng(0)
    sampling = SamplingConfig(cfg_weight=0.5, min_new_tokens=0)

    def slope_time(make_fn, arrs, k1=20, k2=60, iters=5):
        ts = {}
        for K in (k1, k2):
            fn = jax.jit(make_fn(K))
            float(fn(*arrs))
            best = 1e9
            for _ in range(iters):
                t0 = time.time()
                float(fn(*arrs))
                best = min(best, time.time() - t0)
            ts[K] = best
        return (ts[k2] - ts[k1]) / (k2 - k1)

    results = {}

    # --- norms: 60 chained rms_norms (the per-step count at 30 layers) ----
    x = jnp.asarray(rng.standard_normal((rows, 1, c)), jnp.bfloat16)
    scale = jnp.ones((60, c), jnp.bfloat16)

    def make_norms(K):
        def f(x, scale):
            def rep(xx, i):
                def body(j, acc):
                    return rms_norm({"scale": scale[j]}, acc, 1e-5) + acc * 1e-30
                return lax.fori_loop(0, 60, body, xx * (1 + i.astype(xx.dtype) * 1e-30)), None
            out, _ = lax.scan(rep, x, jnp.arange(K))
            return jnp.sum(out.astype(jnp.float32))
        return f

    results["norms_60x"] = slope_time(make_norms, (x, scale))

    # --- rope: 30 chained q,k rotations + one cos/sin --------------------
    q = jnp.asarray(rng.standard_normal((rows, h, 1, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((rows, h, 1, d)), jnp.bfloat16)
    pos = jnp.full((rows, 1), 200, jnp.int32)

    def make_rope(K):
        def f(q, k, pos):
            def rep(qk, i):
                qq, kk = qk
                cos, sin = rope_cos_sin(cfg, pos + i)
                def body(j, acc):
                    a, b = acc
                    a, b = apply_rope(a, b, cos, sin)
                    return (a * (1 + 1e-30), b)
                return lax.fori_loop(0, 30, body, (qq, kk)), None
            (qq, kk), _ = lax.scan(rep, (q, k), jnp.arange(K))
            return jnp.sum(qq.astype(jnp.float32)) + jnp.sum(kk.astype(jnp.float32))
        return f

    results["rope_30x"] = slope_time(make_rope, (q, k, pos))

    # --- speech head matmul ----------------------------------------------
    hw = jnp.asarray(rng.standard_normal((c, vocab)), jnp.bfloat16)
    hx = jnp.asarray(rng.standard_normal((rows, c)), jnp.bfloat16)

    def make_head(K):
        def f(hx, hw):
            def rep(acc, i):
                o = jnp.matmul(acc, hw, preferred_element_type=jnp.float32)
                # feed a reduced value back so reps stay dependent
                return (acc * (1 + jnp.sum(o) * 1e-38)).astype(acc.dtype), None
            out, _ = lax.scan(rep, hx, jnp.arange(K))
            return jnp.sum(out.astype(jnp.float32))
        return f

    results["head_matmul"] = slope_time(make_head, (hx, hw))

    # --- sampling chain (cfg_combine -> process -> sample -> scatters) ---
    b = rows // 2
    logits2b = jnp.asarray(rng.standard_normal((rows, vocab)), jnp.float32)
    seen0 = jnp.zeros((b, vocab), bool)
    toks0 = jnp.zeros((b, 256), jnp.int32)

    def make_sampling(K):
        def f(logits2b, seen, toks):
            def rep(carry, i):
                seen, toks, lg = carry
                lc, lu = lg[:b], lg[b:]
                logits = cfg_combine(lc, lu, sampling.cfg_weight)
                logits = process_logits(logits, seen, sampling)
                u = jax.random.uniform(jax.random.fold_in(jax.random.PRNGKey(0), i), (b,))
                tok = sample_from_logits(logits, u)
                toks = toks.at[:, i % 256].set(tok)
                seen = seen.at[jnp.arange(b), tok].set(True)
                lg = lg * (1 + tok.sum() * 1e-38)
                return (seen, toks, lg), None
            (seen, toks, lg), _ = lax.scan(rep, (seen, toks, logits2b), jnp.arange(K))
            return jnp.sum(lg) + jnp.sum(toks)
        return f

    results["sampling_chain"] = slope_time(make_sampling, (logits2b, seen0, toks0))

    # --- next-token embed + pos + CFG concat ------------------------------
    emb_w = jnp.asarray(rng.standard_normal((vocab, c)), jnp.bfloat16)
    pos_w = jnp.asarray(rng.standard_normal((4100, c)), jnp.bfloat16)
    tok = jnp.asarray(rng.integers(0, 6561, (b,)), jnp.int32)

    def make_embed(K):
        def f(tok, emb_w, pos_w):
            def rep(t, i):
                e = emb_w[t][:, None] + pos_w[i + 1][None, None]
                e2 = jnp.concatenate([e, e], axis=0)
                t = (t + jnp.sum(e2).astype(jnp.int32) % 3) % 6561
                return t, None
            t, _ = lax.scan(rep, tok, jnp.arange(K))
            return jnp.sum(t)
        return f

    results["embed_concat"] = slope_time(make_embed, (tok, emb_w, pos_w))

    total = sum(results.values())
    print(json.dumps({
        "rows": rows,
        **{k: round(v * 1e3, 4) for k, v in results.items()},
        "sum_ms": round(total * 1e3, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
