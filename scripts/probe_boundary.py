"""Slope-timed probe of the T3 decode step's ~0.5 ms custom-call boundary
residual (r5, VERDICT r4 #4).

The measured step @16 CFG rows decomposes as matmuls 1.53 (0.85 int8) +
kernel 1.03 + elementwise glue ~0.24, vs 3.33 (2.63 int8) measured -- a
~0.5 ms gap attributed to the 30 Pallas custom-call boundaries per step
(XLA cannot software-pipeline the next layer's weight prefetch across a
custom call) and/or HBM bus contention between the matmul weight stream and
the kernel cache stream. This probe separates those two causes by
slope-timing four 30-layer chains (K-repeated inside one jit, runtime
epsilon threading so XLA cannot hoist):

  matmuls  -- the real layer matmul chain (norm/qkv/rope/o/mlp), attention
              output replaced by v_new (no custom call at all)
  noop     -- the same chain + a TRIVIAL pallas call per layer in the
              attention slot (copies q; no HBM cache traffic).
              noop - matmuls = pure boundary cost of 30 custom calls.
  kernel   -- 30 chained flash-decode kernel calls, no weight matmuls
              (the kernel's standalone cost incl. its own boundaries)
  full     -- the real layer body (matmuls + flash-decode kernel)
              full - matmuls - kernel ~= extra interleave/contention cost

If noop ~= matmuls, the boundary itself is near-free and the residual is
bus contention (irreducible without fewer bytes); if noop - matmuls is the
~0.5 ms, fusing projections into the kernel (fewer transitions) would pay.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_boundary.py
"""

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=16, help="CFG rows (= 2*batch)")
    ap.add_argument("--s", type=int, default=384, help="cache length (128-mult)")
    ap.add_argument("--cur", type=int, default=256, help="live length mid-decode")
    ap.add_argument("--k1", type=int, default=20)
    ap.add_argument("--k2", type=int, default=60)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--wquant", action="store_true", help="int8 weights")
    ap.add_argument("--variants", nargs="+",
                    default=["matmuls", "noop", "kernel", "full"])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from chatterbox_tpu.core.layers import rms_norm
    from chatterbox_tpu.models.t3.llama import (
        LlamaConfig,
        _mlp,
        _qkv,
        _wmat,
        apply_rope,
        fuse_qkv_params,
        init_llama,
        quantize_llama_weights,
        rope_cos_sin,
    )
    from chatterbox_tpu.ops.flash_decode import TAIL_W, flash_decode_layer_attention
    from chatterbox_tpu.runtime.fast_init import synthetic_init
    from chatterbox_tpu.runtime.precision import cast_floating_jit

    def log(m):
        print(f"[boundary] {m}", file=sys.stderr, flush=True)

    cfg = LlamaConfig()
    rows, c = args.rows, cfg.hidden_size
    h, d, L = cfg.num_attention_heads, cfg.head_dim, cfg.num_hidden_layers
    s, cur = args.s, args.cur
    interp = args.cpu

    params = cast_floating_jit(
        synthetic_init(lambda k: init_llama(k, cfg)), jnp.bfloat16
    )
    params = jax.jit(fuse_qkv_params)(params)
    if args.wquant:
        params = jax.jit(quantize_llama_weights)(params)
    log("params ready")

    rng = np.random.default_rng(0)
    cache = jnp.asarray(
        rng.standard_normal((L, 2, rows, h, d, s)) * 0.05, jnp.bfloat16
    )
    tail = jnp.asarray(
        rng.standard_normal((L, 2, rows, h, TAIL_W, d)) * 0.05, jnp.bfloat16
    )
    merge_base = jnp.int32((cur // TAIL_W) * TAIL_W)
    row_prefix = jnp.full((rows,), 64, jnp.int32)
    gap_end = jnp.int32(66)
    cur_len = jnp.int32(cur)
    positions = jnp.full((rows, 1), cur, jnp.int32)
    cos, sin = rope_cos_sin(cfg, positions)
    x0 = jnp.asarray(rng.standard_normal((rows, 1, c)) * 0.05, jnp.bfloat16)
    q0 = jnp.asarray(rng.standard_normal((rows, h, d)) * 0.05, jnp.bfloat16)

    def _noop(q):
        # trivial pallas call: one full-block copy, no HBM cache traffic --
        # its only cost is the custom-call boundary itself
        def k(x_ref, o_ref):
            o_ref[...] = x_ref[...]

        return pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype), interpret=interp
        )(q)

    def layer_body(lp, xx, lid, mode):
        res = xx
        y = rms_norm(lp["input_ln"], xx, cfg.rms_norm_eps)
        q, k, v = _qkv(lp, y, h, cfg.num_key_value_heads, d)
        q, k = apply_rope(q, k, cos, sin)
        if mode == "full":
            a4 = flash_decode_layer_attention(
                cache, lid, cur_len, row_prefix, gap_end,
                q[:, :, 0], k[:, :, 0], v[:, :, 0],
                tail=tail, merge_base=merge_base,
                interpret=interp, ds_layout=True,
            )
            a = a4.reshape(rows, 1, h * d)
        elif mode == "noop":
            a = _noop(q[:, :, 0]).reshape(rows, 1, h * d)
        else:  # matmuls
            a = v.transpose(0, 2, 1, 3).reshape(rows, 1, h * d)
        xx = res + _wmat(a, lp["o"])
        res = xx
        y = rms_norm(lp["post_ln"], xx, cfg.rms_norm_eps)
        y = _mlp(lp, y)
        return res + _wmat(y, lp["down"])

    def make_chain(mode, K):
        if mode == "kernel":

            def f(cache, tail, q0, eps):
                def rep(qc, i):
                    # runtime-valued ADDITIVE epsilon: a multiplicative
                    # (1 + 1e-30) rounds to exactly 1.0 in bf16 and XLA
                    # hoists the whole body (CLAUDE.md r4 lesson)
                    qc = qc + (eps * (i + 1).astype(jnp.float32) * 1e-30).astype(qc.dtype)

                    def lyr(qq, lid):
                        out = flash_decode_layer_attention(
                            cache, lid, cur_len, row_prefix, gap_end,
                            qq, qq, qq, tail=tail, merge_base=merge_base,
                            interpret=interp, ds_layout=True,
                        )
                        return out, None

                    qc, _ = lax.scan(lyr, qc, jnp.arange(L, dtype=jnp.int32))
                    return qc, None

                qf, _ = lax.scan(rep, q0, jnp.arange(K))
                return jnp.sum(qf.astype(jnp.float32))

            return f

        def f(p, x0, eps):
            def rep(xc, i):
                xc = xc + (eps * (i + 1).astype(jnp.float32) * 1e-30).astype(xc.dtype)

                def lyr(xx, inp):
                    lp, lid = inp
                    return layer_body(lp, xx, lid, mode), None

                xc, _ = lax.scan(
                    lyr, xc, (p["layers"], jnp.arange(L, dtype=jnp.int32))
                )
                return xc, None

            xf, _ = lax.scan(rep, x0, jnp.arange(K))
            return jnp.sum(xf.astype(jnp.float32))

        return f

    eps = jnp.float32(1e-6)
    results = {}
    for mode in args.variants:
        ts = {}
        for K in (args.k1, args.k2):
            fn = jax.jit(make_chain(mode, K))
            arrs = (cache, tail, q0, eps) if mode == "kernel" else (params, x0, eps)
            t0 = time.time()
            float(fn(*arrs))
            log(f"{mode} K={K}: compile+run {time.time() - t0:.1f}s")
            best = 1e9
            for _ in range(args.iters):
                t0 = time.time()
                float(fn(*arrs))
                best = min(best, time.time() - t0)
            ts[K] = best
        ms = 1000.0 * (ts[args.k2] - ts[args.k1]) / (args.k2 - args.k1)
        results[mode] = round(ms, 3)
        log(f"{mode}: {ms:.3f} ms per 30-layer chain")

    out = {
        "rows": rows, "s": s, "cur": cur, "wquant": args.wquant,
        "chain_ms": results,
    }
    if "noop" in results and "matmuls" in results:
        out["boundary_ms_30calls"] = round(results["noop"] - results["matmuls"], 3)
    if all(k in results for k in ("full", "matmuls", "kernel")):
        out["interleave_extra_ms"] = round(
            results["full"] - results["matmuls"] - results["kernel"], 3
        )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
