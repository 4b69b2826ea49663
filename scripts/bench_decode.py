"""Focused T3 decode benchmark: A/B the decode-step implementations on real
hardware at a given batch size. Prints one JSON line per run.

Usage: python scripts/bench_decode.py --batch 8 --impl scan
"""

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--tokens", type=int, default=250)
    ap.add_argument("--impl", choices=["scan", "unroll"], default="scan")
    ap.add_argument("--unroll", type=int, default=1, help="scan_unroll for --impl scan")
    ap.add_argument("--pallas", action="store_true", help="flash-decode kernel in scan mode")
    ap.add_argument("--fuse-qkv", action="store_true", help="one fused qkv matmul per layer")
    ap.add_argument("--quant", action="store_true", help="int8 KV cache (pallas path)")
    ap.add_argument("--wquant", action="store_true",
                    help="int8 weight-only quantization of the matmul chain")
    ap.add_argument("--alignment", action="store_true",
                    help="run the in-loop alignment watchdog (with --pallas "
                         "the kernel-stats fast path; without it the XLA "
                         "attention fallback)")
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from chatterbox_tpu.core.sampling import SamplingConfig
    from chatterbox_tpu.models.t3.t3 import T3Config, init_t3, t3_generate
    from chatterbox_tpu.runtime.fast_init import synthetic_init
    from chatterbox_tpu.runtime.precision import cast_floating_jit

    def log(m):
        print(f"[decode-bench] {m}", file=sys.stderr, flush=True)

    cfg = T3Config()
    params = cast_floating_jit(synthetic_init(lambda k: init_t3(k, cfg)), jnp.bfloat16)
    if args.fuse_qkv:
        from chatterbox_tpu.models.t3.llama import fuse_qkv_params

        params = dict(params)
        params["llama"] = jax.jit(fuse_qkv_params)(params["llama"])
    if args.wquant:
        from chatterbox_tpu.models.t3.llama import quantize_llama_weights

        params = dict(params)
        params["llama"] = jax.jit(quantize_llama_weights)(params["llama"])
    log("params ready")

    b, tmax = args.batch, 32
    rng = np.random.default_rng(0)
    text = np.zeros((b, tmax), np.int32)
    text[:, 0] = cfg.start_text_token
    text[:, 1:28] = rng.integers(1, 700, (b, 27))
    lens = np.full((b,), 29, np.int32)

    sampling = SamplingConfig(cfg_weight=0.5, min_new_tokens=args.tokens - 1)
    impl, unroll, pallas, quant = args.impl, args.unroll, args.pallas, args.quant
    alignment = args.alignment

    @jax.jit
    def run(p, text, lens, spk, prompt, emo, key):
        return t3_generate(
            p, cfg, text, lens, spk, prompt, emo, key, sampling,
            max_new_tokens=args.tokens, decode_impl=impl, scan_unroll=unroll,
            use_pallas=pallas, cache_quant=quant, alignment=alignment,
        )

    spk = jnp.asarray(rng.standard_normal((b, 256)).astype(np.float32))
    prompt = jnp.asarray(rng.integers(0, 6561, (b, 150)).astype(np.int32))
    emo = jnp.full((b,), 0.5)

    t0 = time.time()
    res = run(params, jnp.asarray(text), jnp.asarray(lens), spk, prompt, emo, jax.random.PRNGKey(0))
    steps = int(res.steps)  # scalar readback forces full remote completion
    compile_s = time.time() - t0
    log(f"compile+run {compile_s:.1f}s, steps={steps}")

    times = []
    for i in range(args.iters):
        t0 = time.time()
        res = run(params, jnp.asarray(text), jnp.asarray(lens), spk, prompt, emo,
                  jax.random.PRNGKey(i + 1))
        steps = int(res.steps)
        times.append(time.time() - t0)
    per_step_ms = 1000.0 * min(times) / steps
    print(json.dumps({
        "impl": impl, "unroll": unroll, "pallas": pallas, "fuse_qkv": args.fuse_qkv,
        "quant": quant, "wquant": args.wquant, "alignment": alignment,
        "batch": b, "cfg_rows": 2 * b, "tokens": args.tokens,
        "cache_len": -(-(34 + tmax + 2 + args.tokens) // 128) * 128,
        "compile_s": round(compile_s, 1),
        "run_s": [round(t, 2) for t in times],
        "per_step_ms": round(per_step_ms, 2),
    }))


if __name__ == "__main__":
    main()
