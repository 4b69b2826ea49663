"""CFM Euler step-count curve: flow-stage time + mel divergence vs the
reference's fixed 10 steps (flow_matching.py:215-217 cosine schedule,
10-step Euler -- the count is hardcoded upstream).

The flow stage is the second-largest e2e cost (~0.43 s of the b8@250
iteration) and scales LINEARLY in n_timesteps (one fused UNet CFG pass per
step), so fewer steps is the only remaining flow-stage lever after the
UNet's 24% MXU utilization was probed structural (PERFORMANCE.md). This
measures what each step count buys and costs:

  - flow stage ms at n in {10, 8, 6, 4} (same graph shape otherwise)
  - mel SNR vs the n=10 solution with IDENTICAL noise/weights/inputs

Caveat (same as probe_flow_window.py): random weights give an untrained
velocity field; the divergence numbers are indicative, not perceptual.
The default stays at the reference's 10.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_flow_steps.py
"""

import argparse
import json
import sys
import time
from dataclasses import replace

import numpy as np


def timed(fn, *args, n=5):
    import jax

    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        out = fn(*args)
        float(jax.tree.leaves(out)[0])  # scalar readback (axon early-return)
        best = min(best, time.time() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--tokens", type=int, default=250)
    ap.add_argument("--steps", type=int, nargs="+", default=[10, 8, 6, 4])
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

    from chatterbox_tpu.models.s3gen.flow import flow_inference
    from chatterbox_tpu.models.s3gen.s3gen import S3GenConfig, init_s3gen
    from chatterbox_tpu.runtime.fast_init import synthetic_init
    from chatterbox_tpu.runtime.precision import cast_floating_jit

    def log(m):
        print(f"[flow-steps] {m}", file=sys.stderr, flush=True)

    cfg = S3GenConfig()
    params = synthetic_init(lambda k: init_s3gen(k, cfg))
    flow_p = cast_floating_jit(params["flow"], jnp.bfloat16)
    log("params ready")

    b, tb, p_len = args.batch, args.tokens, 125
    t_mel = 2 * (p_len + tb)
    rng = np.random.default_rng(0)
    gen_tok = jnp.asarray(rng.integers(0, 6561, (b, tb)).astype(np.int32))
    prompt_tok = jnp.asarray(rng.integers(0, 6561, (b, p_len)).astype(np.int32))
    prompt_feat = jnp.asarray(rng.standard_normal((b, 2 * p_len, 80)).astype(np.float32))
    emb192 = jnp.asarray(rng.standard_normal((b, 192)).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal((b, t_mel, 80)).astype(np.float32))
    flow_args = (
        gen_tok, jnp.full((b,), tb, jnp.int32),
        prompt_tok, jnp.full((b,), p_len, jnp.int32),
        prompt_feat, emb192, noise,
    )

    mels = {}
    times = {}
    for n in args.steps:
        fcfg = replace(cfg.flow, n_timesteps=n)
        fn = jax.jit(lambda pr, *a, _c=fcfg: flow_inference(pr, _c, *a)[0])
        t0 = time.time()
        mel = np.asarray(fn(flow_p, *flow_args), np.float64)  # 1.9 MB D2H
        log(f"n={n}: first call (compile+run) {time.time() - t0:.1f}s")
        mels[n] = mel
        sfn = jax.jit(
            lambda pr, *a, _c=fcfg: jnp.sum(
                flow_inference(pr, _c, *a)[0].astype(jnp.float32)
            )
        )
        times[n] = timed(sfn, flow_p, *flow_args)

    ref = mels[max(args.steps)]
    sig = float(np.mean(ref**2)) + 1e-12
    for n in args.steps:
        d = mels[n] - ref
        snr = float("inf") if n == max(args.steps) else 10 * np.log10(
            sig / (float(np.mean(d**2)) + 1e-12)
        )
        print(json.dumps({
            "n_timesteps": n,
            "flow_stage_ms": round(1000 * times[n], 1),
            f"mel_snr_db_vs_n{max(args.steps)}": round(snr, 1) if snr != float("inf") else None,
            "batch": b, "tokens": tb, "t_mel": t_mel,
        }), flush=True)


if __name__ == "__main__":
    main()
