"""Focused S3Gen stage benchmark (flow conformer + 10-step CFM + HiFT) on
hardware at full size. A/Bs the UNet flash-attention kernel."""

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--tokens", type=int, default=250)
    ap.add_argument("--no-flash", action="store_true")
    ap.add_argument("--iters", type=int, default=3)
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

    from chatterbox_tpu.models.s3gen import unet
    from chatterbox_tpu.models.s3gen.s3gen import RefDict, S3GenConfig, init_s3gen, s3gen_wav
    from chatterbox_tpu.runtime.fast_init import synthetic_init
    from chatterbox_tpu.runtime.precision import cast_floating_jit

    unet.FLASH_ATTENTION = not args.no_flash

    def log(m):
        print(f"[s3gen-bench] {m}", file=sys.stderr, flush=True)

    cfg = S3GenConfig()
    params = synthetic_init(lambda k: init_s3gen(k, cfg))
    params = dict(params)
    params["flow"] = cast_floating_jit(params["flow"], jnp.bfloat16)
    log("params ready")

    b, tb = args.batch, args.tokens
    p_len = 125
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, 6561, (b, tb)).astype(np.int32))
    lens = jnp.full((b,), tb, jnp.int32)
    ref = RefDict(
        jnp.asarray(rng.integers(0, 6561, (b, p_len)).astype(np.int32)),
        jnp.full((b,), p_len, jnp.int32),
        jnp.asarray(rng.standard_normal((b, 2 * p_len, 80)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((b, 192)).astype(np.float32)),
    )
    noise = jnp.asarray(rng.standard_normal((b, 2 * (p_len + tb), 80)).astype(np.float32))

    @jax.jit
    def run(p, tokens, lens, ref, noise, key):
        return s3gen_wav(p, cfg, tokens, lens, ref, noise, rng=key)[:2]

    t0 = time.time()
    wav, wl = run(params, tokens, lens, ref, noise, jax.random.PRNGKey(0))
    _ = np.asarray(wl)
    compile_s = time.time() - t0
    log(f"compile+run {compile_s:.1f}s")

    times = []
    for i in range(args.iters):
        t0 = time.time()
        wav, wl = run(params, tokens, lens, ref, noise, jax.random.PRNGKey(i + 1))
        _ = np.asarray(wl)
        times.append(time.time() - t0)
    audio_s = float(np.sum(np.asarray(wl)) / 24000.0)
    print(json.dumps({
        "flash": not args.no_flash, "batch": b, "tokens": tb,
        "compile_s": round(compile_s, 1),
        "iter_s": round(min(times), 3),
        "audio_sec_per_s": round(audio_s / min(times), 1),
    }))


if __name__ == "__main__":
    main()
