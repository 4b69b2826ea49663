"""A/B the HiFT vocoder precision split on hardware: fp32 (shipped default)
vs bf16 conv trunk + fp32 phase head (hift_decode compute_dtype) vs the
rejected whole-bf16 cast. Reports SNR vs the fp32 output and stage timing.

Usage: python scripts/probe_hift_precision.py [--rows 8] [--t 500] [--iters 6]
"""

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8)
    ap.add_argument("--t", type=int, default=500, help="mel frames (50/s)")
    ap.add_argument("--iters", type=int, default=6)
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

    from chatterbox_tpu.models.s3gen.hifigan import HiFTConfig, hift_generate, init_hift
    from chatterbox_tpu.runtime.fast_init import synthetic_init
    from chatterbox_tpu.runtime.precision import cast_floating_jit

    cfg = HiFTConfig()
    params = synthetic_init(lambda k: init_hift(k, cfg))
    b, t = args.rows, args.t
    rng = np.random.default_rng(0)
    # speech-shaped-ish mel: smooth low-band energy + noise floor
    base = rng.standard_normal((b, t, 80)).astype(np.float32)
    ramp = np.linspace(0, -4, 80, dtype=np.float32)[None, None]
    mel = jnp.asarray(base * 0.5 + ramp)
    h = cfg.nb_harmonics + 1
    pn = jnp.asarray(rng.uniform(-np.pi, np.pi, (b, h)).astype(np.float32))
    an = jnp.asarray(rng.standard_normal((b, h, t * cfg.upsample_total)).astype(np.float32))

    def log(m):
        print(f"[hift-prec] {m}", file=sys.stderr, flush=True)

    def run_variant(name, p, compute_dtype):
        fn = jax.jit(
            lambda p, mel, pn, an: hift_generate(
                p, cfg, mel, phase_noise=pn, additive_noise=an,
                compute_dtype=compute_dtype,
            )[0]
        )
        t0 = time.time()
        wav = np.asarray(fn(p, mel, pn, an), np.float32)
        log(f"{name}: compile+run {time.time() - t0:.1f}s")
        times = []
        sfn = jax.jit(
            lambda p, mel, pn, an: jnp.sum(
                hift_generate(p, cfg, mel, phase_noise=pn, additive_noise=an,
                              compute_dtype=compute_dtype)[0].astype(jnp.float32) ** 2
            )
        )
        _ = float(sfn(p, mel, pn, an))
        for _ in range(args.iters):
            t0 = time.time()
            _ = float(sfn(p, mel, pn, an))
            times.append(time.time() - t0)
        return wav, 1000 * min(times)

    ref, ms_ref = run_variant("fp32", params, None)

    def snr(x):
        err = x - ref
        return 10 * np.log10((ref**2).mean() / max((err**2).mean(), 1e-20))

    split, ms_split = run_variant("bf16-trunk", params, jnp.bfloat16)
    p16 = cast_floating_jit(params, jnp.bfloat16)
    full16, ms_full16 = run_variant("bf16-everything", p16, None)

    print(f"fp32:            {ms_ref:.1f} ms")
    print(f"bf16 trunk:      {ms_split:.1f} ms  SNR {snr(split):.1f} dB")
    print(f"bf16 everything: {ms_full16:.1f} ms  SNR {snr(full16):.1f} dB (rejected r2 baseline)")


if __name__ == "__main__":
    main()
