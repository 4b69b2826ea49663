"""Whole-vocoder A/B of the polynomial snake (r4, VERDICT r3 #7).

Slope-times hift_generate (f0 -> sine source -> trunk -> iSTFT) at K in
{3, 9} reps inside one jit with FAST_SNAKE on/off, plus output SNR of the
fast form vs the transcendental form. Target: HiFT <= 90 ms @b8/500 frames
with SNR >= 40 dB.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_snake_hift.py
"""

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8)
    ap.add_argument("--t", type=int, default=500, help="mel frames (50/s)")
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

    from chatterbox_tpu.models.s3gen import hifigan
    from chatterbox_tpu.models.s3gen.hifigan import HiFTConfig, hift_generate, init_hift
    from chatterbox_tpu.runtime.fast_init import synthetic_init

    cfg = HiFTConfig()
    params = synthetic_init(lambda k: init_hift(k, cfg))
    b, t = args.rows, args.t
    rng = np.random.default_rng(0)
    base = rng.standard_normal((b, t, 80)).astype(np.float32)
    ramp = np.linspace(0, -4, 80, dtype=np.float32)[None, None]
    mel = jnp.asarray(base * 0.5 + ramp)
    h = cfg.nb_harmonics + 1
    pn = jnp.asarray(rng.uniform(-np.pi, np.pi, (b, h)).astype(np.float32))
    an = jnp.asarray(
        rng.standard_normal((b, h, t * cfg.upsample_total)).astype(np.float32)
    )

    def log(m):
        print(f"[snake-hift] {m}", file=sys.stderr, flush=True)

    # single-dispatch timing: the vocoder is ~100 ms, so the ~30 ms tunnel
    # overhead is a CONSTANT that cancels in the A/B (a K-rep scan of the
    # whole vocoder graph compiles for >30 min remotely -- measured and
    # abandoned); absolute numbers carry +~30 ms like probe_hift_precision's.
    out = {"rows": b, "frames": t}
    wavs = {}
    for fast in (False, True):
        hifigan.FAST_SNAKE = fast
        name = "poly" if fast else "exact"
        fn = jax.jit(
            lambda p, mel, pn, an: jnp.sum(
                hift_generate(p, cfg, mel, phase_noise=pn, additive_noise=an)[0],
                axis=-1,
            )
        )
        t0 = time.time()
        float(fn(params, mel, pn, an)[0])
        log(f"{name}: compile+run {time.time() - t0:.1f}s")
        best = 1e9
        for _ in range(8):
            t0 = time.time()
            float(fn(params, mel, pn, an)[0])
            best = min(best, time.time() - t0)
        if args.cpu:  # wav SNR needs a second (full-output) graph: CPU only
            wav = hift_generate(params, cfg, mel, phase_noise=pn, additive_noise=an)[0]
            wavs[name] = np.asarray(wav, np.float64)
        out[name + "_ms"] = round(best * 1e3, 1)
        log(f"{name}: {best * 1e3:.1f} ms (incl ~30 ms dispatch overhead)")
    if wavs:
        err = wavs["poly"] - wavs["exact"]
        out["snr_db"] = round(
            10 * np.log10(np.sum(wavs["exact"] ** 2) / max(np.sum(err**2), 1e-30)), 1
        )
    out["speedup"] = round(out["exact_ms"] / out["poly_ms"], 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
