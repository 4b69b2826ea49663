"""Quantify the streaming flow-window approximation (VERDICT r2 #7).

The sliding-window flow truncates left context to ``flow_ctx_tokens``; with
ctx >= the full history the path is exact. Token streams are identical
across ctx values (the T3 carry holds the RNG chain), so the streamed
waveforms are sample-comparable: this measures wav divergence vs the
full-context stream for ctx in {25, 50, 75, 150, full}.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_flow_window.py
"""

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, default=250)
    ap.add_argument("--ctx", type=int, nargs="+", default=[25, 50, 75, 150])
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

    from chatterbox_tpu.models.s3gen.s3gen import RefDict
    from chatterbox_tpu.pipeline.conditionals import Conditionals, T3CondData
    from chatterbox_tpu.pipeline.streaming import StreamConfig, stream_generate
    from chatterbox_tpu.pipeline.tts import ChatterboxTTS
    from chatterbox_tpu.runtime.precision import apply_tts_precision

    def log(m):
        print(f"[flow-window] {m}", file=sys.stderr, flush=True)

    tts = ChatterboxTTS.from_random(seed=0, synthetic=True)
    apply_tts_precision(tts)
    rng = np.random.default_rng(0)
    p_len = 125
    tts.conds = Conditionals(
        T3CondData(
            jnp.asarray(rng.standard_normal((1, 256)).astype(np.float32)),
            jnp.asarray(rng.integers(0, 6561, (1, 150)).astype(np.int32)),
            jnp.full((1,), 0.5),
        ),
        RefDict(
            jnp.asarray(rng.integers(0, 6561, (1, p_len)).astype(np.int32)),
            jnp.full((1,), p_len, jnp.int32),
            jnp.asarray(rng.standard_normal((1, 2 * p_len, 80)).astype(np.float32)),
            jnp.asarray(rng.standard_normal((1, 192)).astype(np.float32)),
        ),
    )
    # disable the watermark so divergence measures the FLOW approximation
    # (the watermark band pattern is deterministic but amplifies nothing)
    tts._apply_watermark_device = lambda wav: wav
    tts.watermarker.apply_watermark = lambda wav, **kw: np.asarray(wav)
    log("model ready")

    text = "The quick brown fox jumps over the lazy dog near the river bank today."

    def run(ctx):
        st = StreamConfig(chunk_tokens=25, flow_ctx_tokens=ctx,
                          max_new_tokens=args.tokens)
        t0 = time.time()
        wav = np.concatenate(list(stream_generate(
            tts, text, stream=st, seed=0, min_new_tokens=args.tokens - 1
        )))
        return wav, time.time() - t0

    full_wav, full_s = run(10_000)  # >= max history: exact flow
    log(f"full-context stream: {len(full_wav)/24000:.1f}s audio in {full_s:.1f}s")

    for ctx in args.ctx:
        wav, wall = run(ctx)
        n = min(len(wav), len(full_wav))
        d = wav[:n] - full_wav[:n]
        sig = float(np.mean(full_wav[:n] ** 2)) + 1e-12
        snr_db = 10 * np.log10(sig / (float(np.mean(d**2)) + 1e-12))
        print(json.dumps({
            "flow_ctx_tokens": ctx,
            "wav_snr_db_vs_full": round(snr_db, 1),
            "max_abs_diff": round(float(np.abs(d).max()), 4),
            "rms_ref": round(float(np.sqrt(sig)), 4),
            "len_match": len(wav) == len(full_wav),
            "wall_s": round(wall, 1),
            "full_ctx_wall_s": round(full_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
