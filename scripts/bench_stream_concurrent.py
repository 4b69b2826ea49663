"""Concurrent-stream capacity benchmark: N lockstep streams on one chip.

Measures, for N in --streams: per-stream TTFA (time from group start to
that stream's first audio chunk) and per-stream RTF (wall / audio-seconds,
whole group). VERDICT r2 #6 target: TTFA < 0.5 s and per-stream RTF < 1 at
N >= 4. Prints one JSON line per N.

``--mixed`` additionally measures a mixed-load point the way the server
schedules it (serve/batcher.py): the stream group's ticks and batched
/generate dispatches interleave on a shared device RLock -- one thread runs
the N-stream lockstep loop taking the lock per tick, another runs b=4
250-token generate batches taking the lock per batch. Reported: stream
TTFA/RTF under contention + per-batch generate latency.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_stream_concurrent.py
"""

import argparse
import json
import sys
import threading
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, default=250)
    ap.add_argument("--chunk-tokens", type=int, default=25)
    ap.add_argument("--streams", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--mixed", action="store_true",
                    help="also measure N=4 streams + interleaved b4 generate batches")
    ap.add_argument("--admission", action="store_true",
                    help="mixed mode: run the bulk loop PREEMPTIBLY "
                         "(generate_batch_preemptible, chunked T3 + row-split "
                         "s3gen releasing the lock between dispatches) -- the "
                         "server's admission-control policy")
    ap.add_argument("--bulk-chunk-tokens", type=int, default=50)
    ap.add_argument("--bulk-rows", type=int, default=4)
    ap.add_argument("--turbo", action="store_true",
                    help="stream with the 4-step-CFM turbo tier (and int8 T3 "
                         "weights): the serving quality tier's capacity sweep")
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
    from chatterbox_tpu.pipeline.streaming import StreamConfig, stream_generate_batch
    from chatterbox_tpu.pipeline.tts import ChatterboxTTS
    from chatterbox_tpu.runtime.precision import apply_tts_precision

    def log(m):
        print(f"[stream-conc] {m}", file=sys.stderr, flush=True)

    tts = ChatterboxTTS.from_random(seed=0, synthetic=True)
    apply_tts_precision(tts, weight_quant=args.turbo)
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
    log("model ready")

    texts_pool = [
        "The quick brown fox jumps over the lazy dog near the river bank today.",
        "A second speaker reads an entirely different sentence about mountains.",
        "Stream three narrates the weather forecast for the coming weekend now.",
        "Speaker four describes a recipe for fresh bread with honey and butter.",
        "The fifth voice recounts a short story about a lighthouse in the storm.",
        "Number six lists the planets of the solar system in order from the sun.",
        "Voice seven explains how tides follow the moon around the earth daily.",
        "The eighth stream hums a tune about trains crossing the high desert.",
    ]
    st = StreamConfig(chunk_tokens=args.chunk_tokens, max_new_tokens=args.tokens,
                      flow_steps=4 if args.turbo else None)
    kw = dict(seed=0, min_new_tokens=args.tokens - 1)

    for n in args.streams:
        texts = texts_pool[:n]
        # warm every shape bucket (compiles persist-cache across runs)
        for chunks in stream_generate_batch(tts, texts, stream=st, **kw):
            pass
        log(f"N={n} warm")
        t0 = time.time()
        ttfa = [None] * n
        audio = [0.0] * n
        for chunks in stream_generate_batch(tts, texts, stream=st, **kw):
            now = time.time()
            for i, c in enumerate(chunks):
                if c is not None and len(c):
                    if ttfa[i] is None:
                        ttfa[i] = now - t0
                    audio[i] += len(c) / 24000.0
        wall = time.time() - t0
        per_rtf = [round(wall / a, 3) if a else None for a in audio]
        print(json.dumps({
            "streams": n,
            "turbo": bool(args.turbo),
            "wall_s": round(wall, 2),
            "audio_s_per_stream": [round(a, 1) for a in audio],
            "ttfa_s": [round(t, 3) if t is not None else None for t in ttfa],
            "per_stream_rtf": per_rtf,
            "aggregate_audio_sec_per_s": round(sum(audio) / wall, 1),
        }), flush=True)

    if args.mixed:
        n = 4
        texts = texts_pool[:n]
        gen_texts = texts_pool[4:8]
        gen_kw = dict(max_new_tokens=args.tokens, min_new_tokens=args.tokens - 1)
        # warm BOTH paths in this process: the b4 generate graph AND the
        # N=4 stream-tick graphs (first contact costs ~60-80 s each on the
        # remote backend even with the persistent disk cache -- measured
        # polluting a mixed run whose --streams list skipped 4)
        tts.generate_batch(gen_texts, seed=9, **gen_kw)
        if args.admission:  # warm the preemptible path's chunk + row graphs
            tts.generate_batch_preemptible(
                gen_texts, seed=9, t3_chunk_tokens=args.bulk_chunk_tokens,
                s3gen_max_rows=args.bulk_rows, **gen_kw,
            )
        for _ in stream_generate_batch(tts, texts, stream=st, **kw):
            pass
        log("mixed: warm")

        from chatterbox_tpu.serve.fairlock import FairRLock

        lock = FairRLock()  # the server's lock: FIFO handoff (fairlock.py)
        gen_lat, stop = [], threading.Event()

        def gen_loop():
            i = 0
            while not stop.is_set():
                t0 = time.time()
                if args.admission:
                    # the server's admission-control policy: bounded
                    # dispatches, lock released between them
                    tts.generate_batch_preemptible(
                        gen_texts, seed=100 + i, lock=lock,
                        t3_chunk_tokens=args.bulk_chunk_tokens,
                        s3gen_max_rows=args.bulk_rows, **gen_kw,
                    )
                else:
                    with lock:
                        tts.generate_batch(gen_texts, seed=100 + i, **gen_kw)
                gen_lat.append(time.time() - t0)
                i += 1

        t0 = time.time()
        ttfa = [None] * n
        audio = [0.0] * n
        gen_thread = threading.Thread(target=gen_loop, daemon=True)
        gen_thread.start()
        it = stream_generate_batch(tts, texts, stream=st, **kw)
        while True:
            with lock:  # one tick per lock hold, like StreamBatcher
                try:
                    chunks = next(it)
                except StopIteration:
                    break
            now = time.time()
            for i, c in enumerate(chunks):
                if c is not None and len(c):
                    if ttfa[i] is None:
                        ttfa[i] = now - t0
                    audio[i] += len(c) / 24000.0
        wall = time.time() - t0
        stop.set()
        gen_thread.join(timeout=120)
        gen_audio = len(gen_lat) * 4 * (args.tokens / 25.0)
        print(json.dumps({
            "mixed": True,
            "admission": bool(args.admission),
            "turbo": bool(args.turbo),
            "streams": n,
            "wall_s": round(wall, 2),
            "ttfa_s": [round(t, 3) if t is not None else None for t in ttfa],
            "per_stream_rtf": [round(wall / a, 3) if a else None for a in audio],
            "gen_batches_completed": len(gen_lat),
            "gen_batch_latency_s": [round(t, 2) for t in gen_lat],
            "aggregate_audio_sec_per_s": round(
                (sum(audio) + gen_audio) / wall, 1
            ),
        }), flush=True)


if __name__ == "__main__":
    main()
