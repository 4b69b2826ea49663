"""Is the pipelined path's wav readback hidden under the next batch's
compute? Times the REAL pipeline at a given batch size three ways:
  sync    -- collect(c-1) via np.asarray (the shipped path)
  nocopy  -- only block on completion (scalar readback), no wav transfer
  async   -- copy_to_host_async issued at dispatch time, np.asarray later
Prints one JSON line."""

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--tokens", type=int, default=250)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from chatterbox_tpu.models.s3gen.s3gen import RefDict
    from chatterbox_tpu.pipeline.conditionals import Conditionals, T3CondData
    from chatterbox_tpu.pipeline.tts import ChatterboxTTS
    from chatterbox_tpu.runtime.precision import apply_tts_precision

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
    texts = ["The quick brown fox jumps over the lazy dog near the river."] * args.batch
    kw = dict(max_new_tokens=args.tokens, min_new_tokens=args.tokens - 1)

    # warm/compile
    h = tts.generate_batch(texts, seed=0, device_chain=True, defer_collect=True, **kw)
    tts.collect(h)
    print("[probe] compiled", file=sys.stderr, flush=True)

    out = {"batch": args.batch}

    def run(mode):
        handles = []
        t0 = time.time()
        for c in range(args.iters):
            hh = tts.generate_batch(
                texts, seed=c + 1, device_chain=True, defer_collect=True, **kw
            )
            if mode == "async":
                try:
                    hh[0].copy_to_host_async()
                except Exception:
                    pass
            handles.append(hh)
            if len(handles) > 1:
                wav, lens = handles.pop(0)
                if mode == "nocopy":
                    int(lens[0])
                    np.asarray(wav[:1, :8])  # completion proof, ~16 B
                else:
                    np.asarray(wav)
        while handles:
            wav, lens = handles.pop(0)
            if mode == "nocopy":
                int(lens[0])
                np.asarray(wav[:1, :8])
            else:
                np.asarray(wav)
        return (time.time() - t0) / args.iters

    for mode in ("sync", "nocopy", "async", "sync"):
        key = f"iter_{mode}_s"
        v = run(mode)
        out[key] = min(out.get(key, 1e9), round(v, 3))
        print(f"[probe] {mode}: {v:.3f}", file=sys.stderr, flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
