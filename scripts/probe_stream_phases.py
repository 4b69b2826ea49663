"""Per-chunk phase breakdown of the streaming path on hardware: t3 chunk
(sync), token readback, flow window, vocoder, total. Prints JSON lines."""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from chatterbox_tpu.constants import SPEECH_VOCAB_SIZE
    from chatterbox_tpu.models.s3gen.s3gen import RefDict
    from chatterbox_tpu.pipeline.conditionals import Conditionals, T3CondData
    from chatterbox_tpu.pipeline import streaming as S
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
    print("[phases] model ready", file=sys.stderr, flush=True)

    # instrument _ChunkSynthesizer.extend + the step loop by re-implementing
    # the stream_generate loop inline with timers
    from chatterbox_tpu.core.sampling import SamplingConfig
    from chatterbox_tpu.models.t3.t3 import t3_generate_resume, t3_generate_start

    text = "The quick brown fox jumps over the lazy dog near the river bank today."
    st = S.StreamConfig(chunk_tokens=25, max_new_tokens=250)
    row = tts._cap_text_row(tts._encode_text(text))
    from chatterbox_tpu.pipeline.tts import TEXT_BUCKETS, _bucket

    tmax = _bucket(len(row), TEXT_BUCKETS)
    text_tokens = np.zeros((1, tmax), np.int32)
    text_tokens[0, : len(row)] = row
    text_lens = jnp.asarray([len(row)], np.int32)
    sampling = SamplingConfig(cfg_weight=0.5, min_new_tokens=249)
    cfg = tts.t3_cfg

    start_fn = jax.jit(
        lambda p, t, l, s, pr, e, r: t3_generate_start(p, cfg, t, l, s, pr, e, r, sampling, 250)
    )
    step_fn = jax.jit(lambda p, c, l: t3_generate_resume(p, cfg, c, l, sampling, 25))
    t3c = tts.conds.t3

    for run in range(2):  # run 0 compiles; run 1 is the measurement
        carry = start_fn(tts.t3_params, jnp.asarray(text_tokens), text_lens,
                         t3c.speaker_emb, t3c.prompt_tokens, t3c.emotion_adv,
                         jax.random.PRNGKey(run))
        synth = S._ChunkSynthesizer(tts, tts.conds, st, run)
        n_emit = 0
        rows = []
        while True:
            t0 = time.time()
            carry, res = step_fn(tts.t3_params, carry, text_lens)
            steps = int(res.steps)  # sync
            t1 = time.time()
            length = int(res.lengths[0])
            finished = bool(np.asarray(carry.done)[0]) or steps >= st.max_new_tokens
            tokens = np.asarray(res.tokens[0, :length])
            clean = tokens[tokens < SPEECH_VOCAB_SIZE]
            t2 = time.time()
            wav = None
            if len(clean) > n_emit:
                wav = synth.extend(clean)
                n_emit = len(clean)
            t3 = time.time()
            rows.append({
                "t3_s": round(t1 - t0, 3),
                "readback_s": round(t2 - t1, 3),
                "synth_s": round(t3 - t2, 3),
                "total_s": round(t3 - t0, 3),
                "n_clean": int(len(clean)),
            })
            if finished:
                break
        if run == 1:
            for r in rows:
                print(json.dumps(r))
            tot = sum(r["total_s"] for r in rows)
            print(json.dumps({"wall_s": round(tot, 2), "chunks": len(rows)}))


if __name__ == "__main__":
    main()
