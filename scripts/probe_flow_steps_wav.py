"""WAV-level divergence of the CFM step-count knob: full TTS pipeline at
n_timesteps in {10, 4}, identical seed/tokens/noise (T3 is unaffected by
the knob, so the token streams are identical by construction and the
waveforms are sample-comparable through the deterministic vocoder).

Complements scripts/probe_flow_steps.py's mel-level curve with the number
users actually hear. Prints one JSON line per n.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_flow_steps_wav.py
"""

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, default=250)
    ap.add_argument("--steps", type=int, nargs="+", default=[10, 4])
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tiny", action="store_true", help="tiny configs (CPU smoke)")
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
    from chatterbox_tpu.pipeline.tts import ChatterboxTTS
    from chatterbox_tpu.runtime.precision import apply_tts_precision

    def log(m):
        print(f"[flow-steps-wav] {m}", file=sys.stderr, flush=True)

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
        from chatterbox_tpu.models.s3gen.conformer import ConformerConfig
        from chatterbox_tpu.models.s3gen.flow import FlowConfig
        from chatterbox_tpu.models.s3gen.s3gen import S3GenConfig
        from chatterbox_tpu.models.s3gen.unet import UNetConfig
        from chatterbox_tpu.models.s3tokenizer import S3TokenizerConfig
        from chatterbox_tpu.models.t3.llama import LlamaConfig
        from chatterbox_tpu.models.t3.t3 import T3Config

        tts = ChatterboxTTS.from_random(
            seed=0,
            t3_cfg=T3Config(llama=LlamaConfig(
                hidden_size=64, intermediate_size=128, num_hidden_layers=2,
                num_attention_heads=2, num_key_value_heads=2, head_dim=32)),
            s3gen_cfg=S3GenConfig(
                flow=FlowConfig(
                    input_size=128,
                    encoder=ConformerConfig(input_size=128, output_size=128,
                                            attention_heads=4, linear_units=256,
                                            num_blocks=2, num_up_blocks=1),
                    estimator=UNetConfig(channels=64, n_blocks=1,
                                         num_mid_blocks=2, num_heads=4)),
                tokenizer=S3TokenizerConfig(n_state=64, n_head=4, n_layer=2)),
        )
        args.tokens = min(args.tokens, 16)
    else:
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
    tts._apply_watermark_device = lambda wav: wav
    tts.watermarker.apply_watermark = lambda wav, **kw: np.asarray(wav)
    log("model ready")

    text = "The quick brown fox jumps over the lazy dog near the river bank today."
    kw = dict(max_new_tokens=args.tokens, min_new_tokens=args.tokens - 1, seed=0)

    wavs = {}
    for n in args.steps:
        # per-call flow_steps (r5 quality-tier path -- the same executables
        # the serving tiers hit; T3 graphs stay cached across step counts)
        t0 = time.time()
        wavs[n] = np.asarray(tts.generate(text, flow_steps=n, **kw)[0], np.float64)
        log(f"n={n}: {len(wavs[n])/24000:.1f}s audio in {time.time()-t0:.1f}s")

    ref = wavs[max(args.steps)]
    sig = float(np.mean(ref**2)) + 1e-12
    for n in args.steps:
        m = min(len(wavs[n]), len(ref))
        d = wavs[n][:m] - ref[:m]
        snr = None if n == max(args.steps) else round(
            10 * np.log10(sig / (float(np.mean(d**2)) + 1e-12)), 1
        )
        print(json.dumps({
            "n_timesteps": n,
            f"wav_snr_db_vs_n{max(args.steps)}": snr,
            "len_match": len(wavs[n]) == len(ref),
            "rms_ref": round(float(np.sqrt(sig)), 4),
        }), flush=True)


if __name__ == "__main__":
    main()
