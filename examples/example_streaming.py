"""Streaming TTS example: audio chunks print/play as they are synthesized.

Equivalent position in the reference: none (its streaming machinery is
dormant); API mirrors example_tts.py otherwise.
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None, help="checkpoint dir (omit: random weights demo)")
    ap.add_argument("--text", default="Streaming synthesis sends audio while the model is still talking.")
    ap.add_argument("--ref-wav", default=None, help="reference voice wav")
    ap.add_argument("--out", default="stream_out.wav")
    ap.add_argument("--chunk-tokens", type=int, default=25)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from chatterbox_tpu.pipeline.audio import save_wav
    from chatterbox_tpu.pipeline.streaming import StreamConfig, stream_generate
    from chatterbox_tpu.pipeline.tts import ChatterboxTTS

    if args.ckpt:
        tts = ChatterboxTTS.from_local(args.ckpt)
    else:
        print("no --ckpt: random-weight demo (output is noise, timing is real)")
        tts = ChatterboxTTS.from_random(seed=0)
    if args.ref_wav:
        tts.prepare_conditionals(args.ref_wav)
    elif tts.conds is None:
        rng = np.random.default_rng(0)
        tts.prepare_conditionals((rng.standard_normal(3 * 24000) * 0.1).astype(np.float32))

    chunks = []
    t0 = time.time()
    for i, chunk in enumerate(
        stream_generate(tts, args.text, stream=StreamConfig(chunk_tokens=args.chunk_tokens))
    ):
        dt = time.time() - t0
        print(f"chunk {i}: {len(chunk) / 24000:.2f}s audio at t+{dt:.2f}s")
        chunks.append(chunk)
    wav = np.concatenate(chunks)
    save_wav(args.out, wav, 24000)
    print(f"wrote {args.out}: {len(wav) / 24000:.2f}s total")


if __name__ == "__main__":
    main()
