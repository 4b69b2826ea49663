"""TTS example (mirrors reference example_tts.py with the TPU-native API).

With a checkpoint directory (the ResembleAI/chatterbox artifact set converted
on the fly):
    python examples/example_tts.py --ckpt /path/to/ckpt --ref voice.wav
Without weights it runs the random-init pipeline (audio is noise; exercises
the full TPU path end to end).
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None, help="checkpoint dir (ve/t3_cfg/s3gen.safetensors + tokenizer.json)")
    ap.add_argument("--ref", default=None, help="reference voice wav (10s)")
    ap.add_argument("--text", default="Ezreal and Jinx teamed up with Ahri, Yasuo, and Teemo "
                    "to take down the enemy's Nexus in an epic late-game pentakill.")
    ap.add_argument("--out", default="test-tpu.wav")
    ap.add_argument("--exaggeration", type=float, default=0.5)
    ap.add_argument("--cfg-weight", type=float, default=0.5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (the reference ships example_for_mac.py for this)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from chatterbox_tpu.pipeline.audio import save_wav
    from chatterbox_tpu.pipeline.tts import ChatterboxTTS

    if args.ckpt:
        model = ChatterboxTTS.from_local(args.ckpt)
    else:
        print("no --ckpt: using random weights (dev mode)")
        model = ChatterboxTTS.from_random()

    if args.ref:
        model.prepare_conditionals(args.ref, exaggeration=args.exaggeration)
    elif model.conds is None:
        print("no --ref and no builtin voice: conditioning on synthetic audio")
        rng = np.random.default_rng(0)
        model.prepare_conditionals((rng.standard_normal(5 * 24000) * 0.05).astype(np.float32))

    wav = model.generate(
        args.text,
        exaggeration=args.exaggeration,
        cfg_weight=args.cfg_weight,
        seed=args.seed,
    )
    save_wav(args.out, wav[0], model.sr)
    print(f"wrote {args.out}: {wav.shape[1] / model.sr:.2f}s @ {model.sr} Hz")


if __name__ == "__main__":
    main()
