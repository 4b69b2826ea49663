"""Voice-conversion example (mirrors reference example_vc.py)."""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--audio", default=None, help="source speech wav")
    ap.add_argument("--target", default=None, help="target voice wav")
    ap.add_argument("--out", default="testvc-tpu.wav")
    args = ap.parse_args()

    from chatterbox_tpu.pipeline.audio import save_wav
    from chatterbox_tpu.pipeline.vc import ChatterboxVC

    model = ChatterboxVC.from_local(args.ckpt) if args.ckpt else ChatterboxVC.from_random()

    rng = np.random.default_rng(0)
    target = args.target or (rng.standard_normal(5 * 24000) * 0.05).astype(np.float32)
    source = args.audio or (rng.standard_normal(3 * 16000) * 0.05).astype(np.float32)
    wav = model.generate(source, target_voice_path=target)
    save_wav(args.out, wav[0], model.sr)
    print(f"wrote {args.out}: {wav.shape[1] / model.sr:.2f}s @ {model.sr} Hz")


if __name__ == "__main__":
    main()
