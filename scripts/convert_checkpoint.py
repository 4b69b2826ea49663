"""One-time converter: reference torch checkpoints -> native JAX pytrees.

Usage:
    python scripts/convert_checkpoint.py --src /path/to/chatterbox_ckpt --dst out/

Reads the ResembleAI/chatterbox artifact set (ve.safetensors,
t3_cfg.safetensors, s3gen.safetensors [, conds.pt, tokenizer.json]) and
writes the framework's native safetensors pytrees (checkpoint/pytree_io.py)
plus converted conditionals -- subsequent loads skip the torch-layout
conversion entirely (`ChatterboxTTS.from_native`).
"""

import argparse
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--dst", required=True)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # conversion is host work

    from chatterbox_tpu.pipeline.tts import ChatterboxTTS

    src, dst = Path(args.src), Path(args.dst)
    print(f"converting {src} -> {dst}")
    tts = ChatterboxTTS.from_local(src)
    dst.mkdir(parents=True, exist_ok=True)
    tts.save_native(dst)
    if (src / "tokenizer.json").exists():
        shutil.copy(src / "tokenizer.json", dst / "tokenizer.json")
    print("wrote:", sorted(p.name for p in dst.iterdir()))


if __name__ == "__main__":
    main()
