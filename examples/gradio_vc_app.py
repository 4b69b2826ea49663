"""Gradio voice-conversion demo (mirrors reference gradio_vc_app.py)."""

import numpy as np

try:
    import gradio as gr
except ImportError as e:
    raise SystemExit("gradio is not installed in this environment") from e

from chatterbox_tpu.pipeline.vc import ChatterboxVC

MODEL = None


def convert(source, target):
    global MODEL
    if MODEL is None:
        MODEL = ChatterboxVC.from_random()
    wav = MODEL.generate(source, target_voice_path=target)
    return (MODEL.sr, np.asarray(wav[0]))


demo = gr.Interface(
    fn=convert,
    inputs=[
        gr.Audio(label="Source speech", type="filepath"),
        gr.Audio(label="Target voice", type="filepath"),
    ],
    outputs=gr.Audio(label="Converted"),
    concurrency_limit=1,
)

if __name__ == "__main__":
    demo.launch()
