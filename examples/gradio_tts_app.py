"""Gradio TTS demo (mirrors reference gradio_tts_app.py). Requires gradio."""

import numpy as np

try:
    import gradio as gr
except ImportError as e:
    raise SystemExit("gradio is not installed in this environment") from e

from chatterbox_tpu.pipeline.tts import ChatterboxTTS

MODEL = None


def get_model(ckpt):
    global MODEL
    if MODEL is None:
        MODEL = ChatterboxTTS.from_local(ckpt) if ckpt else ChatterboxTTS.from_random()
    return MODEL


def generate(text, ref_wav, exaggeration, cfg_weight, temperature, seed):
    model = get_model(None)
    if ref_wav is not None:
        model.prepare_conditionals(ref_wav, exaggeration=exaggeration)
    wav = model.generate(
        text,
        exaggeration=exaggeration,
        cfg_weight=cfg_weight,
        temperature=temperature,
        seed=int(seed),
    )
    return (model.sr, np.asarray(wav[0]))


demo = gr.Interface(
    fn=generate,
    inputs=[
        gr.Textbox(label="Text", value="Hello from chatterbox-tpu."),
        gr.Audio(label="Reference voice (wav path)", type="filepath"),
        gr.Slider(0.0, 2.0, 0.5, label="Exaggeration"),
        gr.Slider(0.0, 1.0, 0.5, label="CFG weight"),
        gr.Slider(0.1, 2.0, 0.8, label="Temperature"),
        gr.Number(value=0, label="Seed"),
    ],
    outputs=gr.Audio(label="Output"),
    concurrency_limit=1,
)

if __name__ == "__main__":
    demo.launch()
