"""chatterbox-tpu: a TPU-native (JAX/XLA/Pallas/pjit) zero-shot voice-cloning
TTS + voice-conversion framework with the capabilities of Chatterbox TTS.

Public API mirrors the reference (`/root/reference/src/chatterbox/__init__.py`):
  - ChatterboxTTS : text + reference voice -> 24 kHz waveform
  - ChatterboxVC  : source speech -> target voice
  - Conditionals  : precomputed voice conditioning (immutable pytree)
"""

__version__ = "0.1.0"

from .constants import S3_SR, S3GEN_SR, S3_TOKEN_RATE, SPEECH_VOCAB_SIZE

__all__ = [
    "S3_SR",
    "S3GEN_SR",
    "S3_TOKEN_RATE",
    "SPEECH_VOCAB_SIZE",
    "ChatterboxTTS",
    "ChatterboxVC",
    "Conditionals",
]


def __getattr__(name):
    # Lazy imports keep `import chatterbox_tpu` cheap (no model-code import).
    if name in ("ChatterboxTTS", "Conditionals"):
        from .pipeline import tts

        return getattr(tts, name)
    if name == "ChatterboxVC":
        from .pipeline import vc

        return vc.ChatterboxVC
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
