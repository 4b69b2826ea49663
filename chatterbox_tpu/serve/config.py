"""Server configuration from CHATTERBOX_* environment variables.

Parity target: reference src/server/config.py (pydantic-settings based).
pydantic-settings isn't installed here, so the same env-var surface is
implemented directly on a pydantic model.
"""

import os
from pathlib import Path

from pydantic import BaseModel


class ServerConfig(BaseModel):
    host: str = "0.0.0.0"
    port: int = 8000
    device: str = "auto"  # auto | tpu | cpu
    model_dir: str = ""  # checkpoint dir; empty -> random weights (dev)
    compile_mode: str = "default"
    voice_storage_path: str = "storage/voices"
    config_storage_path: str = "storage/configs"
    cache_path: str = "storage/cache"
    output_path: str = "storage/outputs"
    max_upload_mb: int = 50
    allowed_audio_formats: tuple = ("wav", "mp3", "flac", "ogg")  # reference config.py upload gate
    default_exaggeration: float = 0.5
    default_cfg_weight: float = 0.5
    default_temperature: float = 0.8
    max_batch_size: int = 8
    # dynamic request batching (serve/batcher.py): concurrent /generate
    # requests within the window coalesce into one batched dispatch.
    # 0 disables (every request runs solo, reference behavior).
    batch_window_ms: float = 25.0
    max_dynamic_batch: int = 16
    # max concurrent /generate/stream rows per lockstep group
    # (serve/batcher.py StreamBatcher); batch_window_ms=0 disables both
    # batchers
    max_stream_group: int = 8
    generate_timeout_s: float = 300.0
    # CFM Euler step count the "turbo" request quality tier maps to
    # (TTSRequest.quality; measured curve in docs/PERFORMANCE.md -- 4 steps
    # = mel SNR 41.5 dB vs the 10-step default)
    turbo_flow_steps: int = 4
    # mixed-load admission control (serve/batcher.py): while streams are
    # active, bulk /generate work runs PREEMPTIBLY -- the T3 decode is
    # chunked (bulk_chunk_tokens per device dispatch) and the synthesis
    # stage split to <= bulk_rows_with_streams rows per dispatch, releasing
    # the device lock between dispatches so stream ticks interleave at
    # sub-second granularity instead of waiting behind whole-batch
    # dispatches. Measured (N=4 streams + saturating b4 bulk, one v5e):
    # per-stream RTF 2.25-2.48 without the policy; 0.90-1.00 with these
    # defaults (bulk latency 1.6 -> ~8 s; docs/PERFORMANCE.md mixed-load
    # table). 25-token chunks also reuse the streaming path's decode
    # executables. admission_control=0 disables.
    admission_control: bool = True
    bulk_chunk_tokens: int = 25
    bulk_rows_with_streams: int = 2

    @classmethod
    def from_env(cls) -> "ServerConfig":
        prefix = "CHATTERBOX_"
        kwargs = {}
        for name, field in cls.model_fields.items():
            env = os.environ.get(prefix + name.upper())
            if env is not None:
                kwargs[name] = env
        return cls(**kwargs)

    def ensure_dirs(self):
        for p in [self.voice_storage_path, self.config_storage_path, self.cache_path, self.output_path]:
            Path(p).mkdir(parents=True, exist_ok=True)


_config = None


def get_config() -> ServerConfig:
    global _config
    if _config is None:
        _config = ServerConfig.from_env()
    return _config
