"""Framework-agnostic serving logic: one TTSService with plain-function
route handlers, adapted to FastAPI (if installed) or the stdlib HTTP server
(serve/server.py). Mirrors the reference FastAPI route set
(src/server/server.py): /health, /generate, /emotions CRUD + test,
/voices upload/list/remove, /outputs files, / web UI.
"""

import base64
import io
import logging
import time
import uuid
import wave
from pathlib import Path
from typing import Optional

import numpy as np

from ..pipeline.tts import ChatterboxTTS
from .config import ServerConfig
from .schemas import (
    EmotionCreateRequest,
    EmotionListResponse,
    EmotionProfile,
    EmotionUpdateRequest,
    ServerStatus,
    TTSRequest,
    TTSResponse,
    VoiceUploadResponse,
)
from .voice_manager import VoiceManager

logger = logging.getLogger(__name__)


def wav_bytes(wav: np.ndarray, sr: int) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes((np.clip(wav, -1, 1) * 32767).astype(np.int16).tobytes())
    return buf.getvalue()


class TTSService:
    def __init__(self, cfg: ServerConfig, tts: Optional[ChatterboxTTS] = None):
        self.cfg = cfg
        cfg.ensure_dirs()
        self.start_time = time.time()
        if tts is None:
            if cfg.model_dir:
                tts = ChatterboxTTS.from_local(cfg.model_dir)
            else:
                logger.warning("CHATTERBOX_MODEL_DIR unset: serving random-weight model (dev mode)")
                tts = ChatterboxTTS.from_random()
        self.tts = tts
        self.voices = VoiceManager(
            tts, cfg.voice_storage_path, cfg.config_storage_path, cfg.cache_path
        )
        # dynamic request batching: concurrent /generate calls coalesce into
        # one generate_batch dispatch (batch 16 is ~3.3x the per-row
        # throughput of batch 1 on TPU, docs/PERFORMANCE.md). device_lock
        # serializes every pipeline dispatch/compile across HTTP handler
        # threads (ThreadingHTTPServer) + the batcher workers. It must be
        # FIFO-FAIR: with a plain RLock a saturated generate worker
        # re-acquires back-to-back and starves stream ticks (measured:
        # stream TTFA ~20 s under continuous batch load -- see fairlock.py).
        from .fairlock import FairRLock

        self.device_lock = FairRLock()
        self.batcher = None
        self.stream_batcher = None
        if cfg.batch_window_ms > 0:
            from .batcher import DynamicBatcher, StreamBatcher

            self.batcher = DynamicBatcher(
                tts, max_batch=cfg.max_dynamic_batch, window_ms=cfg.batch_window_ms,
                device_lock=self.device_lock,
                # admission control (cfg.admission_control): while streams
                # are live, bulk batches run preemptibly so stream ticks
                # never wait behind a whole-batch dispatch
                stream_active_fn=(
                    (lambda: self.stream_batcher is not None
                     and self.stream_batcher.has_active())
                    if cfg.admission_control else None
                ),
                bulk_chunk_tokens=cfg.bulk_chunk_tokens,
                bulk_rows_with_streams=cfg.bulk_rows_with_streams,
            )
            # concurrent /generate/stream requests coalesce into LOCKSTEP
            # groups sharing batched per-tick dispatches (r2 verdict #6)
            self.stream_batcher = StreamBatcher(
                tts, max_streams=cfg.max_stream_group,
                window_ms=max(cfg.batch_window_ms, 50.0),
                device_lock=self.device_lock,
            )

    # ---------------------------------------------------------------- routes
    def health(self) -> ServerStatus:
        import jax

        dev = jax.devices()[0]
        mem = {}
        try:
            stats = dev.memory_stats() or {}
            mem = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
        except Exception:
            pass
        return ServerStatus(
            status="ok",
            model_loaded=self.tts is not None,
            device=dev.platform,
            emotions_ready=self.voices.get_stats()["ready"],
            uptime_seconds=time.time() - self.start_time,
            memory=mem,
            batching={
                **(dict(self.batcher.stats) if self.batcher is not None else {}),
                **(
                    dict(self.stream_batcher.stats)
                    if self.stream_batcher is not None
                    else {}
                ),
            },
        )

    def _resolve_conds(self, req: TTSRequest):
        """Returns (conds, exaggeration). A request without an explicit
        exaggeration uses the emotion profile's stored value (the point of
        exaggeration-keyed conditioning caches) or the server default."""
        if req.emotion:
            # cold-profile conditioning runs the device models -- lock it
            with self.device_lock:
                conds = self.voices.get_conditionals(req.emotion)
            if conds is None:
                raise KeyError(f"emotion profile not found or has no samples: {req.emotion}")
            if req.exaggeration is not None:
                exag = req.exaggeration
            else:
                prof = self.voices.get_profile(req.emotion)
                exag = prof.exaggeration if prof else self.cfg.default_exaggeration
            return conds, exag
        exag = req.exaggeration if req.exaggeration is not None else self.cfg.default_exaggeration
        if self.tts.conds is not None:
            return self.tts.conds, exag
        raise ValueError("no emotion specified and no default voice loaded")

    def _tier_flow_steps(self, req: TTSRequest):
        """Map the request quality tier to a per-call CFM step count (None =
        pipeline default). Tiers hit separately-keyed jit caches, so both
        stay warm once compiled."""
        return self.cfg.turbo_flow_steps if req.quality == "turbo" else None

    def generate(self, req: TTSRequest) -> TTSResponse:
        conds, exaggeration = self._resolve_conds(req)

        params = dict(
            repetition_penalty=req.repetition_penalty,
            min_p=req.min_p,
            top_p=req.top_p,
            exaggeration=exaggeration,
            cfg_weight=req.cfg_weight,
            temperature=req.temperature,
            max_new_tokens=req.max_new_tokens,
            flow_steps=self._tier_flow_steps(req),
            alignment=req.alignment,
        )
        t0 = time.time()
        if self.batcher is not None:
            # coalesced path: seeded requests run as solo groups (the batch
            # shares sampling draws; solo keeps seed -> audio deterministic)
            wav = self.batcher.submit(
                req.text, conds, params, req.seed,
                timeout=self.cfg.generate_timeout_s,
            )
        else:
            with self.device_lock:
                wav = self.tts.generate_batch(
                    [req.text],
                    conds=conds,
                    seed=req.seed if req.seed is not None else int(time.time() * 1000) % (2**31),
                    **params,
                )[0]
        gen_time = time.time() - t0
        duration = len(wav) / self.tts.sr
        resp = TTSResponse(
            sample_rate=self.tts.sr,
            duration_seconds=round(duration, 3),
            generation_time_seconds=round(gen_time, 3),
            rtf=round(gen_time / max(duration, 1e-6), 3),
            metadata={"emotion": req.emotion, "seed": req.seed,
                      "quality": req.quality},
        )
        data = wav_bytes(wav, self.tts.sr)
        if req.return_base64:
            resp.audio_base64 = base64.b64encode(data).decode()
        else:
            name = f"tts_{uuid.uuid4().hex[:10]}.wav"
            (Path(self.cfg.output_path) / name).write_bytes(data)
            resp.audio_url = f"/outputs/{name}"
        return resp

    def generate_stream(self, req: TTSRequest):
        """Yield raw 16-bit PCM chunks while synthesis continues (chunked
        HTTP streaming; the batch path's RTF >> 1 makes this real-time).
        Sample rate rides the X-Sample-Rate response header."""
        from ..pipeline.streaming import StreamConfig, stream_generate

        conds, exaggeration = self._resolve_conds(req)

        stream = StreamConfig(
            max_new_tokens=req.max_new_tokens,
            flow_steps=self._tier_flow_steps(req),
        )
        params = dict(
            stream=stream,
            repetition_penalty=req.repetition_penalty,
            min_p=req.min_p,
            top_p=req.top_p,
            exaggeration=exaggeration,
            cfg_weight=req.cfg_weight,
            temperature=req.temperature,
        )
        if self.stream_batcher is not None:
            # lockstep group path: N concurrent streams share batched
            # per-tick dispatches (serve/batcher.py StreamBatcher)
            for chunk in self.stream_batcher.submit(
                req.text, conds, params, req.seed
            ):
                yield (np.clip(chunk, -1, 1) * 32767).astype("<i2").tobytes()
            return
        it = stream_generate(
            self.tts,
            req.text,
            conds=conds,
            seed=req.seed if req.seed is not None else int(time.time() * 1000) % (2**31),
            **params,
        )
        while True:
            # lock per chunk: batched /generate work interleaves between
            # chunks instead of racing the jit caches mid-stream
            with self.device_lock:
                try:
                    chunk = next(it)
                except StopIteration:
                    return
            yield (np.clip(chunk, -1, 1) * 32767).astype("<i2").tobytes()

    def list_emotions(self) -> EmotionListResponse:
        """Reference /emotions shape (server.py:301-312): emotions +
        total_count + distinct characters."""
        profiles = self.voices.list_profiles()
        return EmotionListResponse(
            emotions=profiles,
            total_count=len(profiles),
            characters=self.voices.list_characters(),
        )

    def create_emotion(self, req: EmotionCreateRequest) -> EmotionProfile:
        return self.voices.create_profile(EmotionProfile(**req.model_dump()))

    def get_emotion(self, emotion_id: str) -> Optional[EmotionProfile]:
        return self.voices.get_profile(emotion_id)

    def update_emotion(self, emotion_id: str, req: EmotionUpdateRequest) -> Optional[EmotionProfile]:
        return self.voices.update_profile(emotion_id, req.model_dump())

    def delete_emotion(self, emotion_id: str) -> bool:
        return self.voices.delete_profile(emotion_id)

    def upload_emotion_voice(
        self, emotion_id: str, filename: str, data: bytes, description=None
    ) -> VoiceUploadResponse:
        """Reference POST /emotions/{id}/voices (server.py:376-440)."""
        if self.voices.get_profile(emotion_id) is None:
            raise KeyError("Emotion not found")
        if not filename or not any(
            filename.lower().endswith("." + f) for f in self.cfg.allowed_audio_formats
        ):
            raise ValueError(
                f"Invalid file format. Allowed formats: {self.cfg.allowed_audio_formats}"
            )
        if len(data) > self.cfg.max_upload_mb * 1024 * 1024:
            raise ValueError(f"File too large. Maximum size: {self.cfg.max_upload_mb}MB")
        sample = self.voices.add_voice_sample(emotion_id, data, filename, description)
        return VoiceUploadResponse(
            success=True,
            message="Voice sample uploaded successfully",
            voice_id=sample["voice_id"],
            file_path=sample["file_path"],
        )

    def remove_emotion_voice(self, emotion_id: str, voice_filename: str) -> dict:
        """Reference DELETE /emotions/{id}/voices/remove (server.py:442-469)."""
        if self.voices.get_profile(emotion_id) is None:
            raise KeyError("Emotion not found")
        if not self.voices.remove_voice_sample(emotion_id, voice_filename):
            raise KeyError("Voice sample not found")
        return {"success": True, "message": "Voice sample removed successfully"}

    def test_emotion(self, emotion_id: str, text: str = "This is a test of the emotion profile.") -> TTSResponse:
        return self.generate(TTSRequest(text=text, emotion=emotion_id))

    def upload_voice(self, filename: str, data: bytes) -> dict:
        if len(data) > self.cfg.max_upload_mb * 1024 * 1024:
            raise ValueError("upload too large")
        safe = Path(filename).name
        if not safe.lower().endswith(".wav"):
            raise ValueError("only .wav uploads supported")
        (Path(self.cfg.voice_storage_path) / safe).write_bytes(data)
        return {"filename": safe, "size": len(data)}

    def list_voices(self):
        return sorted(p.name for p in Path(self.cfg.voice_storage_path).glob("*.wav"))

    def delete_voice(self, name: str) -> bool:
        p = Path(self.cfg.voice_storage_path) / Path(name).name
        if p.exists():
            p.unlink()
            return True
        return False

    def output_file(self, name: str) -> Optional[bytes]:
        p = Path(self.cfg.output_path) / Path(name).name
        return p.read_bytes() if p.exists() else None
