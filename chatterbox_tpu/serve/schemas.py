"""REST request/response schemas, mirroring reference src/server/models.py
(parameter ranges included: temperature 0.1-2.0, cfg 0.0-1.0, etc.)."""

import time
from typing import Dict, List, Optional

from pydantic import BaseModel, Field


class TTSRequest(BaseModel):
    text: str = Field(..., min_length=1, max_length=5000)
    emotion: Optional[str] = None
    # None = use the emotion profile's stored exaggeration (or the server
    # default without a profile); a value overrides per request
    exaggeration: Optional[float] = Field(None, ge=0.0, le=2.0)
    cfg_weight: float = Field(0.5, ge=0.0, le=1.0)
    temperature: float = Field(0.8, ge=0.1, le=2.0)
    repetition_penalty: float = Field(1.2, ge=1.0, le=3.0)
    min_p: float = Field(0.05, ge=0.0, le=1.0)
    top_p: float = Field(1.0, ge=0.0, le=1.0)
    seed: Optional[int] = None
    return_base64: bool = True
    max_new_tokens: int = Field(1000, ge=1, le=1000)
    # quality/latency tier: "default" = reference numerics (10-step CFM);
    # "turbo" = reduced CFM step count (server config turbo_flow_steps,
    # default 4 -- measured mel SNR 41.5 dB vs default, docs/PERFORMANCE.md).
    # Tiers map to separately-cached compiled executables, so switching is
    # free once warm.
    quality: str = Field("default", pattern="^(default|turbo)$")
    # run the alignment hallucination watchdog inside the T3 decode loop
    # (false-start/long-tail/repetition detection with forced EOS); costs
    # decode-step speed -- see docs/PERFORMANCE.md
    alignment: bool = False


class TTSResponse(BaseModel):
    success: bool = True
    audio_base64: Optional[str] = None
    audio_url: Optional[str] = None
    sample_rate: int = 24000
    duration_seconds: float = 0.0
    generation_time_seconds: float = 0.0
    rtf: float = 0.0  # generation_time / duration
    metadata: Dict = {}


class EmotionProfile(BaseModel):
    id: str
    name: str = ""
    character: str = ""  # reference models.py:42 groups emotions by character
    description: str = ""
    exaggeration: float = Field(0.5, ge=0.0, le=1.0)
    voice_samples: List[str] = []
    created_at: float = Field(default_factory=time.time)
    updated_at: float = Field(default_factory=time.time)


class EmotionCreateRequest(BaseModel):
    id: str
    name: str = ""
    character: str = ""
    description: str = ""
    exaggeration: float = Field(0.5, ge=0.0, le=1.0)
    voice_samples: List[str] = []


class EmotionUpdateRequest(BaseModel):
    """Partial update (reference EmotionProfileUpdate, models.py:57-62)."""

    name: Optional[str] = Field(None, min_length=1, max_length=100)
    character: Optional[str] = Field(None, min_length=1, max_length=100)
    exaggeration: Optional[float] = Field(None, ge=0.0, le=1.0)
    description: Optional[str] = Field(None, max_length=500)


class EmotionListResponse(BaseModel):
    """Reference models.py:82-86."""

    emotions: List[EmotionProfile]
    total_count: int
    characters: List[str]


class VoiceUploadResponse(BaseModel):
    """Reference models.py:74-79."""

    success: bool
    message: str
    voice_id: Optional[str] = None
    file_path: Optional[str] = None


class ServerStatus(BaseModel):
    status: str = "ok"
    model_loaded: bool = False
    device: str = ""
    emotions_ready: List[str] = []
    uptime_seconds: float = 0.0
    memory: Dict = {}
    batching: Dict = {}  # dynamic-batcher stats (serve/batcher.py)
    version: str = "0.1.0"
