"""REST request/response schemas, mirroring reference src/server/models.py
(parameter ranges included: temperature 0.1-2.0, cfg 0.0-1.0, etc.)."""

import time
from typing import Dict, List, Optional

from pydantic import BaseModel, Field


class TTSRequest(BaseModel):
    text: str = Field(..., min_length=1, max_length=5000)
    emotion: Optional[str] = None
    exaggeration: float = Field(0.5, ge=0.0, le=2.0)
    cfg_weight: float = Field(0.5, ge=0.0, le=1.0)
    temperature: float = Field(0.8, ge=0.1, le=2.0)
    repetition_penalty: float = Field(1.2, ge=1.0, le=3.0)
    min_p: float = Field(0.05, ge=0.0, le=1.0)
    top_p: float = Field(1.0, ge=0.0, le=1.0)
    seed: Optional[int] = None
    return_base64: bool = True
    max_new_tokens: int = Field(1000, ge=1, le=1000)


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
    description: str = ""
    exaggeration: float = 0.5
    voice_samples: List[str] = []
    created_at: float = Field(default_factory=time.time)


class EmotionCreateRequest(BaseModel):
    id: str
    name: str = ""
    description: str = ""
    exaggeration: float = 0.5
    voice_samples: List[str] = []


class ServerStatus(BaseModel):
    status: str = "ok"
    model_loaded: bool = False
    device: str = ""
    emotions_ready: List[str] = []
    uptime_seconds: float = 0.0
    memory: Dict = {}
    version: str = "0.1.0"
