"""Typed-config (de)serialization for native checkpoints.

``save_native`` persists the pipeline's dataclass configs alongside the
params so ``from_native`` reproduces non-default architectures exactly --
in particular the S3TokenizerV2 config inferred from the torch checkpoint's
tensor shapes at conversion time (models/s3tokenizer.s3tok_config_from_sd).
"""

import dataclasses
import json


def _to_dict(cfg):
    if dataclasses.is_dataclass(cfg):
        return {f.name: _to_dict(getattr(cfg, f.name)) for f in dataclasses.fields(cfg)}
    if isinstance(cfg, (list, tuple)):
        return list(cfg)
    return cfg


def _from_dict(cls, data):
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in data:
            continue
        v = data[f.name]
        ftype = f.type if not isinstance(f.type, str) else None
        # nested dataclass fields carry dataclass defaults we can type from
        default = (
            f.default_factory() if f.default_factory is not dataclasses.MISSING
            else f.default
        )
        if dataclasses.is_dataclass(default):
            v = _from_dict(type(default), v)
        elif isinstance(default, tuple) and isinstance(v, list):
            v = _tuplify(v)
        kwargs[f.name] = v
    return cls(**kwargs)


def _tuplify(v):
    return tuple(_tuplify(x) if isinstance(x, list) else x for x in v)


def save_configs(path, t3_cfg, s3gen_cfg, ve_cfg):
    payload = {
        "t3": _to_dict(t3_cfg),
        "s3gen": _to_dict(s3gen_cfg),
        "ve": _to_dict(ve_cfg),
    }
    with open(path, "w") as f:
        json.dump(payload, f, indent=2)


def load_configs(path):
    from ..models.s3gen.s3gen import S3GenConfig
    from ..models.t3.t3 import T3Config
    from ..models.voice_encoder import VoiceEncoderConfig

    with open(path) as f:
        payload = json.load(f)
    return (
        _from_dict(T3Config, payload["t3"]),
        _from_dict(S3GenConfig, payload["s3gen"]),
        _from_dict(VoiceEncoderConfig, payload["ve"]),
    )
