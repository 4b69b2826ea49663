"""Native C++ library tests: builds with g++, parity vs pure-Python paths."""

import json

import numpy as np
import pytest

from chatterbox_tpu.native import native_available, wav_decode, wav_encode_pcm16


pytestmark = pytest.mark.skipif(not native_available(), reason="g++ build unavailable")


def test_wav_roundtrip_native():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(4321) * 0.4).astype(np.float32)
    data = wav_encode_pcm16(x, 24000)
    assert data[:4] == b"RIFF"
    y, sr = wav_decode(data)
    assert sr == 24000 and len(y) == len(x)
    np.testing.assert_allclose(y, np.clip(x, -1, 1), atol=1e-3)


def test_wav_native_matches_stdlib(tmp_path):
    from chatterbox_tpu.pipeline.audio import load_wav, save_wav

    rng = np.random.default_rng(1)
    x = (rng.standard_normal(8000) * 0.3).astype(np.float32)
    p = tmp_path / "a.wav"
    save_wav(p, x, 16000)
    got = load_wav(p)  # native path
    np.testing.assert_allclose(got, np.clip(x, -1, 1), atol=1e-3)


def test_native_bpe_matches_python(tmp_path):
    from chatterbox_tpu.models.tokenizer import EnTokenizer

    spec = {
        "version": "1.0",
        "model": {
            "type": "BPE",
            "vocab": {"[UNK]": 0, "[START]": 1, "[STOP]": 2, "[SPACE]": 3,
                      "h": 4, "e": 5, "l": 6, "o": 7, "he": 8, "ll": 9, "hell": 10, "hello": 11},
            "merges": ["h e", "l l", "he ll", "hell o"],
        },
        "added_tokens": [
            {"id": i, "content": c, "special": True}
            for i, c in enumerate(["[UNK]", "[START]", "[STOP]", "[SPACE]"])
        ],
    }
    p = tmp_path / "tok.json"
    p.write_text(json.dumps(spec))
    nat = EnTokenizer(str(p), backend="native")
    py = EnTokenizer(str(p), backend="python")
    for text in ["hello hell he", "ohelloo", "hhh eee", "x hello"]:
        assert nat.encode(text) == py.encode(text), text
