"""English text BPE tokenizer (vocab 704) reading the reference
``tokenizer.json``.

Parity target: reference models/tokenizers/tokenizer.py:16-50 (EnTokenizer):
space is mapped to the ``[SPACE]`` special token before encoding; decode
reverses it and strips [STOP]/[UNK].

Backends, in order of preference:
  1. the C++ BPE encoder in native/ (loaded via ctypes) -- off the hot path
     but keeps parity with the reference's Rust `tokenizers` dependency class
  2. the HF `tokenizers` package when installed
  3. a pure-Python greedy-merge BPE (exact same algorithm; vocab 704 makes
     this plenty fast)
"""

import json
from typing import List

SOT = "[START]"
EOT = "[STOP]"
UNK = "[UNK]"
SPACE = "[SPACE]"


class PurePythonBPE:
    """Greedy lowest-rank-merge BPE over a HF tokenizer.json model."""

    def __init__(self, spec: dict):
        model = spec["model"]
        self.vocab = dict(model["vocab"])
        self.id_to_token = {v: k for k, v in self.vocab.items()}
        merges = model.get("merges", [])
        self.merge_ranks = {}
        for rank, m in enumerate(merges):
            pair = tuple(m.split(" ")) if isinstance(m, str) else tuple(m)
            self.merge_ranks[pair] = rank
        self.specials = {t["content"] for t in spec.get("added_tokens", [])}
        self.unk_id = self.vocab.get(UNK)

    def _bpe_word(self, word: str) -> List[str]:
        pieces = list(word)
        while len(pieces) > 1:
            best, best_rank = None, None
            for i in range(len(pieces) - 1):
                r = self.merge_ranks.get((pieces[i], pieces[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = i, r
            if best is None:
                break
            pieces = pieces[:best] + [pieces[best] + pieces[best + 1]] + pieces[best + 2 :]
        return pieces

    def encode(self, text: str) -> List[int]:
        # split out special tokens first (longest-match scan)
        out = []
        i = 0
        segment = []

        def flush():
            if segment:
                for piece in self._bpe_word("".join(segment)):
                    out.append(self.vocab.get(piece, self.unk_id))
                segment.clear()

        while i < len(text):
            matched = None
            for sp in self.specials:
                if text.startswith(sp, i):
                    matched = sp
                    break
            if matched:
                flush()
                out.append(self.vocab[matched])
                i += len(matched)
            else:
                segment.append(text[i])
                i += 1
        flush()
        return [t for t in out if t is not None]

    def decode(self, ids) -> str:
        return "".join(self.id_to_token.get(int(i), "") for i in ids)


class EnTokenizer:
    """Drop-in equivalent of the reference EnTokenizer."""

    def __init__(self, vocab_file_path: str, backend: str = "auto"):
        with open(vocab_file_path) as f:
            self.spec = json.load(f)
        self._hf = None
        self._native = None
        if backend in ("auto", "native"):
            try:
                from ..native import NativeBPE

                self._native = NativeBPE(self.spec)
            except Exception:
                if backend == "native":
                    raise
        if backend in ("auto", "hf") and self._native is None:
            try:
                from tokenizers import Tokenizer

                self._hf = Tokenizer.from_file(vocab_file_path)
            except Exception:
                if backend == "hf":
                    raise
        self._py = PurePythonBPE(self.spec)
        voc = self._py.vocab
        assert SOT in voc and EOT in voc, "tokenizer.json missing [START]/[STOP]"
        self.sot_id = voc[SOT]
        self.eot_id = voc[EOT]

    def encode(self, txt: str) -> List[int]:
        txt = txt.replace(" ", SPACE)
        if self._native is not None:
            return self._native.encode(txt)
        if self._hf is not None:
            return self._hf.encode(txt).ids
        return self._py.encode(txt)

    def text_to_tokens(self, text: str):
        import numpy as np

        return np.asarray(self.encode(text), dtype=np.int32)[None]

    def decode(self, seq) -> str:
        if hasattr(seq, "tolist"):
            seq = [int(x) for x in seq.reshape(-1)] if hasattr(seq, "reshape") else seq.tolist()
        if self._hf is not None:
            txt = self._hf.decode(list(seq), skip_special_tokens=False)
            txt = txt.replace(" ", "")
        else:
            txt = self._py.decode(seq)
        txt = txt.replace(SPACE, " ")
        txt = txt.replace(EOT, "").replace(UNK, "")
        return txt
