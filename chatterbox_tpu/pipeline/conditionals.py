"""Voice conditionals as an immutable pytree, serializable without torch.

Parity target: reference Conditionals dataclass (tts.py:64-103) --
T3 conditioning (speaker emb, prompt tokens, emotion) + S3Gen ref dict --
stored as ``conds.pt`` torch pickles in the reference. We serialize to
safetensors (checkpoint/safetensors_io.py) and provide a torch-compat loader
for shipped ``conds.pt`` files.

Unlike the reference server, which mutates a shared ``model.conds`` per
request (voice_manager.py:370-379 -- a benign-only-because-synchronous race,
SURVEY.md §5), conditionals here are plain values passed per call.
"""

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ..checkpoint.safetensors_io import load_safetensors, save_safetensors
from ..models.s3gen.s3gen import RefDict


class T3CondData(NamedTuple):
    speaker_emb: jnp.ndarray  # (B, 256)
    prompt_tokens: jnp.ndarray  # (B, 150) int32
    emotion_adv: jnp.ndarray  # (B,)


class Conditionals(NamedTuple):
    t3: T3CondData
    gen: RefDict

    def with_exaggeration(self, exaggeration: float) -> "Conditionals":
        t3 = self.t3._replace(
            emotion_adv=jnp.full_like(self.t3.emotion_adv, exaggeration)
        )
        return self._replace(t3=t3)

    def rows(self, i: int, j: int) -> "Conditionals":
        """Row-slice batched (B, ...) conditionals to [i, j); single-voice
        (1, ...) conds pass through unchanged (they broadcast per batch)."""
        import jax

        if self.t3.speaker_emb.shape[0] == 1:
            return self
        return jax.tree.map(lambda x: x[i:j], self)

    @classmethod
    def stack(cls, conds: list) -> "Conditionals":
        """Row-stack several single-voice conditionals into one batched
        Conditionals (leading dim = len(conds)): the batched pipeline
        broadcasts (1, ...) conds but passes (B, ...) through per row, so a
        request batcher can serve MIXED voices in one generate_batch call.
        All entries must share prompt/feat shapes (same cond-length caps)."""
        import jax

        if len(conds) == 1:
            return conds[0]
        shapes = {jax.tree.map(lambda x: x.shape[1:], c) for c in conds}
        assert len(shapes) == 1, f"mixed conditional shapes cannot stack: {shapes}"
        return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *conds)

    def save(self, fpath):
        tensors = {
            "t3.speaker_emb": np.asarray(self.t3.speaker_emb),
            "t3.prompt_tokens": np.asarray(self.t3.prompt_tokens),
            "t3.emotion_adv": np.asarray(self.t3.emotion_adv),
            "gen.prompt_token": np.asarray(self.gen.prompt_token),
            "gen.prompt_token_len": np.asarray(self.gen.prompt_token_len),
            "gen.prompt_feat": np.asarray(self.gen.prompt_feat),
            "gen.embedding": np.asarray(self.gen.embedding),
        }
        save_safetensors(tensors, fpath)

    @classmethod
    def load(cls, fpath):
        t = {k: jnp.asarray(v) for k, v in load_safetensors(fpath).items()}
        return cls(
            T3CondData(t["t3.speaker_emb"], t["t3.prompt_tokens"].astype(jnp.int32), t["t3.emotion_adv"]),
            RefDict(
                t["gen.prompt_token"].astype(jnp.int32),
                t["gen.prompt_token_len"].astype(jnp.int32),
                t["gen.prompt_feat"],
                t["gen.embedding"],
            ),
        )

    @classmethod
    def load_torch(cls, fpath):
        """Load a reference ``conds.pt`` (torch pickle, tts.py:91-103)."""
        import torch

        d = torch.load(fpath, map_location="cpu", weights_only=True)

        def n(x):
            return np.asarray(x.detach().cpu()) if torch.is_tensor(x) else np.asarray(x)

        t3d, gen = d["t3"], d["gen"]
        emotion = n(t3d["emotion_adv"]).reshape(-1)
        return cls(
            T3CondData(
                jnp.asarray(n(t3d["speaker_emb"])),
                jnp.asarray(n(t3d["cond_prompt_speech_tokens"]).astype(np.int32)),
                jnp.asarray(emotion),
            ),
            RefDict(
                jnp.asarray(n(gen["prompt_token"]).astype(np.int32)),
                jnp.asarray(n(gen["prompt_token_len"]).astype(np.int32)),
                jnp.asarray(n(gen["prompt_feat"])),
                jnp.asarray(n(gen["embedding"])),
            ),
        )
