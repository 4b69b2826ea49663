"""Streaming chunked TTS: audio chunks are emitted while T3 is still
decoding, cutting time-to-first-audio from full-utterance latency to
~one-chunk latency.

Capability parity note: the reference ships *dormant* streaming machinery
(flow cache at flow_matching.py:38-70, HiFT ``cache_source`` at
hifigan.py:463-472, chunk masks in utils/mask.py -- none driven by the live
pipeline). This module implements the capability TPU-natively:

  - **T3**: the decode while_loop is resumable (models/t3/t3.py GenCarry /
    t3_generate_resume); chunked decoding is TOKEN-IDENTICAL to one-shot
    decoding because the carry holds the RNG chain and KV cache.
  - **Flow**: each chunk re-synthesizes mels over a sliding token window
    ([window_ctx] context tokens + the new chunk), always conditioned on the
    voice prompt; CFM noise is indexed by ABSOLUTE mel position so a given
    frame sees the same noise regardless of chunking. With
    ``flow_ctx_tokens`` >= the full history this path is exact; the default
    window is a documented approximation (full-context attention sees a
    truncated left context).
  - **HiFT**: vocodes [hift_ctx_frames context + new frames]; the NSF sine
    source continues EXACTLY across chunks via the cumulative-f0 phase
    offset (hifigan.sine_source f0_cum_init), and only the new-frame region
    is emitted (context absorbs conv/iSTFT edge effects).

All device work runs through shape-bucketed cached jits, same as the batch
pipeline.
"""

import logging
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import SPEECH_VOCAB_SIZE
from ..core.sampling import SamplingConfig
from ..models.s3gen.flow import flow_inference
from ..models.s3gen.hifigan import hift_generate
from ..models.t3.t3 import t3_generate_resume, t3_generate_start

logger = logging.getLogger(__name__)

MEL_PER_TOKEN = 2
SAMPLES_PER_FRAME = 480


@dataclass
class StreamConfig:
    chunk_tokens: int = 25  # 1 s of audio per chunk at 25 tok/s
    flow_ctx_tokens: int = 75  # left-context tokens re-fed to the flow
    hift_ctx_frames: int = 24  # mel frames of vocoder context (0.48 s)
    max_new_tokens: int = 1000


def stream_generate(
    tts,
    text: str,
    conds=None,
    stream: StreamConfig = StreamConfig(),
    repetition_penalty: float = 1.2,
    min_p: float = 0.05,
    top_p: float = 1.0,
    exaggeration: float = 0.5,
    cfg_weight: float = 0.5,
    temperature: float = 0.8,
    seed: int = 0,
    min_new_tokens: int = 0,
) -> Iterator[np.ndarray]:
    """Yield watermarked float32 audio chunks (T,) for one utterance."""
    conds = conds or tts.conds
    assert conds is not None, "prepare_conditionals first or pass conds"
    if float(conds.t3.emotion_adv[0]) != exaggeration:
        conds = conds.with_exaggeration(exaggeration)

    from .tts import TEXT_BUCKETS, _bucket

    row = tts._cap_text_row(tts._encode_text(text))
    tmax = _bucket(len(row), TEXT_BUCKETS)
    text_tokens = np.zeros((1, tmax), np.int32)
    text_tokens[0, : len(row)] = row
    text_lens = jnp.asarray([len(row)], np.int32)

    sampling = SamplingConfig(
        temperature=temperature, top_p=top_p, min_p=min_p,
        repetition_penalty=repetition_penalty, cfg_weight=cfg_weight,
        min_new_tokens=min_new_tokens,
    )

    t3c = conds.t3
    kvq = tts.kv_quant
    key_s = ("stream_start", tmax, stream.max_new_tokens, sampling, kvq)
    start_fn = tts._jit_t3.get(key_s)
    if start_fn is None:
        cfg = tts.t3_cfg
        mx = stream.max_new_tokens

        @jax.jit
        def start_fn(p, text, lens, spk, prompt, emo, rng):
            return t3_generate_start(
                p, cfg, text, lens, spk, prompt, emo, rng, sampling, mx,
                cache_quant=kvq,
            )

        tts._jit_t3[key_s] = start_fn
    key_r = ("stream_step", tmax, stream.max_new_tokens, sampling, stream.chunk_tokens, kvq)
    step_fn = tts._jit_t3.get(key_r)
    if step_fn is None:
        cfg = tts.t3_cfg
        n = stream.chunk_tokens

        @jax.jit
        def step_fn(p, carry, lens):
            return t3_generate_resume(p, cfg, carry, lens, sampling, n)

        tts._jit_t3[key_r] = step_fn

    carry = start_fn(
        tts.t3_params, jnp.asarray(text_tokens), text_lens,
        t3c.speaker_emb, t3c.prompt_tokens, t3c.emotion_adv, jax.random.PRNGKey(seed),
    )

    synth = _ChunkSynthesizer(tts, conds, stream, seed)
    n_emitted_tokens = 0
    # NOTE: decode-ahead (dispatching the next t3 chunk before this chunk's
    # synthesis) was measured SLOWER on the axon backend (11.1 -> 19.9 s
    # wall for a 250-token stream) -- keep the serial loop.
    while True:
        carry, res = step_fn(tts.t3_params, carry, text_lens)
        steps = int(res.steps)
        length = int(res.lengths[0])
        finished = bool(np.asarray(carry.done)[0]) or steps >= stream.max_new_tokens
        tokens = np.asarray(res.tokens[0, :length])
        clean = tokens[tokens < SPEECH_VOCAB_SIZE]
        if len(clean) > n_emitted_tokens:
            wav = synth.extend(clean)
            n_emitted_tokens = len(clean)
            if wav is not None and len(wav):
                yield wav
        if finished:
            break


class _ChunkSynthesizer:
    """Sliding-window flow + phase-continuous chunked vocoder."""

    def __init__(self, tts, conds, stream: StreamConfig, seed: int):
        self.tts = tts
        self.conds = conds
        self.stream = stream
        self.seed = seed
        rng = np.random.default_rng(seed + 17)
        h = tts.s3gen_cfg.hift.nb_harmonics + 1
        self.phase_noise = jnp.asarray(
            rng.uniform(-np.pi, np.pi, (1, h)).astype(np.float32)
        )
        self.f0_hist = np.zeros((0,), np.float32)  # per emitted mel frame
        self.n_done_tokens = 0
        # host copy of the CFM noise buffer, fetched ONCE PER PROCESS (cached
        # on the tts object): reading it per chunk would pay a ~5 MB
        # device->host transfer on the ~13 MB/s tunnel for every second of
        # streamed audio, and per-stream would pay it per request
        if not hasattr(tts, "_cfm_noise_np"):
            tts._cfm_noise_np = np.asarray(tts._cfm_noise[0])
        self._noise_np = tts._cfm_noise_np

    def _flow_fn(self, win_tok: int):
        key = ("stream_flow", win_tok, int(self.conds.gen.prompt_token.shape[1]))
        fn = self.tts._jit_s3gen.get(key)
        if fn is None:
            cfg = self.tts.s3gen_cfg

            @jax.jit
            def fn(p, tokens, lens, ref, noise):
                mel, _ = flow_inference(
                    p["flow"], cfg.flow, tokens, lens,
                    ref.prompt_token, ref.prompt_token_len, ref.prompt_feat,
                    ref.embedding, noise,
                )
                return mel[:, ref.prompt_feat.shape[1] :]  # (1, 2*win, 80)

            self.tts._jit_s3gen[key] = fn
        return fn

    def _hift_fn(self, n_frames: int):
        key = ("stream_hift", n_frames, self.tts.hift_bf16)
        fn = self.tts._jit_s3gen.get(key)
        if fn is None:
            cfg = self.tts.s3gen_cfg
            hift_dtype = jnp.bfloat16 if self.tts.hift_bf16 else None

            @jax.jit
            def fn(p, mel, phase_noise, add_noise, f0_cum):
                return hift_generate(
                    p["hift"], cfg.hift, mel,
                    phase_noise=phase_noise, additive_noise=add_noise,
                    f0_cum_init=f0_cum, return_f0=True,
                    compute_dtype=hift_dtype,
                )

            self.tts._jit_s3gen[key] = fn
        return fn

    def extend(self, clean_tokens: np.ndarray) -> Optional[np.ndarray]:
        st = self.stream
        n_new = len(clean_tokens) - self.n_done_tokens
        if n_new <= 0:
            return None
        w0 = max(0, self.n_done_tokens - st.flow_ctx_tokens)
        window = clean_tokens[w0:]
        # bucket the window length to chunk multiples (jit cache)
        win_b = -(-len(window) // st.chunk_tokens) * st.chunk_tokens
        tok = np.zeros((1, win_b), np.int32)
        tok[0, : len(window)] = window

        p_len = int(self.conds.gen.prompt_token.shape[1])
        # CFM noise aligned to ABSOLUTE mel positions: [prompt | w0*2 + ...]
        total = MEL_PER_TOKEN * (p_len + win_b)
        noise = self._noise_np
        buf = np.zeros((1, total, 80), np.float32)
        buf[0, : MEL_PER_TOKEN * p_len] = noise[: MEL_PER_TOKEN * p_len]
        gen_lo = MEL_PER_TOKEN * (p_len + w0)
        buf[0, MEL_PER_TOKEN * p_len :] = noise[gen_lo : gen_lo + MEL_PER_TOKEN * win_b]

        mel = self._flow_fn(win_b)(
            self.tts.s3gen_params, jnp.asarray(tok),
            jnp.asarray([len(window)], np.int32), self.conds.gen, jnp.asarray(buf),
        )  # (1, 2*win_b, 80) mels for tokens [w0 : w0+win_b]

        # vocode [hift context + new frames] with exact sine-phase continuity
        new_lo_frames = MEL_PER_TOKEN * (self.n_done_tokens - w0)
        voc_lo = max(0, new_lo_frames - st.hift_ctx_frames)
        voc_hi = MEL_PER_TOKEN * len(window)
        # bucket the vocoder span to 50-frame multiples by EXTENDING voc_lo
        # (more leading context is always safe -- the emitted region is
        # trimmed below): token-drop randomness otherwise makes nearly every
        # chunk a fresh n_frames -> a fresh multi-second hift compile
        span = -(-(voc_hi - voc_lo) // 50) * 50
        voc_lo = max(0, voc_hi - span)
        voc_mel = np.asarray(mel[:, voc_lo:voc_hi])
        abs_voc_lo = w0 * MEL_PER_TOKEN + voc_lo
        f0_cum = jnp.asarray(
            [np.sum(self.f0_hist[:abs_voc_lo]) * SAMPLES_PER_FRAME / self.tts.s3gen_cfg.hift.sampling_rate],
            jnp.float32,
        )
        n_frames = voc_mel.shape[1]
        rng = np.random.default_rng((self.seed, abs_voc_lo))
        h = self.tts.s3gen_cfg.hift.nb_harmonics + 1
        add_noise = jnp.asarray(
            rng.standard_normal((1, h, n_frames * SAMPLES_PER_FRAME)).astype(np.float32)
        )
        wav, _, f0 = self._hift_fn(n_frames)(
            self.tts.s3gen_params, jnp.asarray(voc_mel), self.phase_noise, add_noise, f0_cum
        )
        f0 = np.asarray(f0[0])  # (n_frames,)

        # record f0 for frames we have not yet logged
        abs_frames = abs_voc_lo + n_frames
        if abs_frames > len(self.f0_hist):
            self.f0_hist = np.concatenate(
                [self.f0_hist[:abs_voc_lo], f0]
            )[:abs_frames]

        emit_lo = (new_lo_frames - voc_lo) * SAMPLES_PER_FRAME
        out = np.asarray(wav[0, emit_lo:]).astype(np.float32)
        if self.n_done_tokens == 0:
            # 20 ms trim-fade at utterance start (reference s3gen.py:232-236)
            n = self.tts.s3gen_cfg.trim_n
            fade = (np.cos(np.linspace(np.pi, 0.0, n)) + 1.0) / 2.0
            out[:n] = 0.0
            out[n : 2 * n] *= fade[: max(0, min(n, len(out) - n))]
        self.n_done_tokens = len(clean_tokens)
        out = self.tts.watermarker.apply_watermark(out)
        return out
