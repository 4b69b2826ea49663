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

**Concurrent streams (r3)**: ``stream_generate_batch`` runs N streams in
LOCKSTEP -- one batched resumable T3 dispatch, one batched flow window and
one batched masked vocode per tick -- so N concurrent streams cost ~one
stream's dispatches instead of serializing N times on the device lock
(single-stream RTF 0.46 wastes half a chip; VERDICT r2 #6). Rows may have
different voices (stacked conds), progress at different token rates
(per-row sliding windows + per-row f0/phase state), and finish raggedly.
The vocoder batches rows of unequal span via right-padding + hift's
``n_valid`` masked vocoding (exact per row up to the documented final-frame
boundary effects). ``stream_generate`` is the 1-stream wrapper.

All device work runs through shape-bucketed cached jits, same as the batch
pipeline.
"""

import logging
from dataclasses import dataclass
from typing import Iterator, List, Optional

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


@dataclass(frozen=True)
class StreamConfig:
    chunk_tokens: int = 25  # 1 s of audio per chunk at 25 tok/s
    # smaller FIRST chunk: time-to-first-audio pays one decode+synth tick,
    # so a short opening chunk (0.4 s of audio) cuts TTFA ~40% (measured
    # r3: 0.58 -> ~0.4 s at 4 concurrent streams) at no steady-state cost
    first_chunk_tokens: int = 10
    # left-context tokens re-fed to the flow. Derived from the measured
    # full-size divergence curve (PERFORMANCE.md r4 / probe_flow_window.py):
    # wav SNR vs exact full-context is 0.1 dB at ctx=25 (collapse), 40.5 dB
    # at 50, 41.2 at 75, 46.7 at 150 -- 75 = the knee (50) + one chunk of
    # margin at half the window cost of 150.
    flow_ctx_tokens: int = 75
    hift_ctx_frames: int = 24  # mel frames of vocoder context (0.48 s)
    max_new_tokens: int = 1000
    # CFM Euler step count for the per-tick flow window (None = pipeline
    # default). The serving "turbo" tier sets 4: the flow is the tick's
    # dominant cost, so fewer steps directly raise stream capacity
    # (docs/PERFORMANCE.md step-count curve: mel SNR 41.5 dB at 4 steps).
    flow_steps: Optional[int] = None


def t3_chunked_start_fn(tts, b, tmax, max_new_tokens, sampling, kvq):
    """Cached jit: prefill -> resumable GenCarry (streaming AND the
    batcher's preemptible bulk path share these executables)."""
    key_s = ("stream_start", b, tmax, max_new_tokens, sampling, kvq)
    start_fn = tts._jit_t3.get(key_s)
    if start_fn is None:
        cfg = tts.t3_cfg

        @jax.jit
        def start_fn(p, text, lens, spk, prompt, emo, rng):
            bb = text.shape[0]
            spk, prompt, emo = (
                jnp.broadcast_to(x, (bb,) + x.shape[1:]) if x.shape[0] == 1 else x
                for x in (spk, prompt, emo)
            )
            return t3_generate_start(
                p, cfg, text, lens, spk, prompt, emo, rng, sampling,
                max_new_tokens, cache_quant=kvq,
            )

        tts._jit_t3[key_s] = start_fn
    return start_fn


def t3_chunked_step_fn(tts, b, tmax, max_new_tokens, sampling, n, kvq):
    """Cached jit: advance a GenCarry by up to ``n`` tokens."""
    key_r = ("stream_step", b, tmax, max_new_tokens, sampling, n, kvq)
    fn = tts._jit_t3.get(key_r)
    if fn is None:
        cfg = tts.t3_cfg

        @jax.jit
        def fn(p, carry, lens):
            return t3_generate_resume(p, cfg, carry, lens, sampling, n)

        tts._jit_t3[key_r] = fn
    return fn


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
    for chunks in stream_generate_batch(
        tts, [text], conds=conds, stream=stream,
        repetition_penalty=repetition_penalty, min_p=min_p, top_p=top_p,
        exaggeration=exaggeration, cfg_weight=cfg_weight,
        temperature=temperature, seed=seed, min_new_tokens=min_new_tokens,
    ):
        if chunks[0] is not None and len(chunks[0]):
            yield chunks[0]


def stream_generate_batch(
    tts,
    texts: List[str],
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
) -> Iterator[List[Optional[np.ndarray]]]:
    """Run ``len(texts)`` streams in lockstep; each tick yields a list with
    one entry per stream: a float32 audio chunk, or None if that stream
    produced no new audio this tick (already finished, or no valid tokens).

    ``conds`` may hold 1 row (shared voice) or len(texts) stacked rows
    (``Conditionals.stack``). Per-stream noise (vocoder phase/additive,
    chunk rng) derives from ``seed`` + the row index, so a group is NOT
    sample-identical to N independent streams with the same seed -- pass
    one-text lists for that.
    """
    b = len(texts)
    conds = conds or tts.conds
    assert conds is not None, "prepare_conditionals first or pass conds"
    if bool(np.any(np.asarray(conds.t3.emotion_adv) != exaggeration)):
        conds = conds.with_exaggeration(exaggeration)
    n_cond_rows = int(conds.t3.speaker_emb.shape[0])
    assert n_cond_rows in (1, b), (n_cond_rows, b)

    from .tts import TEXT_BUCKETS, _bucket

    rows = [tts._cap_text_row(tts._encode_text(t)) for t in texts]
    tmax = _bucket(max(len(r) for r in rows), TEXT_BUCKETS)
    text_tokens = np.zeros((b, tmax), np.int32)
    for i, r in enumerate(rows):
        text_tokens[i, : len(r)] = r
    text_lens = jnp.asarray([len(r) for r in rows], np.int32)

    sampling = SamplingConfig(
        temperature=temperature, top_p=top_p, min_p=min_p,
        repetition_penalty=repetition_penalty, cfg_weight=cfg_weight,
        min_new_tokens=min_new_tokens,
    )

    t3c = conds.t3
    kvq = tts._kv_quant_for(stream.max_new_tokens)
    start_fn = t3_chunked_start_fn(tts, b, tmax, stream.max_new_tokens, sampling, kvq)

    def make_step(n):
        return t3_chunked_step_fn(tts, b, tmax, stream.max_new_tokens, sampling, n, kvq)

    step_fn = make_step(stream.chunk_tokens)
    first_fn = (
        make_step(stream.first_chunk_tokens)
        if 0 < stream.first_chunk_tokens < stream.chunk_tokens
        else step_fn
    )

    carry = start_fn(
        tts.t3_params, jnp.asarray(text_tokens), text_lens,
        t3c.speaker_emb, t3c.prompt_tokens, t3c.emotion_adv, jax.random.PRNGKey(seed),
    )

    synth = _ChunkSynthesizer(tts, conds, stream, seed, b)
    n_emitted = [0] * b
    # NOTE: decode-ahead (dispatching the next t3 chunk before this chunk's
    # synthesis) was measured SLOWER on the axon backend (11.1 -> 19.9 s
    # wall for a 250-token stream) -- keep the serial loop.
    first = True
    while True:
        carry, res = (first_fn if first else step_fn)(tts.t3_params, carry, text_lens)
        first = False
        steps = int(res.steps)
        lengths = np.asarray(res.lengths)
        done = np.asarray(carry.done)
        tokens = np.asarray(res.tokens)
        finished = bool(done.all()) or steps >= stream.max_new_tokens
        cleans = []
        for i in range(b):
            row = tokens[i, : lengths[i]]
            cleans.append(row[row < SPEECH_VOCAB_SIZE])
        if any(len(c) > n_emitted[i] for i, c in enumerate(cleans)):
            wavs = synth.extend(cleans)
            n_emitted = [len(c) for c in cleans]
        else:
            wavs = [None] * b
        yield wavs
        if finished:
            break


class _ChunkSynthesizer:
    """Sliding-window flow + phase-continuous chunked vocoder, batched over
    N lockstep streams (per-row windows, f0 history, and noise)."""

    def __init__(self, tts, conds, stream: StreamConfig, seed: int, b: int = 1):
        self.tts = tts
        self.conds = conds
        self.stream = stream
        self.seed = seed
        self.b = b
        h = tts.s3gen_cfg.hift.nb_harmonics + 1
        # per-row phase: row i draws from default_rng(seed + 17 + i) (row 0
        # matches the historical single-stream draw at seed+17)
        self.phase_noise = jnp.asarray(
            np.stack(
                [
                    np.random.default_rng(seed + 17 + i).uniform(-np.pi, np.pi, h)
                    for i in range(b)
                ]
            ).astype(np.float32)
        )
        self.f0_hist = [np.zeros((0,), np.float32) for _ in range(b)]
        self.n_done = [0] * b
        # host copy of the CFM noise buffer, fetched ONCE PER PROCESS (cached
        # on the tts object): reading it per chunk would pay a ~5 MB
        # device->host transfer on the ~13 MB/s tunnel for every second of
        # streamed audio, and per-stream would pay it per request
        if not hasattr(tts, "_cfm_noise_np"):
            tts._cfm_noise_np = np.asarray(tts._cfm_noise[0])
        self._noise_np = tts._cfm_noise_np

    def _synth_fn(self, win_tok: int, n_frames: int):
        """ONE fused per-tick dispatch: CFM-noise window gather -> flow ->
        per-row vocoder-span slice -> additive-noise draw -> masked chunked
        vocode -> int16 PCM. Everything stays on device: the unfused r3
        hardware measurement showed every tick paying a ~0.6 MB CFM-noise
        upload, a flow-mel round-trip, a ~1 MB additive-noise upload and
        4-5 tunnel round-trips (~28 ms each) -- the reason 4 concurrent
        lockstep streams measured per-stream RTF ~1.0 instead of ~0.4."""
        n_steps = self.tts._effective_flow_steps(self.stream.flow_steps)
        key = ("stream_synth", self.b, win_tok, n_frames,
               int(self.conds.gen.prompt_token.shape[1]), self.tts.hift_bf16,
               n_steps)
        fn = self.tts._jit_s3gen.get(key)
        if fn is None:
            from dataclasses import replace

            cfg = self.tts.s3gen_cfg
            if n_steps != cfg.flow.n_timesteps:
                cfg = replace(cfg, flow=replace(cfg.flow, n_timesteps=n_steps))
            hift_dtype = jnp.bfloat16 if self.tts.hift_bf16 else None
            h = cfg.hift.nb_harmonics + 1

            @jax.jit
            def fn(p, tokens, lens, ref, noise_full, w0s, voc_lo, n_valid,
                   phase_noise, f0_cum, rng):
                from jax import lax

                bb = tokens.shape[0]
                ref = type(ref)(
                    *[
                        jnp.broadcast_to(x, (bb,) + x.shape[1:]) if x.shape[0] == 1 else x
                        for x in ref
                    ]
                )
                p_len = ref.prompt_token.shape[1]
                # CFM noise aligned to ABSOLUTE mel positions, gathered on
                # device: row = [noise[:2*p_len] | noise[gen_lo : +2*win]]
                head = noise_full[0, : MEL_PER_TOKEN * p_len]
                gen = jax.vmap(
                    lambda w0: lax.dynamic_slice(
                        noise_full[0],
                        (MEL_PER_TOKEN * (p_len + w0), 0),
                        (MEL_PER_TOKEN * win_tok, 80),
                    )
                )(w0s)
                noise = jnp.concatenate(
                    [jnp.broadcast_to(head, (bb,) + head.shape), gen], axis=1
                )
                mel, _ = flow_inference(
                    p["flow"], cfg.flow, tokens, lens,
                    ref.prompt_token, ref.prompt_token_len, ref.prompt_feat,
                    ref.embedding, noise,
                )
                mel = mel[:, MEL_PER_TOKEN * p_len :]  # (B, 2*win, 80)
                # per-row vocoder span [voc_lo, voc_lo + n_valid) left-packed
                # (zero-pad so the slice never clamps; pad region is masked)
                mel = jnp.pad(mel, ((0, 0), (0, n_frames), (0, 0)))
                voc_mel = jax.vmap(
                    lambda m, o: lax.dynamic_slice(m, (o, 0), (n_frames, 80))
                )(mel, voc_lo)
                # per-row additive noise drawn on device (threefry compiles
                # once per bucket, persistent-cached) -- replaces the ~1 MB
                # host upload per tick; deterministic per (rng key)
                add_noise = jax.random.normal(
                    rng, (bb, h, n_frames * SAMPLES_PER_FRAME)
                )
                wav, _, f0 = hift_generate(
                    p["hift"], cfg.hift, voc_mel,
                    phase_noise=phase_noise, additive_noise=add_noise,
                    f0_cum_init=f0_cum, return_f0=True,
                    compute_dtype=hift_dtype, n_valid=n_valid,
                )
                # int16 PCM readback halves the ~13 MB/s tunnel transfer
                pcm = jnp.round(jnp.clip(wav, -1.0, 1.0) * 32767.0).astype(jnp.int16)
                return pcm, f0

            self.tts._jit_s3gen[key] = fn
        return fn

    def extend(self, cleans: List[np.ndarray]) -> List[Optional[np.ndarray]]:
        """One lockstep synthesis tick: ``cleans[i]`` is stream i's full
        clean-token history. Returns per-stream new audio (None if none)."""
        st = self.stream
        b = self.b
        active = [i for i in range(b) if len(cleans[i]) > self.n_done[i]]
        if not active:
            return [None] * b

        # --- per-row sliding windows (host: indices only) ---
        w0s, windows = [0] * b, [np.zeros((0,), np.int64)] * b
        for i in range(b):
            w0s[i] = max(0, self.n_done[i] - st.flow_ctx_tokens)
            windows[i] = cleans[i][w0s[i] :]
        win_b = -(-max(len(windows[i]) for i in active) // st.chunk_tokens) * st.chunk_tokens
        tok = np.zeros((b, win_b), np.int32)
        lens = np.zeros((b,), np.int32)
        for i in active:
            tok[i, : len(windows[i])] = windows[i]
            lens[i] = len(windows[i])

        new_lo = [MEL_PER_TOKEN * (self.n_done[i] - w0s[i]) for i in range(b)]
        voc_hi = [MEL_PER_TOKEN * len(windows[i]) for i in range(b)]
        raw_span = [
            voc_hi[i] - max(0, new_lo[i] - st.hift_ctx_frames) for i in active
        ]
        # one shared 50-frame-bucketed span: extending a row's leading
        # context is always safe (emit region trimmed below); short rows
        # (stream start) right-pad and vocode masked via n_valid
        n_frames = -(-max(raw_span) // 50) * 50
        voc_lo = [max(0, voc_hi[i] - n_frames) for i in range(b)]
        n_valid = np.zeros((b,), np.int32)
        f0_cum = np.zeros((b,), np.float32)
        abs_voc_lo = [0] * b
        for i in active:
            n_valid[i] = voc_hi[i] - voc_lo[i]
            abs_voc_lo[i] = w0s[i] * MEL_PER_TOKEN + voc_lo[i]
            f0_cum[i] = (
                np.sum(self.f0_hist[i][: abs_voc_lo[i]])
                * SAMPLES_PER_FRAME
                / self.tts.s3gen_cfg.hift.sampling_rate
            )
        # deterministic per (stream seed, tick progress); drawn ON device
        rng = jax.random.fold_in(
            jax.random.PRNGKey(self.seed + 101), max(abs_voc_lo)
        )
        pcm, f0 = self._synth_fn(win_b, n_frames)(
            self.tts.s3gen_params, jnp.asarray(tok), jnp.asarray(lens),
            self.conds.gen, self.tts._cfm_noise,
            jnp.asarray(np.array(w0s, np.int32)),
            jnp.asarray(np.array(voc_lo, np.int32)),
            jnp.asarray(n_valid), self.phase_noise, jnp.asarray(f0_cum), rng,
        )
        wav = np.asarray(pcm).astype(np.float32) / 32767.0
        f0 = np.asarray(f0)

        outs: List[Optional[np.ndarray]] = [None] * b
        for i in active:
            # record f0 for frames not yet logged
            abs_frames = abs_voc_lo[i] + int(n_valid[i])
            if abs_frames > len(self.f0_hist[i]):
                self.f0_hist[i] = np.concatenate(
                    [self.f0_hist[i][: abs_voc_lo[i]], f0[i, : n_valid[i]]]
                )[:abs_frames]
            emit_lo = (new_lo[i] - voc_lo[i]) * SAMPLES_PER_FRAME
            out = wav[i, emit_lo : int(n_valid[i]) * SAMPLES_PER_FRAME].astype(np.float32)
            if self.n_done[i] == 0:
                # 20 ms trim-fade at utterance start (reference s3gen.py:232-236)
                n = self.tts.s3gen_cfg.trim_n
                fade = (np.cos(np.linspace(np.pi, 0.0, n)) + 1.0) / 2.0
                out[:n] = 0.0
                out[n : 2 * n] *= fade[: max(0, min(n, len(out) - n))]
            self.n_done[i] = len(cleans[i])
            outs[i] = self.tts.watermarker.apply_watermark(out)
        return outs
