"""T3: the 520M-parameter Llama token-to-token speech decoder, with fused
two-stream classifier-free guidance and a fixed-shape KV-cache decode loop.

Capability parity: reference t3/t3.py (T3.forward/loss/inference) and
t3/inference/t3_hf_backend.py, re-designed TPU-first:
  - the per-token python loop (t3.py:319-367) becomes a ``lax.while_loop``
    with a preallocated (2, L, 2B, H, S, D) KV cache; per-batch-row ragged
    EOS is handled with done-masks (the reference only supports B=1)
  - CFG's two streams live as a doubled batch axis [cond; uncond] through a
    single model invocation; the combine + sampling chain runs on-device
    inside the loop (core/sampling.py)
  - text/speech learned position embeddings and the conditioning prefix are
    fused into one prefill embedding buffer

Reference quirk preserved for numerics parity: with cfg_weight > 0 the
prefill sequence ends with TWO BOS embeddings, both at learned speech
position 0 (t3.py:240-245 builds [cond; text; BOS], then 284-295 appends
another BOS) -- this is the production path of `ChatterboxTTS.generate`.
"""

from dataclasses import dataclass, field
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ...core.layers import embedding, linear
from ...core.sampling import (
    SamplingConfig,
    cfg_combine,
    process_logits,
    sample_from_logits,
)
from .cond_enc import cond_embeds, convert_cond_enc, init_cond_enc
from .llama import (
    LLAMA_520M,
    LlamaConfig,
    convert_llama,
    init_llama,
    llama_decode_step,
    llama_decode_step_unrolled,
    llama_prefill,
)


@dataclass(frozen=True)
class T3Config:
    """Mirrors reference t3/modules/t3_config.py."""

    start_text_token: int = 255
    stop_text_token: int = 0
    text_tokens_dict_size: int = 704
    max_text_tokens: int = 2048
    start_speech_token: int = 6561
    stop_speech_token: int = 6562
    speech_tokens_dict_size: int = 8194
    max_speech_tokens: int = 4096
    speech_cond_prompt_len: int = 150
    speaker_embed_size: int = 256
    alignment_layer: int = 9  # attention layer read by the alignment analyzer
    llama: LlamaConfig = field(default_factory=lambda: LLAMA_520M)

    @property
    def n_cond(self) -> int:
        return 34  # 1 speaker + 32 perceiver + 1 emotion

    @property
    def dim(self) -> int:
        return self.llama.hidden_size


# ---------------------------------------------------------------------------
# params
# ---------------------------------------------------------------------------


def init_t3(key, cfg: T3Config = T3Config(), dtype=jnp.float32):
    ks = jax.random.split(key, 8)
    d = cfg.dim

    def emb(k, n):
        return {"w": (jax.random.normal(k, (n, d)) * 0.02).astype(dtype)}

    from ...runtime.precision import cast_floating

    return {
        "llama": init_llama(ks[0], cfg.llama, dtype),
        "cond_enc": cast_floating(init_cond_enc(ks[1], d, cfg.speaker_embed_size), dtype),
        "text_emb": emb(ks[2], cfg.text_tokens_dict_size),
        "speech_emb": emb(ks[3], cfg.speech_tokens_dict_size),
        "text_pos_emb": emb(ks[4], cfg.max_text_tokens + 2),
        "speech_pos_emb": emb(ks[5], cfg.max_speech_tokens + 4),
        "text_head": {"w": (jax.random.normal(ks[6], (d, cfg.text_tokens_dict_size)) * 0.02).astype(dtype)},
        "speech_head": {"w": (jax.random.normal(ks[7], (d, cfg.speech_tokens_dict_size)) * 0.02).astype(dtype)},
    }


def convert_t3(sd, cfg: T3Config = T3Config()):
    """Map the reference t3_cfg.safetensors state dict into our pytree."""
    from ...checkpoint import torch_convert as tc

    return {
        "llama": convert_llama(sd, cfg.llama, prefix="tfmr."),
        "cond_enc": convert_cond_enc(sd, "cond_enc."),
        "text_emb": tc.embedding(sd, "text_emb"),
        "speech_emb": tc.embedding(sd, "speech_emb"),
        "text_pos_emb": tc.embedding(sd, "text_pos_emb.emb"),
        "speech_pos_emb": tc.embedding(sd, "speech_pos_emb.emb"),
        "text_head": tc.linear(sd, "text_head"),
        "speech_head": tc.linear(sd, "speech_head"),
    }


# ---------------------------------------------------------------------------
# conditioning + embedding preparation
# ---------------------------------------------------------------------------


def t3_cond_prefix(p, cfg: T3Config, speaker_emb, prompt_tokens, emotion_adv):
    """(B,256), (B,150) int, (B,) -> (B, 34, C). Mirrors t3.py:71-78: the
    prompt tokens are embedded with speech_emb + speech_pos_emb before the
    perceiver."""
    prompt_emb = embedding(p["speech_emb"], prompt_tokens) + p["speech_pos_emb"]["w"][
        None, : prompt_tokens.shape[1]
    ]
    return cond_embeds(p["cond_enc"], speaker_emb, prompt_emb, emotion_adv)


class PrefillBatch(NamedTuple):
    """Inputs to the prefill forward, one row per CFG stream (2B rows)."""

    embeds: jnp.ndarray  # (2B, S0, C)
    positions: jnp.ndarray  # (2B, S0) rope positions (pads compacted)
    valid: jnp.ndarray  # (2B, S0) bool
    last_idx: jnp.ndarray  # (2B,) index of the final (2nd BOS) position


def t3_build_prefill(p, cfg: T3Config, cond, text_tokens, text_lens, cfg_weight: float):
    """Assemble [cond; text(+pos); BOS; BOS] embeddings for the doubled
    CFG batch. text_tokens (B, T) right-padded with stop_text_token.

    Row layout (per CFG stream): positions are compacted so right-padding
    never shifts rope positions; pad slots are masked out of attention.
    """
    b, tmax = text_tokens.shape
    c = cfg.dim
    text_emb_c = embedding(p["text_emb"], text_tokens)
    text_pos = p["text_pos_emb"]["w"][None, :tmax]
    # uncond stream: zeroed text content, positions kept (t3.py:91-96)
    text_cond = text_emb_c + text_pos
    text_uncond = jnp.zeros_like(text_emb_c) + text_pos
    bos = (
        embedding(p["speech_emb"], jnp.full((b, 1), cfg.start_speech_token))
        + p["speech_pos_emb"]["w"][None, :1]
    )

    n_bos = 2 if cfg_weight > 0 else 1
    bos_seq = jnp.tile(bos, (1, n_bos, 1))

    def assemble(text_part):
        return jnp.concatenate([cond, text_part, bos_seq], axis=1)

    emb_cond = assemble(text_cond)
    emb_uncond = assemble(text_uncond)
    if cfg_weight > 0:
        embeds = jnp.concatenate([emb_cond, emb_uncond], axis=0)
    else:
        embeds = emb_cond

    s0 = cfg.n_cond + tmax + n_bos
    tvalid = jnp.arange(tmax)[None] < text_lens[:, None]  # (B, Tmax)
    valid_row = jnp.concatenate(
        [jnp.ones((b, cfg.n_cond), bool), tvalid, jnp.ones((b, n_bos), bool)], axis=1
    )
    positions = jnp.cumsum(valid_row.astype(jnp.int32), axis=1) - 1
    positions = jnp.where(valid_row, positions, 0)
    last_idx = jnp.full((b,), s0 - 1, jnp.int32)
    if cfg_weight > 0:
        valid_row = jnp.concatenate([valid_row, valid_row], axis=0)
        positions = jnp.concatenate([positions, positions], axis=0)
        last_idx = jnp.concatenate([last_idx, last_idx], axis=0)
    return PrefillBatch(embeds, positions, valid_row, last_idx)


# ---------------------------------------------------------------------------
# generation
# ---------------------------------------------------------------------------


class GenResult(NamedTuple):
    tokens: jnp.ndarray  # (B, max_new) int32, EOS-padded
    lengths: jnp.ndarray  # (B,) number of valid tokens (excluding EOS)
    steps: jnp.ndarray  # scalar: decode iterations executed


def _ds_cache(use_pallas: bool, decode_impl: str, alignment: bool) -> bool:
    """Whether the KV cache uses the pad-free (L,2,B,H,D,S) layout: only the
    Pallas flash-decode path consumes it (the XLA fallbacks read (..., S, D)).
    t3_generate/t3_generate_start/t3_generate_resume must agree on these
    flags -- the carry's cache layout is fixed at prefill. (r5: alignment
    rides the Pallas path too -- the kernel emits its softmax stats and the
    text-window probs are reconstructed in XLA; llama_decode_step.)"""
    return use_pallas and decode_impl != "unroll"


class GenCarry(NamedTuple):
    """Decode-loop state; also the resumable handle for chunked/streaming
    generation (t3_generate_resume). All shapes static, device-resident."""

    cache: jnp.ndarray  # (L, 2, 2B, Hkv, S, D) -- or (..., D, S), see _ds_cache
    valid: jnp.ndarray  # (2B, S)
    tokens: jnp.ndarray  # (B, max_new)
    seen: jnp.ndarray  # (B, vocab)
    done: jnp.ndarray  # (B,)
    last_logits: jnp.ndarray  # (2B, vocab)
    last_attn: jnp.ndarray  # (2B, S_text) alignment-layer attention
    align: tuple  # AlignState
    key: jax.Array
    i: jnp.ndarray


def _make_decode_body(
    p, cfg: T3Config, text_lens, tmax: int, s0: int, sampling: SamplingConfig,
    alignment: bool, decode_impl: str, scan_unroll: int, use_pallas: bool,
):
    """Build the per-token while_loop body closure shared by t3_generate and
    t3_generate_resume. Everything it closes over is derivable from
    (cfg, sampling, text_lens, tmax) -- nothing request-mutable."""
    rows_b = text_lens.shape[0]
    cfg_on = sampling.cfg_weight > 0
    n_bos = 2 if cfg_on else 1
    assert s0 == cfg.n_cond + tmax + n_bos, (s0, cfg.n_cond, tmax, n_bos)
    base_pos = cfg.n_cond + text_lens + n_bos  # compacted rope position after prefill
    if cfg_on:
        base_pos = jnp.concatenate([base_pos, base_pos])
    row_prefix = cfg.n_cond + text_lens
    if cfg_on:
        row_prefix = jnp.concatenate([row_prefix, row_prefix])
    gap_end = jnp.int32(cfg.n_cond + tmax)
    text_slice = (cfg.n_cond, cfg.n_cond + tmax)

    def sample_step(logits_2b, seen, key, done, align_state, attn_row, step_i):
        logits_2b = logits_2b.astype(jnp.float32)  # sampling chain in fp32
        if cfg_on:
            lc, lu = logits_2b[:rows_b], logits_2b[rows_b:]
            logits = cfg_combine(lc, lu, sampling.cfg_weight)
        else:
            logits = logits_2b
        if sampling.min_new_tokens > 0:
            # HF min_new_tokens semantics: EOS unreachable before the minimum.
            # Applied BEFORE the alignment watchdog so a hallucination-forced
            # EOS survives: flooring a forced EOS after the fact would leave
            # every logit at the watchdog's -2^15 suppression value and the
            # row would sample uniformly from the whole vocab.
            eos_col = jnp.arange(logits.shape[-1])[None] == cfg.stop_speech_token
            logits = jnp.where(
                (step_i < sampling.min_new_tokens) & eos_col, jnp.finfo(jnp.float32).min, logits
            )
        if alignment:
            from .alignment import alignment_step

            align_state, logits = alignment_step(
                align_state,
                attn_row[:rows_b],
                text_lens,
                step_i,
                logits,
                cfg.stop_speech_token,
            )
        logits = process_logits(logits, seen, sampling)
        if sampling.greedy:
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        else:
            u = jax.random.uniform(key, (rows_b,))
            tok = sample_from_logits(logits, u)
        tok = jnp.where(done, cfg.stop_speech_token, tok)
        return tok, align_state

    def body_fn(cy: GenCarry) -> GenCarry:
        key, sub = jax.random.split(cy.key)
        tok, align = sample_step(
            cy.last_logits, cy.seen, sub, cy.done, cy.align, cy.last_attn, cy.i
        )  # (B,)
        newly_done = tok == cfg.stop_speech_token
        tokens = cy.tokens.at[:, cy.i].set(tok)
        seen = cy.seen.at[jnp.arange(rows_b), tok].set(True)
        done = cy.done | newly_done

        # next-token embedding: speech emb + learned speech pos (i+1)
        emb = embedding(p["speech_emb"], tok)[:, None] + p["speech_pos_emb"]["w"][cy.i + 1][
            None, None
        ]
        if cfg_on:
            emb = jnp.concatenate([emb, emb], axis=0)  # same token both streams

        write_pos = s0 + cy.i
        rope_pos = (base_pos + cy.i)[:, None]  # sequential rope continuation
        valid = cy.valid.at[:, write_pos].set(True)
        if decode_impl == "unroll":
            h, cache, attn = llama_decode_step_unrolled(
                p["llama"],
                cfg.llama,
                emb,
                cy.cache,
                write_pos,
                rope_pos,
                valid,
                collect_attn_layer=cfg.alignment_layer if alignment else None,
            )
        else:
            h, cache, attn = llama_decode_step(
                p["llama"],
                cfg.llama,
                emb,
                cy.cache,
                write_pos,
                rope_pos,
                valid,
                collect_attn_layer=cfg.alignment_layer if alignment else None,
                unroll=scan_unroll,
                pallas_valid=(row_prefix, gap_end) if use_pallas else None,
                ds_layout=_ds_cache(use_pallas, decode_impl, alignment),
                attn_slice=text_slice if alignment else None,
            )
        logits = linear(p["speech_head"], h[:, 0])
        attn_text = (
            attn[:, text_slice[0] : text_slice[1]].astype(jnp.float32)
            if alignment
            else cy.last_attn
        )
        return GenCarry(cache, valid, tokens, seen, done, logits, attn_text, align, key, cy.i + 1)

    return body_fn


def t3_generate(
    p,
    cfg: T3Config,
    text_tokens: jnp.ndarray,
    text_lens: jnp.ndarray,
    speaker_emb: jnp.ndarray,
    prompt_tokens: jnp.ndarray,
    emotion_adv: jnp.ndarray,
    rng: jax.Array,
    sampling: SamplingConfig = SamplingConfig(),
    max_new_tokens: int = 1000,
    alignment: bool = False,
    decode_impl: str = "scan",  # "scan": read-only-cache layer scan (30x smaller trace); "unroll": static layer indices
    scan_unroll: int = 1,  # layers per scan iteration in "scan" mode (must divide n_layers)
    use_pallas: bool = True,  # flash-decode kernel reads the HBM cache zero-copy (scan mode, no alignment)
    cache_quant: bool = False,  # int8 KV cache w/ per-token scales (Pallas path only)
    _prefill_only: bool = False,  # return the GenCarry after prefill (streaming)
) -> GenResult:
    """Batched CFG speech-token generation. All shapes static; per-row EOS
    via done-masks; early exit when every row finished.

    text_tokens must already carry SOT/EOT framing (added by the pipeline,
    tts.py:240-243).
    """
    b, tmax = text_tokens.shape
    cfg_on = sampling.cfg_weight > 0
    n_bos = 2 if cfg_on else 1
    # the alignment text-read reconstructs probs from a full-precision
    # cache column read; the int8 cache is not plumbed through it
    cache_quant = cache_quant and not alignment
    pdt = p["speech_emb"]["w"].dtype
    speaker_emb = speaker_emb.astype(pdt)
    emotion_adv = emotion_adv.astype(pdt)
    cond = t3_cond_prefix(p, cfg, speaker_emb, prompt_tokens, emotion_adv)
    pre = t3_build_prefill(p, cfg, cond, text_tokens, text_lens, sampling.cfg_weight)

    s0 = pre.embeds.shape[1]
    # pad the cache to the flash-decode kernel's S-block multiple (free at
    # runtime: the kernel truncates to live blocks each step)
    cache_len = -(-(s0 + max_new_tokens) // 128) * 128
    ds = _ds_cache(use_pallas, decode_impl, alignment)
    hidden, cache = llama_prefill(
        p["llama"], cfg.llama, pre.embeds, pre.positions, pre.valid, cache_len,
        ds_layout=ds, cache_quant=cache_quant and ds,
    )
    # logits at the last prefill position
    last_h = hidden[jnp.arange(hidden.shape[0]), pre.last_idx]  # (2B, C)
    logits0 = linear(p["speech_head"], last_h)

    rows_b = b  # conditional rows
    vocab = cfg.speech_tokens_dict_size
    # (decode rope positions come from _make_decode_body's base_pos =
    # cfg.n_cond + text_lens + n_bos, the compacted valid-prefill count)

    valid0 = jnp.pad(pre.valid, ((0, 0), (0, cache_len - s0)))

    seen0 = jnp.zeros((rows_b, vocab), bool).at[:, cfg.start_speech_token].set(True)

    from .alignment import init_align_state

    align0 = init_align_state(rows_b, max_new_tokens if alignment else 1, tmax)
    attn0 = jnp.zeros((pre.embeds.shape[0], tmax), jnp.float32)

    init = GenCarry(
        cache=cache,
        valid=valid0,
        tokens=jnp.full((rows_b, max_new_tokens), cfg.stop_speech_token, jnp.int32),
        seen=seen0,
        done=jnp.zeros((rows_b,), bool),
        last_logits=logits0,
        last_attn=attn0,
        align=align0,
        key=rng,
        i=jnp.int32(0),
    )
    if _prefill_only:
        return init

    body_fn = _make_decode_body(
        p, cfg, text_lens, tmax, s0, sampling, alignment,
        decode_impl, scan_unroll, use_pallas,
    )

    def cond_fn(cy: GenCarry):
        return (cy.i < max_new_tokens) & ~jnp.all(cy.done)

    fin = lax.while_loop(cond_fn, body_fn, init)
    return _carry_result(fin, cfg)


def _carry_result(cy: GenCarry, cfg: T3Config) -> GenResult:
    """length = index of first EOS (tokens are EOS-padded afterwards)."""
    max_new = cy.tokens.shape[1]
    is_eos = cy.tokens == cfg.stop_speech_token
    lengths = jnp.where(
        jnp.any(is_eos, axis=1), jnp.argmax(is_eos, axis=1), max_new
    ).astype(jnp.int32)
    return GenResult(cy.tokens, lengths, cy.i)


def t3_generate_start(
    p,
    cfg: T3Config,
    text_tokens: jnp.ndarray,
    text_lens: jnp.ndarray,
    speaker_emb: jnp.ndarray,
    prompt_tokens: jnp.ndarray,
    emotion_adv: jnp.ndarray,
    rng: jax.Array,
    sampling: SamplingConfig = SamplingConfig(),
    max_new_tokens: int = 1000,
    cache_quant: bool = False,
) -> GenCarry:
    """Prefill only: build the resumable decode carry without running the
    loop (streaming entry; pipeline/streaming.py)."""
    res_carry = t3_generate(
        p, cfg, text_tokens, text_lens, speaker_emb, prompt_tokens,
        emotion_adv, rng, sampling, max_new_tokens, cache_quant=cache_quant,
        _prefill_only=True,
    )
    return res_carry


def t3_generate_resume(
    p,
    cfg: T3Config,
    carry: GenCarry,
    text_lens: jnp.ndarray,
    sampling: SamplingConfig = SamplingConfig(),
    n_steps: int = 50,
    alignment: bool = False,
    decode_impl: str = "scan",
    scan_unroll: int = 1,
    use_pallas: bool = True,
):
    """Continue a decode carry for up to ``n_steps`` more tokens (fewer if
    every row hits EOS). Token streams are IDENTICAL to a single
    t3_generate call with the same rng: the carry holds the RNG chain.
    Returns (new_carry, GenResult-so-far)."""
    max_new = carry.tokens.shape[1]
    tmax = carry.last_attn.shape[1]
    cfg_on = sampling.cfg_weight > 0
    s0 = cfg.n_cond + tmax + (2 if cfg_on else 1)
    body_fn = _make_decode_body(
        p, cfg, text_lens, tmax, s0, sampling, alignment,
        decode_impl, scan_unroll, use_pallas,
    )
    i_end = jnp.minimum(carry.i + n_steps, max_new)

    def cond_fn(cy: GenCarry):
        return (cy.i < i_end) & ~jnp.all(cy.done)

    fin = lax.while_loop(cond_fn, body_fn, carry)
    return fin, _carry_result(fin, cfg)


# ---------------------------------------------------------------------------
# training-style forward (parity with t3.py:110-201; used by train/ and the
# multi-chip dryrun)
# ---------------------------------------------------------------------------


def t3_forward(
    p,
    cfg: T3Config,
    speaker_emb,
    prompt_tokens,
    emotion_adv,
    text_tokens,
    text_lens,
    speech_tokens,
    speech_lens,
):
    """Teacher-forced forward -> (text_logits, speech_logits)."""
    b, tt = text_tokens.shape
    ts = speech_tokens.shape[1]
    cond = t3_cond_prefix(p, cfg, speaker_emb, prompt_tokens, emotion_adv)
    text_emb = embedding(p["text_emb"], text_tokens) + p["text_pos_emb"]["w"][None, :tt]
    speech_emb = embedding(p["speech_emb"], speech_tokens) + p["speech_pos_emb"]["w"][None, :ts]
    embeds = jnp.concatenate([cond, text_emb, speech_emb], axis=1)
    s = embeds.shape[1]
    valid = jnp.concatenate(
        [
            jnp.ones((b, cfg.n_cond), bool),
            jnp.arange(tt)[None] < text_lens[:, None],
            jnp.arange(ts)[None] < speech_lens[:, None],
        ],
        axis=1,
    )
    positions = jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1
    positions = jnp.where(valid, positions, 0)
    hidden, _ = llama_prefill(p["llama"], cfg.llama, embeds, positions, valid, s)
    text_latents = hidden[:, cfg.n_cond : cfg.n_cond + tt]
    speech_latents = hidden[:, cfg.n_cond + tt :]
    return linear(p["text_head"], text_latents), linear(p["speech_head"], speech_latents)


def t3_loss(p, cfg: T3Config, batch):
    """Masked CE losses (loss_text, loss_speech), parity with t3.py:167-201."""
    text_logits, speech_logits = t3_forward(
        p,
        cfg,
        batch["speaker_emb"],
        batch["prompt_tokens"],
        batch["emotion_adv"],
        batch["text_tokens"],
        batch["text_lens"],
        batch["speech_tokens"],
        batch["speech_lens"],
    )

    def masked_ce(logits, targets, lens):
        mask = jnp.arange(targets.shape[1])[None] < lens[:, None]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)

    loss_text = masked_ce(text_logits, batch["text_tokens"], batch["text_lens"])
    loss_speech = masked_ce(speech_logits, batch["speech_tokens"], batch["speech_lens"])
    return loss_text, loss_speech
