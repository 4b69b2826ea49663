"""S3 speech tokenizer: 16 kHz speech -> 25 Hz semantic tokens (FSQ 3^8).

The in-repo reference (s3tokenizer/s3tokenizer.py) only wraps the external
``s3tokenizer`` package's ``S3TokenizerV2`` ("speech_tokenizer_v2_25hz"),
supplying the 128-mel whisper-style frontend (parity-implemented in
core/dsp.s3tok_log_mel_spectrogram), 40 ms padding and max_len truncation.

This module reconstructs the V2 encoder TPU-natively:
  - conv downsample x4 (100 Hz mel frames -> 25 Hz): two stride-2 convs + GELU
  - Whisper-style sinusoidal positions + pre-norm transformer blocks with an
    FSMN memory branch on the values (the V2/Paraformer-style block)
  - FSQ quantizer: project to 8 dims, round each to 3 levels, radix-3 pack
    (SPEECH_VOCAB_SIZE = 3^8 = 6561, s3tokenizer.py:19)

NOTE (SURVEY.md §7 hard part 3): the exact upstream V2 block layout can only
be token-parity-validated against the published checkpoint, which this
offline environment cannot fetch; `convert_s3tokenizer` maps the documented
checkpoint key names and is the single place to adjust if the upstream
differs. The wrapper semantics (padding / truncation / mel frontend) are
golden-tested against the reference.
"""

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import S3_TOKEN_RATE, SPEECH_VOCAB_SIZE
from ..core.dsp import s3tok_log_mel_spectrogram
from ..core.layers import conv1d, layer_norm, linear, merge_heads, sdpa, split_heads

# FSQ bound: upstream quantizer exports tanh(h) scaled by this constant before
# rounding (keeps +/-1 digits reachable but never exactly at the boundary)
FSQ_TANH_SCALE = 0.9990000128746033


@dataclass(frozen=True)
class S3TokenizerConfig:
    n_mels: int = 128
    n_audio_ctx: int = 1500
    n_state: int = 1280
    n_head: int = 20
    n_layer: int = 6
    fsq_dim: int = 8
    fsq_levels: int = 3
    fsmn_kernel: int = 11

    @property
    def vocab_size(self) -> int:
        return self.fsq_levels**self.fsq_dim  # 6561


def _sinusoids(length: int, channels: int) -> np.ndarray:
    """Whisper positional embedding."""
    log_timescale = np.log(10000.0) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    t = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1).astype(np.float32)


def _block(p, x, n_head, fsmn_kernel, key_mask=None):
    """Pre-norm attention block with FSMN value-memory + MLP.

    FSMN branch follows the funasr/Paraformer SANM construction the upstream
    V2 encoder derives from (tests/torch_s3tok_ref.py is the executable torch
    statement of the same semantics): memory = dwconv(v * mask) + v * mask,
    re-masked, added to the attention output AFTER the out projection.
    """
    res = x
    y = layer_norm(p["attn_ln"], x, 1e-5)
    q = split_heads(linear(p["q"], y), n_head)
    k = split_heads(linear(p["k"], y), n_head)
    vproj = linear(p["v"], y)
    v = split_heads(vproj, n_head)
    mask = None if key_mask is None else key_mask[:, None, None, :]
    a = sdpa(q, k, v, mask=mask)  # whisper's d^-0.25 on q and k == d^-0.5 net
    a = merge_heads(a)
    # FSMN memory (SANM): mask -> depthwise conv (symmetric pad) -> +v -> mask
    vm = vproj if key_mask is None else vproj * key_mask[..., None].astype(vproj.dtype)
    lpad = (fsmn_kernel - 1) // 2
    mem = conv1d(p["fsmn"], vm, padding=(lpad, fsmn_kernel - 1 - lpad), groups=vm.shape[-1])
    mem = mem + vm
    if key_mask is not None:
        mem = mem * key_mask[..., None].astype(mem.dtype)
    x = res + linear(p["attn_out"], a) + mem
    res = x
    y = layer_norm(p["mlp_ln"], x, 1e-5)
    y = linear(p["mlp2"], jax.nn.gelu(linear(p["mlp1"], y), approximate=False))
    return res + y


def s3_encode_mels(p, cfg: S3TokenizerConfig, mels: jnp.ndarray, mel_lens=None):
    """(B, T_mel, 128) log-mels (100 fps) -> (tokens (B, T_mel//4), token_lens).

    Tokens are FSQ indices in [0, 6561).
    """
    mels = mels.astype(p["conv1"]["w"].dtype)  # bf16-capable encoder
    x = jax.nn.gelu(conv1d(p["conv1"], mels, stride=2, padding=1), approximate=False)
    x = jax.nn.gelu(conv1d(p["conv2"], x, stride=2, padding=1), approximate=False)
    t = x.shape[1]
    x = x + jnp.asarray(_sinusoids(cfg.n_audio_ctx, cfg.n_state))[None, :t].astype(x.dtype)
    key_mask = None
    if mel_lens is not None:
        tok_lens = mel_lens // 4
        key_mask = jnp.arange(t)[None] < tok_lens[:, None]
    for bp in p["blocks"]:
        x = _block(bp, x, cfg.n_head, cfg.fsmn_kernel, key_mask)
    x = layer_norm(p["ln_post"], x.astype(jnp.float32), 1e-5)
    # FSQ quantize (fp32: rounding boundaries are precision-sensitive):
    # digits = round(tanh(z) * 0.999...) + (L-1)/2, radix-L packed
    # (tests/torch_s3tok_ref.py FSQCodebook.encode)
    z = linear(p["fsq_proj"], x)  # (B, T, 8)
    half = (cfg.fsq_levels - 1) / 2.0  # = 1 for 3 levels
    digits = jnp.round(jnp.tanh(z) * FSQ_TANH_SCALE * half) + half  # {0, 1, 2}
    radix = jnp.asarray(cfg.fsq_levels ** np.arange(cfg.fsq_dim), jnp.int32)
    tokens = jnp.sum(digits.astype(jnp.int32) * radix[None, None], axis=-1)
    if mel_lens is not None:
        tokens = jnp.where(key_mask, tokens, 0)
        return tokens, tok_lens
    return tokens, jnp.full((tokens.shape[0],), t, jnp.int32)


def pad_to_token_multiple(wav: np.ndarray, sr: int = 16000) -> np.ndarray:
    """Zero-pad a (T,) wav so its length is a whole number of 40 ms tokens
    (reference s3tokenizer.py:54-76)."""
    n_tokens = int(np.ceil(len(wav) / sr * S3_TOKEN_RATE))
    target = int(n_tokens * (sr / S3_TOKEN_RATE))
    return np.pad(wav, (0, target - len(wav)))


def s3_tokenize(p, cfg: S3TokenizerConfig, wav16: jnp.ndarray, max_len: int = None,
                wav_lens=None):
    """(B, T) padded 16 kHz wavs -> (tokens (B, T_tok), lens). Mirrors the
    reference forward (s3tokenizer.py:90-126): mel frontend, optional
    truncation to max_len tokens (mel frames = 4 * tokens).

    ``wav_lens`` (B,) masks zero-padded rows: without it the encoder's full
    self-attention mixes pad-region mel keys into short rows' tokens, so a
    row's tokens would depend on what it was batched with (the reference
    masks too, s3tokenizer padding)."""
    mels = s3tok_log_mel_spectrogram(wav16).transpose(0, 2, 1)  # (B, T_mel, 128)
    if max_len is not None:
        mels = mels[:, : max_len * 4]
    mel_lens = None
    if wav_lens is not None:
        mel_lens = jnp.minimum(wav_lens // 160, mels.shape[1])
    return s3_encode_mels(p, cfg, mels, mel_lens=mel_lens)


def drop_invalid_tokens(tokens: np.ndarray) -> np.ndarray:
    """Host-side helper matching s3tokenizer/__init__.py:16-30: slice between
    SOS/EOS and drop ids >= vocab."""
    tokens = np.asarray(tokens).reshape(-1)
    sos, eos = SPEECH_VOCAB_SIZE, SPEECH_VOCAB_SIZE + 1
    s = int(np.argmax(tokens == sos)) + 1 if (tokens == sos).any() else 0
    e = int(np.argmax(tokens == eos)) if (tokens == eos).any() else len(tokens)
    out = tokens[s:e]
    return out[out < SPEECH_VOCAB_SIZE]


def init_s3tokenizer(key, cfg: S3TokenizerConfig = S3TokenizerConfig()):
    ks = iter(jax.random.split(key, 8 + cfg.n_layer * 8))

    def lin(i, o, bias=True):
        p = {"w": jax.random.normal(next(ks), (i, o)) * (1.0 / np.sqrt(i))}
        if bias:
            p["b"] = jnp.zeros((o,))
        return p

    def conv(w, i, o, groups=1):
        return {
            "w": jax.random.normal(next(ks), (w, i // groups, o)) * 0.02,
            "b": jnp.zeros((o,)),
        }

    def ln(c):
        return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}

    c = cfg.n_state
    return {
        "conv1": conv(3, cfg.n_mels, c),
        "conv2": conv(3, c, c),
        "blocks": [
            {
                "attn_ln": ln(c),
                "q": lin(c, c),
                "k": lin(c, c, bias=False),
                "v": lin(c, c),
                "fsmn": conv(cfg.fsmn_kernel, c, c, groups=c),
                "attn_out": lin(c, c),
                "mlp_ln": ln(c),
                "mlp1": lin(c, 4 * c),
                "mlp2": lin(4 * c, c),
            }
            for _ in range(cfg.n_layer)
        ],
        "ln_post": ln(c),
        "fsq_proj": lin(c, cfg.fsq_dim),
    }


_ENCODER_ANCHOR = "encoder.conv1.weight"
# checkpoint buffers we recompute (sinusoids) or that belong to the mel
# frontend (reference S3Tokenizer registers them, s3tokenizer.py:38-52)
_IGNORED_SUFFIXES = ("_mel_filters", "window", "positional_embedding")


def detect_s3tok_prefix(sd) -> str:
    """Locate the tokenizer subtree in an arbitrary state dict by its
    ``encoder.conv1.weight`` anchor ('' for a bare S3TokenizerV2 dict,
    'tokenizer.' inside the s3gen checkpoint, ...)."""
    hits = [k[: -len(_ENCODER_ANCHOR)] for k in sd if k.endswith(_ENCODER_ANCHOR)]
    if len(hits) != 1:
        raise KeyError(
            f"expected exactly one '*{_ENCODER_ANCHOR}' key, found {len(hits)}: {hits}"
        )
    return hits[0]


def s3tok_config_from_sd(sd, prefix=None, n_head=None) -> S3TokenizerConfig:
    """Infer the tokenizer architecture from checkpoint tensor SHAPES so
    first contact with real weights cannot silently mismatch (VERDICT r1):
    n_mels/n_state from conv1, n_layer by counting blocks, fsmn kernel and
    fsq_dim from their weights, n_audio_ctx from the positional buffer.

    ``n_head`` is the one quantity shapes cannot determine; defaults to
    n_state // 64 (whisper-large head width, 1280 -> 20)."""
    import re

    prefix = detect_s3tok_prefix(sd) if prefix is None else prefix

    def shape(k):
        t = sd[prefix + k]
        return tuple(t.shape)

    n_state, n_mels, _ = shape("encoder.conv1.weight")
    layer_ids = {
        int(m.group(1))
        for k in sd
        if (m := re.match(re.escape(prefix) + r"encoder\.blocks\.(\d+)\.", k))
    }
    if not layer_ids or layer_ids != set(range(max(layer_ids) + 1)):
        raise KeyError(f"non-contiguous/empty encoder.blocks indices: {sorted(layer_ids)}")
    fsmn_kernel = shape("encoder.blocks.0.attn.fsmn_block.weight")[-1]
    fsq_key = next(
        (k for k in sd if k.startswith(prefix) and k.endswith("project_down.weight")), None
    )
    if fsq_key is None:
        raise KeyError(f"no '*project_down.weight' (FSQ) key under prefix {prefix!r}")
    fsq_dim = tuple(sd[fsq_key].shape)[0]
    n_audio_ctx = S3TokenizerConfig.n_audio_ctx
    pos_key = prefix + "encoder.positional_embedding"
    if pos_key in sd:
        n_audio_ctx = tuple(sd[pos_key].shape)[0]
    return S3TokenizerConfig(
        n_mels=n_mels,
        n_audio_ctx=n_audio_ctx,
        n_state=n_state,
        n_head=n_head or max(n_state // 64, 1),
        n_layer=max(layer_ids) + 1,
        fsq_dim=fsq_dim,
        fsmn_kernel=fsmn_kernel,
    )


def convert_s3tokenizer(
    sd,
    cfg: S3TokenizerConfig = None,
    prefix=None,
    strict: bool = True,
):
    """Map the upstream s3tokenizer V2 checkpoint into our pytree.

    Hardened for first-weights contact (key map: docs/S3TOKENIZER_KEYMAP.md):
      - ``prefix=None`` auto-detects the subtree, ``cfg=None`` infers the
        architecture from tensor shapes (s3tok_config_from_sd)
      - every key consumed is tracked; with ``strict=True`` any unconsumed
        non-buffer key under the prefix raises (silently dropped weights are
        how wrong tokens happen without a crash); missing keys always raise
        KeyError naming the key.
    Returns (params, cfg) when ``cfg`` was inferred, else params (the
    historical signature for explicit-config callers).
    """
    import logging

    from ..checkpoint import torch_convert as tc

    prefix = detect_s3tok_prefix(sd) if prefix is None else prefix
    inferred = cfg is None
    if inferred:
        cfg = s3tok_config_from_sd(sd, prefix)

    consumed = set()
    sub = _TrackingDict(sd, consumed)

    fsq_key = next(
        (k for k in sd if k.startswith(prefix) and k.endswith("project_down.weight")),
        prefix + "quantizer.project_down.weight",
    )
    fsq_prefix = fsq_key[: -len(".weight")]

    def blk(i):
        b = f"{prefix}encoder.blocks.{i}"
        return {
            "attn_ln": tc.layer_norm(sub, f"{b}.attn_ln"),
            "q": tc.linear(sub, f"{b}.attn.query"),
            "k": tc.linear(sub, f"{b}.attn.key"),
            "v": tc.linear(sub, f"{b}.attn.value"),
            "fsmn": tc.conv1d(sub, f"{b}.attn.fsmn_block"),
            "attn_out": tc.linear(sub, f"{b}.attn.out"),
            "mlp_ln": tc.layer_norm(sub, f"{b}.mlp_ln"),
            "mlp1": tc.linear(sub, f"{b}.mlp.0"),
            "mlp2": tc.linear(sub, f"{b}.mlp.2"),
        }

    params = {
        "conv1": tc.conv1d(sub, prefix + "encoder.conv1"),
        "conv2": tc.conv1d(sub, prefix + "encoder.conv2"),
        "blocks": [blk(i) for i in range(cfg.n_layer)],
        "ln_post": tc.layer_norm(sub, prefix + "encoder.ln_post"),
        "fsq_proj": tc.linear(sub, fsq_prefix),
    }

    # shape sanity on the assembled pytree (catches transposed/mis-sized maps)
    c = cfg.n_state
    checks = {
        "conv1.w": (params["conv1"]["w"].shape, (3, cfg.n_mels, c)),
        "fsq_proj.w": (params["fsq_proj"]["w"].shape, (c, cfg.fsq_dim)),
        "blocks.0.fsmn.w": (params["blocks"][0]["fsmn"]["w"].shape, (cfg.fsmn_kernel, 1, c)),
    }
    for name, (got, want) in checks.items():
        if tuple(got) != want:
            raise ValueError(f"s3tokenizer {name}: shape {tuple(got)} != expected {want}")

    unconsumed = [
        k
        for k in sd
        if k.startswith(prefix)
        and k not in consumed
        and not k.endswith(_IGNORED_SUFFIXES)
    ]
    if unconsumed:
        msg = (
            f"convert_s3tokenizer: {len(unconsumed)} checkpoint keys under "
            f"{prefix!r} were NOT consumed (layout drift?): {sorted(unconsumed)[:20]}"
        )
        if strict:
            raise ValueError(msg)
        logging.getLogger(__name__).warning(msg)

    # positional buffer, if shipped, must equal our recomputed sinusoids
    pos_key = prefix + "encoder.positional_embedding"
    if pos_key in sd:
        shipped = np.asarray(
            sd[pos_key].detach().cpu().numpy() if hasattr(sd[pos_key], "detach") else sd[pos_key]
        )
        ours = _sinusoids(shipped.shape[0], shipped.shape[1])
        if not np.allclose(shipped, ours, atol=1e-4):
            raise ValueError(
                "s3tokenizer positional_embedding in checkpoint differs from "
                "recomputed sinusoids -- encoder variant mismatch"
            )

    return (params, cfg) if inferred else params


class _TrackingDict:
    """Read-through state-dict view recording which keys were consumed."""

    def __init__(self, sd, consumed: set):
        self._sd = sd
        self._consumed = consumed

    def __getitem__(self, k):
        self._consumed.add(k)
        return self._sd[k]

    def __contains__(self, k):
        return k in self._sd

    def __iter__(self):
        return iter(self._sd)
