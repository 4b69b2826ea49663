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
    """Pre-norm attention block with FSMN value-memory + MLP."""
    res = x
    y = layer_norm(p["attn_ln"], x, 1e-5)
    q = split_heads(linear(p["q"], y), n_head)
    k = split_heads(linear(p["k"], y), n_head)
    vproj = linear(p["v"], y)
    v = split_heads(vproj, n_head)
    mask = None if key_mask is None else key_mask[:, None, None, :]
    a = sdpa(q, k, v, mask=mask)  # whisper's d^-0.25 on q and k == d^-0.5 net
    a = merge_heads(a)
    # FSMN memory: depthwise conv over values, added to the attention output
    pad = (fsmn_kernel - 1) // 2
    mem = conv1d(p["fsmn"], vproj, padding=pad, groups=vproj.shape[-1])
    a = a + mem
    x = res + linear(p["attn_out"], a)
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
    # FSQ quantize (fp32: rounding boundaries are precision-sensitive)
    z = linear(p["fsq_proj"], x)  # (B, T, 8)
    half = (cfg.fsq_levels - 1) / 2.0  # = 1 for 3 levels
    digits = jnp.clip(jnp.round(z), -half, half) + half  # {0, 1, 2}
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


def s3_tokenize(p, cfg: S3TokenizerConfig, wav16: jnp.ndarray, max_len: int = None):
    """(B, T) padded 16 kHz wavs -> (tokens (B, T_tok), lens). Mirrors the
    reference forward (s3tokenizer.py:90-126): mel frontend, optional
    truncation to max_len tokens (mel frames = 4 * tokens)."""
    mels = s3tok_log_mel_spectrogram(wav16).transpose(0, 2, 1)  # (B, T_mel, 128)
    if max_len is not None:
        mels = mels[:, : max_len * 4]
    return s3_encode_mels(p, cfg, mels)


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


def convert_s3tokenizer(sd, cfg: S3TokenizerConfig = S3TokenizerConfig(), prefix="tokenizer."):
    """Best-known mapping of the upstream s3tokenizer V2 checkpoint keys.

    Single adjustment point if the published checkpoint layout differs
    (cannot be validated offline -- see module docstring)."""
    from ..checkpoint import torch_convert as tc

    def blk(i):
        b = f"{prefix}encoder.blocks.{i}"
        return {
            "attn_ln": tc.layer_norm(sd, f"{b}.attn_ln"),
            "q": tc.linear(sd, f"{b}.attn.query"),
            "k": tc.linear(sd, f"{b}.attn.key"),
            "v": tc.linear(sd, f"{b}.attn.value"),
            "fsmn": tc.conv1d(sd, f"{b}.attn.fsmn_block"),
            "attn_out": tc.linear(sd, f"{b}.attn.out"),
            "mlp_ln": tc.layer_norm(sd, f"{b}.mlp_ln"),
            "mlp1": tc.linear(sd, f"{b}.mlp.0"),
            "mlp2": tc.linear(sd, f"{b}.mlp.2"),
        }

    return {
        "conv1": tc.conv1d(sd, prefix + "encoder.conv1"),
        "conv2": tc.conv1d(sd, prefix + "encoder.conv2"),
        "blocks": [blk(i) for i in range(cfg.n_layer)],
        "ln_post": tc.layer_norm(sd, prefix + "encoder.ln_post"),
        "fsq_proj": tc.linear(sd, prefix + "quantizer.project_down"),
    }
