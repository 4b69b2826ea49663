"""Executable torch cross-implementation of the S3TokenizerV2 encoder.

The upstream ``s3tokenizer`` package (imported by reference
s3tokenizer/s3tokenizer.py:7-11) is not installable offline, so this module
re-states the *documented* construction it derives from, in torch, to give
the JAX implementation something executable to golden-test against:

  - Whisper-style audio encoder front (two GELU convs, k=3, stride 2 each:
    100 fps mel -> 25 Hz), sinusoidal positions;
  - pre-norm transformer blocks whose attention carries a Paraformer/funasr
    "SANM" FSMN value-memory branch: ``mem = conv_dw(v * mask) + v``, masked,
    added to the attention output AFTER the out projection
    (funasr MultiHeadedAttentionSANM.forward_fsmn / forward);
  - FSQ quantizer: Linear project_down to 8 dims, digits =
    round(tanh(h) * 0.999...) + 1 in {0,1,2}, radix-3 packed (3^8 = 6561).

State-dict key names follow the upstream layout that
``convert_s3tokenizer`` maps (see docs/S3TOKENIZER_KEYMAP.md).
"""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

FSQ_TANH_SCALE = 0.9990000128746033  # upstream FSQ export constant


def sinusoids(length, channels):
    log_timescale = np.log(10000.0) / (channels // 2 - 1)
    inv = torch.exp(-log_timescale * torch.arange(channels // 2).float())
    t = torch.arange(length).float()[:, None] * inv[None, :]
    return torch.cat([t.sin(), t.cos()], dim=1)


class FSMNMultiHeadAttention(nn.Module):
    def __init__(self, n_state, n_head, kernel_size=11):
        super().__init__()
        self.n_head = n_head
        self.query = nn.Linear(n_state, n_state)
        self.key = nn.Linear(n_state, n_state, bias=False)
        self.value = nn.Linear(n_state, n_state)
        self.out = nn.Linear(n_state, n_state)
        self.fsmn_block = nn.Conv1d(
            n_state, n_state, kernel_size, stride=1, padding=0,
            groups=n_state, bias=False,
        )
        self.left_padding = (kernel_size - 1) // 2
        self.right_padding = kernel_size - 1 - self.left_padding
        self.pad_fn = nn.ConstantPad1d((self.left_padding, self.right_padding), 0.0)

    def forward_fsmn(self, inputs, mask):
        # funasr SANM semantics: mask -> depthwise conv -> +residual -> mask
        if mask is not None:
            inputs = inputs * mask
        x = inputs.transpose(1, 2)
        x = self.fsmn_block(self.pad_fn(x))
        x = x.transpose(1, 2)
        x = x + inputs
        if mask is not None:
            x = x * mask
        return x

    def forward(self, x, mask=None):
        b, t, d = x.shape
        q = self.query(x)
        k = self.key(x)
        v = self.value(x)
        fsmn_mask = None if mask is None else mask[:, :, None].float()
        memory = self.forward_fsmn(v, fsmn_mask)

        hd = d // self.n_head
        q = q.view(b, t, self.n_head, hd).transpose(1, 2) * (hd ** -0.25)
        k = k.view(b, t, self.n_head, hd).transpose(1, 2) * (hd ** -0.25)
        v = v.view(b, t, self.n_head, hd).transpose(1, 2)
        scores = q @ k.transpose(-1, -2)
        if mask is not None:
            scores = scores.masked_fill(~mask[:, None, None, :], float("-inf"))
        w = scores.softmax(dim=-1)
        a = (w @ v).transpose(1, 2).reshape(b, t, d)
        return self.out(a) + memory


class EncoderBlock(nn.Module):
    def __init__(self, n_state, n_head, kernel_size=11):
        super().__init__()
        self.attn = FSMNMultiHeadAttention(n_state, n_head, kernel_size)
        self.attn_ln = nn.LayerNorm(n_state)
        self.mlp = nn.Sequential(
            nn.Linear(n_state, 4 * n_state), nn.GELU(), nn.Linear(4 * n_state, n_state)
        )
        self.mlp_ln = nn.LayerNorm(n_state)

    def forward(self, x, mask=None):
        x = x + self.attn(self.attn_ln(x), mask)
        x = x + self.mlp(self.mlp_ln(x))
        return x


class AudioEncoderV2(nn.Module):
    def __init__(self, n_mels=128, n_state=1280, n_head=20, n_layer=6,
                 n_audio_ctx=1500, kernel_size=11):
        super().__init__()
        self.conv1 = nn.Conv1d(n_mels, n_state, 3, stride=2, padding=1)
        self.conv2 = nn.Conv1d(n_state, n_state, 3, stride=2, padding=1)
        self.register_buffer("positional_embedding", sinusoids(n_audio_ctx, n_state))
        self.blocks = nn.ModuleList(
            [EncoderBlock(n_state, n_head, kernel_size) for _ in range(n_layer)]
        )
        self.ln_post = nn.LayerNorm(n_state)

    def forward(self, mels, mel_lens=None):
        """mels (B, n_mels, T) -> (B, T//4, n_state); mask from mel_lens//4."""
        x = F.gelu(self.conv1(mels))
        x = F.gelu(self.conv2(x))
        x = x.permute(0, 2, 1)
        t = x.shape[1]
        x = x + self.positional_embedding[:t]
        mask = None
        if mel_lens is not None:
            tok_lens = torch.div(mel_lens, 4, rounding_mode="floor")
            mask = torch.arange(t)[None, :] < tok_lens[:, None]
        for block in self.blocks:
            x = block(x, mask)
        return self.ln_post(x)


class FSQCodebook(nn.Module):
    def __init__(self, dim=1280, level=3, fsq_dim=8):
        super().__init__()
        self.level = level
        self.project_down = nn.Linear(dim, fsq_dim)

    def encode(self, x):
        h = self.project_down(x)
        h = torch.tanh(h) * FSQ_TANH_SCALE
        digits = h.round() + (self.level - 1) / 2  # {0, 1, 2}
        powers = torch.pow(
            self.level, torch.arange(h.shape[-1], dtype=torch.long)
        )
        return (digits.long() * powers).sum(dim=-1)


class S3TokenizerV2Ref(nn.Module):
    """mels (B, 128, T) @100 fps -> tokens (B, T//4) @25 Hz, vocab 6561."""

    def __init__(self, n_mels=128, n_state=1280, n_head=20, n_layer=6,
                 n_audio_ctx=1500, kernel_size=11):
        super().__init__()
        self.encoder = AudioEncoderV2(n_mels, n_state, n_head, n_layer,
                                      n_audio_ctx, kernel_size)
        self.quantizer = FSQCodebook(dim=n_state)

    @torch.no_grad()
    def quantize(self, mels, mel_lens=None):
        hidden = self.encoder(mels, mel_lens)
        tokens = self.quantizer.encode(hidden)
        if mel_lens is None:
            lens = torch.full((mels.shape[0],), hidden.shape[1], dtype=torch.long)
        else:
            lens = torch.div(mel_lens, 4, rounding_mode="floor")
            tokens = tokens * (torch.arange(tokens.shape[1])[None] < lens[:, None])
        return tokens, lens
