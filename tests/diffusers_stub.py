"""Minimal stand-ins for the `diffusers` / `conformer` APIs that the
reference matcha modules import (matcha/transformer.py:5-14,
matcha/decoder.py:7-8). Only the pieces live in the Chatterbox config are
implemented faithfully (plain-LayerNorm BasicTransformerBlock path with
standard scaled-dot-product attention); Ada* variants raise if touched.

Registering these lets the *real* reference decoder/flow code run under
torch for golden-parity tests without the heavyweight deps.
"""

import sys
import types

import torch
import torch.nn as nn
import torch.nn.functional as F


class GELU(nn.Module):
    def __init__(self, dim_in, dim_out, approximate="none"):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out)
        self.approximate = approximate

    def forward(self, x):
        return F.gelu(self.proj(x), approximate=self.approximate)


class GEGLU(nn.Module):
    def __init__(self, dim_in, dim_out):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class ApproximateGELU(nn.Module):
    def __init__(self, dim_in, dim_out):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out)

    def forward(self, x):
        x = self.proj(x)
        return x * torch.sigmoid(1.702 * x)


class _Unused(nn.Module):
    def __init__(self, *a, **k):
        super().__init__()

    def forward(self, *a, **k):
        raise NotImplementedError("Ada layer norms are dormant in the live config")


AdaLayerNorm = _Unused
AdaLayerNormZero = _Unused


class Attention(nn.Module):
    """diffusers.models.attention_processor.Attention, SDPA semantics."""

    def __init__(
        self,
        query_dim,
        heads=8,
        dim_head=64,
        dropout=0.0,
        bias=False,
        cross_attention_dim=None,
        upcast_attention=False,
        **kwargs,
    ):
        super().__init__()
        inner = heads * dim_head
        self.heads = heads
        self.dim_head = dim_head
        kv_dim = cross_attention_dim or query_dim
        self.to_q = nn.Linear(query_dim, inner, bias=bias)
        self.to_k = nn.Linear(kv_dim, inner, bias=bias)
        self.to_v = nn.Linear(kv_dim, inner, bias=bias)
        self.to_out = nn.ModuleList([nn.Linear(inner, query_dim), nn.Dropout(dropout)])

    def forward(self, hidden_states, encoder_hidden_states=None, attention_mask=None, **kwargs):
        ctx = encoder_hidden_states if encoder_hidden_states is not None else hidden_states
        b, t, _ = hidden_states.shape

        def heads(x):
            return x.view(b, -1, self.heads, self.dim_head).permute(0, 2, 1, 3)

        q, k, v = heads(self.to_q(hidden_states)), heads(self.to_k(ctx)), heads(self.to_v(ctx))
        mask = None
        if attention_mask is not None:
            mask = attention_mask
            if mask.dim() == 3:  # (B, 1 or T, S) additive bias
                mask = mask.unsqueeze(1)
        out = F.scaled_dot_product_attention(q, k, v, attn_mask=mask)
        out = out.permute(0, 2, 1, 3).reshape(b, t, -1)
        return self.to_out[1](self.to_out[0](out))


LoRACompatibleLinear = nn.Linear


def maybe_allow_in_graph(cls):
    return cls


def get_activation(name):
    return {"silu": nn.SiLU(), "relu": nn.ReLU(), "gelu": nn.GELU(), "mish": nn.Mish()}[name]


class ConformerBlock(nn.Module):  # matcha ConformerWrapper base; unused in live config
    def __init__(self, *a, **k):
        super().__init__()


def register():
    mods = {
        "diffusers": ["models", "utils"],
        "diffusers.models": ["attention", "attention_processor", "lora", "activations"],
        "diffusers.utils": ["torch_utils"],
    }
    for name, subs in mods.items():
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
        for s in subs:
            full = f"{name}.{s}"
            if full not in sys.modules:
                sys.modules[full] = types.ModuleType(full)
            setattr(sys.modules[name], s, sys.modules[full])

    att = sys.modules["diffusers.models.attention"]
    att.GEGLU, att.GELU, att.ApproximateGELU = GEGLU, GELU, ApproximateGELU
    att.AdaLayerNorm, att.AdaLayerNormZero = AdaLayerNorm, AdaLayerNormZero
    sys.modules["diffusers.models.attention_processor"].Attention = Attention
    sys.modules["diffusers.models.lora"].LoRACompatibleLinear = LoRACompatibleLinear
    sys.modules["diffusers.models.activations"].get_activation = get_activation
    sys.modules["diffusers.utils.torch_utils"].maybe_allow_in_graph = maybe_allow_in_graph

    if "conformer" not in sys.modules:
        conf = types.ModuleType("conformer")
        conf.ConformerBlock = ConformerBlock
        sys.modules["conformer"] = conf
