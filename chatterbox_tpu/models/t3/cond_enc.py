"""T3 conditioning encoder: speaker projection + perceiver resampler +
emotion-intensity projection -> 34 conditioning positions.

Parity targets: reference t3/modules/cond_enc.py:64-97 and
t3/modules/perceiver.py:55-212 (AttentionQKV/AttentionBlock2/Perceiver;
RelativePositionBias is constructed but unused in the default config).
"""

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ...core.layers import layer_norm, linear, merge_heads, sdpa, split_heads


def _attention_block(p, x1, x2, n_heads):
    """AttentionBlock2: shared-norm cross attention, residual on x1
    (perceiver.py:113-170)."""
    q = linear(p["to_q"], layer_norm(p["norm"], x1))
    x2n = layer_norm(p["norm"], x2)
    k = linear(p["to_k"], x2n)
    v = linear(p["to_v"], x2n)
    h = sdpa(split_heads(q, n_heads), split_heads(k, n_heads), split_heads(v, n_heads))
    h = linear(p["proj_out"], merge_heads(h))
    return x1 + h


def perceiver(p, h, n_heads=4):
    """32 learned queries cross-attend to the 150-token speech-prompt
    embedding, then one self-attention pass (perceiver.py:200-212)."""
    query = jnp.broadcast_to(p["query"], (h.shape[0],) + p["query"].shape[1:])
    pre = _attention_block(p["attn"], query, h, n_heads)
    return _attention_block(p["attn"], pre, pre, n_heads)


def cond_embeds(p, speaker_emb, prompt_speech_emb, emotion_adv):
    """(B,256) speaker, (B,150,C) prompt embedding, (B,) emotion ->
    (B, 34, C) conditioning prefix (cond_enc.py:64-97)."""
    spkr = linear(p["spkr_enc"], speaker_emb)[:, None]  # (B, 1, C)
    prompt = perceiver(p["perceiver"], prompt_speech_emb)  # (B, 32, C)
    emo = linear(p["emotion_adv_fc"], emotion_adv[:, None, None])  # (B, 1, C)
    return jnp.concatenate([spkr, prompt, emo], axis=1)


def init_cond_enc(key, dim=1024, speaker_dim=256, n_queries=32):
    ks = jax.random.split(key, 8)

    def lin(k, i, o, bias=True):
        p = {"w": jax.random.normal(k, (i, o)) * 0.02}
        if bias:
            p["b"] = jnp.zeros((o,))
        return p

    qv = np.sqrt(3.0) * np.sqrt(2.0 / (n_queries + n_queries))
    return {
        "spkr_enc": lin(ks[0], speaker_dim, dim),
        "emotion_adv_fc": lin(ks[1], 1, dim, bias=False),
        "perceiver": {
            "query": jax.random.uniform(ks[2], (1, n_queries, dim), minval=-qv, maxval=qv),
            "attn": {
                "norm": {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))},
                "to_q": lin(ks[3], dim, dim),
                "to_k": lin(ks[4], dim, dim),
                "to_v": lin(ks[5], dim, dim),
                "proj_out": lin(ks[6], dim, dim),
            },
        },
    }


def convert_cond_enc(sd, prefix="cond_enc."):
    from ...checkpoint import torch_convert as tc

    def _n(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    return {
        "spkr_enc": tc.linear(sd, prefix + "spkr_enc"),
        "emotion_adv_fc": tc.linear(sd, prefix + "emotion_adv_fc"),
        "perceiver": {
            "query": jnp.asarray(_n(sd[prefix + "perceiver.pre_attention_query"])),
            "attn": {
                "norm": tc.layer_norm(sd, prefix + "perceiver.attn.norm"),
                "to_q": tc.linear(sd, prefix + "perceiver.attn.to_q"),
                "to_k": tc.linear(sd, prefix + "perceiver.attn.to_k"),
                "to_v": tc.linear(sd, prefix + "perceiver.attn.to_v"),
                "proj_out": tc.linear(sd, prefix + "perceiver.attn.proj_out"),
            },
        },
    }
