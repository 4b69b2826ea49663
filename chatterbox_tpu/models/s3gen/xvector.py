"""CAMPPlus x-vector speaker encoder (S3Gen conditioning) in functional JAX.

Parity target: reference s3gen/xvector.py:61-428 (FCM 2-D conv front, CAM
dense-TDNN blocks 12/24/16, stats pooling, 192-d embedding) with the Kaldi
fbank frontend from core/fbank.py (xvector.py:45-58).

Inference-mode BatchNorm uses running stats; all convs are channels-last.
"""

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ...core.fbank import kaldi_fbank
from ...core.layers import batch_norm, conv1d, conv2d


@dataclass(frozen=True)
class CAMPPlusConfig:
    feat_dim: int = 80
    embedding_size: int = 192
    growth_rate: int = 32
    bn_size: int = 4
    init_channels: int = 128
    m_channels: int = 32
    block_layers: tuple = (12, 24, 16)
    block_dilations: tuple = (1, 2, 2)
    seg_len: int = 100


def _bn_relu(p, x):
    return jax.nn.relu(batch_norm(p, x))


def _basic_res_block(p, x, stride):
    """(B, H, W, C) BasicResBlock with stride on H (xvector.py:61-91)."""
    y = jax.nn.relu(batch_norm(p["bn1"], conv2d(p["conv1"], x, stride=(stride, 1), padding=1)))
    y = batch_norm(p["bn2"], conv2d(p["conv2"], y, stride=(1, 1), padding=1))
    if "shortcut_conv" in p:
        sc = batch_norm(p["shortcut_bn"], conv2d(p["shortcut_conv"], x, stride=(stride, 1)))
    else:
        sc = x
    return jax.nn.relu(y + sc)


def _fcm(p, x):
    """(B, T, F) -> (B, T, C*F/8). FCM front (xvector.py:94-127)."""
    # torch layout (B, 1, F, T); ours NHWC = (B, F, T, 1)
    h = x.transpose(0, 2, 1)[..., None]  # (B, F, T, 1)
    h = jax.nn.relu(batch_norm(p["bn1"], conv2d(p["conv1"], h, padding=1)))
    for blk, stride in zip(p["layer1"], (2, 1)):
        h = _basic_res_block(blk, h, stride)
    for blk, stride in zip(p["layer2"], (2, 1)):
        h = _basic_res_block(blk, h, stride)
    h = jax.nn.relu(batch_norm(p["bn2"], conv2d(p["conv2"], h, stride=(2, 1), padding=1)))
    b, f, t, c = h.shape
    # torch reshape (B, C, F', T) -> (B, C*F', T); ours (B, F', T, C) -> match order
    h = h.transpose(0, 3, 1, 2).reshape(b, c * f, t)  # (B, C*F', T)
    return h.transpose(0, 2, 1)  # (B, T, C*F')


def _seg_pooling(x, seg_len):
    """avg_pool1d(k=seg, s=seg, ceil) repeated back (xvector.py:221-231).
    x: (B, T, C)."""
    b, t, c = x.shape
    n_seg = -(-t // seg_len)
    pad = n_seg * seg_len - t
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    seg_sum = xp.reshape(b, n_seg, seg_len, c).sum(axis=2)
    counts = jnp.minimum(seg_len, t - np.arange(n_seg) * seg_len)
    seg = seg_sum / counts[None, :, None]
    rep = jnp.repeat(seg, seg_len, axis=1)[:, :t]
    return rep


def _cam_layer(p, x, dilation, seg_len):
    """Context-aware mask conv (xvector.py:195-231). x: (B, T, Cbn)."""
    k = p["local"]["w"].shape[0]
    pad = (k - 1) // 2 * dilation
    y = conv1d(p["local"], x, padding=pad, dilation=dilation)
    context = jnp.mean(x, axis=1, keepdims=True) + _seg_pooling(x, seg_len)
    m = jax.nn.relu(conv1d(p["lin1"], context))
    m = jax.nn.sigmoid(conv1d(p["lin2"], m))
    return y * m


def _dense_tdnn_block(p, x, dilation, seg_len):
    """CAMDenseTDNNBlock: dense concat of CAM layers (xvector.py:278-310)."""
    for lp in p["layers"]:
        y = conv1d(lp["lin1"], _bn_relu(lp["nl1"], x))
        y = _cam_layer(lp["cam"], _bn_relu(lp["nl2"], y), dilation, seg_len)
        x = jnp.concatenate([x, y], axis=-1)
    return x


def campplus_forward(p, cfg: CAMPPlusConfig, feats: jnp.ndarray) -> jnp.ndarray:
    """(B, T, 80) mean-normed fbank -> (B, 192) x-vector."""
    h = _fcm(p["head"], feats)
    # tdnn: conv k5 stride 2 pad 2 + BN + ReLU
    h = _bn_relu(p["tdnn"]["nl"], conv1d(p["tdnn"]["conv"], h, stride=2, padding=2))
    for bp, dil in zip(p["blocks"], cfg.block_dilations):
        h = _dense_tdnn_block(bp, h, dil, cfg.seg_len)
        h = conv1d(bp["transit"], _bn_relu(bp["transit_nl"], h))
    h = _bn_relu(p["out_nl"], h)
    # stats pooling over time (unbiased std, xvector.py:146-152)
    mean = jnp.mean(h, axis=1)
    var = jnp.sum((h - mean[:, None]) ** 2, axis=1) / jnp.maximum(h.shape[1] - 1, 1)
    stats = jnp.concatenate([mean, jnp.sqrt(var)], axis=-1)
    emb = conv1d(p["dense"]["conv"], stats[:, None])[:, 0]
    emb = batch_norm(p["dense"]["bn"], emb)  # affine-free batchnorm_
    return emb


def campplus_embed_wav(p, cfg: CAMPPlusConfig, wav16: jnp.ndarray) -> jnp.ndarray:
    """(B, T) 16 kHz wav -> (B, 192): fbank + per-utterance mean-norm +
    forward (xvector.py:45-58, 425-428)."""
    feats = kaldi_fbank(wav16, num_mel_bins=cfg.feat_dim)
    feats = feats - jnp.mean(feats, axis=1, keepdims=True)
    return campplus_forward(p, cfg, feats)


# ---------------------------------------------------------------------------
# init / convert
# ---------------------------------------------------------------------------


def init_campplus(key, cfg: CAMPPlusConfig = CAMPPlusConfig()):
    """Random init with the exact architecture shape (for tests/bench)."""
    ks = iter(jax.random.split(key, 256))

    def c2(k, kh, kw, i, o):
        return {"w": jax.random.normal(k, (kh, kw, i, o)) * np.sqrt(2.0 / (kh * kw * i))}

    def c1(k, w, i, o, bias=False):
        p = {"w": jax.random.normal(k, (w, i, o)) * np.sqrt(2.0 / (w * i))}
        if bias:
            p["b"] = jnp.zeros((o,))
        return p

    def bn(c, affine=True):
        p = {"mean": jnp.zeros((c,)), "var": jnp.ones((c,))}
        if affine:
            p["scale"] = jnp.ones((c,))
            p["bias"] = jnp.zeros((c,))
        return p

    def res_block(cin, cout, stride):
        p = {
            "conv1": c2(next(ks), 3, 3, cin, cout),
            "bn1": bn(cout),
            "conv2": c2(next(ks), 3, 3, cout, cout),
            "bn2": bn(cout),
        }
        if stride != 1 or cin != cout:
            p["shortcut_conv"] = c2(next(ks), 1, 1, cin, cout)
            p["shortcut_bn"] = bn(cout)
        return p

    m = cfg.m_channels
    head = {
        "conv1": c2(next(ks), 3, 3, 1, m),
        "bn1": bn(m),
        "layer1": [res_block(m, m, 2), res_block(m, m, 1)],
        "layer2": [res_block(m, m, 2), res_block(m, m, 1)],
        "conv2": c2(next(ks), 3, 3, m, m),
        "bn2": bn(m),
    }
    channels = m * (cfg.feat_dim // 8)
    p = {
        "head": head,
        "tdnn": {"conv": c1(next(ks), 5, channels, cfg.init_channels), "nl": bn(cfg.init_channels)},
        "blocks": [],
    }
    channels = cfg.init_channels
    bnc = cfg.bn_size * cfg.growth_rate
    for n_layers in cfg.block_layers:
        layers = []
        cin = channels
        for i in range(n_layers):
            layers.append(
                {
                    "nl1": bn(cin),
                    "lin1": c1(next(ks), 1, cin, bnc),
                    "nl2": bn(bnc),
                    "cam": {
                        "local": c1(next(ks), 3, bnc, cfg.growth_rate),
                        "lin1": c1(next(ks), 1, bnc, bnc // 2, bias=True),
                        "lin2": c1(next(ks), 1, bnc // 2, cfg.growth_rate, bias=True),
                    },
                }
            )
            cin += cfg.growth_rate
        blk = {"layers": layers, "transit_nl": bn(cin), "transit": c1(next(ks), 1, cin, cin // 2)}
        p["blocks"].append(blk)
        channels = cin // 2
    p["out_nl"] = bn(channels)
    p["dense"] = {
        "conv": c1(next(ks), 1, channels * 2, cfg.embedding_size),
        "bn": bn(cfg.embedding_size, affine=False),
    }
    return p


def convert_campplus(sd, cfg: CAMPPlusConfig = CAMPPlusConfig(), prefix="speaker_encoder."):
    from ...checkpoint import torch_convert as tc

    def res_block(rp, cin, cout, stride):
        p = {
            "conv1": tc.conv2d(sd, f"{rp}.conv1"),
            "bn1": tc.batch_norm(sd, f"{rp}.bn1"),
            "conv2": tc.conv2d(sd, f"{rp}.conv2"),
            "bn2": tc.batch_norm(sd, f"{rp}.bn2"),
        }
        if stride != 1 or cin != cout:
            p["shortcut_conv"] = tc.conv2d(sd, f"{rp}.shortcut.0")
            p["shortcut_bn"] = tc.batch_norm(sd, f"{rp}.shortcut.1")
        return p

    m = cfg.m_channels
    head = {
        "conv1": tc.conv2d(sd, prefix + "head.conv1"),
        "bn1": tc.batch_norm(sd, prefix + "head.bn1"),
        "layer1": [
            res_block(prefix + "head.layer1.0", m, m, 2),
            res_block(prefix + "head.layer1.1", m, m, 1),
        ],
        "layer2": [
            res_block(prefix + "head.layer2.0", m, m, 2),
            res_block(prefix + "head.layer2.1", m, m, 1),
        ],
        "conv2": tc.conv2d(sd, prefix + "head.conv2"),
        "bn2": tc.batch_norm(sd, prefix + "head.bn2"),
    }
    p = {
        "head": head,
        "tdnn": {
            "conv": tc.conv1d(sd, prefix + "xvector.tdnn.linear"),
            "nl": tc.batch_norm(sd, prefix + "xvector.tdnn.nonlinear.batchnorm"),
        },
        "blocks": [],
    }
    channels = cfg.init_channels
    for bi, n_layers in enumerate(cfg.block_layers, start=1):
        layers = []
        cin = channels
        for i in range(n_layers):
            lp = f"{prefix}xvector.block{bi}.tdnnd{i + 1}"
            layers.append(
                {
                    "nl1": tc.batch_norm(sd, f"{lp}.nonlinear1.batchnorm"),
                    "lin1": tc.conv1d(sd, f"{lp}.linear1"),
                    "nl2": tc.batch_norm(sd, f"{lp}.nonlinear2.batchnorm"),
                    "cam": {
                        "local": tc.conv1d(sd, f"{lp}.cam_layer.linear_local"),
                        "lin1": tc.conv1d(sd, f"{lp}.cam_layer.linear1"),
                        "lin2": tc.conv1d(sd, f"{lp}.cam_layer.linear2"),
                    },
                }
            )
            cin += cfg.growth_rate
        p["blocks"].append(
            {
                "layers": layers,
                "transit_nl": tc.batch_norm(sd, f"{prefix}xvector.transit{bi}.nonlinear.batchnorm"),
                "transit": tc.conv1d(sd, f"{prefix}xvector.transit{bi}.linear"),
            }
        )
        channels = cin // 2
    p["out_nl"] = tc.batch_norm(sd, prefix + "xvector.out_nonlinear.batchnorm")
    p["dense"] = {
        "conv": tc.conv1d(sd, prefix + "xvector.dense.linear"),
        "bn": tc.batch_norm(sd, prefix + "xvector.dense.nonlinear.batchnorm"),
    }
    return jax.tree.map(jnp.asarray, p)
