"""torch state-dict -> JAX pytree conversion helpers.

Every shipped Chatterbox checkpoint is a torch state dict; these helpers do
the one-time layout transposition into this framework's conventions
(core/layers.py): conv weights (W, Cin, Cout), linear (Cin, Cout). Weight-norm
parametrizations (hifigan.py:28, f0_predictor.py:29-47) are folded into plain
weights at conversion time -- inference never re-normalizes.

Model-specific key mappings live next to each model
(``models/*/convert.py`` functions named ``convert_<model>``).
"""

import numpy as np


def _np(t):
    if isinstance(t, np.ndarray):
        return t
    # torch tensor without importing torch at module scope
    return t.detach().cpu().numpy()


def fold_weight_norm(sd, prefix):
    """Return the folded conv/linear weight for a weight-normed torch module.

    Handles both old-style keys (``weight_g``/``weight_v``) and the new
    parametrize API (``parametrizations.weight.original0/1``). torch
    weight_norm uses dim=0: w = g * v / ||v||_{dims != 0}.
    """
    if f"{prefix}.weight_g" in sd:
        g, v = _np(sd[f"{prefix}.weight_g"]), _np(sd[f"{prefix}.weight_v"])
    elif f"{prefix}.parametrizations.weight.original0" in sd:
        g = _np(sd[f"{prefix}.parametrizations.weight.original0"])
        v = _np(sd[f"{prefix}.parametrizations.weight.original1"])
    else:
        return _np(sd[f"{prefix}.weight"])
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt(np.sum(v.astype(np.float64) ** 2, axis=axes, keepdims=True))
    return (g.astype(np.float64) / norm * v.astype(np.float64)).astype(np.float32)


def linear(sd, prefix):
    p = {"w": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        p["b"] = _np(sd[f"{prefix}.bias"])
    return p


def embedding(sd, prefix):
    return {"w": _np(sd[f"{prefix}.weight"])}


def conv1d(sd, prefix, weight_norm=False):
    w = fold_weight_norm(sd, prefix) if weight_norm else _np(sd[f"{prefix}.weight"])
    p = {"w": np.transpose(w, (2, 1, 0))}  # (Cout, Cin, W) -> (W, Cin, Cout)
    if f"{prefix}.bias" in sd:
        p["b"] = _np(sd[f"{prefix}.bias"])
    return p


def conv_transpose1d(sd, prefix, weight_norm=False):
    w = fold_weight_norm(sd, prefix) if weight_norm else _np(sd[f"{prefix}.weight"])
    p = {"w": np.transpose(w, (2, 0, 1))}  # (Cin, Cout, W) -> (W, Cin, Cout)
    if f"{prefix}.bias" in sd:
        p["b"] = _np(sd[f"{prefix}.bias"])
    return p


def conv2d(sd, prefix):
    w = _np(sd[f"{prefix}.weight"])  # (Cout, Cin, KH, KW)
    p = {"w": np.transpose(w, (2, 3, 1, 0))}  # -> (KH, KW, Cin, Cout)
    if f"{prefix}.bias" in sd:
        p["b"] = _np(sd[f"{prefix}.bias"])
    return p


def layer_norm(sd, prefix):
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def rms_norm(sd, prefix):
    return {"scale": _np(sd[f"{prefix}.weight"])}


def batch_norm(sd, prefix):
    p = {
        "mean": _np(sd[f"{prefix}.running_mean"]),
        "var": _np(sd[f"{prefix}.running_var"]),
    }
    if f"{prefix}.weight" in sd:
        p["scale"] = _np(sd[f"{prefix}.weight"])
        p["bias"] = _np(sd[f"{prefix}.bias"])
    return p


def lstm(sd, prefix, num_layers):
    """torch nn.LSTM -> list of per-layer dicts for core.layers.lstm."""
    layers = []
    for i in range(num_layers):
        w_ih = _np(sd[f"{prefix}.weight_ih_l{i}"]).T  # (Cin, 4H)
        w_hh = _np(sd[f"{prefix}.weight_hh_l{i}"]).T  # (H, 4H)
        b = _np(sd[f"{prefix}.bias_ih_l{i}"]) + _np(sd[f"{prefix}.bias_hh_l{i}"])
        layers.append({"w_ih": w_ih, "w_hh": w_hh, "b": b})
    return layers
