"""Executable torch cross-implementation of a PerthNet-implicit watermarker.

The upstream ``resemble-perth`` package (applied to every reference output,
reference tts.py:126,271 / vc.py:29,103; presence extraction README.md:89-108)
is not installable offline. This module states the documented construction --
an implicit (no-payload) neural watermarker operating on log-magnitude STFT
frames: an encoder conv stack predicts an imperceptible magnitude ripple; a
decoder conv stack detects its presence (sigmoid over a global-mean logit).

``convert_perth`` (chatterbox_tpu/models/watermark.py) does NOT assume this
exact topology: it rebuilds the conv stacks from whatever state dict it is
given (shapes + indices), so the real published checkpoint reshapes the JAX
net at load. This file pins the semantics the JAX side is golden-tested
against (tests/test_watermark_perth.py).
"""

import torch
import torch.nn as nn


class PerthEncoder(nn.Module):
    """log-mag frames (B, F, T) -> bounded ripple delta (B, F, T)."""

    def __init__(self, n_bins=513, hidden=256, n_layers=4):
        super().__init__()
        chans = [n_bins] + [hidden] * (n_layers - 1) + [n_bins]
        self.layers = nn.ModuleList(
            [nn.Conv1d(chans[i], chans[i + 1], 3, padding=1) for i in range(n_layers)]
        )

    def forward(self, x):
        for i, layer in enumerate(self.layers):
            x = layer(x)
            if i < len(self.layers) - 1:
                x = torch.nn.functional.leaky_relu(x, 0.2)
        return torch.tanh(x)


class PerthDecoder(nn.Module):
    """log-mag frames (B, F, T) -> presence logit (B,)."""

    def __init__(self, n_bins=513, hidden=256, n_layers=4):
        super().__init__()
        chans = [n_bins] + [hidden] * (n_layers - 1) + [1]
        self.layers = nn.ModuleList(
            [nn.Conv1d(chans[i], chans[i + 1], 3, padding=1) for i in range(n_layers)]
        )

    def forward(self, x):
        for i, layer in enumerate(self.layers):
            x = layer(x)
            if i < len(self.layers) - 1:
                x = torch.nn.functional.leaky_relu(x, 0.2)
        return x.mean(dim=(1, 2))  # global-mean logit


class PerthNetImplicitRef(nn.Module):
    def __init__(self, n_bins=513, hidden=256, n_layers=4):
        super().__init__()
        self.encoder = PerthEncoder(n_bins, hidden, n_layers)
        self.decoder = PerthDecoder(n_bins, hidden, n_layers)

    @torch.no_grad()
    def ripple(self, logmag):
        return self.encoder(logmag)

    @torch.no_grad()
    def presence_logit(self, logmag):
        return self.decoder(logmag)
