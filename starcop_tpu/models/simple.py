"""Tiny CNN baselines.

Capability parity with the reference's hand baselines
(/root/reference/starcop/models/architectures/baselines.py:6-70): a 1x1-conv
"SingleConv", a 5-layer CNN, and 1x1-conv regression nets used for the learned
band-ratio experiments. NHWC layout.
"""

from __future__ import annotations

import flax.linen as nn


class SingleConv(nn.Module):
    """One 1x1 conv: per-pixel linear probe over the input products."""

    out_channels: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.Conv(self.out_channels, (1, 1))(x)


class SimpleCNN(nn.Module):
    """5-layer 3x3 CNN with ReLUs, logits head."""

    out_channels: int = 1
    width: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(4):
            x = nn.Conv(self.width, (3, 3), padding="SAME", name=f"conv{i}")(x)
            x = nn.relu(x)
        return nn.Conv(self.out_channels, (3, 3), padding="SAME", name="head")(x)


class SimpleCNNRegression(nn.Module):
    """1x1-conv regression stack (band-value regression, 'cnn_v2/v3' class)."""

    out_channels: int = 1
    width: int = 128
    depth: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.depth):
            x = nn.Conv(self.width, (1, 1), name=f"conv{i}")(x)
            x = nn.relu(x)
        return nn.Conv(self.out_channels, (1, 1), name="head")(x)
