"""Classic hand-rolled U-Net (and dropout variant).

Capability parity with the reference alternates
(/root/reference/starcop/models/architectures/unet.py:7-100): 4-level encoder
64->128->256->512 with double 3x3 conv + ReLU, maxpool downsampling, bilinear
x2 upsampling with skip concatenation. NHWC layout for TPU.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class DoubleConv(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), padding="SAME")(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (3, 3), padding="SAME")(x)
        x = nn.relu(x)
        return x


def _maxpool2(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def _upsample2(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear")


class UNet(nn.Module):
    """4-level U-Net; input/output NHWC. out_channels=1 logits."""

    out_channels: int = 1
    widths: Sequence[int] = (64, 128, 256, 512)
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        skips = []
        for i, w in enumerate(self.widths[:-1]):
            x = DoubleConv(w, name=f"down{i}")(x)
            skips.append(x)
            x = _maxpool2(x)
        x = DoubleConv(self.widths[-1], name="bottleneck")(x)
        if self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        for i, w in reversed(list(enumerate(self.widths[:-1]))):
            x = _upsample2(x)
            x = jnp.concatenate([x, skips[i]], axis=-1)
            x = DoubleConv(w, name=f"up{i}")(x)
        return nn.Conv(self.out_channels, (1, 1), name="head")(x)


class UNetDropout(UNet):
    dropout_rate: float = 0.5
