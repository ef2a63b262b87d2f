"""MobileNetV2-encoder U-Net — the flagship segmentation architecture.

Structural parity with the reference's ``smp.Unet(encoder_name='mobilenet_v2',
classes=1, activation=None)`` (/root/reference/starcop/models/model_module.py:238-251):

  * Encoder: torchvision-style MobileNetV2 feature extractor with the standard
    stage split at feature indices [2, 4, 7, 14] giving skip channels
    (16, 24, 32, 96) at strides (2, 4, 8, 16) and a 1280-channel stride-32 head.
  * Decoder: 5 blocks of [nearest x2 upsample -> concat skip -> (conv3x3 + BN +
    ReLU) x 2] with channels (256, 128, 64, 32, 16); the last block has no skip.
  * Head: conv3x3 -> ``num_classes`` logits (no activation).

The module tree is named so that a released torch checkpoint (Lightning
state_dict of smp.Unet) maps 1:1 onto the param pytree — see
``starcop_tpu.models.torch_port``. Layout is NHWC; BatchNorm runs in inference
mode by default (``train=True`` enables batch-stats updates, mutable
collection "batch_stats").
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# (expansion t, out channels c, repeats n, stride s) — the MobileNetV2 paper's
# bottleneck configuration table.
_INVERTED_RESIDUAL_CFG: Tuple[Tuple[int, int, int, int], ...] = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)

# Feature indices after which an encoder stage ends (torchvision numbering):
# features[0] conv stem, features[1..17] inverted residuals, features[18] 1x1.
_STAGE_SPLITS = (2, 4, 7, 14)  # -> channels 16, 24, 32, 96
ENCODER_CHANNELS = (16, 24, 32, 96, 1280)
DECODER_CHANNELS = (256, 128, 64, 32, 16)


def relu6(x):
    return jnp.minimum(nn.relu(x), 6.0)


class ConvBNReLU(nn.Module):
    """conv -> BN -> ReLU6 (torchvision ConvBNActivation)."""

    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    dtype: Any = None  # compute dtype (params stay f32); None = f32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(self.kernel // 2, self.kernel // 2)] * 2,
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn")(x)
        return relu6(x)


class InvertedResidual(nn.Module):
    """MobileNetV2 bottleneck: expand 1x1 -> depthwise 3x3 -> project 1x1."""

    out_features: int
    stride: int
    expand_ratio: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_features = x.shape[-1]
        hidden = in_features * self.expand_ratio
        use_res = self.stride == 1 and in_features == self.out_features
        h = x
        if self.expand_ratio != 1:
            h = ConvBNReLU(hidden, kernel=1, dtype=self.dtype, name="expand")(h, train)
        h = ConvBNReLU(hidden, kernel=3, stride=self.stride, groups=hidden,
                       dtype=self.dtype, name="depthwise")(h, train)
        h = nn.Conv(self.out_features, (1, 1), use_bias=False, dtype=self.dtype, name="project")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="project_bn")(h)
        return x + h if use_res else h


class MobileNetV2Encoder(nn.Module):
    """Feature extractor emitting the 5 U-Net skip/head tensors."""

    width_mult: float = 1.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        features = []
        stage_splits = set(_STAGE_SPLITS)
        idx = 0

        h = ConvBNReLU(32, kernel=3, stride=2, dtype=self.dtype, name=f"features_{idx}")(x, train)
        idx += 1

        for t, c, n, s in _INVERTED_RESIDUAL_CFG:
            for i in range(n):
                if idx in stage_splits:
                    features.append(h)
                h = InvertedResidual(
                    c, stride=s if i == 0 else 1, expand_ratio=t, dtype=self.dtype,
                    name=f"features_{idx}"
                )(h, train)
                idx += 1

        h = ConvBNReLU(1280, kernel=1, dtype=self.dtype, name=f"features_{idx}")(h, train)
        features.append(h)
        return features  # [16@s2, 24@s4, 32@s8, 96@s16, 1280@s32]


class Conv2dReLU(nn.Module):
    """conv3x3 -> BN -> ReLU (smp decoder building block)."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class DecoderBlock(nn.Module):
    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, skip=None, train: bool = False):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")
        if skip is not None:
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        x = Conv2dReLU(self.features, dtype=self.dtype, name="conv1")(x, train)
        x = Conv2dReLU(self.features, dtype=self.dtype, name="conv2")(x, train)
        return x


class MobileNetV2UNet(nn.Module):
    """The flagship model ("HyperSTARCOP"/"MultiSTARCOP" capability class).

    Input NHWC (any channel count — normalized products), output NHWC logits
    with ``num_classes`` channels. H and W must be multiples of 32 (use
    ``starcop_tpu.ops.padding.padded_apply`` for arbitrary scenes).
    """

    num_classes: int = 1
    decoder_channels: Sequence[int] = DECODER_CHANNELS
    dtype: Any = None  # compute dtype (e.g. jnp.bfloat16); params stay f32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        feats = MobileNetV2Encoder(dtype=self.dtype, name="encoder")(x, train)
        skips = feats[:-1][::-1]  # [96@s16, 32@s8, 24@s4, 16@s2]
        h = feats[-1]
        for i, ch in enumerate(self.decoder_channels):
            skip = skips[i] if i < len(skips) else None
            h = DecoderBlock(ch, dtype=self.dtype, name=f"decoder_{i}")(h, skip, train)
        logits = nn.Conv(self.num_classes, (3, 3), padding="SAME",
                         dtype=self.dtype, name="segmentation_head")(h)
        return logits.astype(jnp.float32)
