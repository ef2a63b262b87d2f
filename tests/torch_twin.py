"""Torch twin of MobileNetV2UNet with smp-compatible state_dict names.

Used as the oracle for weight-port forward parity: we build this torch model
(same architecture spec: torchvision MobileNetV2 encoder + smp U-Net decoder,
with the exact smp parameter naming), port its random weights through
``port_smp_mobilenetv2_unet``, and require logits parity with the Flax model.

This is test-only code — the framework itself never imports torch.
"""

import torch
import torch.nn as nn

CFG = [
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
]


def conv_bn_relu(inp, oup, kernel, stride=1, groups=1):
    return nn.Sequential(
        nn.Conv2d(inp, oup, kernel, stride, kernel // 2, groups=groups, bias=False),
        nn.BatchNorm2d(oup, eps=1e-5, momentum=0.1),
        nn.ReLU6(inplace=True),
    )


class InvertedResidual(nn.Module):
    def __init__(self, inp, oup, stride, expand_ratio):
        super().__init__()
        self.use_res = stride == 1 and inp == oup
        hidden = inp * expand_ratio
        layers = []
        if expand_ratio != 1:
            layers.append(conv_bn_relu(inp, hidden, 1))
        layers.extend(
            [
                conv_bn_relu(hidden, hidden, 3, stride, groups=hidden),
                nn.Conv2d(hidden, oup, 1, bias=False),
                nn.BatchNorm2d(oup, eps=1e-5, momentum=0.1),
            ]
        )
        self.conv = nn.Sequential(*layers)

    def forward(self, x):
        out = self.conv(x)
        return x + out if self.use_res else out


class MobileNetV2Features(nn.Module):
    """torchvision-style `.features` with smp stage splits [2, 4, 7, 14]."""

    def __init__(self, in_channels=3):
        super().__init__()
        feats = [conv_bn_relu(in_channels, 32, 3, stride=2)]
        inp = 32
        for t, c, n, s in CFG:
            for i in range(n):
                feats.append(InvertedResidual(inp, c, s if i == 0 else 1, t))
                inp = c
        feats.append(conv_bn_relu(inp, 1280, 1))
        self.features = nn.Sequential(*feats)

    def forward(self, x):
        outs = []
        for i, layer in enumerate(self.features):
            if i in (2, 4, 7, 14):
                outs.append(x)
            x = layer(x)
        outs.append(x)
        return outs  # [16@s2, 24@s4, 32@s8, 96@s16, 1280@s32]


class DecoderBlock(nn.Module):
    def __init__(self, in_ch, skip_ch, out_ch):
        super().__init__()
        self.conv1 = nn.Sequential(
            nn.Conv2d(in_ch + skip_ch, out_ch, 3, padding=1, bias=False),
            nn.BatchNorm2d(out_ch, eps=1e-5),
            nn.ReLU(inplace=True),
        )
        self.conv2 = nn.Sequential(
            nn.Conv2d(out_ch, out_ch, 3, padding=1, bias=False),
            nn.BatchNorm2d(out_ch, eps=1e-5),
            nn.ReLU(inplace=True),
        )

    def forward(self, x, skip=None):
        x = torch.nn.functional.interpolate(x, scale_factor=2, mode="nearest")
        if skip is not None:
            x = torch.cat([x, skip], dim=1)
        return self.conv2(self.conv1(x))


class Decoder(nn.Module):
    def __init__(self):
        super().__init__()
        in_chs = [1280, 256, 128, 64, 32]
        skip_chs = [96, 32, 24, 16, 0]
        out_chs = [256, 128, 64, 32, 16]
        self.blocks = nn.ModuleList(
            [DecoderBlock(i, s, o) for i, s, o in zip(in_chs, skip_chs, out_chs)]
        )

    def forward(self, feats):
        skips = feats[:-1][::-1]
        x = feats[-1]
        for i, block in enumerate(self.blocks):
            x = block(x, skips[i] if i < len(skips) else None)
        return x


class TorchMobileNetV2UNet(nn.Module):
    """state_dict names: encoder.features.*, decoder.blocks.*, segmentation_head.0."""

    def __init__(self, in_channels=4, classes=1):
        super().__init__()
        self.encoder = MobileNetV2Features(in_channels)
        self.decoder = Decoder()
        self.segmentation_head = nn.Sequential(nn.Conv2d(16, classes, 3, padding=1))

    def forward(self, x):
        return self.segmentation_head(self.decoder(self.encoder(x)))
