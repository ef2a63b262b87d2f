"""Flax model family: U-Nets, tiny CNN baselines, classical threshold baselines.

External protocol: batches are dicts with (B, C, H, W) float arrays (parity
with the reference batch protocol); internally all convs run NHWC (TPU-native
layout) — the boundary transposes fold into the first/last conv under XLA.
"""

from starcop_tpu.models.unet import UNet, UNetDropout  # noqa: F401
from starcop_tpu.models.mobilenet_unet import MobileNetV2UNet  # noqa: F401
from starcop_tpu.models.simple import SingleConv, SimpleCNN, SimpleCNNRegression  # noqa: F401
from starcop_tpu.models.segmenter import (  # noqa: F401
    SegmentationModel,
    cast_variables_for_inference,
    configure_architecture,
    differences,
    pred_classification,
)
from starcop_tpu.models.baselines import (  # noqa: F401
    Mag1cBaseline,
    SanchezBaseline,
    VaronBaseline,
)
