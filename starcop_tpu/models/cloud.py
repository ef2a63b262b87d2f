"""Sentinel-2 cloud detection model.

Parity with the reference CDModel (/root/reference/starcop/sentinel2/models.py:55-89):
a CloudSEN12-style ``smp.Unet(mobilenet_v2, in_channels=13, classes=4)`` whose
predict is an argmax over {clear, thick cloud, thin cloud, shadow}, with
reflect-padded whole-scene inference. Used to mask clouds in the Sentinel-2
experiments.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from starcop_tpu.models.mobilenet_unet import MobileNetV2UNet
from starcop_tpu.ops.padding import padded_apply

CLOUD_CLASSES = ("clear", "thick_cloud", "thin_cloud", "cloud_shadow")


class CloudDetector:
    """13-band S2 input -> 4-class cloud mask."""

    def __init__(self, num_bands: int = 13, num_classes: int = 4):
        self.network = MobileNetV2UNet(num_classes=num_classes)
        self.num_bands = num_bands
        self._jit_forward = None

    def init(self, rng: jax.Array, sample_nchw: jax.Array) -> Dict[str, Any]:
        return self.network.init(rng, jnp.transpose(sample_nchw, (0, 2, 3, 1)), train=False)

    def logits(self, variables, x_nchw: jax.Array) -> jax.Array:
        out = self.network.apply(variables, jnp.transpose(x_nchw, (0, 2, 3, 1)), train=False)
        return jnp.transpose(out, (0, 3, 1, 2))

    def predict(self, variables, x_nchw: jax.Array) -> jax.Array:
        """(B, 13, H, W) -> (B, H, W) int class map (argmax over classes)."""
        if self._jit_forward is None:
            self._jit_forward = jax.jit(self.logits)
        return jnp.argmax(self._jit_forward(variables, x_nchw), axis=1)

    def predict_scene(self, variables, scene_chw: jax.Array) -> jax.Array:
        """Whole-scene prediction with reflect padding to x32 (padded_predict)."""
        logits = padded_apply(scene_chw, lambda b: self.logits(variables, b), divisor=32)
        return jnp.argmax(logits, axis=0)
