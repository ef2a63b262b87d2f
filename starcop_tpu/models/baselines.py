"""Classical thresholding baselines sharing the ``batch_with_preds`` protocol.

Parity with the reference baselines (/root/reference/starcop/baselines.py:31-200):
  * Mag1cBaseline  — mag1c channel > 500, then binary opening (cross kernel).
  * SanchezBaseline — normalized Sanchez MLR ratio > 0.05 (+ opening).
  * VaronBaseline  — normalized Varon band ratio > 0.05 (+ opening).

All thresholding + morphology is jittable; ``apply_threshold`` exists so the
validation harness can sweep thresholds against the raw prediction exactly as
it does for learned models.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from starcop_tpu.data.normalizer import DataNormalizer
from starcop_tpu.models.segmenter import differences, pred_classification
from starcop_tpu.ops.morphology import binary_opening


class _ThresholdBaseline:
    """Shared protocol: select one input channel, threshold, open, classify."""

    band_name: str
    use_normalisation: bool = True

    def __init__(
        self,
        input_products: List[str],
        threshold: float,
        use_normalisation: bool = True,
        use_morphological_ops: bool = True,
    ):
        self.input_products = list(input_products)
        self.band_index = self.input_products.index(self.band_name)
        self.threshold = float(threshold)
        self.use_normalisation = use_normalisation
        self.use_morphological_ops = use_morphological_ops
        self.normalizer = DataNormalizer(input_products, ["labelbinary"])

    def forward(self, x: jax.Array) -> jax.Array:
        return x[:, self.band_index : self.band_index + 1]

    def apply_threshold(self, pred: jax.Array, threshold: float) -> jax.Array:
        thresholded = pred > threshold
        if self.use_morphological_ops:
            return binary_opening(thresholded[:, 0]).astype(jnp.int32)[:, None]
        return thresholded.astype(jnp.int32)

    def batch_with_preds(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        batch = dict(batch)
        batch["input_norm"] = self.normalizer.normalize_x(batch["input"])
        batch["output_norm"] = self.normalizer.normalize_y(batch["output"])
        source = batch["input_norm"] if self.use_normalisation else batch["input"]
        pred = self.forward(source)
        batch["prediction"] = pred
        batch["pred_binary"] = self.apply_threshold(pred, self.threshold)
        batch["differences"] = differences(
            batch["pred_binary"], batch["output_norm"].astype(jnp.int32)
        )
        batch["pred_classification"] = pred_classification(batch["pred_binary"])
        return batch


class Mag1cBaseline(_ThresholdBaseline):
    """mag1c > 500 (un-normalized) with morphological opening."""

    band_name = "mag1c"

    def __init__(self, input_products: List[str], mag1c_threshold: float = 500.0):
        super().__init__(input_products, mag1c_threshold, use_normalisation=False)


class SanchezBaseline(_ThresholdBaseline):
    """Sanchez MLR ratio ('B8 against the MLR of B1-B6') > 0.05, normalized."""

    band_name = "ratio_wv3_B8_B8MLR_SanchezGarcia22_sum_c_out"

    def __init__(
        self,
        input_products: List[str],
        baseline_threshold: float = 0.05,
        use_normalisation: bool = True,
        use_morphological_ops: bool = True,
        band_name: str = None,
    ):
        if band_name is not None:
            self.band_name = band_name
        super().__init__(
            input_products, baseline_threshold, use_normalisation, use_morphological_ops
        )


class VaronBaseline(_ThresholdBaseline):
    """Varon B7/B5 band ratio > 0.05, normalized."""

    band_name = "ratio_wv3_B7_B5_varon21_sum_c_out"

    def __init__(
        self,
        input_products: List[str],
        baseline_threshold: float = 0.05,
        use_normalisation: bool = True,
        use_morphological_ops: bool = True,
    ):
        super().__init__(
            input_products, baseline_threshold, use_normalisation, use_morphological_ops
        )
