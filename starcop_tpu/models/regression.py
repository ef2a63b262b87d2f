"""Regression model wrapper (band-value regression).

Parity with the reference ModelModuleRegression
(/root/reference/starcop/models/model_module_regression.py:16-205): same
skeleton as the segmentation wrapper but with l1/mse losses, a
``regression_output`` protocol (no sigmoid/threshold), and the
``inhibit_normalisation`` flag used when training the learned-ratio WV3
regressors on raw band values.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from starcop_tpu.data.normalizer import DataNormalizer
from starcop_tpu.models.segmenter import configure_architecture


class RegressionModel:
    """Network + (optional) normalizer for band-value regression."""

    def __init__(
        self,
        input_products: Sequence[str],
        output_products: Sequence[str],
        model_type: str = "cnn_regression",
        num_outputs: int = 1,
        loss_name: str = "l1",
        inhibit_normalisation: bool = False,
    ):
        self.input_products = list(input_products)
        self.output_products = list(output_products)
        self.normalizer = None if inhibit_normalisation else DataNormalizer(
            input_products, output_products
        )
        self.network = configure_architecture(model_type, num_outputs)
        self.loss_name = loss_name
        self._jit_batch_with_preds = None

    def init(self, rng: jax.Array, sample_input: jax.Array) -> Dict[str, Any]:
        x = self._normalize_x(sample_input)
        return self.network.init(rng, jnp.transpose(x, (0, 2, 3, 1)), train=False)

    def _normalize_x(self, x):
        return x if self.normalizer is None else self.normalizer.normalize_x(x)

    def _normalize_y(self, y):
        return y if self.normalizer is None else self.normalizer.normalize_y(y)

    def apply(self, variables, x, train: bool = False, rngs=None):
        xn = jnp.transpose(self._normalize_x(x), (0, 2, 3, 1))
        if train:
            out, updates = self.network.apply(
                variables, xn, train=True, mutable=["batch_stats"], rngs=rngs
            )
            return jnp.transpose(out, (0, 3, 1, 2)), updates
        return jnp.transpose(self.network.apply(variables, xn, train=False), (0, 3, 1, 2))

    def loss_fn(self, prediction, y, weight_loss=None):
        y_norm = self._normalize_y(y)
        if self.loss_name == "mse":
            per = (prediction - y_norm) ** 2
        else:
            per = jnp.abs(prediction - y_norm)
        if weight_loss is not None:
            per = per * weight_loss
        return jnp.mean(per)

    def batch_with_preds(self, variables: Dict[str, Any], batch: Dict[str, Any]) -> Dict[str, Any]:
        if self._jit_batch_with_preds is None:
            def impl(variables, arrays):
                pred = self.apply(variables, arrays["input"], train=False)
                out = {
                    "prediction": pred,
                    "output_norm": self._normalize_y(arrays["output"]),
                }
                out["residual"] = out["prediction"] - out["output_norm"]
                return out

            self._jit_batch_with_preds = jax.jit(impl)
        arrays = {k: batch[k] for k in ("input", "output") if k in batch}
        enriched = dict(batch)
        enriched.update(self._jit_batch_with_preds(variables, arrays))
        return enriched
