"""Segmentation model wrapper: network + normalizer + loss + prediction protocol.

Functional JAX re-design of the reference LightningModule
(/root/reference/starcop/models/model_module.py:24-269): holds a Flax network,
the frozen normalizer constants, and the weighted-BCE loss; exposes the same
``batch_with_preds`` protocol (prediction / pred_binary / differences /
pred_classification / per-pixel loss) consumed by the validation harness and
plotting. Everything is jittable; no framework magic.

Batch protocol (parity with the reference dataloaders): dict with
  input: (B, C, H, W) float    output: (B, 1, H, W) float
  weight_loss: (B, 1, H, W)    has_plume: (B,) bool/int    id: list[str]
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from starcop_tpu.data.normalizer import DataNormalizer
from starcop_tpu.models.mobilenet_unet import MobileNetV2UNet
from starcop_tpu.models.simple import SimpleCNN, SimpleCNNRegression, SingleConv
from starcop_tpu.models.unet import UNet, UNetDropout


def pred_classification(pred_binary: jax.Array) -> jax.Array:
    """Tile counts as "plume detected" if positive pixels > 10 * (H*W) / 64^2.

    The resolution-scaled 10-pixel rule (reference: model_module.py:210-212) —
    load-bearing for the published tile-classification numbers.
    """
    n_pixels = (10 * np.prod(pred_binary.shape[-2:])) / (64**2)
    return (jnp.sum(pred_binary, axis=(-1, -2)) > n_pixels).astype(jnp.int32)


def differences(y_pred_binary: jax.Array, y_gt: jax.Array) -> jax.Array:
    """2*pred + (gt==1): categorical {0 TN, 1 FN, 2 FP, 3 TP} map for plots."""
    return 2 * y_pred_binary.astype(jnp.int32) + (y_gt == 1).astype(jnp.int32)


def weighted_bce_with_logits(
    logits: jax.Array,
    targets: jax.Array,
    pos_weight: float = 1.0,
) -> jax.Array:
    """Per-element binary cross-entropy with logits and positive-class weight.

    Matches torch BCEWithLogitsLoss(pos_weight=w, reduction='none'):
      l = (1-y) * z - (1 + (w-1) y) * log(sigmoid(z)) ... computed stably:
      l = (1-y) * z + (1 + (w-1) y) * log(1 + exp(-z))
    """
    log_sig = jax.nn.log_sigmoid(logits)
    log_sig_neg = jax.nn.log_sigmoid(-logits)
    return -(pos_weight * targets * log_sig + (1.0 - targets) * log_sig_neg)


ARCHITECTURES: Dict[str, Callable[..., nn.Module]] = {
    "unet_semseg": lambda num_classes, settings=None, dtype=None: MobileNetV2UNet(num_classes=num_classes, dtype=dtype),
    "unet": lambda num_classes, settings=None, dtype=None: UNet(out_channels=num_classes),
    "unet_dropout": lambda num_classes, settings=None, dtype=None: UNetDropout(out_channels=num_classes),
    "cnn": lambda num_classes, settings=None, dtype=None: SimpleCNN(out_channels=num_classes),
    "single": lambda num_classes, settings=None, dtype=None: SingleConv(out_channels=num_classes),
    "cnn_regression": lambda num_classes, settings=None, dtype=None: SimpleCNNRegression(out_channels=num_classes),
}


def configure_architecture(architecture: str, num_classes: int, settings=None, dtype=None) -> nn.Module:
    """Architecture factory (reference: model_module.py:224-256).

    'unet_semseg' is the flagship (MobileNetV2-encoder U-Net, logits output).
    ``dtype`` selects the compute precision (e.g. jnp.bfloat16 for
    mixed-precision training; params and the loss stay float32).
    """
    if architecture not in ARCHITECTURES:
        raise ValueError(f"No model implemented for model_type: {architecture}")
    if dtype is not None and architecture != "unet_semseg":
        import warnings

        warnings.warn(
            f"model dtype={dtype} is only plumbed through 'unet_semseg'; "
            f"'{architecture}' will compute in float32"
        )
    return ARCHITECTURES[architecture](num_classes, settings, dtype=dtype)


def cast_variables_for_inference(variables, dtype=jnp.bfloat16):
    """Cast all float32 leaves of a variables pytree (params AND batch_stats)
    to ``dtype`` once, for a bf16-resident-weights inference configuration.

    Rationale: building the network with ``model_dtype=jnp.bfloat16`` alone
    makes every layer promote its float32 params to bf16 *per forward pass*
    (flax's dtype promotion) — at inference the conv weights then cross from
    HBM twice per layer (f32 read + cast). Casting the stored variables once
    removes the per-layer casts entirely and halves the weight DMA. Pair with
    a model constructed with ``model_dtype=jnp.bfloat16``; logits are still
    returned float32 (the network's final cast). Detection equivalence vs the
    f32 configuration is pinned by
    tests/test_models.py::test_bf16_resident_weights_inference.
    """
    def cast(p):
        return p.astype(dtype) if p.dtype == jnp.float32 else p

    return jax.tree.map(cast, variables)


class SegmentationModel:
    """Network + normalizer + loss, with a pure-functional parameter state.

    Construction only builds Python objects; ``init(rng, sample)`` creates the
    variables pytree. All compute methods are pure in (variables, batch) and
    jit/pjit-compatible.
    """

    def __init__(
        self,
        input_products: Sequence[str],
        output_products: Sequence[str] = ("labelbinary",),
        model_type: str = "unet_semseg",
        num_classes: int = 1,
        pos_weight: float = 1.0,
        use_weight_loss: bool = True,
        loss_name: str = "BCEWithLogitsLoss",
        model_dtype=None,
        encoder_weights: Optional[str] = "auto",
    ):
        self.input_products = list(input_products)
        self.output_products = list(output_products)
        self.normalizer = DataNormalizer(input_products, output_products)
        self.network = configure_architecture(model_type, num_classes, dtype=model_dtype)
        self.model_type = model_type
        self.num_classes = num_classes
        self.pos_weight = float(pos_weight)
        self.use_weight_loss = bool(use_weight_loss)
        self.loss_name = loss_name
        self.encoder_weights = encoder_weights
        self._jit_batch_with_preds = None

    # ------------------------------------------------------------- params
    def init(self, rng: jax.Array, sample_input: jax.Array) -> Dict[str, Any]:
        """Initialize variables from a sample (B, C, H, W) input.

        ImageNet encoder init (reference rule: ``encoder_weights='imagenet'``
        iff ``in_channels == 3`` — model_module.py:244-246): with the default
        ``encoder_weights='auto'``, a 3-channel unet_semseg model initializes
        its MobileNetV2 encoder from a torchvision ImageNet checkpoint when
        one is discoverable on disk (``torch_port.find_imagenet_mobilenet_v2``)
        and falls back to random init silently otherwise (zero-egress hosts
        can't download it). ``encoder_weights='imagenet'`` makes a missing
        checkpoint an error; ``encoder_weights=None`` disables porting.
        """
        x = self.normalizer.normalize_x(sample_input)
        variables = self.network.init(rng, self._to_nhwc(x), train=False)
        if (
            self.encoder_weights in ("auto", "imagenet")
            and self.model_type == "unet_semseg"
            and len(self.input_products) == 3
        ):
            from starcop_tpu.models.torch_port import (
                find_imagenet_mobilenet_v2,
                init_encoder_from_torchvision,
                load_torch_checkpoint,
            )

            ckpt = find_imagenet_mobilenet_v2()
            if ckpt is not None:
                variables = init_encoder_from_torchvision(
                    variables, load_torch_checkpoint(ckpt)
                )
            elif self.encoder_weights == "imagenet":
                raise FileNotFoundError(
                    "encoder_weights='imagenet' but no torchvision mobilenet_v2 "
                    "checkpoint found (set $STARCOP_TPU_IMAGENET_MOBILENETV2 or "
                    "populate the torch hub cache)"
                )
        return variables

    # -------------------------------------------------------------- fwd
    @staticmethod
    def _to_nhwc(x: jax.Array) -> jax.Array:
        return jnp.transpose(x, (0, 2, 3, 1))

    @staticmethod
    def _to_nchw(x: jax.Array) -> jax.Array:
        return jnp.transpose(x, (0, 3, 1, 2))

    def apply(
        self,
        variables: Dict[str, Any],
        x: jax.Array,
        train: bool = False,
        rngs: Optional[Dict[str, jax.Array]] = None,
    ):
        """Forward pass: normalize -> network. x: (B, C, H, W) -> (B, K, H, W) logits.

        In train mode returns (logits, new_batch_stats_variables).
        """
        xn = self._to_nhwc(self.normalizer.normalize_x(x))
        if train:
            out, updates = self.network.apply(
                variables, xn, train=True, mutable=["batch_stats"], rngs=rngs
            )
            return self._to_nchw(out), updates
        return self._to_nchw(self.network.apply(variables, xn, train=False))

    # -------------------------------------------------------------- loss
    def loss_fn(
        self,
        logits: jax.Array,
        y: jax.Array,
        weight_loss: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Weighted BCE (reference training_step semantics: per-pixel loss x
        weight_loss, then mean — model_module.py:72-88). For 'l1'/'mse' modes
        (regression), plain reductions."""
        y_norm = self.normalizer.normalize_y(y)
        if self.loss_name == "l1":
            return jnp.mean(jnp.abs(logits - y_norm))
        if self.loss_name == "mse":
            return jnp.mean((logits - y_norm) ** 2)
        per_pixel = weighted_bce_with_logits(logits, y_norm, self.pos_weight)
        if self.use_weight_loss and weight_loss is not None:
            return jnp.mean(per_pixel * weight_loss)
        return jnp.mean(per_pixel)

    # ---------------------------------------------------------- protocol
    def batch_with_preds(self, variables: Dict[str, Any], batch: Dict[str, Any]) -> Dict[str, Any]:
        """Enrich a batch with predictions (reference: model_module.py:191-208).

        Adds input_norm, output_norm, logits, prediction (sigmoid), pred_binary
        (>0.5), differences, pred_classification, and per-pixel losses.
        """
        if self._jit_batch_with_preds is None:
            self._jit_batch_with_preds = jax.jit(self._batch_with_preds_impl)
        arrays = {k: batch[k] for k in ("input", "output", "weight_loss") if k in batch}
        out = self._jit_batch_with_preds(variables, arrays)
        enriched = dict(batch)
        enriched.update(out)
        return enriched

    def _batch_with_preds_impl(self, variables, arrays):
        x, y = arrays["input"], arrays["output"]
        logits = self.apply(variables, x, train=False)
        pred = jax.nn.sigmoid(logits)
        out = {
            "input_norm": self.normalizer.normalize_x(x),
            "output_norm": self.normalizer.normalize_y(y),
            "logits": logits,
            "prediction": pred,
            "pred_binary": (pred > 0.5).astype(jnp.int32),
        }
        if self.use_weight_loss and self.loss_name == "BCEWithLogitsLoss":
            per_pixel = weighted_bce_with_logits(logits, out["output_norm"], self.pos_weight)
            out["loss_per_pixel"] = per_pixel
            if "weight_loss" in arrays:
                out["loss_per_pixel_weighted"] = arrays["weight_loss"] * per_pixel
        out["differences"] = differences(out["pred_binary"], out["output_norm"].astype(jnp.int32))
        out["pred_classification"] = pred_classification(out["pred_binary"])
        return out
