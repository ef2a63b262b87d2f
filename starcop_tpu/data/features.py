"""Feature registry and lazy product extraction.

Re-design of the reference FEATURES registry + ``extract_features``
(/root/reference/starcop/data/feature_extration.py:193-286): maps each derived
product name to its compute function and input band names; missing products
are computed from the chip folders and materialized next to their inputs.

All 16 registered products carry over (weight_mag1c, 3 AVIRIS ratios, 3 Varon
WV3 ratios, 2+2 Sanchez WV3 ratios, 1 learned-regression ratio, 4 S2->WV3
mixed ratios). Compute runs as jitted JAX ops batched per tile.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Sequence

import jax.numpy as jnp
import numpy as np

from starcop_tpu.ops.ratios import (
    ratio_2c_match_c_from_sums_outlier,
    ratio_mlr_local,
    weight_mag1c,
)

WV3_BANDS = [f"TOA_WV3_SWIR{w + 1}" for w in range(8)]
S2_BAND_NAMES = ["B1", "B2", "B3", "B4", "B5", "B6", "B7", "B8", "B8A", "B9", "B10", "B11", "B12"]
S2A_BANDS = [f"TOA_S2A_{b}" for b in S2_BAND_NAMES]
S2B_BANDS = [f"TOA_S2B_{b}" for b in S2_BAND_NAMES]


def _mlr_5in(*bands, division="c_matched_outliers"):
    return ratio_mlr_local(list(bands[:5]), bands[5], division=division)


def _mlr_9in(*bands, division="c_matched_outliers"):
    return ratio_mlr_local(list(bands[:9]), bands[9], division=division)


def _mlr_5in_simplediv(*bands):
    return ratio_mlr_local(list(bands[:5]), bands[5], division="simple_plus")


def _learned_ratio(*bands):
    """Learned-regression ratio (reference use_pretrained_model_b1to6_b8,
    feature_extration.py:127-175): reconstruct B8 from B1-B6 with a trained
    regression CNN, then c-matched ratio. The model comes from (first hit
    wins, mirroring the reference's lazy global-singleton load):

      1. an apply fn registered via ``register_learned_ratio_model``;
      2. a checkpoint path registered via
         ``register_learned_ratio_checkpoint`` (which config loading wires
         from ``dataset.learned_ratio_checkpoint`` / ``model.model_folder`` —
         see ``configure_learned_ratio_from_config``), built lazily here.
    """
    if _LEARNED_MODEL["apply"] is None and _LEARNED_MODEL["checkpoint"]:
        _LEARNED_MODEL["apply"] = _build_learned_apply(_LEARNED_MODEL["checkpoint"])
    if _LEARNED_MODEL["apply"] is None:
        raise RuntimeError(
            "Learned ratio requires a registered regression model: call "
            "starcop_tpu.data.features.register_learned_ratio_model(apply_fn), "
            "register_learned_ratio_checkpoint(path), or set the "
            "dataset.learned_ratio_checkpoint config key"
        )
    inputs = jnp.stack(bands[:6])[None]  # (1, 6, H, W)
    recon = _LEARNED_MODEL["apply"](inputs)[0, 0]
    target = bands[6]
    r = ratio_2c_match_c_from_sums_outlier(target, recon, zero_value_out=-0.5)
    return jnp.where(target == 0.0, -0.5, r)


_LEARNED_MODEL: Dict[str, object] = {"apply": None, "checkpoint": None}

#: Experiment folder name of the reference's pretrained WV3 B1-6 -> B8
#: regressor (feature_extration.py:128: experiment_path
#: "wv3_cnn_v2_bands2band8only_60ep_512_l1/..."); used as the model_folder
#: auto-discovery subdirectory.
LEARNED_RATIO_EXPERIMENT = "wv3_cnn_v2_bands2band8only_60ep_512_l1"


def register_learned_ratio_model(apply_fn: Callable) -> None:
    """Register fn((1, 6, H, W)) -> (1, 1, H, W) for the learned-ratio product."""
    _LEARNED_MODEL["apply"] = apply_fn


def register_learned_ratio_checkpoint(path: str) -> None:
    """Record a regression checkpoint (npz/.pt/.ckpt file or experiment
    folder); the model is built lazily on first product use (the reference
    loads its GCS checkpoint the same way — feature_extration.py:129-147)."""
    _LEARNED_MODEL["checkpoint"] = path
    _LEARNED_MODEL["apply"] = None  # rebuild from the new checkpoint


def configure_learned_ratio_from_config(cfg) -> bool:
    """Wire the learned-ratio product from a Config: explicit
    ``dataset.learned_ratio_checkpoint`` wins; else auto-discover
    ``model.model_folder/<LEARNED_RATIO_EXPERIMENT>``. Returns True when a
    checkpoint was registered."""
    explicit = getattr(cfg.dataset, "learned_ratio_checkpoint", "")
    if explicit:
        register_learned_ratio_checkpoint(explicit)
        return True
    folder = getattr(cfg.model, "model_folder", "")
    if folder:
        candidate = os.path.join(folder, LEARNED_RATIO_EXPERIMENT)
        if os.path.isdir(candidate):
            register_learned_ratio_checkpoint(candidate)
            return True
    return False


def _build_learned_apply(path: str) -> Callable:
    """Build the (1, 6, H, W) -> (1, 1, H, W) apply from a checkpoint.

    The regressor consumes RAW band values and predicts the raw B8 band
    (RegressionModel(inhibit_normalisation=True) — the ratio downstream
    compares the reconstruction against the raw target band, so a
    normalized-domain output would change the product's scale)."""
    import jax

    from starcop_tpu.models.regression import RegressionModel
    from starcop_tpu.setup_shims import load_pretrained_variables

    model = RegressionModel(
        [f"TOA_WV3_SWIR{i}" for i in (1, 2, 3, 4, 5, 6)],
        ["TOA_WV3_SWIR8"],
        model_type="cnn_regression",
        inhibit_normalisation=True,
    )
    # npz-first folder resolution: the generic loader prefers torch .ckpt
    # files, whose porting path targets the U-Net layout — a regression CNN
    # checkpoint in this framework is an npz variable dump.
    if os.path.isdir(path):
        for candidate in ("best.npz", "final_checkpoint_model.npz", "model.npz"):
            p = os.path.join(path, candidate)
            if os.path.exists(p):
                path = p
                break
    variables = load_pretrained_variables(path)
    apply_jit = jax.jit(lambda x: model.apply(variables, x, train=False))
    return apply_jit


FEATURES: Dict[str, Dict] = {
    "weight_mag1c": {"function": weight_mag1c, "inputs": ["mag1c"]},
    # AVIRIS band ratios
    "ratio_aviris_2350_2310_out": {
        "function": ratio_2c_match_c_from_sums_outlier,
        "inputs": ["TOA_AVIRIS_2350nm", "TOA_AVIRIS_2310nm"],
    },
    "ratio_aviris_2350_2360_out": {
        "function": ratio_2c_match_c_from_sums_outlier,
        "inputs": ["TOA_AVIRIS_2350nm", "TOA_AVIRIS_2360nm"],
    },
    "ratio_aviris_2360_2310_out": {
        "function": ratio_2c_match_c_from_sums_outlier,
        "inputs": ["TOA_AVIRIS_2360nm", "TOA_AVIRIS_2310nm"],
    },
    # WV3 Varon-style ratios
    "ratio_wv3_B7_B5_varon21_sum_c_out": {
        "function": ratio_2c_match_c_from_sums_outlier,
        "inputs": ["TOA_WV3_SWIR7", "TOA_WV3_SWIR5"],
    },
    "ratio_wv3_B8_B5_varon21_sum_c_out": {
        "function": ratio_2c_match_c_from_sums_outlier,
        "inputs": ["TOA_WV3_SWIR8", "TOA_WV3_SWIR5"],
    },
    "ratio_wv3_B7_B6_varon21_sum_c_out": {
        "function": ratio_2c_match_c_from_sums_outlier,
        "inputs": ["TOA_WV3_SWIR7", "TOA_WV3_SWIR6"],
    },
    # WV3 Sanchez MLR ratios
    "ratio_wv3_B7_B7MLR_SanchezGarcia22_sum_c_out": {
        "function": _mlr_5in,
        "inputs": ["TOA_WV3_SWIR1", "TOA_WV3_SWIR2", "TOA_WV3_SWIR4", "TOA_WV3_SWIR5", "TOA_WV3_SWIR6", "TOA_WV3_SWIR7"],
    },
    "ratio_wv3_B8_B8MLR_SanchezGarcia22_sum_c_out": {
        "function": _mlr_5in,
        "inputs": ["TOA_WV3_SWIR1", "TOA_WV3_SWIR2", "TOA_WV3_SWIR4", "TOA_WV3_SWIR5", "TOA_WV3_SWIR6", "TOA_WV3_SWIR8"],
    },
    "ratio_wv3_B7_B7MLR_SanchezGarcia22_simplediv": {
        "function": _mlr_5in_simplediv,
        "inputs": ["TOA_WV3_SWIR1", "TOA_WV3_SWIR2", "TOA_WV3_SWIR4", "TOA_WV3_SWIR5", "TOA_WV3_SWIR6", "TOA_WV3_SWIR7"],
    },
    "ratio_wv3_B8_B8MLR_SanchezGarcia22_simplediv": {
        "function": _mlr_5in_simplediv,
        "inputs": ["TOA_WV3_SWIR1", "TOA_WV3_SWIR2", "TOA_WV3_SWIR4", "TOA_WV3_SWIR5", "TOA_WV3_SWIR6", "TOA_WV3_SWIR8"],
    },
    # Learned model ratio
    "ratio_lrn_bands2band8only_60ep_512_l1": {
        "function": _learned_ratio,
        "inputs": ["TOA_WV3_SWIR1", "TOA_WV3_SWIR2", "TOA_WV3_SWIR3", "TOA_WV3_SWIR4", "TOA_WV3_SWIR5", "TOA_WV3_SWIR6", "TOA_WV3_SWIR8"],
    },
    # Sanchez ratios simulated from S2 + one WV3 band
    "ratio_wv3_B7_B7MLR_fromS2_9bands_sum_c_out": {
        "function": _mlr_9in,
        "inputs": ["TOA_S2B_B2", "TOA_S2B_B3", "TOA_S2B_B4", "TOA_S2B_B5", "TOA_S2B_B6", "TOA_S2B_B7", "TOA_S2B_B8", "TOA_S2B_B8A", "TOA_S2B_B11", "TOA_WV3_SWIR7"],
    },
    "ratio_wv3_B7_B7MLR_fromS2_5bands_sum_c_out": {
        "function": _mlr_5in,
        "inputs": ["TOA_S2B_B2", "TOA_S2B_B3", "TOA_S2B_B4", "TOA_S2B_B8", "TOA_S2B_B11", "TOA_WV3_SWIR7"],
    },
    "ratio_wv3_B8_B8MLR_fromS2_9bands_sum_c_out": {
        "function": _mlr_9in,
        "inputs": ["TOA_S2B_B2", "TOA_S2B_B3", "TOA_S2B_B4", "TOA_S2B_B5", "TOA_S2B_B6", "TOA_S2B_B7", "TOA_S2B_B8", "TOA_S2B_B8A", "TOA_S2B_B11", "TOA_WV3_SWIR8"],
    },
    "ratio_wv3_B8_B8MLR_fromS2_5bands_sum_c_out": {
        "function": _mlr_5in,
        "inputs": ["TOA_S2B_B2", "TOA_S2B_B3", "TOA_S2B_B4", "TOA_S2B_B8", "TOA_S2B_B11", "TOA_WV3_SWIR8"],
    },
}

AVIRIS_WAVELENGTHS = list(range(376, 2501, 5))  # nominal AVIRIS-NG 5nm grid


def raw_bands_available() -> List[str]:
    """All raw product names (reference feature_extration.py:21-30)."""
    bands = [f"TOA_AVIRIS_{wv}nm" for wv in AVIRIS_WAVELENGTHS + [550, 640, 460]]
    bands.extend(WV3_BANDS)
    bands.extend(S2A_BANDS + S2B_BANDS)
    bands.extend(["mag1c", "labelbinary", "label_rgba"])
    return bands


def extract_features(features: Sequence[str], rows: Sequence[Dict]) -> int:
    """Compute and persist missing feature products for each tile folder.

    Mirrors reference ``extract_features`` (feature_extration.py:249-286):
    skips products that already exist; reads the input bands per tile; saves
    ``{folder}/{feature}.npy``. Returns the number of files written.
    """
    from starcop_tpu.data.dataset import _read_product

    written = 0
    for feature in features:
        if feature not in FEATURES:
            raise KeyError(f"Unknown feature: {feature}")
    for row in rows:
        folder = row["folder"]
        for feature in features:
            out_path = os.path.join(folder, f"{feature}.npy")
            if os.path.exists(out_path) or os.path.exists(out_path[:-4] + ".tif"):
                continue
            spec = FEATURES[feature]
            inputs = [jnp.asarray(_read_product(folder, p, None)) for p in spec["inputs"]]
            result = np.asarray(spec["function"](*inputs), np.float32)
            np.save(out_path, result)
            written += 1
    return written
