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
    regression CNN, then c-matched ratio. Requires a trained
    ``SimpleCNNRegression`` checkpoint registered via
    ``register_learned_ratio_model``."""
    if _LEARNED_MODEL["apply"] is None:
        raise RuntimeError(
            "Learned ratio requires a registered regression model: call "
            "starcop_tpu.data.features.register_learned_ratio_model(apply_fn)"
        )
    inputs = jnp.stack(bands[:6])[None]  # (1, 6, H, W)
    recon = _LEARNED_MODEL["apply"](inputs)[0, 0]
    target = bands[6]
    r = ratio_2c_match_c_from_sums_outlier(target, recon, zero_value_out=-0.5)
    return jnp.where(target == 0.0, -0.5, r)


_LEARNED_MODEL: Dict[str, Callable] = {"apply": None}


def register_learned_ratio_model(apply_fn: Callable) -> None:
    """Register fn((1, 6, H, W)) -> (1, 1, H, W) for the learned-ratio product."""
    _LEARNED_MODEL["apply"] = apply_fn


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
