"""Per-product band normalization.

The normalization table maps each product to {offset, factor, clip}; inputs are
normalized as ``clip((x - offset) / factor, lo, hi)``. Constants carry the
reference's published values (/root/reference/starcop/data/normalizer_module.py:7-74) —
they are load-bearing for checkpoint parity (e.g. mag1c factor 1750, AVIRIS RGB
factor 60).

TPU design: the normalizer is a frozen pytree of per-channel constants applied
as a fused elementwise op inside the jitted forward pass (it rides along in
checkpoints as part of the model state, like the reference's frozen
nn.Parameters).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_TOA_UNIT = {"offset": 0.0, "factor": 1.0, "clip": (0.0, 2.0)}

BAND_NORMALIZATION: Dict[str, Dict] = {}

# All S2A/S2B TOA bands and WV3 SWIR bands: unit factor, clip [0, 2].
for _b in ["B1", "B2", "B3", "B4", "B5", "B6", "B7", "B8", "B8A", "B9", "B10", "B11", "B12"]:
    BAND_NORMALIZATION[f"TOA_S2A_{_b}"] = dict(_TOA_UNIT)
    BAND_NORMALIZATION[f"TOA_S2B_{_b}"] = dict(_TOA_UNIT)
for _i in range(1, 9):
    BAND_NORMALIZATION[f"TOA_WV3_SWIR{_i}"] = dict(_TOA_UNIT)

BAND_NORMALIZATION.update(
    {
        "TOA_AVIRIS_550nm": {"offset": 0.0, "factor": 60.0, "clip": (0.0, 2.0)},
        "TOA_AVIRIS_640nm": {"offset": 0.0, "factor": 60.0, "clip": (0.0, 2.0)},
        "TOA_AVIRIS_460nm": {"offset": 0.0, "factor": 60.0, "clip": (0.0, 2.0)},
        "TOA_AVIRIS_2004nm": {"offset": 0.0, "factor": 1.0, "clip": (0.0, 2.0)},
        "TOA_AVIRIS_2109nm": {"offset": 0.0, "factor": 5.0, "clip": (0.0, 2.0)},
        "TOA_AVIRIS_2310nm": {"offset": 0.0, "factor": 4.0, "clip": (0.0, 2.0)},
        "TOA_AVIRIS_2350nm": {"offset": 0.0, "factor": 3.0, "clip": (0.0, 2.0)},
        "TOA_AVIRIS_2360nm": {"offset": 0.0, "factor": 3.0, "clip": (0.0, 2.0)},
        "mag1c": {"offset": 0.0, "factor": 1750.0, "clip": (0.0, 2.0)},
        "ratio_aviris_2350_2310_out": {"offset": 0.0, "factor": 0.0625, "clip": (-2.0, 2.0)},
        "ratio_aviris_2350_2360_out": {"offset": 0.0, "factor": 0.0625, "clip": (-2.0, 2.0)},
        "ratio_aviris_2360_2310_out": {"offset": 0.0, "factor": 0.0625, "clip": (-2.0, 2.0)},
        "ratio_wv3_B7_B5_varon21_sum_c_out": {"offset": 0.0, "factor": 0.04, "clip": (-2.0, 2.0)},
        "ratio_wv3_B8_B5_varon21_sum_c_out": {"offset": 0.0, "factor": 0.1, "clip": (-2.0, 2.0)},
        "ratio_wv3_B7_B6_varon21_sum_c_out": {"offset": 0.0, "factor": 0.1, "clip": (-2.0, 2.0)},
        "ratio_wv3_B7_B7MLR_SanchezGarcia22_sum_c_out": {"offset": 0.0, "factor": 0.025, "clip": (-2.0, 2.0)},
        "ratio_wv3_B8_B8MLR_SanchezGarcia22_sum_c_out": {"offset": 0.0, "factor": 0.0769, "clip": (-2.0, 2.0)},
        "ratio_wv3_B7_B7MLR_SanchezGarcia22_simplediv": {"offset": 0.0, "factor": 1.0, "clip": (-2.0, 2.0)},
        "ratio_wv3_B8_B8MLR_SanchezGarcia22_simplediv": {"offset": -0.5, "factor": 1.0, "clip": (-2.0, 2.0)},
        "ratio_lrn_bands2band8only_60ep_512_l1": {"offset": 0.0, "factor": 0.5, "clip": (-2.0, 2.0)},
        "ratio_wv3_B7_B7MLR_fromS2_9bands_sum_c_out": {"offset": 0.0, "factor": 1.0, "clip": (-2.0, 2.0)},
        "ratio_wv3_B7_B7MLR_fromS2_5bands_sum_c_out": {"offset": 0.0, "factor": 0.1111111, "clip": (-2.0, 2.0)},
        "ratio_wv3_B8_B8MLR_fromS2_9bands_sum_c_out": {"offset": 0.0, "factor": 0.125, "clip": (-2.0, 2.0)},
        "ratio_wv3_B8_B8MLR_fromS2_5bands_sum_c_out": {"offset": 0.0, "factor": 0.1666666, "clip": (-2.0, 2.0)},
    }
)


class DataNormalizer:
    """Frozen per-channel normalization constants for input/output products.

    Unknown products warn and fall back to identity with clip [-10, 10]
    (reference semantics: normalizer_module.py:88-93). Arrays are laid out
    (C, 1, 1) so normalization broadcasts over (..., C, H, W) batches and fuses
    into the first conv under jit.
    """

    def __init__(self, input_products: Sequence[str], output_products: Sequence[str] = ("labelbinary",)):
        self.input_products = list(input_products)
        self.output_products = list(output_products)
        off, fac, cmin, cmax = [], [], [], []
        for p in self.input_products:
            if p not in BAND_NORMALIZATION:
                import warnings

                warnings.warn(
                    f"Product {p} has no band-normalization entry. "
                    f"It will not be normalized BUT it will be clipped to [-10, 10]"
                )
                off.append(0.0), fac.append(1.0), cmin.append(-10.0), cmax.append(10.0)
            else:
                e = BAND_NORMALIZATION[p]
                off.append(e["offset"]), fac.append(e["factor"])
                cmin.append(e["clip"][0]), cmax.append(e["clip"][1])
        shape = (len(self.input_products), 1, 1)
        self.offsets_input = np.asarray(off, np.float32).reshape(shape)
        self.factors_input = np.asarray(fac, np.float32).reshape(shape)
        self.clip_min_input = np.asarray(cmin, np.float32).reshape(shape)
        self.clip_max_input = np.asarray(cmax, np.float32).reshape(shape)

        out_entries = [BAND_NORMALIZATION[p] for p in self.output_products if p in BAND_NORMALIZATION]
        if out_entries:
            if len(out_entries) != len(self.output_products):
                raise ValueError("Some output products don't have normalization. CHECK!")
            oshape = (len(out_entries), 1, 1)
            self.offsets_output = np.asarray([e["offset"] for e in out_entries], np.float32).reshape(oshape)
            self.factors_output = np.asarray([e["factor"] for e in out_entries], np.float32).reshape(oshape)
            self.clip_min_output = np.asarray([e["clip"][0] for e in out_entries], np.float32).reshape(oshape)
            self.clip_max_output = np.asarray([e["clip"][1] for e in out_entries], np.float32).reshape(oshape)
        else:
            self.factors_output = None
            self.offsets_output = None

    def normalize_x(self, x: jax.Array) -> jax.Array:
        return jnp.clip(
            (x - self.offsets_input) / self.factors_input,
            self.clip_min_input,
            self.clip_max_input,
        ).astype(jnp.float32)

    def denormalize_x(self, x: jax.Array) -> jax.Array:
        return x * self.factors_input + self.offsets_input

    def normalize_y(self, y: jax.Array) -> jax.Array:
        if self.factors_output is None:
            return y
        return jnp.clip(
            (y - self.offsets_output) / self.factors_output,
            self.clip_min_output,
            self.clip_max_output,
        )

    def denormalize_y(self, y: jax.Array) -> jax.Array:
        if self.factors_output is None:
            return y
        return y * self.factors_output + self.offsets_output

    # Make the constants checkpointable as a pytree leaf dict.
    def state_dict(self) -> Dict[str, np.ndarray]:
        d = {
            "offsets_input": self.offsets_input,
            "factors_input": self.factors_input,
            "clip_min_input": self.clip_min_input,
            "clip_max_input": self.clip_max_input,
        }
        if self.factors_output is not None:
            d.update(
                offsets_output=self.offsets_output,
                factors_output=self.factors_output,
                clip_min_output=self.clip_min_output,
                clip_max_output=self.clip_max_output,
            )
        return d
