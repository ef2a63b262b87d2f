"""Chip dataset: windowed per-product reads from the chip-folder layout.

Functional re-design of the reference STARCOPDataset
(/root/reference/starcop/data/dataset.py:11-102): each index row points at a
tile folder holding one file per product; a sample stacks the requested
input/output/weight products into (C, H, W) float arrays, optionally random-
crops to the training window, and applies joint geometric augmentation.

Storage backends:
  * ``.npy`` per product (the fast synthetic/test format);
  * ``.tif`` per product via the framework's own GeoTIFF codec
    (``starcop_tpu.data.geotiff``) — the reference's COG chip layout
    (sampling_dataset.py:358-394), same window semantics, geo metadata
    preserved.

The reader is host-side numpy by design: chips feed a prefetched host->device
pipeline; all math after batching happens on TPU.
"""

from __future__ import annotations

import csv
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def read_index_csv(path: str) -> List[Dict]:
    with open(path, newline="") as fh:
        rows = list(csv.DictReader(fh))
    for r in rows:
        for k in ("window_col_off", "window_row_off", "window_width", "window_height"):
            if k in r and r[k] != "":
                r[k] = int(float(r[k]))
        if "has_plume" in r:
            r["has_plume"] = str(r["has_plume"]).lower() in ("true", "1", "yes")
        if "qplume" in r and r["qplume"] != "":
            r["qplume"] = float(r["qplume"])
    return rows


def _read_product(folder: str, product: str, window: Optional[Tuple[int, int, int, int]]) -> np.ndarray:
    """Read one product raster, optionally windowed (col_off, row_off, w, h)."""
    from starcop_tpu.data.geotiff import find_raster, load_raster

    path = find_raster(folder, product)
    if path is None:
        raise FileNotFoundError(f"No {product}.tif/.npy in {folder}")
    return np.asarray(load_raster(path, window=window), np.float32)


class ChipDataset:
    """Index-row-driven chip dataset with the reference batch protocol.

    Returns dict samples: input (C, H, W), output (1, H, W), weight_loss
    (1, H, W) if configured, id, has_plume. RGB-AVIRIS convenience (/50 like
    the reference dataset.py:91) applies when ``add_rgb_aviris``.
    """

    RGB_AVIRIS = ("TOA_AVIRIS_640nm", "TOA_AVIRIS_550nm", "TOA_AVIRIS_460nm")

    def __init__(
        self,
        rows: Sequence[Dict],
        input_products: Sequence[str],
        output_products: Sequence[str] = ("labelbinary",),
        weight_loss_product: Optional[str] = "weight_mag1c",
        window_size_sample: Optional[Tuple[int, int]] = None,
        augment: bool = False,
        extra_products: Sequence[str] = (),
        add_rgb_aviris: bool = False,
        seed: int = 0,
    ):
        self.rows = list(rows)
        self.input_products = list(input_products)
        self.output_products = list(output_products)
        self.weight_loss_product = weight_loss_product
        self.window_size_sample = window_size_sample
        self.augment = augment
        self.extra_products = list(extra_products)
        self.add_rgb_aviris = add_rgb_aviris
        # BatchLoader reads samples from a thread pool; numpy Generators are
        # not thread-safe, so each thread gets its own child generator.
        self._seed_seq = np.random.SeedSequence(seed)
        self._local = None

    @property
    def _rng(self) -> np.random.Generator:
        import threading

        if self._local is None:
            self._local = threading.local()
        if not hasattr(self._local, "rng"):
            self._local.rng = np.random.default_rng(self._seed_seq.spawn(1)[0])
        return self._local.rng

    def add_extra_products(self, products: Sequence[str]):
        for p in products:
            if p not in self.extra_products:
                self.extra_products.append(p)

    def __len__(self) -> int:
        return len(self.rows)

    def _window(self, row: Dict) -> Optional[Tuple[int, int, int, int]]:
        if "window_col_off" in row:
            return (
                row["window_col_off"],
                row["window_row_off"],
                row["window_width"],
                row["window_height"],
            )
        return None

    def __getitem__(self, idx: int) -> Dict:
        row = self.rows[idx]
        folder = row["folder"]
        window = self._window(row)

        def stack(products: Sequence[str]) -> np.ndarray:
            return np.stack([_read_product(folder, p, window) for p in products])

        x = stack(self.input_products)
        y = stack(self.output_products)
        sample: Dict = {"id": row.get("id", str(idx)), "has_plume": float(row.get("has_plume", y.sum() > 0))}
        arrays = {"input": x, "output": y}
        if self.weight_loss_product:
            arrays["weight_loss"] = stack([self.weight_loss_product])
        for p in self.extra_products:
            arrays[p] = stack([p])
        if self.add_rgb_aviris:
            arrays["rgb_aviris"] = stack(list(self.RGB_AVIRIS)) / 50.0

        if self.window_size_sample is not None:
            th, tw = self.window_size_sample
            _, h, w = arrays["input"].shape
            if h > th or w > tw:
                r0 = int(self._rng.integers(0, h - th + 1))
                c0 = int(self._rng.integers(0, w - tw + 1))
                arrays = {k: v[:, r0 : r0 + th, c0 : c0 + tw] for k, v in arrays.items()}

        if self.augment:
            arrays = joint_augment(arrays, self._rng)

        sample.update(arrays)
        return sample


def joint_augment(arrays: Dict[str, np.ndarray], rng: np.random.Generator) -> Dict[str, np.ndarray]:
    """Joint geometric augmentation of all (C, H, W) arrays in the sample.

    Reference recipe (datamodule.py:128-134): random 90-degree rotation p=0.5,
    horizontal flip p=0.5, vertical flip p=0.5 — applied identically to inputs,
    masks and loss weights.
    """
    out = dict(arrays)
    if rng.uniform() < 0.5:
        k = int(rng.integers(1, 4))
        out = {key: np.rot90(v, k, axes=(-2, -1)) for key, v in out.items()}
    if rng.uniform() < 0.5:
        out = {key: v[..., ::-1] for key, v in out.items()}
    if rng.uniform() < 0.5:
        out = {key: v[..., ::-1, :] for key, v in out.items()}
    return {key: np.ascontiguousarray(v) for key, v in out.items()}
