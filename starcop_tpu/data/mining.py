"""Negative/confounder mining from matched-filter scene statistics.

Re-design of the reference negative-sampling machinery:
  * sliding-window mag1c statistics per scene (reference
    scripts/preprocessing/stats_mag1c.py:24-70) — computed on-device as one
    batched reduction over all windows instead of a Python window loop;
  * non-overlapping window selection + hard/random negative sampling
    (reference sampling_dataset.py:19-41, 408-439).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def sliding_window_offsets(height: int, width: int, size: int = 512, overlap: int = 256):
    """Top-left offsets of sliding windows (stride = size - overlap)."""
    stride = size - overlap
    rows = list(range(0, max(height - size, 0) + 1, stride))
    cols = list(range(0, max(width - size, 0) + 1, stride))
    if rows and rows[-1] + size < height:
        rows.append(height - size)
    if cols and cols[-1] + size < width:
        cols.append(width - size)
    return [(r, c) for r in (rows or [0]) for c in (cols or [0])]


def mag1c_window_stats(
    mag1c: np.ndarray,
    size: int = 512,
    overlap: int = 256,
    nodata: float = -9999.0,
) -> List[Dict]:
    """Per-window statistics driving negative mining.

    For each sliding window: max/min/mean/percentiles(25,50,75,95,99)/sum of
    valid mag1c values plus the valid-pixel fraction (reference
    stats_mag1c.py rows). All windows are gathered into one (N, size, size)
    batch and reduced on device.
    """
    h, w = mag1c.shape
    offsets = sliding_window_offsets(h, w, size, overlap)
    wins = np.stack(
        [mag1c[r : r + size, c : c + size] for r, c in offsets]
    )  # (N, size, size)
    x = jnp.asarray(wins)
    valid = x != nodata
    xv = jnp.where(valid, x, 0.0)
    n_valid = jnp.maximum(jnp.sum(valid, axis=(1, 2)), 1)
    mean = jnp.sum(xv, axis=(1, 2)) / n_valid
    mx = jnp.max(jnp.where(valid, x, -jnp.inf), axis=(1, 2))
    mn = jnp.min(jnp.where(valid, x, jnp.inf), axis=(1, 2))
    total = jnp.sum(xv, axis=(1, 2))
    # Percentiles over valid values: push invalids to +inf and use the valid
    # count to index the sorted array (static-shaped masked percentile).
    sorted_vals = jnp.sort(jnp.where(valid, x, jnp.inf).reshape(x.shape[0], -1), axis=1)
    qs = (25, 50, 75, 95, 99)
    pct = {}
    for q in qs:
        pos = jnp.clip((n_valid - 1) * (q / 100.0), 0, None)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.ceil(pos).astype(jnp.int32)
        frac = pos - lo
        vlo = jnp.take_along_axis(sorted_vals, lo[:, None], axis=1)[:, 0]
        vhi = jnp.take_along_axis(sorted_vals, hi[:, None], axis=1)[:, 0]
        pct[q] = vlo * (1 - frac) + vhi * frac

    stats = []
    frac_valid = np.asarray(jnp.sum(valid, axis=(1, 2)) / (size * size))
    mean, mx, mn, total = map(np.asarray, (mean, mx, mn, total))
    pct = {q: np.asarray(v) for q, v in pct.items()}
    for i, (r, c) in enumerate(offsets):
        row = {
            "window_row_off": r,
            "window_col_off": c,
            "window_height": size,
            "window_width": size,
            "max": float(mx[i]),
            "min": float(mn[i]),
            "mean": float(mean[i]),
            "sum": float(total[i]),
            "percentage_valids": float(frac_valid[i]),
        }
        for q in qs:
            row[f"p{q}"] = float(pct[q][i])
        stats.append(row)
    return stats


def _windows_intersect(a: Dict, b: Dict) -> bool:
    return not (
        a["window_col_off"] + a["window_width"] <= b["window_col_off"]
        or b["window_col_off"] + b["window_width"] <= a["window_col_off"]
        or a["window_row_off"] + a["window_height"] <= b["window_row_off"]
        or b["window_row_off"] + b["window_height"] <= a["window_row_off"]
    )


def select_non_overlapping(rows: Sequence[Dict], n: int = 2, chosen: Optional[List[int]] = None) -> List[int]:
    """Greedy selection of up to n mutually non-overlapping windows
    (reference sampling_dataset.py:19-41). Returns indices into ``rows``."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    idxs = list(chosen or [])
    for i, row in enumerate(rows):
        if i in idxs:
            continue
        if not idxs:
            idxs.append(i)
        elif not any(_windows_intersect(rows[j], row) for j in idxs):
            idxs.append(i)
        if len(idxs) >= n:
            break
    return idxs


def sampling_no_plumes(
    stats_rows: Sequence[Dict],
    n_hard: int,
    n_random: int,
    percentage_valids: float = 0.8,
    seed: int = 42,
) -> List[Dict]:
    """Hard + random negative tile selection per scene.

    Per scene (grouped by 'name'): keep windows with >= percentage_valids
    valid pixels; pick n_hard non-overlapping windows with the highest mean
    mag1c ("hard" confounders), then n_random more from a random permutation
    ("random"). (Reference sampling_dataset.py:408-439.)
    """
    rng = np.random.default_rng(seed)
    out: List[Dict] = []
    names = sorted({r.get("name", "") for r in stats_rows})
    for name in names:
        rows = [r for r in stats_rows if r.get("name", "") == name]
        rows = [r for r in rows if r.get("percentage_valids", 1.0) >= percentage_valids]
        rows_sorted = sorted(rows, key=lambda r: -r.get("mean", 0.0))
        hard_idx = select_non_overlapping(rows_sorted, n=n_hard)
        perm = list(rng.permutation(len(rows_sorted)))
        rows_permuted = [rows_sorted[i] for i in perm]
        # map hard indices into the permuted ordering
        hard_in_perm = [perm.index(i) for i in hard_idx]
        all_idx = select_non_overlapping(rows_permuted, n=n_hard + n_random, chosen=hard_in_perm)
        for k, i in enumerate(all_idx):
            row = dict(rows_permuted[i])
            row["difficulty"] = "hard" if k < len(hard_in_perm) else "random"
            row["qplume"] = 0.0
            row["has_plume"] = False
            out.append(row)
    return out
