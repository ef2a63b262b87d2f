"""AVIRIS full-scene matched filter by detector column groups.

TPU re-design of the reference ``func_by_groups`` driver
(/root/reference/starcop/models/mag1c.py:117-174) and ``run_mag1c``
(process_aviris.py:136-241): AVIRIS pushbroom scenes carry a GLT band mapping
every pixel to its detector sample (CCD column); matched-filter statistics
must be computed per column group.

The reference loops groups one-by-one on one torch device (groups are ragged).
Here groups are bucketed by padded pixel count, each bucket is gathered into a
uniform (G, P_max, S) batch with 0/1 weights, and each bucket runs as ONE
batched device program (vmapped statistics + Cholesky). Host work is only the
index bookkeeping (gather/scatter indices); all flops are on-device.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from starcop_tpu.ops.ch4_template import generate_template_from_bands, get_mask_bad_bands
from starcop_tpu.ops.mag1c import NODATA, acrwl1mf

MIN_PIXELS_PER_GROUP = 10  # reference skips groups with <= 10 valid pixels


def _bucket_sizes(sizes: Sequence[int], growth: float = 1.3) -> Dict[int, int]:
    """Map each group size to a padded bucket size (geometric buckets bound
    padding waste by ~30% while keeping the number of compiled shapes small)."""
    out = {}
    for s in sorted(set(sizes)):
        b = 1 << 7  # minimum bucket: 128 pixels (one VPU sublane tile)
        while b < s:
            b = int(np.ceil(b * growth / 128.0) * 128)
        out[s] = b
    return out


def run_mag1c_groups(
    radiance: np.ndarray,
    groups: np.ndarray,
    valid_mask: Optional[np.ndarray] = None,
    template: Optional[np.ndarray] = None,
    wavelengths: Optional[np.ndarray] = None,
    fwhm: Optional[np.ndarray] = None,
    *,
    num_iter: int = 30,
    alpha: float = 0.0,
    covariance_update_scaling: float = 1.0,
    groups_per_batch: int = 64,
    compute_dtype=jnp.float32,
    fill_value: float = NODATA,
) -> Tuple[np.ndarray, np.ndarray]:
    """Matched filter per detector column group over a full AVIRIS scene.

    Args:
        radiance: (H, W, S) radiance (already band-selected, e.g. the
            2122-2488 nm window after ``get_mask_bad_bands``).
        groups: (H, W) int detector sample index per pixel (GLT band 0).
        valid_mask: (H, W) bool; default = all bands > NODATA.
        template: (S,) target spectrum; if None, computed from
            wavelengths/fwhm.
        groups_per_batch: how many same-bucket groups to batch per device call.

    Returns:
        (mf, albedo) (H, W) float32 with ``fill_value`` where invalid/skipped.
    """
    h, w, s = radiance.shape
    if template is None:
        if wavelengths is None or fwhm is None:
            raise ValueError("Provide template or wavelengths+fwhm")
        template = generate_template_from_bands(wavelengths, fwhm)[:, 1]
    template = jnp.asarray(template, compute_dtype)

    if valid_mask is None:
        valid_mask = np.all(radiance > NODATA, axis=-1)
    groups = np.asarray(groups)

    mf_out = np.full((h, w), fill_value, np.float32)
    albedo_out = np.full((h, w), fill_value, np.float32)

    flat_valid = valid_mask.reshape(-1)
    flat_groups = groups.reshape(-1)
    flat_rad = radiance.reshape(-1, s)

    # Host-side index bookkeeping: per-group flat pixel indices.
    order = np.argsort(flat_groups[flat_valid], kind="stable")
    valid_idx = np.nonzero(flat_valid)[0][order]
    sorted_groups = flat_groups[valid_idx]
    uniq, starts = np.unique(sorted_groups, return_index=True)
    ends = np.append(starts[1:], len(sorted_groups))

    group_indices = [
        valid_idx[a:b] for a, b, g in zip(starts, ends, uniq) if (b - a) > MIN_PIXELS_PER_GROUP
    ]
    if not group_indices:
        return mf_out, albedo_out

    sizes = [len(gi) for gi in group_indices]
    buckets = _bucket_sizes(sizes)

    # Same auto-selection as mag1c_column_blocks: the Pallas-fused kernel's
    # weighted path on TPU at f32 (one streaming read per iteration +
    # Woodbury-updated solves), plain XLA elsewhere. tile_p is matched to the
    # bucket (lane-aligned) — the kernel's default 8192 tile would pad small
    # buckets' pixel axis up to 64x, inflating per-iteration streaming work.
    import jax

    if compute_dtype == jnp.float32 and jax.devices()[0].platform == "tpu":
        from starcop_tpu.ops.mag1c_pallas import DEFAULT_TILE_P, acrwl1mf_fused

        def _mf_kernel(xb, tpl, wb, *, p_max, **kw):
            tile_p = min(DEFAULT_TILE_P, -(-p_max // 128) * 128)
            return acrwl1mf_fused(xb, tpl, wb, tile_p=tile_p, **kw)

    else:

        def _mf_kernel(xb, tpl, wb, *, p_max, **kw):
            return acrwl1mf(xb, tpl, wb, **kw)

    # Group the groups by bucket so each device call has a uniform shape.
    by_bucket: Dict[int, list] = {}
    for gi in group_indices:
        by_bucket.setdefault(buckets[len(gi)], []).append(gi)

    for p_max, members in sorted(by_bucket.items()):
        for start in range(0, len(members), groups_per_batch):
            chunk = members[start : start + groups_per_batch]
            # Pad the batch dimension to groups_per_batch so every bucket size
            # compiles exactly one program shape (a ragged final chunk would
            # otherwise trigger a fresh compile); padded rows carry zero
            # weights and are skipped on scatter.
            g = groups_per_batch if len(members) > groups_per_batch else len(chunk)
            xb = np.zeros((g, p_max, s), np.float32)
            wb = np.zeros((g, p_max), np.float32)
            for j, gi in enumerate(chunk):
                xb[j, : len(gi)] = flat_rad[gi]
                wb[j, : len(gi)] = 1.0
            mf, albedo = _mf_kernel(
                jnp.asarray(xb, compute_dtype),
                template,
                jnp.asarray(wb, compute_dtype),
                p_max=p_max,
                num_iter=num_iter,
                alpha=alpha,
                covariance_update_scaling=covariance_update_scaling,
            )
            mf = np.asarray(mf, np.float32)[..., 0]
            albedo = np.asarray(albedo, np.float32)[..., 0]
            for j, gi in enumerate(chunk):
                np.put(mf_out, gi, mf[j, : len(gi)])
                np.put(albedo_out, gi, albedo[j, : len(gi)])

    return mf_out, albedo_out


def run_mag1c_scene(
    radiance: np.ndarray,
    wavelengths: np.ndarray,
    fwhm: np.ndarray,
    glt_samples: Optional[np.ndarray] = None,
    wavelength_range: Tuple[float, float] = (2122.0, 2488.0),
    **kwargs,
) -> Tuple[np.ndarray, np.ndarray]:
    """Full run_mag1c: band-keep mask ∩ wavelength window, template, groups.

    (Reference: process_aviris.py:136-241.) If no GLT is provided, every
    column is its own group (sample index = column index).
    """
    wavelengths = np.asarray(wavelengths, np.float64)
    fwhm = np.asarray(fwhm, np.float64)
    keep = get_mask_bad_bands(wavelengths)
    keep &= (wavelengths >= wavelength_range[0]) & (wavelengths <= wavelength_range[1])
    if not keep.any():
        raise ValueError("No bands left after masking")
    template = generate_template_from_bands(wavelengths[keep], fwhm[keep])[:, 1]
    cube = np.asarray(radiance)[..., keep]
    if glt_samples is None:
        glt_samples = np.broadcast_to(np.arange(cube.shape[1]), cube.shape[:2])
    valid = np.all(cube > NODATA, axis=-1)
    return run_mag1c_groups(cube, glt_samples, valid, template=template, **kwargs)
