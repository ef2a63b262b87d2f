"""Label refinement: from human RGBA annotations + matched filter to binary masks.

Re-design of the reference ``proposed_mask``
(/root/reference/starcop/data/mask_creation.py:6-27): threshold mag1c at 200,
morphologically open+dilate (disk(1) = 3x3 cross), find connected components,
keep components intersecting the human annotation, and intersect with the raw
threshold again.

The morphology runs as jittable TPU ops (starcop_tpu.ops.morphology); connected
components run on host via scipy.ndimage (offline label prep, not a hot path —
SURVEY.md hard-parts note).
"""

from __future__ import annotations

import numpy as np

from starcop_tpu.ops.morphology import CROSS_KERNEL, binary_opening, dilation

MAG1C_LABEL_THRESHOLD = 200.0


def mosaic_labels(
    scene_shape,
    windows,
    rasters,
) -> np.ndarray:
    """Burn per-plume label rasters into one full-scene label mosaic.

    Re-design of the reference's join_labels_permian script
    (scripts/preprocessing/join_labels_permian.py:1-38): each labeled plume
    raster is pasted at its aligned window (see data/geo.py) with logical-OR /
    max merge on overlap. Works for (H, W) binary or (C, H, W) RGBA labels.

    Args:
        scene_shape: (H, W) of the flight-line product grid.
        windows: per-plume dicts with window_{col,row}_off (from
            geo.window_from_product).
        rasters: per-plume label arrays, (H_i, W_i) or (C, H_i, W_i).
    """
    if not rasters:
        return np.zeros(scene_shape, np.float32)
    first = np.asarray(rasters[0])
    channels = first.shape[0] if first.ndim == 3 else None
    out_shape = (channels,) + tuple(scene_shape) if channels else tuple(scene_shape)
    mosaic = np.zeros(out_shape, np.float32)
    h_scene, w_scene = scene_shape
    for win, raster in zip(windows, rasters):
        raster = np.asarray(raster, np.float32)
        r0, c0 = win["window_row_off"], win["window_col_off"]
        rh, rw = raster.shape[-2:]
        rr0, cc0 = max(r0, 0), max(c0, 0)
        rr1, cc1 = min(r0 + rh, h_scene), min(c0 + rw, w_scene)
        if rr1 <= rr0 or cc1 <= cc0:
            continue
        src = raster[..., rr0 - r0 : rr1 - r0, cc0 - c0 : cc1 - c0]
        dst = mosaic[..., rr0:rr1, cc0:cc1]
        np.maximum(dst, src, out=dst)
    return mosaic


def proposed_mask(label_rgba_values: np.ndarray, mag1c_values: np.ndarray) -> np.ndarray:
    """Refined binary plume mask.

    Args:
        label_rgba_values: (4, H, W) RGBA human annotation; alpha != 0 marks
            annotated pixels.
        mag1c_values: (1, H, W) matched-filter raster.

    Returns:
        (H, W) bool refined mask.
    """
    existing_label = np.asarray(label_rgba_values)[-1] != 0
    mag1c = np.asarray(mag1c_values)[0]
    thresholded = mag1c >= MAG1C_LABEL_THRESHOLD

    # opening then dilation with the 3x3 cross (skimage disk(1)); border
    # semantics: erosion treats outside as True (skimage binary_erosion
    # border_value=1), dilation as False.
    opened = np.asarray(binary_opening(thresholded.astype(np.float32), CROSS_KERNEL))
    opened_dilated = np.asarray(dilation(opened.astype(np.float32), CROSS_KERNEL))

    # Connected components, 8-connectivity (skimage measure.label default).
    from scipy import ndimage

    components, _ = ndimage.label(opened_dilated, structure=np.ones((3, 3), bool))

    keep = np.unique(components[existing_label & (components != 0)])
    mask = np.isin(components, keep) & (components != 0)
    return mask & thresholded
