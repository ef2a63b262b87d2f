"""Zero-shot EMIT inference pipeline: raw radiance -> plume mask, on-device.

TPU re-design of the reference notebook flow
(inference_on_raw_EMIT_nc_file.ipynb; mag1c driver
/root/reference/starcop/models/mag1c_emit.py:16-90):

  raw .nc -> band select (2122-2488 nm) -> CH4 template -> column-blocked
  acrwl1mf (30 iters, alpha 1e-4) -> EMIT->AVIRIS renormalization -> reflect-
  padded whole-scene U-Net forward -> sigmoid mask -> optional GLT gather.

Everything between the host read and the final mask is one fused on-device
program per stage; the matched filter's column blocks batch across the chip
(and shard across a mesh via ``parallel.sharded_mag1c_scene``).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from starcop_tpu.data.emit import (
    DEFAULT_WAVELENGTH_RANGE,
    EMITRawScene,
    renormalize_emit_to_aviris,
)
from starcop_tpu.ops.ch4_template import generate_template_from_bands
from starcop_tpu.ops.mag1c import NODATA, mag1c_column_blocks
from starcop_tpu.ops.padding import padded_apply


def emit_mag1c(
    radiance: np.ndarray,
    wavelengths: np.ndarray,
    fwhm: np.ndarray,
    valid_mask: Optional[np.ndarray] = None,
    *,
    wavelength_range: Tuple[float, float] = DEFAULT_WAVELENGTH_RANGE,
    column_step: int = 32,
    num_iter: int = 30,
    alpha: float = 1e-4,
    mesh=None,
    compute_dtype=jnp.float32,
) -> Tuple[np.ndarray, np.ndarray]:
    """Matched filter over an EMIT-like radiance cube.

    Args:
        radiance: (rows, cols, bands) full-spectrum radiance.
        wavelengths, fwhm: (bands,) sensor band parameters.
        valid_mask: (rows, cols) True where pixels are valid.
        column_step: column-block width (reference demo uses 2; wider blocks
            give better MXU utilization with identical per-block statistics
            semantics — per-CCD-column grouping is preserved for multiples of
            the detector layout).
        mesh: optional jax Mesh; shards column blocks across devices.

    Returns:
        (mf, albedo) float32 (rows, cols) with NODATA at invalid pixels.
    """
    sel = (wavelengths >= wavelength_range[0]) & (wavelengths <= wavelength_range[1])
    if not sel.any():
        raise ValueError("No bands in the selected wavelength range")
    target = generate_template_from_bands(wavelengths[sel], fwhm[sel])[:, 1]
    cube = np.asarray(radiance[..., sel], np.float32)

    if mesh is not None:
        from starcop_tpu.parallel.scene_mag1c import sharded_mag1c_scene

        mf, albedo = sharded_mag1c_scene(
            jnp.asarray(cube), jnp.asarray(target), valid_mask,
            mesh=mesh, column_step=column_step, num_iter=num_iter, alpha=alpha,
            compute_dtype=compute_dtype,
        )
    else:
        mf, albedo = mag1c_column_blocks(
            jnp.asarray(cube), jnp.asarray(target), valid_mask,
            column_step=column_step, num_iter=num_iter, alpha=alpha,
            compute_dtype=compute_dtype,
        )
    return np.asarray(mf, np.float32), np.asarray(albedo, np.float32)


def emit_granule_to_mask(
    cube: jax.Array,
    rgb_chw: jax.Array,
    template: jax.Array,
    model_apply: Callable[[jax.Array], jax.Array],
    *,
    column_step: int = 54,
    num_iter: int = 30,
    alpha: float = 1e-4,
    valid_mask: Optional[jax.Array] = None,
    stream_dtype=None,
) -> Tuple[jax.Array, jax.Array]:
    """Device-resident raw-granule -> plume-mask path (no host round trips).

    The step-by-step pipeline (emit_inference) materializes the matched filter
    on host between stages; under a remote-TPU tunnel those transfers dominate
    end-to-end latency (measured ~6x the compute). This variant chains matched
    filter -> EMIT->AVIRIS renormalization -> reflect-padded U-Net forward as
    device ops: one upload (cube + rgb), one download (mask).

    Wrap the call in jax.jit (closing over template and model_apply) so the
    whole path compiles to ONE program — eager per-op dispatch through a
    remote tunnel costs ~1s/scene:

        fused = jax.jit(lambda c, r: emit_granule_to_mask(c, r, tpl, apply_fn))

    Args:
        cube: (H, W, S) radiance already band-selected to the filter window.
        rgb_chw: (3, H, W) radiance at the RGB picks.
        template: (S,) target spectrum.
        model_apply: (1, 4, H', W') normalized input -> (1, 1, H', W') logits.
        stream_dtype: matched-filter streaming dtype (jnp.bfloat16 halves the
            filter's HBM traffic at pinned detection fidelity; default f32).

    Returns:
        (prediction sigmoid (H, W), mf (H, W)) as device arrays.
    """
    from starcop_tpu.data.emit import MAGIC_DIV_BY, MAGIC_MULT_BY, RGB_DIV_BY, RGB_MULT_BY
    from starcop_tpu.ops.padding import padded_apply

    mf, _ = mag1c_column_blocks(
        cube, template, valid_mask, column_step=column_step, num_iter=num_iter,
        alpha=alpha, stream_dtype=stream_dtype,
    )
    mf_clean = jnp.where(mf == NODATA, 0.0, mf)
    m_n = jnp.clip(mf_clean / MAGIC_DIV_BY, 0, 2) * MAGIC_MULT_BY
    rgb_n = jnp.clip(jnp.asarray(rgb_chw) / RGB_DIV_BY, 0, 2) * RGB_MULT_BY
    model_input = jnp.concatenate([m_n[None], rgb_n])

    pred = padded_apply(
        model_input, lambda b: jax.nn.sigmoid(model_apply(b)), divisor=32
    )
    if pred.ndim == 3:
        pred = pred[0]
    return pred, mf


def emit_granule_to_mask_batched(
    cubes: jax.Array,
    rgbs_chw: jax.Array,
    template: jax.Array,
    model_apply: Callable[[jax.Array], jax.Array],
    *,
    column_step: int = 54,
    num_iter: int = 30,
    alpha: float = 1e-4,
    stream_dtype=None,
) -> Tuple[jax.Array, jax.Array]:
    """Batched raw-granule -> plume-mask path: B same-shaped scenes, ONE program.

    Rationale: serving on a bandwidth-limited link is upload-bound, but on
    locally-attached chips the ~23 ms fused compute becomes the wall;
    batching B scenes amortizes the U-Net forward's fixed costs and doubles
    the matched filter's block batch. MEASURED RESULT at full EMIT-granule
    size (1280 x 1242 x 50, v5e): 25.0 ms/scene batched vs 24.2 ms single —
    0.97x, i.e. NO win: at 23 column blocks and a 1280x1242 U-Net input the
    per-program fixed costs are already fully amortized, so B=2 only adds
    the concat/reshape shuffle (docs/PROFILE.md "B=2 batching"). The API
    stays for small-scene workloads (chips/quicklooks), where fixed costs
    do dominate.

    Layout: the scenes concatenate along the WIDTH axis before the column-
    blocked filter — column blocks are the statistic unit, so as long as
    each scene's width is a multiple of ``column_step`` no block straddles
    two scenes and the per-scene results are bit-comparable to B separate
    calls (pinned by tests/test_emit_pipeline.py::
    test_granule_to_mask_batched_matches_single). Widths that do not divide
    evenly would merge one scene's ragged tail block with the next scene's
    first columns (wrong statistics), so that case raises.

    Args:
        cubes: (B, H, W, S) radiance, band-selected to the filter window.
        rgbs_chw: (B, 3, H, W) radiance at the RGB picks.
        template: (S,) target spectrum.
        model_apply: (B, 4, H', W') normalized input -> (B, 1, H', W') logits.

    Returns:
        (prediction sigmoid (B, H, W), mf (B, H, W)) as device arrays.
    """
    from starcop_tpu.data.emit import MAGIC_DIV_BY, MAGIC_MULT_BY, RGB_DIV_BY, RGB_MULT_BY
    from starcop_tpu.ops.padding import find_padding

    b, h, w, s = cubes.shape
    if w % column_step:
        raise ValueError(
            f"batched granule->mask requires width ({w}) to be a multiple of "
            f"column_step ({column_step}): a ragged tail block would merge "
            "statistics across scenes"
        )
    wide = jnp.moveaxis(cubes, 0, 1).reshape(h, b * w, s)  # (H, B*W, S)
    mf_wide, _ = mag1c_column_blocks(
        wide, template, None, column_step=column_step, num_iter=num_iter,
        alpha=alpha, stream_dtype=stream_dtype,
    )
    mf = jnp.moveaxis(mf_wide.reshape(h, b, w), 1, 0)  # (B, H, W)

    mf_clean = jnp.where(mf == NODATA, 0.0, mf)
    m_n = jnp.clip(mf_clean / MAGIC_DIV_BY, 0, 2) * MAGIC_MULT_BY
    rgb_n = jnp.clip(jnp.asarray(rgbs_chw) / RGB_DIV_BY, 0, 2) * RGB_MULT_BY
    model_input = jnp.concatenate([m_n[:, None], rgb_n], axis=1)  # (B, 4, H, W)

    pad_r = find_padding(h, 32)
    pad_c = find_padding(w, 32)
    padded = jnp.pad(model_input, ((0, 0), (0, 0), pad_r, pad_c), mode="reflect")
    out = jax.nn.sigmoid(model_apply(padded))  # (B, 1, H', W')
    rows = slice(pad_r[0], None if pad_r[1] <= 0 else -pad_r[1])
    cols = slice(pad_c[0], None if pad_c[1] <= 0 else -pad_c[1])
    pred = out[:, 0, rows, cols]
    return pred, mf


def emit_inference(
    scene: EMITRawScene,
    model_apply: Callable[[jax.Array], jax.Array],
    *,
    column_step: int = 32,
    num_iter: int = 30,
    alpha: float = 1e-4,
    mesh=None,
    georeference: bool = False,
) -> Dict[str, np.ndarray]:
    """Full zero-shot pipeline on a raw EMIT granule.

    Args:
        scene: opened EMITRawScene.
        model_apply: fn((1, 4, H, W) normalized-domain input) -> (1, 1, H, W)
            logits (a bound SegmentationModel forward). The 4 channels are
            [mag1c, R, G, B] in the AVIRIS training domain.
        georeference: gather outputs onto the GLT grid.

    Returns dict with mag1c, albedo, rgb, prediction (sigmoid), and (if
    requested) their georeferenced versions.
    """
    sel = scene.band_slice()
    cube = scene.read_bands(sel)
    invalid = scene.invalid_mask(cube)
    mf, albedo = emit_mag1c(
        cube,
        scene.wavelengths[sel],
        scene.fwhm[sel],
        ~invalid,
        column_step=column_step,
        num_iter=num_iter,
        alpha=alpha,
        mesh=mesh,
    )
    rgb = scene.read_rgb()  # (rows, cols, 3)

    mf_in = np.where(mf == NODATA, 0.0, mf)
    m_n, rgb_n = renormalize_emit_to_aviris(mf_in, np.moveaxis(rgb, -1, 0))
    model_input = jnp.asarray(np.concatenate([m_n[None], rgb_n]))  # (4, H, W)

    def fwd(batch):
        return jax.nn.sigmoid(model_apply(batch))

    pred = np.asarray(padded_apply(model_input, fwd, divisor=32))
    if pred.ndim == 3:
        pred = pred[0]

    out = {"mag1c": mf, "albedo": albedo, "rgb": rgb, "prediction": pred}
    if georeference:
        out["mag1c_geo"] = scene.georeference(mf)
        out["prediction_geo"] = scene.georeference(pred, fill_value=0.0)
    return out
