"""Pipelined scene-processing runtime for production serving.

The reference processes scenes strictly sequentially (download -> mag1c ->
save, one python process per scene at best). This runtime keeps the TPU busy:
three stages connected by bounded queues, each in its own thread —

    reader (host: h5py/ENVI/npy IO)  ->  compute (device: matched filter +
    renormalization + whole-scene U-Net)  ->  writer (host: npy/COG outputs)

While granule N computes on-device, granule N+1 is being read and granule N-1
written. Host IO uses the native threaded reader where applicable; device work
is one jitted program per stage. Throughput approaches max(read, compute,
write) instead of their sum.
"""

from __future__ import annotations

import logging
import os
import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, Iterable, List, Optional

import numpy as np

logger = logging.getLogger("starcop_tpu.serve")

_SENTINEL = object()


@dataclass
class SceneResult:
    name: str
    outputs: Dict[str, np.ndarray]
    timings: Dict[str, float] = field(default_factory=dict)
    error: Optional[str] = None


class ScenePipeline:
    """Threaded read | compute | write pipeline over scene descriptors.

    Args:
        read_fn: name -> payload dict (host IO; runs in the reader thread).
        compute_fn: payload dict -> outputs dict (device compute; one compute
            thread keeps single-device dispatch ordered). For MULTI-CHIP
            serving pass ``compute_fns`` instead: one callable per device —
            scenes are independent, so scene-level round-robin across chips
            is the natural parallel axis (no collectives, linear scaling);
            each worker thread owns one chip and drains the shared read
            queue.
        write_fn: optional (name, outputs) -> None (host IO; writer thread).
        queue_size: bounded stage queues (backpressure; default 2 = double
            buffering per compute worker).
    """

    def __init__(
        self,
        read_fn: Callable[[str], Dict],
        compute_fn: Optional[Callable[[Dict], Dict]] = None,
        write_fn: Optional[Callable[[str, Dict], None]] = None,
        queue_size: int = 2,
        compute_fns: Optional[List[Callable[[Dict], Dict]]] = None,
    ):
        if (compute_fn is None) == (compute_fns is None):
            raise ValueError("Provide exactly one of compute_fn / compute_fns")
        self.read_fn = read_fn
        self.compute_fns = list(compute_fns) if compute_fns is not None else [compute_fn]
        self.write_fn = write_fn
        self.queue_size = queue_size

    def run(self, names: Iterable[str]) -> List[SceneResult]:
        n_workers = len(self.compute_fns)
        read_q: queue.Queue = queue.Queue(maxsize=self.queue_size * n_workers)
        write_q: queue.Queue = queue.Queue(maxsize=self.queue_size * n_workers)
        results: List[SceneResult] = []
        results_lock = threading.Lock()

        def reader():
            for name in names:
                t0 = time.time()
                try:
                    payload = self.read_fn(name)
                    read_q.put((name, payload, time.time() - t0))
                except Exception as e:  # noqa: BLE001 — isolate scene failures
                    logger.exception("read failed for %s", name)
                    with results_lock:
                        results.append(SceneResult(name, {}, error=f"read: {e}"))
            for _ in range(n_workers):
                read_q.put(_SENTINEL)

        def computer(fn):
            while True:
                item = read_q.get()
                if item is _SENTINEL:
                    write_q.put(_SENTINEL)
                    return
                name, payload, t_read = item
                t0 = time.time()
                try:
                    outputs = fn(payload)
                    write_q.put((name, outputs, {"read_s": t_read, "compute_s": time.time() - t0}))
                except Exception as e:  # noqa: BLE001
                    logger.exception("compute failed for %s", name)
                    with results_lock:
                        results.append(SceneResult(name, {}, error=f"compute: {e}"))

        def writer():
            done_workers = 0
            while done_workers < n_workers:
                item = write_q.get()
                if item is _SENTINEL:
                    done_workers += 1
                    continue
                name, outputs, timings = item
                t0 = time.time()
                try:
                    if self.write_fn is not None:
                        self.write_fn(name, outputs)
                    timings["write_s"] = time.time() - t0
                    with results_lock:
                        results.append(SceneResult(name, outputs, timings))
                except Exception as e:  # noqa: BLE001
                    logger.exception("write failed for %s", name)
                    with results_lock:
                        results.append(SceneResult(name, outputs, timings, error=f"write: {e}"))

        threads = [threading.Thread(target=reader, daemon=True)]
        threads += [
            threading.Thread(target=computer, args=(fn,), daemon=True)
            for fn in self.compute_fns
        ]
        threads += [threading.Thread(target=writer, daemon=True)]
        t_start = time.time()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.time() - t_start
        ok = [r for r in results if r.error is None]
        logger.info(
            "pipeline: %d scenes (%d ok, %d workers) in %.2fs (%.2fs/scene)",
            len(results), len(ok), n_workers, wall, wall / max(len(results), 1),
        )
        return results


def emit_serving_pipeline(
    model_apply: Callable,
    output_dir: str,
    column_step: int = 32,
    num_iter: int = 30,
    georeference: bool = False,
    queue_size: int = 2,
    stream_dtype=None,
    devices: Optional[List] = None,
    upload_dtype=None,
    download_dtype="f16",
    compress_outputs=False,
) -> ScenePipeline:
    """Ready-made pipeline: raw EMIT granule paths -> mag1c + plume masks.

    ``compress_outputs``: DEFLATE setting for the output GeoTIFFs (bool or
    zlib level, see ``write_geotiff``). Default OFF for serving: the f32
    plume/mag1c rasters are mostly zlib-incompressible (prediction tiles
    compress ~0.9x even at level 6), so level-6 DEFLATE costs ~100 ms of
    writer CPU per product for almost no size win — ~400 ms/scene that
    competes with the reader and the tunnel client for host CPU on the
    serving host. Pass ``True`` (or a level) for archival deliverables.

    Device compute materializes results to numpy inside the compute stage
    (forcing completion so the pipeline's backpressure reflects real device
    time, not async dispatch).

    ``devices``: list of jax devices for MULTI-CHIP serving — scenes are
    independent, so each chip gets its own compute worker draining the shared
    queue (scene-level data parallelism: zero collectives, linear scaling
    with chip count). Default: single compute worker on the default device,
    with the host->device upload started in the reader stage for overlap.

    ``upload_dtype``: wire format of the radiance cube over the host->device
    link (default: the reader's float32). Narrowing it cuts the per-scene
    upload bytes — the dominant per-scene cost on bandwidth-limited links
    (remote-attached chips, thin PCIe):

    * ``"u12"`` (recommended on bandwidth-starved links): per-band affine
      12-bit quantization, band pairs packed 2 values / 3 bytes — 37.5% of
      the f32 bytes. Contract: >=99.9% threshold-mask agreement and
      u16-grade relative error on true detections (measured on the 640x624
      bench scene: agreement 0.99980 u12 vs 0.99976 u16 against f32, best-F1
      identical to 4 decimals — the filter's own f32 noise dominates both
      grids). Unlike u16 it can re-ignite a rare isolated background pixel
      the f32 L1 reweighting fully suppressed (removed by the baselines'
      binary opening). Host encode is one fused threaded pass in native
      code (``cpp/starcop_io.cpp``, ~55 ms for an 80 MB cube; numpy
      fallback works everywhere), and the fused device program unpacks
      with two shifts per byte plane.
    * ``"u10"``: per-band affine 10-bit grid, PIXEL quads packed 4 values /
      5 bytes — 31.25% of the f32 bytes (5/6 of u12). Same contract class
      as u12 (measured on the 640x624 bench scene: threshold-mask
      agreement 0.99980 vs f32, best-F1 unchanged — exactly u12's
      committed bar on the round-3 bench scene), one less bit of headroom
      above the filter's own f32 noise. Packing along pixels instead of
      band pairs means any band count ships without padding or an f32
      tail. Prefer u12 unless the link is the measured bottleneck (it is
      on this build's ~30 MB/s tunnel: the upload stage IS the serve wall,
      see docs/PROFILE.md).
    * ``jnp.uint16``: per-band affine 16-bit grid at 50% of the bytes
      (~1e-4 relative error — ~30x finer than bf16's 8-bit mantissa).
      Passes the SAME strict detection-equivalence contract as the pinned
      bf16-stream tests.
    * ``jnp.bfloat16``: plain rounding, zero host-side work beyond the cast.
      ~0.4% relative input rounding; measured ~99% threshold-mask agreement
      with a few borderline background pixels unpinned by the L1
      regularizer — use u12/u16 unless the host CPU is the bottleneck.

    Under u12/u16 the three RGB display planes also ride the wire as
    per-band affine u16 (~1e-4 relative error into the model's TOA
    channels); under u10 they ride the same u10 pixel-quad pack as the cube
    (~1e-3, in-family with the bf16 model compute they feed). Both are
    dequantized inside the fused program. The valid mask ships bit-packed
    (1/8 of the bool bytes) on every path.

    Fidelity of all three is pinned by
    tests/test_serve.py::test_pipeline_narrow_upload_detection. Radiometric
    products (mf magnitudes, albedo) keep f32 compute either way; only the
    input rounding differs from the f32 default.

    ``download_dtype``: wire format of the (prediction, mag1c) results over
    the device->host link. The two outputs always ride ONE stacked transfer
    (two separate syncs each paid wire + ~33 ms tunnel RTT — ~390 ms/scene
    of the measured compute stage was the downloads). Default ``"f16"``
    additionally halves the download bytes: prediction error <= 2^-11
    (~4.9e-4 absolute on a sigmoid in [0, 1]); mag1c rides scaled by 1/16
    (exact power of 2, undone on host) so values to ~1.05e6 ppm*m fit f16
    range at <= 2^-11 relative error — inside every narrow-upload codec's
    own error budget; compute stays f32 throughout. NODATA sentinels at
    invalid pixels are restored exactly from the reader's host-side valid
    mask. Pass ``None``/``"f32"`` for bit-exact f32 results (still one
    stacked transfer). Pinned by
    tests/test_serve.py::test_pipeline_f16_download_contract.
    """
    import jax
    import jax.numpy as jnp

    from starcop_tpu.data.emit import EMITRawScene
    from starcop_tpu.ops.ch4_template import generate_template_from_bands
    from starcop_tpu.ops.mag1c import NODATA
    from starcop_tpu.scenes.emit_pipeline import emit_granule_to_mask

    # Any explicit devices list (even length 1) pins compute to those chips;
    # uploads then happen in the worker so they target the right device.
    multi = devices is not None and len(devices) > 0

    packed12 = isinstance(upload_dtype, str) and upload_dtype.lower() == "u12"
    packed10 = isinstance(upload_dtype, str) and upload_dtype.lower() == "u10"
    packed = packed12 or packed10
    quantized = (
        not packed
        and upload_dtype is not None
        and np.dtype(upload_dtype) == np.uint16
    )
    down_f16 = isinstance(download_dtype, str) and download_dtype.lower() == "f16"
    # mag1c rides the f16 wire scaled by 1/16 (exact power of 2): keeps
    # values to ~16 * 65504 ppm*m in f16 range at unchanged mantissa error.
    MF_F16_SCALE = 16.0

    def read_fn(path: str) -> Dict:
        from starcop_tpu.data import native_io

        scene = EMITRawScene(path)
        sel = scene.band_slice()
        # Validity must come from the ORIGINAL f32 values: narrowing rounds
        # the sensor fill value (bf16(-9999) = -9984) and quantization clips
        # it into range, so the sentinel comparison would silently miss.
        # valid_band_minmax fuses the sentinel scan with the quantizer's
        # per-band range scan in ONE native threaded pass (the separate
        # numpy compare+any pass was ~25 ms of the uncontended read stage).
        cube = np.ascontiguousarray(scene.read_bands(sel), np.float32)
        raw = {}
        if packed12:
            # Per-band affine 12-bit grid over the VALID range, band pairs
            # packed 2 values / 3 bytes (fused threaded native pass; see
            # data/native_io.quantize_pack12). Odd band counts carry the
            # last band unpaired as a separate f32 plane (cheap: one band);
            # validity still scans ALL bands, the affine grid covers only
            # the even-band body.
            s_total = cube.shape[-1]
            s_even = s_total - (s_total % 2)
            valid, lo, hi = native_io.valid_band_minmax(
                cube, scene.fill_value, n_minmax_bands=s_even
            )
            if s_total % 2:
                raw["q_tail"] = np.ascontiguousarray(cube[..., s_even:])
                # Materialize the even-band body ONCE: the sliced view is
                # non-contiguous, and quantize_pack12 would otherwise take
                # its own full-cube contiguous copy.
                body = np.ascontiguousarray(cube[..., :s_even])
            else:
                body = cube
            scale = np.maximum((hi - lo) / 4095.0, 1e-12).astype(np.float32)
            raw["q_lo"], raw["q_scale"] = lo, scale
            cube = native_io.quantize_pack12(body, lo, scale)
        elif packed10:
            # Per-band affine 10-bit grid, pixel quads packed 4 values /
            # 5 bytes (fused threaded native pass; see
            # data/native_io.quantize_pack10). No band pad/tail cases: the
            # quad grouping runs along pixels.
            valid, lo, hi = native_io.valid_band_minmax(cube, scene.fill_value)
            scale = np.maximum((hi - lo) / 1023.0, 1e-12).astype(np.float32)
            raw["q_lo"], raw["q_scale"] = lo, scale
            cube = native_io.quantize_pack10(cube, lo, scale)
        elif quantized:
            # Per-band affine quantization over the VALID range (fill
            # sentinels would blow the step size ~1000x); the fused program
            # dequantizes on device.
            valid, lo, hi = native_io.valid_band_minmax(cube, scene.fill_value)
            scale = np.maximum((hi - lo) / 65535.0, 1e-12).astype(np.float32)
            # nan_to_num BEFORE the uint cast: float->uint of NaN is
            # platform-undefined, and NaN survives clip/rint. Same
            # "NaN maps to 0 deterministically" contract as the packed
            # codecs (data/native_io.quantize_pack12/pack10).
            cube = np.nan_to_num(
                np.clip(np.rint((cube - lo) / scale), 0, 65535), nan=0.0
            ).astype(np.uint16)
            raw["q_lo"], raw["q_scale"] = lo, scale
        elif upload_dtype is not None:
            # Plain narrowing cast (one cheap host pass); device upcasts once.
            valid, _, _ = native_io.valid_band_minmax(
                cube, scene.fill_value, n_minmax_bands=0
            )
            cube = np.asarray(cube).astype(upload_dtype)
        else:
            valid, _, _ = native_io.valid_band_minmax(
                cube, scene.fill_value, n_minmax_bands=0
            )
        payload = {
            "wavelengths": scene.wavelengths[sel],
            "fwhm": scene.fwhm[sel],
            "glt": (scene.glt_x, scene.glt_y, scene.fill_value) if georeference else None,
            "transform": scene.transform,
            "crs_epsg": scene.crs_epsg,
        }
        rgb_hwc = scene.read_rgb().astype(np.float32)  # (H, W, 3)
        if packed10:
            # Under the maximum-compression codec the RGB planes ride the
            # same u10 pixel-quad pack as the cube (31.25% of f32 bytes;
            # the 10-bit grid's ~1e-3 relative error is in-family with the
            # bf16 model compute these TOA channels feed). u12/u16 keep
            # their stricter per-band affine u16 RGB below.
            r_lo, r_hi = native_io.band_minmax(rgb_hwc, valid)
            r_scale = np.maximum((r_hi - r_lo) / 1023.0, 1e-12).astype(np.float32)
            raw["rgb_lo"], raw["rgb_scale"] = r_lo, r_scale
            rgb = native_io.quantize_pack10(rgb_hwc, r_lo, r_scale)
        elif packed12 or quantized:
            # The RGB display planes ride the narrow wire as per-band
            # affine u16 (50% of the f32 bytes; ~1e-4 relative error, far
            # inside the model's bf16-compute tolerance). On this link the
            # f32 RGB was ~90-180 ms/scene of upload for 3 of 53 bands.
            # band_minmax carries the valid-masking / all-invalid-pin / NaN
            # semantics in ONE place (and the fused threaded native pass).
            rgb = np.moveaxis(rgb_hwc, -1, 0)
            r_lo, r_hi = native_io.band_minmax(rgb_hwc, valid)
            r_scale = np.maximum((r_hi - r_lo) / 65535.0, 1e-12).astype(np.float32)
            # NaN -> 0 deterministically before the uint cast (see the u16
            # cube branch above).
            rgb = np.nan_to_num(
                np.clip(
                    np.rint((rgb - r_lo[:, None, None]) / r_scale[:, None, None]),
                    0, 65535,
                ),
                nan=0.0,
            ).astype(np.uint16)
            raw["rgb_lo"], raw["rgb_scale"] = r_lo, r_scale
        else:
            rgb = np.moveaxis(rgb_hwc, -1, 0)
        raw.update({
            "cube": cube,
            # The valid mask ships bit-packed (1/8 of the bool bytes; the
            # fused program unpacks with one mask-and-compare). Geometry
            # travels via valid_host (the jit cache key below).
            "valid": np.packbits(valid.ravel()),
            "rgb": rgb,
        })
        # Host-side copy of the valid mask (a reference, not a copy): the
        # f16 download path restores exact NODATA sentinels from it after
        # the narrow cast rounds them (compute_fn), at zero wire cost.
        payload["valid_host"] = valid
        if multi:
            # Device unknown until a worker claims the scene: hand over host
            # arrays (uploads to different chips then proceed in parallel).
            payload.update(raw)
        else:
            # Start the (async) host->device transfers in the reader stage so
            # scene N+1's upload overlaps scene N's compute — the upload is
            # the largest per-scene cost on bandwidth-limited links.
            payload.update({k: jax.device_put(v) for k, v in raw.items()})
        scene.close()
        return payload

    def make_compute_fn(device=None) -> Callable[[Dict], Dict]:
        # One fused jitted program per (template, shape) per worker; granules
        # from the same sensor share shapes, so the cache hits after the
        # first scene on each chip.
        fused_cache: Dict = {}

        def compute_fn(payload: Dict) -> Dict:
            wl = payload["wavelengths"]
            # valid_host's (H, W) rides in the key: the u10 wire tensor and
            # the bit-packed valid mask both flatten pixels, so wire shapes
            # alone no longer pin the scene geometry.
            # The FULL band grid (wavelengths + fwhm) rides in too — the
            # packed wire shapes coarsen band-count information (u12 halves
            # it, u10 flattens pixels entirely) and two granules with equal
            # shapes but different interior band centers must not silently
            # reuse each other's CH4 template. The u12 tail flag guards the
            # jit arity (tail scenes take an extra operand).
            key = (
                payload["cube"].shape,
                payload["valid_host"].shape,
                "q_tail" in payload,
                np.asarray(wl, np.float64).tobytes(),
                np.asarray(payload["fwhm"], np.float64).tobytes(),
            )
            if key not in fused_cache:
                template = generate_template_from_bands(wl, payload["fwhm"])[:, 1]
                tpl_dev = jnp.asarray(template, jnp.float32)
                h_s, w_s = payload["valid_host"].shape

                # The valid mask arrives bit-packed (big bitorder, see
                # np.packbits in read_fn): one mask-and-compare unpacks it.
                bit_masks = jnp.array([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)

                def granule(c, r, vb):
                    v = ((vb[:, None] & bit_masks) != 0).reshape(-1)
                    v = v[: h_s * w_s].reshape(h_s, w_s)
                    pred, mf = emit_granule_to_mask(
                        c, r, tpl_dev, model_apply,
                        column_step=column_step, num_iter=num_iter, valid_mask=v,
                        stream_dtype=stream_dtype,
                    )
                    # ONE stacked device->host transfer instead of two
                    # synced downloads (each paid wire + ~33 ms tunnel RTT);
                    # f16 halves the bytes (docstring: download_dtype).
                    if down_f16:
                        return jnp.stack(
                            [pred, mf * (1.0 / MF_F16_SCALE)]
                        ).astype(jnp.float16)
                    return jnp.stack([pred, mf])

                # RGB planes arrive u16 under u12/u16 codecs; dequantize
                # inside the fused program (one multiply-add on 3 planes).
                def dequant_rgb(r, rlo, rsc):
                    return r.astype(jnp.float32) * rsc[:, None, None] + rlo[:, None, None]

                def dequant10(p, lo, sc):
                    # Unpack pixel-quad byte planes: shifts/masks per plane,
                    # one interleave, one multiply-add (shared by the u10
                    # cube and the u10 RGB wire).
                    b = p.astype(jnp.uint16)  # (5, G, S)
                    q0 = b[0] | ((b[1] & 0x3) << 8)
                    q1 = (b[1] >> 2) | ((b[2] & 0xF) << 6)
                    q2 = (b[2] >> 4) | ((b[3] & 0x3F) << 4)
                    q3 = (b[3] >> 6) | (b[4] << 2)
                    g, s_n = q0.shape
                    q = jnp.stack([q0, q1, q2, q3], axis=1).reshape(4 * g, s_n)
                    x = q[: h_s * w_s].astype(jnp.float32) * sc + lo
                    return x.reshape(h_s, w_s, s_n)

                if packed12:
                    # Unpack the byte planes inside the fused program: two
                    # shifts per plane + interleave + one multiply-add —
                    # trivial next to the filter; the win is 62.5% fewer
                    # wire bytes.
                    def dequant12(p, lo, sc, tail):
                        b0 = p[0].astype(jnp.uint16)
                        b1 = p[1].astype(jnp.uint16)
                        b2 = p[2].astype(jnp.uint16)
                        q0 = b0 | ((b1 & 0xF) << 8)
                        q1 = (b1 >> 4) | (b2 << 4)
                        h, w, sh = q0.shape
                        q = jnp.stack([q0, q1], axis=-1).reshape(h, w, 2 * sh)
                        x = q.astype(jnp.float32) * sc + lo
                        if tail is not None:
                            x = jnp.concatenate([x, tail], axis=-1)
                        return x

                    has_tail = "q_tail" in payload
                    if has_tail:
                        fused_cache[key] = jax.jit(
                            lambda c, lo, sc, tail, r, rlo, rsc, v: granule(
                                dequant12(c, lo, sc, tail), dequant_rgb(r, rlo, rsc), v
                            )
                        )
                    else:
                        fused_cache[key] = jax.jit(
                            lambda c, lo, sc, r, rlo, rsc, v: granule(
                                dequant12(c, lo, sc, None), dequant_rgb(r, rlo, rsc), v
                            )
                        )
                elif packed10:
                    # Cube AND RGB ride the u10 pixel-quad pack — 68.75%
                    # fewer wire bytes; RGB dequantizes to (H, W, 3) and
                    # transposes to the granule's CHW on device.
                    fused_cache[key] = jax.jit(
                        lambda c, lo, sc, r, rlo, rsc, v: granule(
                            dequant10(c, lo, sc),
                            jnp.moveaxis(dequant10(r, rlo, rsc), -1, 0),
                            v,
                        )
                    )
                elif quantized:
                    # Dequantize inside the fused program: one fused
                    # multiply-add pass before the filter.
                    fused_cache[key] = jax.jit(
                        lambda c, lo, sc, r, rlo, rsc, v: granule(
                            c.astype(jnp.float32) * sc + lo, dequant_rgb(r, rlo, rsc), v
                        )
                    )
                else:
                    fused_cache[key] = jax.jit(granule)
            cube, rgb, valid = payload["cube"], payload["rgb"], payload["valid"]
            if device is not None:
                cube = jax.device_put(cube, device)
                rgb = jax.device_put(rgb, device)
                valid = jax.device_put(valid, device)
            if packed or quantized:
                extra = [payload["q_lo"], payload["q_scale"]]
                if packed12 and "q_tail" in payload:
                    extra.append(payload["q_tail"])
                rgb_extra = [payload["rgb_lo"], payload["rgb_scale"]]
                if device is not None:
                    extra = [jax.device_put(a, device) for a in extra]
                    rgb_extra = [jax.device_put(a, device) for a in rgb_extra]
                out_d = fused_cache[key](cube, *extra, rgb, *rgb_extra, valid)
            else:
                out_d = fused_cache[key](cube, rgb, valid)
            both = np.asarray(out_d)  # the single stacked download
            if down_f16:
                both = both.astype(np.float32)
                pred, mf = both[0], both[1] * MF_F16_SCALE
                # Restore exact NODATA sentinels the narrow cast rounded
                # (invalid pixels are exactly the reader's ~valid set).
                mf = np.where(payload["valid_host"], mf, np.float32(NODATA))
            else:
                pred, mf = both[0], both[1]
            return _finalize_outputs(payload, pred, mf)

        return compute_fn

    def _finalize_outputs(payload: Dict, pred, mf) -> Dict:
        out = {"mag1c": mf, "prediction": pred}
        nodata = {"mag1c": -9999.0}
        if payload["glt"] is not None:
            from starcop_tpu.data.emit import glt_gather

            glt_x, glt_y, fill = payload["glt"]
            for key, fill_v in (("mag1c", fill), ("prediction", 0.0)):
                out[f"{key}_geo"] = glt_gather(glt_x, glt_y, out[key], fill_v)
            nodata["mag1c_geo"] = fill
        out["__geo__"] = {
            "transform": payload.get("transform"),
            "crs_epsg": payload.get("crs_epsg"),
            "nodata": nodata,
        }
        return out

    def write_fn(name: str, outputs: Dict):
        # GeoTIFF deliverables (the reference's outputs are COGs with
        # CRS/transform — process_aviris.py:224-241); the granule's transform
        # describes the GLT-mapped (ortho) grid, so only *_geo products (and
        # scenes with no GLT pass) carry it.
        from starcop_tpu.data.geotiff import write_geotiff

        geo = outputs.pop("__geo__", {})
        transform, crs_epsg = geo.get("transform"), geo.get("crs_epsg")
        nodata = geo.get("nodata", {})
        base = os.path.join(output_dir, os.path.splitext(os.path.basename(name))[0])
        os.makedirs(base, exist_ok=True)
        for key, arr in outputs.items():
            on_ortho_grid = key.endswith("_geo")
            write_geotiff(
                os.path.join(base, f"{key}.tif"),
                np.asarray(arr, np.float32),
                transform=transform if on_ortho_grid else None,
                crs_epsg=crs_epsg if on_ortho_grid else None,
                nodata=nodata.get(key),
                descriptions=["CH4 Absorption (ppm x m)" if "mag1c" in key else "plume probability"],
                compress=compress_outputs,
            )

    if multi:
        return ScenePipeline(
            read_fn,
            compute_fns=[make_compute_fn(d) for d in devices],
            write_fn=write_fn,
            queue_size=queue_size,
        )
    return ScenePipeline(read_fn, make_compute_fn(), write_fn, queue_size=queue_size)
