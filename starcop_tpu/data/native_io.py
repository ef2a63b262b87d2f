"""ctypes bindings for the native IO library (cpp/starcop_io.cpp).

Threaded windowed raster reads on the host side of the input pipeline: batch
chip-window reads run in native threads (pread, no GIL), replacing the
reference's per-worker-process GDAL readers for raw layouts. Falls back to
numpy memmap reads transparently when the shared library isn't built.

Build: ``make -C cpp`` (done lazily on first use when g++ is available).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
_LIB_PATH = os.path.join(_REPO_ROOT, "cpp", "libstarcop_io.so")

LAYOUT_R2 = 0  # (H, W)
LAYOUT_BIP = 1  # (H, W, C)
LAYOUT_BSQ = 2  # (C, H, W)

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    # Build when the library is missing OR older than the source (the old
    # code only built when the .so was absent, so edits never took effect).
    # The mtime check — not an unconditional make — keeps process startup
    # free of a fork/exec when the library is current and shrinks the
    # window in which concurrent processes rebuild the same file (the
    # Makefile additionally compiles to a PID-suffixed temp and renames, so
    # a loader never maps a half-written library).
    makefile = os.path.join(_REPO_ROOT, "cpp", "Makefile")
    src = os.path.join(_REPO_ROOT, "cpp", "starcop_io.cpp")
    try:
        needs_build = os.path.exists(makefile) and (
            not os.path.exists(_LIB_PATH)
            or (
                os.path.exists(src)
                and os.stat(src).st_mtime > os.stat(_LIB_PATH).st_mtime
            )
        )
    except OSError:
        needs_build = os.path.exists(makefile)
    if needs_build:
        try:
            subprocess.run(
                ["make", "-C", os.path.dirname(makefile)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except subprocess.CalledProcessError as e:
            # A silent failure here would load the STALE library — the exact
            # divergence class the mtime check exists to prevent. Fall
            # through (a pre-built library may still be usable) but say so.
            stderr = (e.stderr or b"").decode(errors="replace")[-2000:]
            logger.warning("native IO rebuild failed; using the existing "
                           "library or numpy fallback. Compiler said:\n%s", stderr)
        except (subprocess.SubprocessError, OSError) as e:
            logger.warning("native IO rebuild did not run (%s); using the "
                           "existing library or numpy fallback", e)
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        # E.g. a truncated .so from a killed build: degrade to numpy rather
        # than crashing every caller (the module contract is transparent
        # fallback).
        logger.warning("could not load %s (%s); using numpy fallback", _LIB_PATH, e)
        return None
    lib.starcop_read_window.restype = ctypes.c_int
    lib.starcop_read_windows_batch.restype = ctypes.c_int
    lib.starcop_file_size.restype = ctypes.c_int64
    # Upload-codec entry points are absent in a stale pre-built library;
    # treat them as optional so the numpy fallback keeps working.
    for fn in ("starcop_band_minmax", "starcop_valid_band_minmax",
               "starcop_quantize_pack12", "starcop_quantize_pack10"):
        if hasattr(lib, fn):
            getattr(lib, fn).restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def npy_payload_info(path: str) -> Tuple[int, Tuple[int, ...], np.dtype]:
    """Header offset, shape and dtype of a .npy file (v1/v2 headers)."""
    with open(path, "rb") as fh:
        version = np.lib.format.read_magic(fh)
        shape, fortran, dtype = np.lib.format._read_array_header(fh, version)
        if fortran:
            raise ValueError("Fortran-ordered .npy not supported")
        return fh.tell(), shape, dtype


def read_window(
    path: str,
    shape: Sequence[int],
    dtype: np.dtype,
    window: Tuple[int, int, int, int],
    layout: int = LAYOUT_R2,
    offset_bytes: int = 0,
) -> np.ndarray:
    """Read (row_off, col_off, h, w) window; returns the window array."""
    row_off, col_off, h, w = window
    dtype = np.dtype(dtype)
    lib = _load()
    if layout == LAYOUT_R2:
        out_shape: Tuple[int, ...] = (h, w)
    elif layout == LAYOUT_BIP:
        out_shape = (h, w, int(shape[2]))
    else:
        out_shape = (int(shape[0]), h, w)

    if lib is None:  # numpy fallback
        mm = np.memmap(path, dtype=dtype, mode="r", offset=offset_bytes, shape=tuple(shape))
        if layout == LAYOUT_R2:
            return np.array(mm[row_off : row_off + h, col_off : col_off + w])
        if layout == LAYOUT_BIP:
            return np.array(mm[row_off : row_off + h, col_off : col_off + w, :])
        return np.array(mm[:, row_off : row_off + h, col_off : col_off + w])

    out = np.empty(out_shape, dtype=dtype)
    shape_arr = (ctypes.c_int64 * 3)(*(list(shape) + [1] * (3 - len(shape))))
    rc = lib.starcop_read_window(
        path.encode(),
        ctypes.c_int64(offset_bytes),
        ctypes.c_int32(dtype.itemsize),
        ctypes.c_int32(layout),
        shape_arr,
        ctypes.c_int64(row_off),
        ctypes.c_int64(col_off),
        ctypes.c_int64(h),
        ctypes.c_int64(w),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise OSError(f"starcop_read_window({path}) failed: {rc}")
    return out


def band_minmax(
    cube: np.ndarray, valid: Optional[np.ndarray] = None, n_threads: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-band (lo, hi) over valid pixels of a (..., S) float32 cube.

    One fused threaded pass in native code when the library is built; the
    numpy fallback needs two full-cube temporaries. All-invalid bands pin
    (0, 1) so the downstream quantization scale stays finite.
    """
    cube = np.ascontiguousarray(cube, np.float32)
    s = cube.shape[-1]
    n_px = int(np.prod(cube.shape[:-1]))
    if valid is not None:
        valid = np.ascontiguousarray(valid.reshape(n_px), np.uint8)
    lib = _load()
    if lib is not None and hasattr(lib, "starcop_band_minmax"):
        lo = np.empty(s, np.float32)
        hi = np.empty(s, np.float32)
        rc = lib.starcop_band_minmax(
            cube.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            None if valid is None else valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int64(n_px),
            ctypes.c_int32(s),
            lo.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            hi.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int32(n_threads),
        )
        if rc != 0:
            raise OSError(f"starcop_band_minmax failed: {rc}")
        return lo, hi
    flat = cube.reshape(n_px, s)
    # Match the native kernel's NaN semantics: NaN comparisons are false in
    # C++, so NaN values never contribute to the range (a plain .min() here
    # would propagate NaN and pin the whole band to (0, 1), flattening every
    # real radiance to one quantization level on the wire).
    contrib = ~np.isnan(flat)
    if valid is not None:
        contrib &= valid.astype(bool)[:, None]
    lo = np.where(contrib, flat, np.inf).min(axis=0)
    hi = np.where(contrib, flat, -np.inf).max(axis=0)
    ok = np.isfinite(lo) & np.isfinite(hi)
    return (
        np.where(ok, lo, 0.0).astype(np.float32),
        np.where(ok, hi, 1.0).astype(np.float32),
    )


def valid_band_minmax(
    cube: np.ndarray,
    fill: float,
    n_minmax_bands: Optional[int] = None,
    n_threads: int = 0,
) -> Tuple[np.ndarray, Optional[np.ndarray], Optional[np.ndarray]]:
    """Fused nodata-validity scan + per-band (lo, hi) in ONE threaded pass.

    ``valid[p]`` = no band of pixel p equals the ``fill`` sentinel — the
    ``EMITRawScene.invalid_mask`` contract (any band at fill invalidates the
    pixel; NaN never invalidates — NaN != fill — and never contributes to
    the range, matching ``band_minmax``). (lo, hi) accumulate over valid
    pixels of the FIRST ``n_minmax_bands`` bands (default: all bands; 0
    skips minmax and returns ``(valid, None, None)`` — the validity-only
    scan of the f32/bf16 serving paths). The band prefix covers the u12
    codec's even-band body while validity still scans the odd tail band.
    All-invalid bands pin (0, 1) so downstream quantization scales stay
    finite.

    One native pass replaces the serving read stage's numpy compare+any
    pass plus the separate minmax pass (~25 ms of the uncontended read
    stage on the 80 MB bench cube). The scalar compares in f32 exactly as
    numpy's ``cube == fill`` does (NEP-50 weak scalar).

    Returns ``(valid bool cube.shape[:-1], lo (s_mm,) f32, hi (s_mm,) f32)``.
    """
    cube = np.ascontiguousarray(cube, np.float32)
    s = cube.shape[-1]
    s_mm = s if n_minmax_bands is None else int(n_minmax_bands)
    if not 0 <= s_mm <= s:
        raise ValueError(f"n_minmax_bands must be in [0, {s}], got {s_mm}")
    n_px = int(np.prod(cube.shape[:-1]))
    lib = _load()
    if lib is not None and hasattr(lib, "starcop_valid_band_minmax"):
        valid = np.empty(n_px, np.uint8)
        lo = np.empty(max(s_mm, 1), np.float32)
        hi = np.empty(max(s_mm, 1), np.float32)
        rc = lib.starcop_valid_band_minmax(
            cube.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_float(float(fill)),
            ctypes.c_int64(n_px),
            ctypes.c_int32(s),
            ctypes.c_int32(s_mm),
            valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            lo.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            hi.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int32(n_threads),
        )
        if rc != 0:
            raise OSError(f"starcop_valid_band_minmax failed: {rc}")
        valid_b = valid.view(bool).reshape(cube.shape[:-1])
        if s_mm == 0:
            return valid_b, None, None
        return valid_b, lo, hi
    # numpy fallback: the same two logical passes the fusion replaces.
    flat = cube.reshape(n_px, s)
    valid_b = ~(flat == np.float32(fill)).any(axis=-1)
    valid_shaped = valid_b.reshape(cube.shape[:-1])
    if s_mm == 0:
        return valid_shaped, None, None
    lo, hi = band_minmax(cube[..., :s_mm], valid_shaped)
    return valid_shaped, lo, hi


def quantize_pack12(
    cube: np.ndarray,
    lo: np.ndarray,
    scale: np.ndarray,
    n_threads: int = 0,
) -> np.ndarray:
    """Per-band affine 12-bit quantization, band pairs packed 2 values/3 bytes.

    cube: (..., S) float32 with S even; lo/scale: (S,) affine grid per band
    (q = clamp(rint((x - lo)/scale), 0, 4095)). Returns a (3, ..., S/2) uint8
    array of byte planes:

        b0 = q0 & 0xff, b1 = (q0 >> 8) | ((q1 & 0xf) << 4), b2 = q1 >> 4

    for each band pair (2k, 2k+1) — the wire format of the serving pipeline's
    'u12' upload codec (unpacked on device, see serve/pipeline.py). Native
    path is one fused threaded pass; numpy fallback vectorizes the same math
    (rounding may differ by one step on exact-half grid points).
    """
    cube = np.ascontiguousarray(cube, np.float32)
    s = cube.shape[-1]
    if s % 2:
        raise ValueError(f"quantize_pack12 needs an even band count, got {s}")
    n_px = int(np.prod(cube.shape[:-1]))
    out_shape = (3,) + cube.shape[:-1] + (s // 2,)
    lo = np.ascontiguousarray(lo, np.float32)
    inv_scale = np.ascontiguousarray(1.0 / np.asarray(scale, np.float32))
    # The native kernel indexes lo/scale per band with no bounds check; a
    # wrong-length array would read out of bounds where the numpy fallback
    # raises a broadcast error — fail loudly and identically on both paths.
    if lo.shape != (s,) or inv_scale.shape != (s,):
        raise ValueError(
            f"lo/scale must have shape ({s},); got {lo.shape}/{inv_scale.shape}"
        )
    lib = _load()
    if lib is not None and hasattr(lib, "starcop_quantize_pack12"):
        out = np.empty(out_shape, np.uint8)
        rc = lib.starcop_quantize_pack12(
            cube.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int64(n_px),
            ctypes.c_int32(s),
            lo.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            inv_scale.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int32(n_threads),
        )
        if rc != 0:
            raise OSError(f"starcop_quantize_pack12 failed: {rc}")
        return out
    # nan_to_num BEFORE the uint16 cast: np.clip propagates NaN and casting
    # NaN to an int type is platform-dependent; the native kernel maps NaN
    # to 0 deterministically (cpp/starcop_io.cpp clamp), so match it.
    q = np.nan_to_num(
        np.clip(np.rint((cube - lo) * inv_scale), 0, 4095), nan=0.0
    ).astype(np.uint16)
    q0, q1 = q[..., 0::2], q[..., 1::2]
    out = np.empty(out_shape, np.uint8)
    out[0] = q0 & 0xFF
    out[1] = (q0 >> 8).astype(np.uint8) | ((q1 & 0xF) << 4).astype(np.uint8)
    out[2] = (q1 >> 4).astype(np.uint8)
    return out


def quantize_pack10(
    cube: np.ndarray,
    lo: np.ndarray,
    scale: np.ndarray,
    n_threads: int = 0,
) -> np.ndarray:
    """Per-band affine 10-bit quantization, PIXEL quads packed 4 values/5 bytes.

    cube: (..., S) float32, any S; lo/scale: (S,) affine grid per band
    (q = clamp(rint((x - lo)/scale), 0, 1023)). Pixels are flattened and
    grouped in quads along the pixel axis (so no band padding is ever
    needed, unlike the band-pair pack12); a trailing partial quad carries
    q=0 pads the device slices off. Returns a (5, n_groups, S) uint8 array
    of byte planes with n_groups = ceil(n_px / 4):

        p0 = q0 & 0xff
        p1 = (q0 >> 8) | ((q1 & 0x3f) << 2)
        p2 = (q1 >> 6) | ((q2 & 0x0f) << 4)
        p3 = (q2 >> 4) | ((q3 & 0x03) << 6)
        p4 = q3 >> 2

    — the wire format of the serving pipeline's 'u10' upload codec (5/6 of
    u12's bytes; unpacked on device, see serve/pipeline.py). Native path is
    one fused threaded pass; numpy fallback vectorizes the same math
    (rounding may differ by one step on exact-half grid points).
    """
    cube = np.ascontiguousarray(cube, np.float32)
    s = cube.shape[-1]
    n_px = int(np.prod(cube.shape[:-1]))
    n_groups = (n_px + 3) // 4
    out_shape = (5, n_groups, s)
    lo = np.ascontiguousarray(lo, np.float32)
    inv_scale = np.ascontiguousarray(1.0 / np.asarray(scale, np.float32))
    # See quantize_pack12: the native kernel has no bounds check on lo/scale.
    if lo.shape != (s,) or inv_scale.shape != (s,):
        raise ValueError(
            f"lo/scale must have shape ({s},); got {lo.shape}/{inv_scale.shape}"
        )
    lib = _load()
    if lib is not None and hasattr(lib, "starcop_quantize_pack10"):
        out = np.empty(out_shape, np.uint8)
        rc = lib.starcop_quantize_pack10(
            cube.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int64(n_px),
            ctypes.c_int32(s),
            lo.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            inv_scale.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int32(n_threads),
        )
        if rc != 0:
            raise OSError(f"starcop_quantize_pack10 failed: {rc}")
        return out
    # NaN -> 0 deterministically, matching the native clamp (see pack12).
    q = np.nan_to_num(
        np.clip(np.rint((cube.reshape(n_px, s) - lo) * inv_scale), 0, 1023),
        nan=0.0,
    ).astype(np.uint16)
    if n_px % 4:
        q = np.concatenate(
            [q, np.zeros((4 * n_groups - n_px, s), np.uint16)], axis=0
        )
    q = q.reshape(n_groups, 4, s)
    q0, q1, q2, q3 = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    out = np.empty(out_shape, np.uint8)
    out[0] = q0 & 0xFF
    out[1] = (q0 >> 8).astype(np.uint8) | ((q1 & 0x3F) << 2).astype(np.uint8)
    out[2] = (q1 >> 6).astype(np.uint8) | ((q2 & 0x0F) << 4).astype(np.uint8)
    out[3] = (q2 >> 4).astype(np.uint8) | ((q3 & 0x03) << 6).astype(np.uint8)
    out[4] = (q3 >> 2).astype(np.uint8)
    return out


def read_npy_windows_batch(
    paths: Sequence[str],
    windows: Sequence[Tuple[int, int, int, int]],
    n_threads: int = 0,
) -> List[np.ndarray]:
    """Batched windowed reads from single-band .npy rasters, native-threaded."""
    lib = _load()
    infos = [npy_payload_info(p) for p in paths]
    if lib is None:
        return [
            read_window(p, info[1], info[2], win, LAYOUT_R2, info[0])
            for p, info, win in zip(paths, infos, windows)
        ]
    n = len(paths)
    dtype = infos[0][2]
    if any(i[2] != dtype for i in infos):
        raise ValueError("Mixed dtypes in a batch are not supported")
    outs = [np.empty((w[2], w[3]), dtype=dtype) for w in windows]
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    c_offsets = (ctypes.c_int64 * n)(*[i[0] for i in infos])
    shapes_flat = []
    for i in infos:
        shapes_flat.extend(list(i[1]) + [1] * (3 - len(i[1])))
    c_shapes = (ctypes.c_int64 * (3 * n))(*shapes_flat)
    wins_flat = []
    for w in windows:
        wins_flat.extend(w)
    c_wins = (ctypes.c_int64 * (4 * n))(*wins_flat)
    c_outs = (ctypes.POINTER(ctypes.c_uint8) * n)(
        *[o.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for o in outs]
    )
    rc = lib.starcop_read_windows_batch(
        c_paths,
        c_offsets,
        ctypes.c_int32(dtype.itemsize),
        ctypes.c_int32(LAYOUT_R2),
        c_shapes,
        c_wins,
        c_outs,
        ctypes.c_int32(n),
        ctypes.c_int32(n_threads),
    )
    if rc != 0:
        raise OSError(f"starcop_read_windows_batch failed: {rc}")
    return outs
