"""Sensor simulation and radiometric correction.

Re-design of the reference AVIRIS->S2/WV3 simulation and TOA stack
(/root/reference/starcop/data/aviris.py:19-338):

  * spectral response aggregation (``transform_to_srf``): AVIRIS bands are
    combined per target band by normalized SRF weights — on TPU this is one
    (H*W, K_aviris) x (K_aviris, B_out) matmul instead of a per-band Python
    loop;
  * anti-aliased resolution change (per-band Gaussian blur + resize);
  * TOA reflectance: earth-sun distance factor, solar zenith (own NOAA-style
    solar position — the reference uses pysolar), per-sensor solar irradiance
    tables (published ESA/Maxar constants, aviris.py:31-49).

SRFs: the reference loads measured SRF CSVs from GCS (aviris.py:27-29). This
framework ships tabulated per-sensor SRFs as an asset (``data/srf.py``,
``assets/srf_tables.npz`` — flat-topped super-Gaussian band shapes from the
published per-unit centers/FWHM, S2A and S2B distinct) consumed through
``srf_from_table``, with a measured-CSV override in the reference's schema
and a plain-Gaussian fallback (``srf_source='gaussian'``).
"""

from __future__ import annotations

import math
from datetime import datetime, timezone
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BANDS_S2_RESOLUTION = {
    "B1": 60, "B2": 10, "B3": 10, "B4": 10, "B5": 20, "B6": 20, "B7": 20,
    "B8": 10, "B8A": 20, "B9": 60, "B10": 60, "B11": 20, "B12": 20,
}

# Mean solar spectral irradiance per band, W/m^2/nm (ESA S2 L1C constants,
# Maxar WV3 SWIR constants/1000) — reference aviris.py:31-49.
SOLAR_IRRADIANCE_S2B = {
    "B01": 1.8743, "B02": 1.95977, "B03": 1.82493, "B04": 1.51279,
    "B05": 1.42578, "B06": 1.29113, "B07": 1.17557, "B08": 1.04128,
    "B8A": 0.95393, "B09": 0.81758, "B10": 0.36541, "B11": 0.24708, "B12": 0.08775,
}
SOLAR_IRRADIANCE_S2A = {
    "B01": 1.88469, "B02": 1.95972, "B03": 1.82324, "B04": 1.51206,
    "B05": 1.42464, "B06": 1.28761, "B07": 1.16208, "B08": 1.04163,
    "B8A": 0.95532, "B09": 0.81292, "B10": 0.36715, "B11": 0.24559, "B12": 0.08525,
}
SOLAR_IRRADIANCE_WV3 = {
    "SWIR1": 0.4778728, "SWIR2": 0.2632926, "SWIR3": 0.2249720, "SWIR4": 0.1973366,
    "SWIR5": 0.0903976, "SWIR6": 0.0850757, "SWIR7": 0.0769260, "SWIR8": 0.0680897,
}
SOLAR_IRRADIANCE = {"S2A": SOLAR_IRRADIANCE_S2A, "S2B": SOLAR_IRRADIANCE_S2B, "WV3": SOLAR_IRRADIANCE_WV3}

# Published band centers / FWHM (nm) for Gaussian SRF approximations.
S2_BAND_CENTERS_FWHM: Dict[str, Tuple[float, float]] = {
    "B1": (442.7, 21), "B2": (492.4, 66), "B3": (559.8, 36), "B4": (664.6, 31),
    "B5": (704.1, 15), "B6": (740.5, 15), "B7": (782.8, 20), "B8": (832.8, 106),
    "B8A": (864.7, 21), "B9": (945.1, 20), "B10": (1373.5, 31), "B11": (1613.7, 91),
    "B12": (2202.4, 175),
}
WV3_SWIR_CENTERS_FWHM: Dict[str, Tuple[float, float]] = {
    "SWIR1": (1210, 30), "SWIR2": (1570, 40), "SWIR3": (1660, 40), "SWIR4": (1730, 40),
    "SWIR5": (2165, 40), "SWIR6": (2205, 40), "SWIR7": (2260, 50), "SWIR8": (2330, 70),
}


# ------------------------------------------------------------------ solar
def earth_sun_distance_correction_factor(date_of_acquisition: datetime) -> float:
    """(1 - 0.01673 cos(0.0172 (doy - 4))) — reference aviris.py:53-72."""
    tm_yday = date_of_acquisition.timetuple().tm_yday
    return 1 - 0.01673 * math.cos(0.0172 * (tm_yday - 4))


def solar_zenith_angle(lat_deg: float, lon_deg: float, when: datetime) -> float:
    """Solar zenith angle in degrees (NOAA low-accuracy solar position,
    accurate to ~0.1 degree — replaces the reference's pysolar dependency)."""
    if when.tzinfo is None:
        when = when.replace(tzinfo=timezone.utc)
    when = when.astimezone(timezone.utc)
    # Julian centuries since J2000.0
    y, m = when.year, when.month
    d = when.day + (when.hour + when.minute / 60 + when.second / 3600) / 24.0
    if m <= 2:
        y -= 1
        m += 12
    a = y // 100
    b = 2 - a + a // 4
    jd = int(365.25 * (y + 4716)) + int(30.6001 * (m + 1)) + d + b - 1524.5
    t = (jd - 2451545.0) / 36525.0
    # Sun geometry
    l0 = (280.46646 + t * (36000.76983 + 0.0003032 * t)) % 360
    m_anom = 357.52911 + t * (35999.05029 - 0.0001537 * t)
    mrad = math.radians(m_anom)
    c = (
        (1.914602 - t * (0.004817 + 0.000014 * t)) * math.sin(mrad)
        + (0.019993 - 0.000101 * t) * math.sin(2 * mrad)
        + 0.000289 * math.sin(3 * mrad)
    )
    true_long = l0 + c
    omega = 125.04 - 1934.136 * t
    app_long = true_long - 0.00569 - 0.00478 * math.sin(math.radians(omega))
    # Obliquity
    e0 = 23 + (26 + (21.448 - t * (46.815 + t * (0.00059 - t * 0.001813))) / 60) / 60
    e = e0 + 0.00256 * math.cos(math.radians(omega))
    # Declination
    decl = math.degrees(math.asin(math.sin(math.radians(e)) * math.sin(math.radians(app_long))))
    # Equation of time (minutes)
    var_y = math.tan(math.radians(e / 2)) ** 2
    ecc = 0.016708634 - t * (0.000042037 + 0.0000001267 * t)
    l0r = math.radians(l0)
    eot = 4 * math.degrees(
        var_y * math.sin(2 * l0r)
        - 2 * ecc * math.sin(mrad)
        + 4 * ecc * var_y * math.sin(mrad) * math.cos(2 * l0r)
        - 0.5 * var_y**2 * math.sin(4 * l0r)
        - 1.25 * ecc**2 * math.sin(2 * mrad)
    )
    minutes = when.hour * 60 + when.minute + when.second / 60
    tst = (minutes + eot + 4 * lon_deg) % 1440
    ha = tst / 4 - 180 if tst / 4 >= 0 else tst / 4 + 180
    latr, declr, har = map(math.radians, (lat_deg, decl, ha))
    cos_zenith = math.sin(latr) * math.sin(declr) + math.cos(latr) * math.cos(declr) * math.cos(har)
    return math.degrees(math.acos(max(-1.0, min(1.0, cos_zenith))))


def observation_date_correction_factor(
    center_coords: Tuple[float, float], date_of_acquisition: datetime
) -> float:
    """pi d^2 / cos(sza) — reference aviris.py:75-107 (coords lon/lat EPSG:4326)."""
    lon, lat = center_coords
    sza = solar_zenith_angle(lat, lon, date_of_acquisition)
    d = earth_sun_distance_correction_factor(date_of_acquisition)
    return math.pi * d**2 / math.cos(math.radians(sza))


def radiance_to_reflectance(
    data: jax.Array,
    solar_irradiance: Sequence[float],
    correction_factor: float,
    fill_value: Optional[float] = None,
) -> jax.Array:
    """TOA reflectance from AVIRIS-unit radiance (uW/nm/cm^2/sr).

    toa = radiance * 1e-6/1e-4 * (pi d^2 / cos sza) / E_band
    (reference aviris.py:110-152; the caller computes correction_factor via
    ``observation_date_correction_factor`` from the scene center/date).
    """
    si = jnp.asarray(solar_irradiance, data.dtype)[:, None, None]
    radiances = data * (1e-6 / 1e-4)
    toa = radiances * correction_factor / si
    if fill_value is not None:
        toa = jnp.where(data == fill_value, fill_value, toa)
    return toa


# -------------------------------------------------------------------- SRF
def gaussian_srf_weights(
    aviris_wavelengths: Sequence[float],
    band_centers_fwhm: Dict[str, Tuple[float, float]],
    bands: Optional[Sequence[str]] = None,
) -> Tuple[np.ndarray, List[str]]:
    """(K_aviris, B_out) normalized SRF weight matrix from Gaussian bands."""
    bands = list(bands or band_centers_fwhm.keys())
    wl = np.asarray(aviris_wavelengths, np.float64)
    cols = []
    for b in bands:
        center, fwhm = band_centers_fwhm[b]
        sigma = fwhm / (2 * math.sqrt(2 * math.log(2)))
        w = np.exp(-((wl - center) ** 2) / (2 * sigma**2))
        w[w < 1e-4 * w.max()] = 0.0
        total = w.sum()
        if total <= 0:
            raise ValueError(f"No AVIRIS coverage for band {b}")
        cols.append(w / total)
    return np.stack(cols, axis=1), bands


def covered_bands(
    aviris_wavelengths: Sequence[float],
    band_centers_fwhm: Dict[str, Tuple[float, float]],
    n_sigma: float = 2.0,
) -> List[str]:
    """Bands whose SRF support lies inside the cube's wavelength range
    (used when a cube covers only part of the spectrum, e.g. SWIR-only)."""
    wl = np.asarray(aviris_wavelengths, np.float64)
    lo, hi = wl.min(), wl.max()
    out = []
    for b, (center, fwhm) in band_centers_fwhm.items():
        sigma = fwhm / (2 * math.sqrt(2 * math.log(2)))
        if center - n_sigma * sigma >= lo and center + n_sigma * sigma <= hi:
            out.append(b)
    return out


def srf_from_table(
    aviris_wavelengths: Sequence[float],
    srf_wavelengths: Sequence[float],
    srf_values: np.ndarray,
    threshold: float = 1e-4,
) -> np.ndarray:
    """(K_aviris, B_out) weights from a measured SRF table.

    Implements the reference's nearest-band resampling + normalization
    (aviris.py:278-310): each SRF wavelength maps to its nearest AVIRIS band;
    weights below ``threshold`` are dropped; each column normalized to sum 1
    before grouping by AVIRIS band.
    """
    wl = np.asarray(aviris_wavelengths, np.float64)
    srf_wl = np.asarray(srf_wavelengths, np.float64)
    srf_values = np.asarray(srf_values, np.float64)  # (len(srf_wl), B_out)
    nearest = np.argmin(np.abs(srf_wl[:, None] - wl[None, :]), axis=1)
    k, b_out = len(wl), srf_values.shape[1]
    weights = np.zeros((k, b_out))
    for j in range(b_out):
        col = srf_values[:, j].copy()
        col[col <= threshold] = 0.0
        total = col.sum()
        if total <= 0:
            raise ValueError(f"SRF column {j} has no support")
        col = col / total
        np.add.at(weights[:, j], nearest[col > 0], col[col > 0])
    return weights


def gaussian_blur(x: jax.Array, sigma: float) -> jax.Array:
    """Separable Gaussian blur of (..., H, W) (anti-aliasing before resize)."""
    if sigma <= 0:
        return x
    radius = max(1, int(math.ceil(3 * sigma)))
    grid = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-(grid**2) / (2 * sigma**2))
    k = jnp.asarray(k / k.sum())
    batch = x.shape[:-2]
    h, w = x.shape[-2:]
    xr = x.reshape((-1, 1, h, w)).astype(jnp.float32)
    # Reflect-pad so borders keep full kernel mass (skimage 'mirror' semantics).
    xr = jnp.pad(xr, ((0, 0), (0, 0), (radius, radius), (radius, radius)), mode="reflect")
    kv = k.reshape(1, 1, -1, 1)
    kh = k.reshape(1, 1, 1, -1)
    dn = ("NCHW", "OIHW", "NCHW")
    xr = jax.lax.conv_general_dilated(xr, kv, (1, 1), [(0, 0), (0, 0)], dimension_numbers=dn)
    xr = jax.lax.conv_general_dilated(xr, kh, (1, 1), [(0, 0), (0, 0)], dimension_numbers=dn)
    return xr.reshape(batch + (h, w))


def transform_to_srf(
    aviris_cube: jax.Array,
    weights: np.ndarray,
    scale: float = 1.0,
    sigma_bands: Optional[Sequence[float]] = None,
    fill_value: float = 0.0,
    valid_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Simulate a multispectral sensor from an AVIRIS cube.

    Args:
        aviris_cube: (H, W, K) radiance.
        weights: (K, B_out) normalized SRF weight matrix.
        scale: output resolution change factor (>1 downsamples, e.g. 10m from
            ~4-8m AVIRIS); implemented as per-band anti-aliased resize.
        sigma_bands: per-band anti-aliasing sigmas (reference: (scale-1)/2 per
            band resolution, aviris.py:248-254).
        valid_mask: (H, W) True where the cube is valid; invalid -> fill_value.

    Returns:
        (B_out, H', W') simulated bands — one matmul on the MXU, then blur/resize.
    """
    h, w, k = aviris_cube.shape
    wts = jnp.asarray(weights, aviris_cube.dtype)
    # precision=highest: the TPU MXU's default f32 matmul rounds through
    # bf16 (~1e-3 relative error); band aggregation is tiny FLOPs, so buy
    # full f32 accuracy for the radiometry.
    out = jnp.einsum(
        "hwk,kb->bhw",
        aviris_cube,
        wts,
        preferred_element_type=aviris_cube.dtype,
        precision="highest",
    )
    if valid_mask is not None:
        out = jnp.where(valid_mask[None], out, fill_value)
    if scale != 1.0 or sigma_bands is not None:
        new_h, new_w = max(1, round(h / scale)), max(1, round(w / scale))
        bands_out = []
        for i in range(out.shape[0]):
            band = out[i]
            sigma = (
                sigma_bands[i]
                if sigma_bands is not None
                else max((scale - 1) / 2, 0)
            )
            band = gaussian_blur(band, float(sigma))
            if (new_h, new_w) != (h, w):
                band = jax.image.resize(band, (new_h, new_w), method="bilinear")
            bands_out.append(band)
        out = jnp.stack(bands_out)
    return out


def _resolve_srf_weights(
    aviris_wavelengths: Sequence[float],
    sensor: str,
    bands: List[str],
    gaussian_table: Dict[str, Tuple[float, float]],
    srf_source: str,
    srf_csv: Optional[str],
) -> np.ndarray:
    """Weight matrix from the requested SRF source: 'table' (the shipped
    tabulated SRFs / a measured CSV — the reference's mechanism,
    aviris.py:155-223) or 'gaussian' (center/FWHM approximation)."""
    if srf_source == "gaussian":
        weights, _ = gaussian_srf_weights(aviris_wavelengths, gaussian_table, bands)
        return weights
    if srf_source != "table":
        raise ValueError(f"srf_source must be 'table' or 'gaussian', got {srf_source!r}")
    from starcop_tpu.data.srf import srf_table_weights

    weights, _ = srf_table_weights(
        aviris_wavelengths, sensor, bands=bands, path_override=srf_csv
    )
    return weights


def transform_to_worldview_3(
    aviris_cube: jax.Array,
    aviris_wavelengths: Sequence[float],
    bands: Optional[Sequence[str]] = None,
    scale: float = 1.0,
    srf_weights: Optional[np.ndarray] = None,
    srf_source: str = "table",
    srf_csv: Optional[str] = None,
    **kwargs,
) -> Tuple[jax.Array, List[str]]:
    """AVIRIS -> WV3 SWIR simulation (reference aviris.py:225-235).

    Uses the shipped tabulated WV3 SRFs by default (``data/srf.py``); pass a
    measured-SRF CSV via ``srf_csv`` for exact instrument parity, or
    ``srf_source='gaussian'`` for the center/FWHM approximation.
    """
    bands = list(bands or WV3_SWIR_CENTERS_FWHM.keys())
    if srf_weights is None:
        srf_weights = _resolve_srf_weights(
            aviris_wavelengths, "WV3", bands, WV3_SWIR_CENTERS_FWHM, srf_source, srf_csv
        )
    return transform_to_srf(aviris_cube, srf_weights, scale=scale, **kwargs), bands


def transform_to_sentinel_2(
    aviris_cube: jax.Array,
    aviris_wavelengths: Sequence[float],
    bands: Optional[Sequence[str]] = None,
    sensor: str = "S2A",
    resolution_src: float = 8.0,
    resolution_dst: float = 10.0,
    srf_weights: Optional[np.ndarray] = None,
    srf_source: str = "table",
    srf_csv: Optional[str] = None,
    **kwargs,
) -> Tuple[jax.Array, List[str]]:
    """AVIRIS -> Sentinel-2 simulation with per-band anti-aliasing sigmas from
    the native band resolutions (reference aviris.py:238-260). Per-unit
    tabulated SRFs (S2A vs S2B differ) by default; see
    ``transform_to_worldview_3`` for the srf_source/srf_csv options.
    """
    bands = list(bands or S2_BAND_CENTERS_FWHM.keys())
    if srf_weights is None:
        srf_weights = _resolve_srf_weights(
            aviris_wavelengths, sensor.upper(), bands, S2_BAND_CENTERS_FWHM,
            srf_source, srf_csv,
        )
    sigma_bands = [
        max((BANDS_S2_RESOLUTION[b] / resolution_src - 1) / 2, 0) for b in bands
    ]
    scale = resolution_dst / resolution_src
    return (
        transform_to_srf(aviris_cube, srf_weights, scale=scale, sigma_bands=sigma_bands, **kwargs),
        bands,
    )
