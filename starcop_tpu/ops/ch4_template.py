"""CH4 unit-absorption template generation.

Convolves the CH4 radiance look-up table (7 concentrations x 31800 wavelengths,
1399.6-2522 nm) with per-band Gaussian spectral response functions and fits the
log-radiance slope against concentration, yielding the per-band unit absorption
spectrum used as the matched-filter target.

Behavioral parity with the reference ``generate_template_from_bands``
(/root/reference/starcop/models/mag1c.py:60-95) and ``get_mask_bad_bands``
(mag1c.py:98-113). Runs on host in numpy float64: it is a tiny one-time setup
computation (per sensor band set), not a hot path — the TPU work starts at the
matched filter itself.

The LUT ships as ``assets/ch4_lut.npz`` (converted from the BSD-3-licensed
ENVI-format LUT of markusfoote/mag1c; see assets/README.md for provenance).
"""

from __future__ import annotations

import functools
import os
from typing import List, Tuple, Union

import numpy as np

SCALING = 1e5

_ASSET_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "assets", "ch4_lut.npz")


@functools.lru_cache(maxsize=1)
def load_ch4_lut() -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Load the CH4 absorption LUT.

    Returns:
        wavelengths_nm: (31800,) float64 — LUT wavelength grid in nanometers.
        radiances: (7, 31800) float64 — simulated radiance per concentration.
        concentrations_ppmm: (7,) float64 — [0, 500, 1000, 2000, 4000, 8000, 16000].
    """
    with np.load(os.path.abspath(_ASSET_PATH)) as f:
        return (
            f["wavelengths_nm"].copy(),
            f["radiances"].copy(),
            f["concentrations_ppmm"].copy(),
        )


def generate_template_from_bands(
    centers: Union[np.ndarray, List[float]],
    fwhm: Union[np.ndarray, List[float]],
) -> np.ndarray:
    """Calculate the methane unit absorption spectrum for a band set.

    Args:
        centers: (K,) band center wavelengths in nanometers.
        fwhm: (K,) full width at half maximum of each band's Gaussian SRF.

    Returns:
        (K, 2) array: column 0 = band centers, column 1 = unit absorption
        spectrum (log-radiance slope vs concentration, scaled by 1e5).
    """
    centers = np.asarray(centers, dtype=np.float64)
    fwhm = np.asarray(fwhm, dtype=np.float64)
    if np.any(~np.isfinite(centers)) or np.any(~np.isfinite(fwhm)):
        raise ValueError("Band centers/FWHM contain non-finite data (NaN or Inf).")
    if centers.shape[0] != fwhm.shape[0]:
        raise ValueError("centers and fwhm must have equal length.")

    wave, rads, concentrations = load_ch4_lut()

    # Gaussian SRF per band, normalized to unit sum over the LUT grid.
    sigma = fwhm / (2.0 * np.sqrt(2.0 * np.log(2.0)))  # (K,)
    var = sigma**2
    denom = np.sqrt(2.0 * np.pi * var)  # (K,)
    response = np.exp(-((wave[:, None] - centers[None, :]) ** 2) / (2.0 * var)) / denom  # (31800, K)
    colsum = response.sum(axis=0)
    # out=zeros: ``where=`` alone leaves the masked slots UNINITIALIZED
    # (np.empty garbage) — a band with no SRF overlap on the LUT grid
    # (colsum == 0) would otherwise produce nondeterministic template
    # values. The reference carries the same hazard (mag1c.py:88-91);
    # zeros make the out-of-grid bands a deterministic zero spectrum.
    response = np.divide(
        response, colsum, out=np.zeros_like(response), where=colsum > 0
    )

    # Resample LUT radiances onto the band set, then least-squares fit
    # log(radiance) = a + slope * concentration per band.
    resampled = rads @ response  # (7, K)
    lograd = np.log(
        resampled, out=np.zeros_like(resampled), where=resampled > 0
    )
    lsqmat = np.stack((np.ones_like(concentrations), concentrations)).T  # (7, 2)
    slope, _, _, _ = np.linalg.lstsq(lsqmat, lograd, rcond=None)  # (2, K)
    spectrum = slope[1, :] * SCALING
    return np.stack((centers, spectrum)).T


def get_mask_bad_bands(wave: np.ndarray) -> np.ndarray:
    """Mask of wavelengths to KEEP, rejecting water-vapor absorption windows.

    Rejects: below 400 nm, above 2485 nm, 1350-1420 nm, 1800-1945 nm.
    (Reference: mag1c.py:98-113.)
    """
    wave = np.asarray(wave)
    reject = (
        (wave < 400)
        | (wave > 2485)
        | ((wave > 1350) & (wave < 1420))
        | ((wave > 1800) & (wave < 1945))
    )
    return ~reject
