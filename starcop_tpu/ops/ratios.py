"""Band-ratio / MLR enhancement products for multispectral sensors.

Jittable JAX re-designs of the reference feature functions
(/root/reference/starcop/data/feature_extration.py:32-190): the Varon-style
outlier-robust two-band ratio, the Sanchez-Garcia multiple-linear-regression
ratio, and the mag1c-derived loss-weight product.

TPU notes: the reference's percentile-based outlier rejection selects elements
(dynamic shapes); here the identical sums are computed with masked reductions
so everything stays static-shaped and jit/vmap/pjit-compatible. sklearn's
``LinearRegression`` is replaced by a least-squares solve via the normal
equations on-device.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def weight_mag1c(mag1c: jax.Array) -> jax.Array:
    """Per-pixel loss weight from the matched filter: clip(mag1c / 400, 0.1, 1).

    Down-weights pixels the matched filter already marks ambiguous
    (reference: feature_extration.py:32-35).
    """
    return jnp.clip(mag1c / 400.0, 0.1, 1.0)


def _inlier_sum(d: jax.Array, percentile: float) -> jax.Array:
    """Sum of elements within the [p, 100-p] percentile range (masked, static)."""
    flat = d.reshape(-1)
    lo = jnp.percentile(flat, percentile)
    hi = jnp.percentile(flat, 100.0 - percentile)
    mask = (flat >= lo) & (flat <= hi)
    return jnp.sum(jnp.where(mask, flat, 0.0))


def ratio_2c_match_c_from_sums_outlier(
    background_channel: jax.Array,
    signal: jax.Array,
    p: float = 5.0,
    zero_value_out: float = -0.6,
) -> jax.Array:
    """Outlier-robust two-band ratio (Varon et al. 2021 style).

    c = sum(background inliers) / sum(signal inliers);
    R = (c * signal - background) / (background + 1e-6);
    pixels where both bands are ~zero are set to ``zero_value_out``.
    (Reference: feature_extration.py:42-56.)
    """
    zero_both = (signal < 1e-6) & (background_channel < 1e-6)
    c = _inlier_sum(background_channel, p) / _inlier_sum(signal, p)
    r = (c * signal - background_channel) / (background_channel + 1e-6)
    return jnp.where(zero_both, zero_value_out, r)


def _ols_fit_predict(x: jax.Array, y: jax.Array) -> jax.Array:
    """Ordinary least squares with intercept; returns in-sample predictions.

    x: (N, K) regressors, y: (N,) target. Solved via the normal equations of
    the centered system (equivalent to sklearn LinearRegression), which keeps
    the matmuls MXU-shaped and avoids an SVD.
    """
    xm = jnp.mean(x, axis=0, keepdims=True)
    ym = jnp.mean(y)
    xc = x - xm
    yc = y - ym
    gram = xc.T @ xc
    k = x.shape[1]
    # Ridge jitter scaled by the gram's mean eigenvalue: an absolute 1e-12
    # is below f32 resolution for any realistically-scaled gram, so a
    # rank-deficient regressor set (constant band, duplicated band) made
    # solve() return NaN across the whole product where sklearn's lstsq
    # yields a valid minimum-norm fit. At ~1e-6 relative the jitter is
    # invisible for well-posed fits and regularizes singular ones to
    # predictions matching the minimum-norm solution.
    eps = 1e-6 * (jnp.trace(gram) / k) + 1e-30
    coef = jnp.linalg.solve(gram + eps * jnp.eye(k, dtype=x.dtype), xc.T @ yc)
    return (x - xm) @ coef + ym


def ratio_mlr_local(
    bands_bg: Sequence[jax.Array],
    band_target_signal: jax.Array,
    division: str = "c_matched_outliers",
    autoclip: bool = False,
) -> jax.Array:
    """MLR ratio (Sanchez-Garcia et al. 2022): regress the target band on the
    background bands, then ratio the target against its reconstruction.

    Division modes (reference: feature_extration.py:58-109):
      * ``simple``: L / L_ref; no-data pixels -> 1.
      * ``simple_plus``: -(L / L_ref), z-scored per tile; no-data -> min.
      * ``residual``: (L - L_ref) / L_ref; no-data -> 0.
      * ``c_matched_outliers`` (default): outlier-robust c-matched ratio of
        target vs reconstruction; no-data -> -0.5.
    """
    shape = band_target_signal.shape
    y = band_target_signal.reshape(-1)
    x = jnp.stack([b.reshape(-1) for b in bands_bg], axis=1)
    recon = _ols_fit_predict(x, y).reshape(shape)

    if division == "simple":
        r = band_target_signal / (recon + 1e-6)
        r = jnp.where(band_target_signal == 0.0, 1.0, r)
    elif division == "simple_plus":
        r = band_target_signal / (recon + 1e-6)
        r = 0.0 - r
        r = (r - jnp.mean(r)) / jnp.std(r)
        r = jnp.where(band_target_signal == 0.0, jnp.min(r), r)
    elif division == "residual":
        r = (band_target_signal - recon) / (recon + 1e-6)
        r = jnp.where(band_target_signal == 0.0, 0.0, r)
    elif division == "c_matched_outliers":
        zero_value_out = -0.5
        r = ratio_2c_match_c_from_sums_outlier(
            band_target_signal, recon, zero_value_out=zero_value_out
        )
        r = jnp.where(band_target_signal == 0.0, zero_value_out, r)
    else:
        raise ValueError(f"Unknown division mode: {division}")

    if autoclip:
        r = jnp.clip(r, -0.2, 0.2)
    return r


def lr_bands(regressors: Sequence[jax.Array], signal: jax.Array) -> jax.Array:
    """Linear-regression residual product (Sanchez-Garcia et al. 2021 test
    method; reference: feature_extration.py:179-190): fit signal on regressors
    (with intercept) and return prediction - signal."""
    y = signal.reshape(-1)
    x = jnp.stack([r.reshape(-1) for r in regressors], axis=1)
    prediction = _ols_fit_predict(x, y).reshape(signal.shape)
    return prediction - signal
