"""SRF approximation sensitivity: bound the error of the tabulated SRFs.

The reference consumes *measured* instrument SRF CSVs
(/root/reference/starcop/data/aviris.py:27-29,168-190); this framework ships
super-Gaussian tabulations built from published band centers/FWHM
(starcop_tpu/data/srf.py). This harness bounds what that approximation can
cost downstream: it perturbs the band shapes within published instrument
tolerances (center shift, FWHM scale, edge slope, in-band ripple — i.e. a
family of "measured-like" responses the true instrument curves live inside),
runs the full WV3 simulation -> Varon ratio -> detection chain on a synthetic
plume scene for each draw, and reports the deltas on simulated radiances,
ratio products, and best-F1 detection.

Run: python experiments/srf_sensitivity/run.py [--quick]
Writes summary.json next to this file (committed).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

# Published instrument tolerances bounding the perturbation family:
#   center: S2 MSI spectral calibration accuracy is <~1 nm; WV3 SWIR band
#           placement tolerance a few nm -> +-3 nm is conservative.
#   FWHM:   +-5% covers the spread between published unit values.
#   order:  super-Gaussian order +-2 spans Gaussian-ish (2) to near-square (8)
#           edge slopes.
#   ripple: +-3% sinusoidal in-band ripple (interference-filter fringing).
CENTER_TOL_NM = 3.0
FWHM_TOL = 0.05
ORDER_RANGE = (2, 8)
RIPPLE = 0.03

VARON_PAIRS = [("SWIR7", "SWIR5"), ("SWIR8", "SWIR5"), ("SWIR7", "SWIR6")]


def perturbed_table(rng, bands, orders, step_nm=1.0):
    """A measured-like SRF table drawn from the tolerance family."""
    from starcop_tpu.data.srf import super_gaussian

    names = list(bands)
    lo = min(c - 1.3 * f for c, f in bands.values())
    hi = max(c + 1.3 * f for c, f in bands.values())
    wl = np.arange(np.floor(lo), np.ceil(hi) + step_nm, step_nm)
    cols = []
    for name in names:
        c, f = bands[name]
        c = c + rng.uniform(-CENTER_TOL_NM, CENTER_TOL_NM)
        f = f * (1.0 + rng.uniform(-FWHM_TOL, FWHM_TOL))
        order = int(np.clip(orders + rng.integers(-2, 3), *ORDER_RANGE))
        v = super_gaussian(wl, c, f, order)
        phase = rng.uniform(0, 2 * np.pi)
        v = v * (1.0 + RIPPLE * np.sin(2 * np.pi * (wl - c) / (f / 3.0) + phase))
        cols.append(np.clip(v, 0.0, None))
    values = np.stack(cols, axis=1)
    values[values < 1e-6] = 0.0
    keep = values.any(axis=1)
    return wl[keep], values[keep], names


def best_f1(score, label, n_thr=64):
    """Threshold-free detection quality: best F1 over a quantile sweep."""
    flat = score.ravel()
    lab = label.ravel() > 0
    thrs = np.quantile(flat, np.linspace(0.5, 0.999, n_thr))
    best = 0.0
    for t in thrs:
        pred = flat > t
        tp = float(np.sum(pred & lab))
        denom = float(pred.sum() + lab.sum())
        if denom:
            best = max(best, 2 * tp / denom)
    return best


def run(quick: bool = False, seed: int = 0, size: int = None, n_draws: int = None):
    import jax

    # Offline numerics analysis: CPU is deterministic and keeps the harness
    # independent of the TPU tunnel (post-import override per CLAUDE.md).
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from starcop_tpu.data.sensors import transform_to_srf
    from starcop_tpu.data.srf import WV3_BANDS, _ORDER, get_srf, srf_table_weights
    from starcop_tpu.data.synthetic import synthetic_scene
    from starcop_tpu.ops.ch4_template import generate_template_from_bands
    from starcop_tpu.ops.ratios import ratio_2c_match_c_from_sums_outlier
    from starcop_tpu.data.sensors import srf_from_table

    rng = np.random.default_rng(seed)
    size = size or (128 if quick else 256)
    n_draws = n_draws or (4 if quick else 24)

    # AVIRIS-like grid covering the WV3 SWIR5-8 window (the Varon-chain
    # bands); the CH4 LUT starts at 1399.6 nm.
    centers = np.arange(1400.0, 2500.0, 5.0)
    fwhm = np.full_like(centers, 5.5)
    template = generate_template_from_bands(centers, fwhm)[:, 1]
    # Plume strength tuned so the NOMINAL Varon chain lands mid-range
    # (best-F1 ~0.5-0.7, not 0 and not saturated): a delta-F1 bound is only
    # meaningful where the detector has headroom in both directions. Default
    # scene parameters (conc 4000, noise 0.01) saturate the chain at F1~0.93.
    scene = synthetic_scene(
        rng, size, size, n_plumes=4, template=template, n_confounders=2,
        max_concentration=1200.0, noise=0.02,
    )
    cube = jnp.asarray(scene["radiance"])
    label = scene["label"]

    band_names = ["SWIR5", "SWIR6", "SWIR7", "SWIR8"]

    def simulate(weights):
        sim = np.asarray(transform_to_srf(cube, weights))
        bands = dict(zip(band_names, sim))
        # Reference argument order (feature_extration.py:201-203 registers
        # inputs [SWIR7, SWIR5] for "B7_B5"): the CH4-ABSORBING band is the
        # ``background_channel`` and the non-absorbing band the ``signal``,
        # so R = (c*SWIR5 - SWIR7)/(SWIR7 + eps) is POSITIVE over plumes and
        # the >0.05 Varon threshold (baselines.py:150) detects them. Round 3
        # had these swapped, which negated the score and made the nominal
        # detector find nothing (vacuous delta-F1 bound).
        ratios = {
            f"{a}/{b}": np.asarray(
                ratio_2c_match_c_from_sums_outlier(
                    jnp.asarray(bands[a]), jnp.asarray(bands[b])
                )
            )
            for a, b in VARON_PAIRS
        }
        return sim, ratios

    w_nom, _ = srf_table_weights(centers, "WV3", bands=band_names)
    sim_nom, ratios_nom = simulate(w_nom)
    f1_nom = {k: best_f1(v, label) for k, v in ratios_nom.items()}

    # Context row: the round-1 Gaussian fallback vs the shipped super-Gaussian.
    from starcop_tpu.data.sensors import gaussian_srf_weights, WV3_SWIR_CENTERS_FWHM

    w_gauss, _ = gaussian_srf_weights(centers, WV3_SWIR_CENTERS_FWHM, band_names)
    sim_g, ratios_g = simulate(w_gauss)

    def deltas(sim, ratios):
        band_rel = float(
            np.max(
                [
                    np.sqrt(np.mean((sim[i] - sim_nom[i]) ** 2))
                    / (np.mean(np.abs(sim_nom[i])) + 1e-12)
                    for i in range(len(band_names))
                ]
            )
        )
        ratio_rms = float(
            np.max(
                [np.sqrt(np.mean((ratios[k] - ratios_nom[k]) ** 2)) for k in ratios_nom]
            )
        )
        df1 = {k: best_f1(ratios[k], label) - f1_nom[k] for k in ratios_nom}
        return band_rel, ratio_rms, df1

    draws = []
    for d in range(n_draws):
        wl, values, names = perturbed_table(rng, WV3_BANDS, _ORDER["WV3"])
        idx = [names.index(b) for b in band_names]
        w_pert = srf_from_table(centers, wl, values[:, idx])
        sim_p, ratios_p = simulate(w_pert)
        band_rel, ratio_rms, df1 = deltas(sim_p, ratios_p)
        draws.append({"band_rel_rms": band_rel, "ratio_rms": ratio_rms,
                      "delta_f1": df1})
        print(
            f"draw {d}: band_rel_rms {band_rel:.2e}, ratio_rms {ratio_rms:.2e}, "
            f"dF1 max {max(abs(v) for v in df1.values()):.4f}",
            file=sys.stderr,
        )

    g_band, g_ratio, g_df1 = deltas(sim_g, ratios_g)
    summary = {
        "config": {
            "size": size, "n_draws": n_draws, "seed": seed,
            "center_tol_nm": CENTER_TOL_NM, "fwhm_tol": FWHM_TOL,
            "order_range": list(ORDER_RANGE), "ripple": RIPPLE,
        },
        "nominal_best_f1": f1_nom,
        "perturbation_family": {
            "band_rel_rms_max": max(d["band_rel_rms"] for d in draws),
            "band_rel_rms_mean": float(np.mean([d["band_rel_rms"] for d in draws])),
            "ratio_rms_max": max(d["ratio_rms"] for d in draws),
            "ratio_rms_mean": float(np.mean([d["ratio_rms"] for d in draws])),
            "abs_delta_f1_max": max(
                abs(v) for d in draws for v in d["delta_f1"].values()
            ),
            "abs_delta_f1_mean": float(
                np.mean([abs(v) for d in draws for v in d["delta_f1"].values()])
            ),
        },
        "gaussian_fallback_vs_table": {
            "band_rel_rms": g_band, "ratio_rms": g_ratio,
            "abs_delta_f1_max": max(abs(v) for v in g_df1.values()),
        },
        "draws": draws,
    }
    return summary


def main():
    quick = "--quick" in sys.argv
    summary = run(quick=quick)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "summary.json")
    with open(out, "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps(summary["perturbation_family"]))
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
