"""Tests for the tabulated SRF tables and the sensor-sim table path.

Pins the shipped-asset mechanics against the reference's measured-CSV loader
semantics (/root/reference/starcop/data/aviris.py:155-223: SR_WL-indexed
columns, all-zero rows dropped, path_override, per-process cache) and the
simulation against an independent float64 numpy restatement.
"""

import numpy as np
import pytest

from starcop_tpu.data import sensors
from starcop_tpu.data.srf import (
    S2A_BANDS,
    S2B_BANDS,
    WV3_BANDS,
    build_srf_table,
    get_srf,
    load_srf_csv,
    srf_table_weights,
    super_gaussian,
    write_srf_asset,
)


def test_super_gaussian_shape():
    wl = np.linspace(2000, 2400, 4001)
    s = super_gaussian(wl, 2200.0, 100.0, order=6)
    # peak 1 at center; half maximum at center +- fwhm/2
    assert s[np.argmin(np.abs(wl - 2200))] == pytest.approx(1.0)
    assert s[np.argmin(np.abs(wl - 2150))] == pytest.approx(0.5, abs=1e-3)
    assert s[np.argmin(np.abs(wl - 2250))] == pytest.approx(0.5, abs=1e-3)
    # flat top: much fuller than a Gaussian at fwhm/4 from center
    gauss_quarter = 0.5 ** ((0.5) ** 2)  # exp(-ln2 (2d/fwhm)^2) at d=fwhm/4
    assert s[np.argmin(np.abs(wl - 2225))] > gauss_quarter + 0.1


def test_asset_matches_builder():
    """The committed asset is exactly what the builder produces."""
    for sensor in ("S2A", "S2B", "WV3"):
        wl_a, val_a, bands_a = get_srf(sensor, cache=False)
        wl_b, val_b, bands_b = build_srf_table(sensor)
        assert bands_a == bands_b
        np.testing.assert_array_equal(wl_a, wl_b)
        np.testing.assert_allclose(val_a, val_b)


def test_s2a_s2b_distinct():
    """Per-unit tables differ (e.g. B12: 2202.4 vs 2185.7 nm centers)."""
    assert S2A_BANDS["B12"][0] != S2B_BANDS["B12"][0]
    wl = np.arange(2050.0, 2350.0, 5.0)
    w_a, _ = srf_table_weights(wl, "S2A", bands=["B12"])
    w_b, _ = srf_table_weights(wl, "S2B", bands=["B12"])
    assert np.abs(w_a - w_b).max() > 1e-3
    # center of mass tracks the per-unit band center
    com_a = (wl * w_a[:, 0]).sum()
    com_b = (wl * w_b[:, 0]).sum()
    assert com_a > com_b  # 2202.4 > 2185.7


def test_weights_normalized_and_localized():
    wl = np.arange(1150.0, 2500.0, 5.0)
    weights, bands = srf_table_weights(wl, "WV3")
    assert bands == list(WV3_BANDS)
    np.testing.assert_allclose(weights.sum(axis=0), 1.0, rtol=1e-9)
    # SWIR7 support localized around its 2259.3 nm center
    w7 = weights[:, bands.index("SWIR7")]
    assert wl[w7 > 0].min() > 2200 and wl[w7 > 0].max() < 2320


def test_csv_override_reference_schema(tmp_path):
    """Measured-CSV loading mirrors load_srf_wv3 (SR_WL index, zero rows
    dropped) and takes precedence over the shipped table."""
    csv_path = tmp_path / "srf_wv3.csv"
    rows = ["SR_WL,SWIR5,SWIR6"]
    for wl in range(2100, 2260):
        s5 = 1.0 if 2145 <= wl <= 2185 else 0.0
        s6 = 0.8 if 2185 <= wl <= 2225 else 0.0
        rows.append(f"{wl},{s5},{s6}")
    csv_path.write_text("\n".join(rows))
    wl, values, names = load_srf_csv(str(csv_path))
    assert names == ["SWIR5", "SWIR6"]
    assert (values > 0).any(axis=1).all()  # all-zero rows dropped
    assert wl.min() >= 2145 and wl.max() <= 2225

    aviris_wl = np.arange(2100.0, 2300.0, 5.0)
    weights, bands = srf_table_weights(
        aviris_wl, "WV3", bands=["SWIR5"], path_override=str(csv_path)
    )
    np.testing.assert_allclose(weights.sum(axis=0), 1.0)
    assert aviris_wl[weights[:, 0] > 0].max() <= 2190  # boxcar support only


def test_transform_table_constant_spectrum():
    """A spectrally-flat cube maps to the same constant in every simulated
    band (weights are normalized)."""
    import jax.numpy as jnp

    wl = np.arange(1150.0, 2500.0, 5.0)
    cube = jnp.full((4, 6, len(wl)), 3.25, jnp.float32)
    out, bands = sensors.transform_to_worldview_3(cube, wl)
    np.testing.assert_allclose(np.asarray(out), 3.25, rtol=1e-5)


def test_transform_table_matches_numpy_oracle(rng):
    """Table-driven simulation == float64 numpy weighted sum."""
    import jax.numpy as jnp

    wl = np.arange(2100.0, 2400.0, 5.0)
    cube = rng.uniform(0.5, 5.0, size=(8, 7, len(wl)))
    weights, bands = srf_table_weights(wl, "WV3", bands=["SWIR5", "SWIR6", "SWIR7"])
    expected = np.einsum("hwk,kb->bhw", cube, weights)
    out, _ = sensors.transform_to_worldview_3(
        jnp.asarray(cube), wl, bands=["SWIR5", "SWIR6", "SWIR7"]
    )
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-6)


def test_gaussian_fallback_still_available(rng):
    import jax.numpy as jnp

    wl = np.arange(2100.0, 2400.0, 5.0)
    cube = jnp.asarray(rng.uniform(0.5, 5.0, size=(4, 4, len(wl))))
    out_t, _ = sensors.transform_to_worldview_3(cube, wl, bands=["SWIR6"])
    out_g, _ = sensors.transform_to_worldview_3(
        cube, wl, bands=["SWIR6"], srf_source="gaussian"
    )
    # both valid simulations, but distinct shapes (flat-top vs gaussian)
    assert np.isfinite(np.asarray(out_t)).all() and np.isfinite(np.asarray(out_g)).all()
    assert np.abs(np.asarray(out_t) - np.asarray(out_g)).max() > 0


def test_write_asset_roundtrip(tmp_path):
    p = write_srf_asset(str(tmp_path / "tables.npz"))
    with np.load(p) as z:
        assert {f"{s}_{k}" for s in ("S2A", "S2B", "WV3")
                for k in ("wavelengths", "values", "bands")} <= set(z.files)
        assert z["WV3_values"].shape[1] == 8


def test_measured_csv_fixture_end_to_end():
    """A measured-shaped S2A B12 curve (approximate digitization of the ESA
    S2 spectral-response release shape: sloped edges + rippled plateau,
    ~2074-2312 nm support) drives the load_srf_csv -> srf_table_weights ->
    transform_to_sentinel_2 chain end to end, and lands close to the shipped
    tabulated B12 (same instrument, different shape model)."""
    import os

    import jax.numpy as jnp

    from starcop_tpu.data.sensors import transform_to_sentinel_2
    from starcop_tpu.data.srf import load_srf_csv, srf_table_weights

    fixture = os.path.join(os.path.dirname(__file__), "fixtures", "srf_s2a_b12.csv")
    wl, values, names = load_srf_csv(fixture)
    assert names == ["B12"]
    assert (values > 0).all(axis=1).any()  # all-zero rows dropped
    # Support within the published B12 window, peak normalized.
    assert 2050 < wl.min() and wl.max() < 2330
    assert np.isclose(values.max(), 1.0)

    centers = np.arange(2000.0, 2400.0, 5.0)
    w_csv, bands = srf_table_weights(centers, "S2A", bands=["B12"], path_override=fixture)
    w_tab, _ = srf_table_weights(centers, "S2A", bands=["B12"])
    assert bands == ["B12"]
    np.testing.assert_allclose(w_csv.sum(axis=0), 1.0, rtol=1e-6)
    # Same instrument band: effective centers within a few nm of each other.
    c_csv = float((w_csv[:, 0] * centers).sum())
    c_tab = float((w_tab[:, 0] * centers).sum())
    assert abs(c_csv - c_tab) < 10.0

    rng_l = np.random.default_rng(3)
    cube = jnp.asarray(rng_l.uniform(1, 2, size=(32, 32, len(centers))).astype(np.float32))
    sim_csv, _ = transform_to_sentinel_2(cube, centers, bands=["B12"], srf_csv=fixture)
    sim_tab, _ = transform_to_sentinel_2(cube, centers, bands=["B12"])
    assert np.isfinite(np.asarray(sim_csv)).all()
    # Band-shape model change moves the simulated radiance by well under 1%.
    rel = np.abs(np.asarray(sim_csv) - np.asarray(sim_tab)) / np.abs(np.asarray(sim_tab))
    assert float(rel.mean()) < 0.01


def test_srf_sensitivity_harness_smoke():
    """The committed sensitivity harness (experiments/srf_sensitivity) runs
    and reproduces its headline bound at toy scale: instrument-tolerance SRF
    perturbations move the Varon ratio chain's best-F1 by < 0.05."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "srf_sensitivity_run",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "experiments", "srf_sensitivity", "run.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    summary = mod.run(size=64, n_draws=2)
    fam = summary["perturbation_family"]
    assert fam["abs_delta_f1_max"] < 0.05
    assert fam["ratio_rms_max"] < 0.01
    assert all(v > 0.5 for v in summary["nominal_best_f1"].values())
