"""Data-production pipeline tests: sensor simulation, TOA, label refinement,
negative mining, chip caching, AVIRIS group driver, EMIT pipeline."""

import os
from datetime import datetime, timezone

import jax.numpy as jnp
import numpy as np
import pytest

from starcop_tpu.data import sensors
from starcop_tpu.data.chip_cache import cache_chip, cache_dataset, pad_to_size
from starcop_tpu.data.labels import proposed_mask
from starcop_tpu.data.mining import (
    mag1c_window_stats,
    sampling_no_plumes,
    select_non_overlapping,
    sliding_window_offsets,
)
from starcop_tpu.data.synthetic import synthetic_scene
from starcop_tpu.scenes.aviris_pipeline import run_mag1c_groups, run_mag1c_scene


# ------------------------------------------------------------------ solar
def test_earth_sun_distance():
    d_jan = sensors.earth_sun_distance_correction_factor(datetime(2019, 1, 4))
    d_jul = sensors.earth_sun_distance_correction_factor(datetime(2019, 7, 4))
    assert d_jan < 1 < d_jul  # perihelion early January
    assert abs(d_jan - (1 - 0.01673)) < 1e-6


def test_solar_zenith_sanity():
    # Quito (lat ~0) near noon UTC-5 on an equinox: sun nearly overhead.
    when = datetime(2019, 3, 21, 17, 0, tzinfo=timezone.utc)
    sza = sensors.solar_zenith_angle(-0.18, -78.47, when)
    assert sza < 10
    # Same place at local midnight: sun below horizon.
    sza_night = sensors.solar_zenith_angle(-0.18, -78.47, datetime(2019, 3, 21, 5, 0, tzinfo=timezone.utc))
    assert sza_night > 90


def test_solar_zenith_permian_afternoon():
    # Permian basin (~31.9N, -102.1W), 2019-10-21 ~19:00 UTC (13:00 local):
    # autumn mid-day sun at moderate elevation.
    sza = sensors.solar_zenith_angle(31.9, -102.1, datetime(2019, 10, 21, 19, 0, tzinfo=timezone.utc))
    assert 35 < sza < 55


def test_radiance_to_reflectance_units():
    when = datetime(2019, 10, 21, 19, 0, tzinfo=timezone.utc)
    factor = sensors.observation_date_correction_factor((-102.1, 31.9), when)
    assert 3 < factor < 6  # pi * d^2 / cos(~45 deg)
    rad = jnp.full((2, 4, 4), 100.0)  # uW/nm/cm^2/sr
    toa = np.asarray(
        sensors.radiance_to_reflectance(rad, [1.0, 0.5], factor, fill_value=None)
    )
    np.testing.assert_allclose(toa[0], 100 * 1e-2 * factor / 1.0, rtol=1e-6)
    np.testing.assert_allclose(toa[1], 100 * 1e-2 * factor / 0.5, rtol=1e-6)


def test_radiance_to_reflectance_fill():
    rad = jnp.full((1, 2, 2), -9999.0)
    toa = np.asarray(sensors.radiance_to_reflectance(rad, [1.0], 4.0, fill_value=-9999.0))
    np.testing.assert_array_equal(toa, -9999.0)


# -------------------------------------------------------------------- SRF
def test_gaussian_srf_weights_normalized():
    wl = np.arange(400, 2500, 5.0)
    w, bands = sensors.gaussian_srf_weights(wl, sensors.WV3_SWIR_CENTERS_FWHM)
    assert w.shape == (len(wl), 8) and bands == list(sensors.WV3_SWIR_CENTERS_FWHM)
    np.testing.assert_allclose(w.sum(axis=0), 1.0, rtol=1e-6)
    # SWIR5 (2165 nm) weight mass concentrates near 2165.
    idx = np.argmax(w[:, 4])
    assert abs(wl[idx] - 2165) < 10


def test_srf_from_table_matches_reference_semantics():
    wl_aviris = np.array([500.0, 505.0, 510.0, 515.0])
    srf_wl = np.array([499.0, 504.0, 506.0, 511.0])
    vals = np.array([[0.2], [0.4], [0.4], [0.2]])
    w = sensors.srf_from_table(wl_aviris, srf_wl, vals)
    # 499->500, 504->505, 506->505, 511->510; normalized by 1.2
    np.testing.assert_allclose(w[:, 0], [0.2 / 1.2, 0.8 / 1.2, 0.2 / 1.2, 0.0])


def test_transform_to_srf_flat_spectrum():
    """A spectrally flat cube must map to the same value in every band."""
    wl = np.arange(1200, 2400, 5.0)
    cube = jnp.full((8, 8, len(wl)), 3.0)
    out, bands = sensors.transform_to_worldview_3(cube, wl)
    assert np.asarray(out).shape == (8, 8, 8)[:1] + (8, 8)
    np.testing.assert_allclose(np.asarray(out), 3.0, rtol=1e-5)


def test_transform_to_srf_downsample():
    wl = np.arange(1200, 2400, 5.0)
    rng = np.random.default_rng(0)
    cube = jnp.asarray(rng.uniform(1, 2, size=(16, 16, len(wl))), jnp.float32)
    out, _ = sensors.transform_to_worldview_3(cube, wl, scale=2.0)
    assert np.asarray(out).shape == (8, 8, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_transform_s2_antialiasing_sigmas():
    wl = np.arange(400, 2500, 5.0)
    cube = jnp.full((12, 12, len(wl)), 1.0)
    out, bands = sensors.transform_to_sentinel_2(cube, wl, bands=["B2", "B11", "B12"])
    assert np.asarray(out).shape[0] == 3
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-4)


# ------------------------------------------------------------------ labels
def test_proposed_mask_keeps_annotated_components():
    mag1c = np.zeros((1, 64, 64), np.float32)
    mag1c[0, 10:20, 10:20] = 500.0  # blob A (annotated)
    mag1c[0, 40:48, 40:48] = 500.0  # blob B (not annotated)
    mag1c[0, 30, 30] = 500.0  # isolated speck -> removed by opening
    rgba = np.zeros((4, 64, 64), np.float32)
    rgba[3, 12:15, 12:15] = 255  # annotation touching blob A
    mask = proposed_mask(rgba, mag1c)
    assert mask[15, 15] and not mask[44, 44] and not mask[30, 30]
    # Mask is intersected with the raw threshold: nothing outside blobs.
    assert mask.sum() == 100


def test_proposed_mask_dilation_bridges():
    """Dilation after opening merges near-adjacent annotated pixels."""
    mag1c = np.zeros((1, 32, 32), np.float32)
    mag1c[0, 5:12, 5:12] = 300.0
    rgba = np.zeros((4, 32, 32), np.float32)
    rgba[3, 4, 6] = 1  # annotation adjacent (cross-dilated component reaches it)
    mask = proposed_mask(rgba, mag1c)
    # The component (after opening+dilation) intersected with the raw
    # threshold recovers the full 7x7 blob.
    assert mask.sum() == 49


# ------------------------------------------------------------------ mining
def test_sliding_window_offsets_cover():
    offs = sliding_window_offsets(1024, 1536, 512, 256)
    assert (0, 0) in offs
    assert max(r for r, _ in offs) + 512 == 1024
    assert max(c for _, c in offs) + 512 == 1536


def test_mag1c_window_stats():
    rng = np.random.default_rng(0)
    mag1c = rng.uniform(0, 100, size=(512, 768)).astype(np.float32)
    mag1c[:, :100] = -9999.0
    stats = mag1c_window_stats(mag1c, size=256, overlap=128)
    assert all(s["percentage_valids"] <= 1.0 for s in stats)
    full = [s for s in stats if s["percentage_valids"] == 1.0]
    s = full[0]
    win = mag1c[
        s["window_row_off"] : s["window_row_off"] + 256,
        s["window_col_off"] : s["window_col_off"] + 256,
    ]
    assert abs(s["mean"] - win.mean()) < 1e-2
    assert abs(s["p50"] - np.percentile(win, 50)) < 0.5
    assert s["max"] == win.max()


def test_select_non_overlapping():
    rows = [
        {"window_row_off": 0, "window_col_off": 0, "window_width": 100, "window_height": 100},
        {"window_row_off": 50, "window_col_off": 50, "window_width": 100, "window_height": 100},
        {"window_row_off": 200, "window_col_off": 200, "window_width": 100, "window_height": 100},
        {"window_row_off": 400, "window_col_off": 0, "window_width": 100, "window_height": 100},
    ]
    idx = select_non_overlapping(rows, n=3)
    assert idx == [0, 2, 3]  # row 1 overlaps row 0


def test_sampling_no_plumes():
    rng = np.random.default_rng(1)
    rows = []
    for name in ("sceneA", "sceneB"):
        for i in range(10):
            rows.append(
                {
                    "name": name,
                    "window_row_off": i * 300,
                    "window_col_off": 0,
                    "window_width": 256,
                    "window_height": 256,
                    "mean": float(rng.uniform(0, 50)),
                    "percentage_valids": 1.0,
                }
            )
    out = sampling_no_plumes(rows, n_hard=2, n_random=2, seed=0)
    assert len(out) == 8  # 4 per scene
    for name in ("sceneA", "sceneB"):
        sel = [r for r in out if r["name"] == name]
        hard = [r for r in sel if r["difficulty"] == "hard"]
        scene_rows = [r for r in rows if r["name"] == name]
        top_means = sorted((r["mean"] for r in scene_rows), reverse=True)[:2]
        assert sorted((r["mean"] for r in hard), reverse=True) == top_means
        assert all(not r["has_plume"] for r in sel)


# -------------------------------------------------------------- chip cache
def test_pad_to_size():
    a = np.ones((3, 100, 120))
    out = pad_to_size(a, (128, 128))
    assert out.shape == (3, 128, 128)
    assert out[:, :100, :120].sum() == a.sum() and out[:, 100:, :].sum() == 0


def test_cache_chip_and_dataset(tmp_path):
    rng = np.random.default_rng(0)
    mag1c = rng.uniform(0, 20000, size=(256, 256)).astype(np.float32)  # exercises clamp
    rgba = np.zeros((4, 256, 256), np.float32)
    rgba[3, 100:110, 100:110] = 1

    def read_products(row):
        return {"mag1c": mag1c, "TOA_AVIRIS_640nm": rng.uniform(0, 60, (256, 256))}, rgba, {}

    rows = [{"id": f"t{i}"} for i in range(3)]
    index = cache_dataset(str(tmp_path), rows, read_products, output_size=(512, 512), num_workers=2)
    assert os.path.exists(index)
    from starcop_tpu.data.geotiff import read_geotiff

    m, _ = read_geotiff(str(tmp_path / "t0" / "mag1c.tif"))
    assert m.shape == (1, 512, 512) and m.max() <= 10000.0
    w, _ = read_geotiff(str(tmp_path / "t0" / "weight_mag1c.tif"))
    assert w.min() >= 0.0 and w.max() <= 1.0
    label, _ = read_geotiff(str(tmp_path / "t0" / "labelbinary.tif"))
    assert label.shape == (1, 512, 512)
    from starcop_tpu.data.dataset import read_index_csv

    entries = read_index_csv(index)
    assert len(entries) == 3 and all("folder" in e for e in entries)


# ----------------------------------------------------- AVIRIS group driver
def test_run_mag1c_groups_matches_column_blocks():
    """Group driver with per-column groups must match the uniform-block path."""
    from starcop_tpu.ops.mag1c import mag1c_column_blocks

    rng = np.random.default_rng(3)
    scene = synthetic_scene(rng, 32, 24, n_plumes=1)
    cube, template = scene["radiance"].astype(np.float64), scene["template"]
    groups = np.broadcast_to(np.arange(24) // 8, (32, 24))  # 3 groups of 8 columns
    mf_g, alb_g = run_mag1c_groups(
        cube, groups, None, template=template, num_iter=3, alpha=1e-4,
        compute_dtype=jnp.float64,
    )
    mf_b, alb_b = mag1c_column_blocks(
        jnp.asarray(cube), jnp.asarray(template), None, column_step=8, num_iter=3,
        alpha=1e-4, compute_dtype=jnp.float64,
    )
    np.testing.assert_allclose(mf_g, np.asarray(mf_b), rtol=1e-6, atol=1e-6)


def test_run_mag1c_groups_skips_tiny_groups():
    rng = np.random.default_rng(4)
    scene = synthetic_scene(rng, 16, 12, n_plumes=0)
    cube, template = scene["radiance"].astype(np.float64), scene["template"]
    groups = np.zeros((16, 12), int)
    groups[:, -1] = 99  # 16 px > 10 -> processed; make a tiny group instead
    valid = np.ones((16, 12), bool)
    valid[6:, -1] = False  # group 99 has only 6 valid px -> skipped
    mf, _ = run_mag1c_groups(cube, groups, valid, template=template, num_iter=2)
    assert np.all(mf[:, -1] == -9999.0)
    assert np.all(mf[:, :-1] != -9999.0)


def test_run_mag1c_scene_band_masking():
    rng = np.random.default_rng(5)
    wl = np.arange(2100.0, 2500.0, 10.0)
    fwhm = np.full_like(wl, 10.0)
    cube = rng.uniform(1, 5, size=(24, 16, len(wl))).astype(np.float64)
    # Groups must hold more pixels than bands (covariance rank): 8-col groups
    # of 24 rows = 192 px > ~36 kept bands.
    glt = np.broadcast_to(np.arange(16) // 8, (24, 16))
    mf, alb = run_mag1c_scene(cube, wl, fwhm, glt_samples=glt, num_iter=2)
    assert mf.shape == (24, 16)
    assert np.isfinite(mf).all()


def test_mosaic_labels():
    from starcop_tpu.data.labels import mosaic_labels

    r1 = np.ones((4, 4), np.float32)
    r2 = np.full((3, 3), 2.0, np.float32)
    wins = [
        {"window_row_off": 1, "window_col_off": 1},
        {"window_row_off": 3, "window_col_off": 3},  # overlaps r1's corner
    ]
    out = mosaic_labels((8, 8), wins, [r1, r2])
    assert out.shape == (8, 8)
    assert out[1, 1] == 1.0 and out[3, 3] == 2.0  # max-merge on overlap
    assert out[0, 0] == 0.0
    # negative offsets clip
    out2 = mosaic_labels((8, 8), [{"window_row_off": -2, "window_col_off": -2}], [r1])
    assert out2[0, 0] == 1.0 and out2[2, 2] == 0.0
    # RGBA channels
    rgba = np.ones((4, 3, 3), np.float32)
    out3 = mosaic_labels((6, 6), [{"window_row_off": 0, "window_col_off": 0}], [rgba])
    assert out3.shape == (4, 6, 6)


def test_extract_features_lazy(tmp_path):
    """Feature registry extraction: computes missing products, skips existing."""
    from starcop_tpu.data.features import FEATURES, extract_features

    rng = np.random.default_rng(0)
    folder = tmp_path / "tile0"
    folder.mkdir()
    np.save(folder / "mag1c.npy", rng.uniform(0, 2000, (64, 64)).astype(np.float32))
    np.save(folder / "TOA_WV3_SWIR7.npy", rng.uniform(0.1, 1.0, (64, 64)).astype(np.float32))
    np.save(folder / "TOA_WV3_SWIR5.npy", rng.uniform(0.1, 1.0, (64, 64)).astype(np.float32))
    rows = [{"folder": str(folder)}]

    written = extract_features(["weight_mag1c", "ratio_wv3_B7_B5_varon21_sum_c_out"], rows)
    assert written == 2
    w = np.load(folder / "weight_mag1c.npy")
    m = np.load(folder / "mag1c.npy")
    np.testing.assert_allclose(w, np.clip(m / 400.0, 0.1, 1.0), rtol=1e-6)
    ratio = np.load(folder / "ratio_wv3_B7_B5_varon21_sum_c_out.npy")
    assert ratio.shape == (64, 64) and np.isfinite(ratio).all()
    # idempotent second run
    assert extract_features(["weight_mag1c"], rows) == 0
    with pytest.raises(KeyError):
        extract_features(["nope"], rows)


def test_learned_ratio_from_config(tmp_path):
    """The learned-ratio product works from a config alone: a regression
    checkpoint registered via dataset.learned_ratio_checkpoint (or
    auto-discovered under model.model_folder) is lazily built on first
    extraction — reference use_pretrained_model_b1to6_b8 lazy GCS load
    (feature_extration.py:127-175)."""
    import jax

    from starcop_tpu.config import Config
    from starcop_tpu.data import features as feat
    from starcop_tpu.models.regression import RegressionModel
    from starcop_tpu.train.checkpoint import _flatten

    rng = np.random.default_rng(1)
    h = w = 32

    # Train-shaped checkpoint: a tiny cnn_regression init dumped as npz.
    model = RegressionModel(
        [f"TOA_WV3_SWIR{i}" for i in (1, 2, 3, 4, 5, 6)],
        ["TOA_WV3_SWIR8"],
        model_type="cnn_regression",
        inhibit_normalisation=True,
    )
    sample = np.ones((1, 6, h, w), np.float32)
    variables = model.init(jax.random.PRNGKey(0), sample)
    exp_dir = tmp_path / "experiments" / feat.LEARNED_RATIO_EXPERIMENT
    exp_dir.mkdir(parents=True)
    flat = _flatten(variables["params"], "params/")
    if "batch_stats" in variables:
        flat.update(_flatten(variables["batch_stats"], "batch_stats/"))
    np.savez(exp_dir / "best.npz", **flat)

    # Tile folder with the product's 7 input bands.
    folder = tmp_path / "tile0"
    folder.mkdir()
    product = "ratio_lrn_bands2band8only_60ep_512_l1"
    for band in feat.FEATURES[product]["inputs"]:
        np.save(folder / f"{band}.npy", rng.uniform(0.1, 1.0, (h, w)).astype(np.float32))
    rows = [{"folder": str(folder)}]

    saved = dict(feat._LEARNED_MODEL)
    try:
        feat._LEARNED_MODEL.update({"apply": None, "checkpoint": None})
        # Unregistered: loud error naming the config key.
        with pytest.raises(RuntimeError, match="learned_ratio_checkpoint"):
            extract_from = feat.extract_features([product], rows)

        # model_folder auto-discovery (reference experiment-path layout).
        cfg = Config()
        cfg.model.model_folder = str(tmp_path / "experiments")
        assert feat.configure_learned_ratio_from_config(cfg)
        assert feat.extract_features([product], rows) == 1
        out = np.load(folder / f"{product}.npy")
        assert out.shape == (h, w) and np.isfinite(out).all()

        # Explicit checkpoint key wins and also works end to end.
        (folder / f"{product}.npy").unlink()
        feat._LEARNED_MODEL.update({"apply": None, "checkpoint": None})
        cfg2 = Config()
        cfg2.dataset.learned_ratio_checkpoint = str(exp_dir / "best.npz")
        assert feat.configure_learned_ratio_from_config(cfg2)
        assert feat.extract_features([product], rows) == 1
    finally:
        feat._LEARNED_MODEL.update(saved)


def test_evaluate_cli_baseline(tmp_path):
    from starcop_tpu.cli.evaluate import main as eval_main
    from starcop_tpu.data.synthetic import write_synthetic_chip_dataset

    rng = np.random.default_rng(0)
    index = write_synthetic_chip_dataset(str(tmp_path / "chips"), rng, n_tiles=2, size=256)
    out = tmp_path / "eval"
    rc = eval_main([
        "--test-csv", index, "--baseline", "mag1c",
        "--input-products", "mag1c", "TOA_AVIRIS_640nm",
        "--output", str(out),
    ])
    assert rc == 0
    assert (out / "results_agg.json").exists()
    import json as _json

    agg = _json.loads((out / "results_agg.json").read_text())
    assert "f1score" in agg and len(agg["thresholded"]) > 10


def test_evaluate_cli_model_bf16_default(tmp_path):
    """The evaluate CLI's model path runs the bf16-RESIDENT-weights default
    (VERDICT r4 #6: the measured-best inference config is the product
    default) and the f32 opt-out agrees on the aggregate detection metrics
    (equivalence at the kernel level is pinned by
    tests/test_models.py::test_bf16_resident_weights_inference)."""
    import jax

    from starcop_tpu.cli.evaluate import main as eval_main
    from starcop_tpu.data.synthetic import write_synthetic_chip_dataset
    from starcop_tpu.models import SegmentationModel
    from starcop_tpu.train import create_train_state, save_checkpoint

    rng = np.random.default_rng(0)
    index = write_synthetic_chip_dataset(str(tmp_path / "chips"), rng, n_tiles=2, size=64)
    products = ["mag1c", "TOA_AVIRIS_640nm", "TOA_AVIRIS_550nm", "TOA_AVIRIS_460nm"]
    model = SegmentationModel(products, model_type="unet_semseg")
    state, _ = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 4, 32, 32), jnp.float32)
    )
    ckpt = save_checkpoint(str(tmp_path), state, name="best")

    import json as _json

    aggs = {}
    for dtype in ("bf16", "f32"):
        out = tmp_path / f"eval_{dtype}"
        rc = eval_main([
            "--test-csv", index, "--checkpoint", ckpt,
            "--input-products", *products,
            "--model-dtype", dtype, "--output", str(out),
        ])
        assert rc == 0
        aggs[dtype] = _json.loads((out / "results_agg.json").read_text())
    for key in ("f1score", "classification_f1score"):
        assert np.isclose(aggs["bf16"][key], aggs["f32"][key], atol=0.02), key


def test_run_mag1c_groups_padded_batches():
    """Many same-bucket groups: ragged final chunk pads to one program shape."""
    rng = np.random.default_rng(7)
    scene = synthetic_scene(rng, 24, 30, n_plumes=0)
    cube, template = scene["radiance"].astype(np.float64), scene["template"]
    groups = np.broadcast_to(np.arange(30) // 6, (24, 30))  # 5 groups of 6 cols
    mf, _ = run_mag1c_groups(
        cube, groups, None, template=template, num_iter=2, alpha=1e-4,
        groups_per_batch=2, compute_dtype=jnp.float64,  # 5 groups -> chunks 2,2,1
    )
    assert mf.shape == (24, 30)
    assert np.isfinite(mf).all()
    # parity against one-shot batching
    mf_all, _ = run_mag1c_groups(
        cube, groups, None, template=template, num_iter=2, alpha=1e-4,
        groups_per_batch=64, compute_dtype=jnp.float64,
    )
    np.testing.assert_allclose(mf, mf_all, rtol=1e-8)


def test_infer_emit_cli(tmp_path):
    h5py = pytest.importorskip("h5py")
    import jax

    from starcop_tpu.cli.infer_emit import main as infer_main
    from starcop_tpu.models import SegmentationModel
    from starcop_tpu.train import create_train_state, save_checkpoint

    # fake granule
    rng = np.random.default_rng(0)
    wl = np.arange(2100.0, 2490.0, 7.4)
    scene = synthetic_scene(np.random.default_rng(0), 64, 48, n_plumes=1)
    cube = rng.uniform(1, 8, size=(64, 48, len(wl))).astype(np.float32)
    swir = (wl >= 2122) & (wl <= 2488)
    idx = np.linspace(0, scene["radiance"].shape[-1] - 1, swir.sum()).astype(int)
    cube[..., swir] = scene["radiance"][..., idx]
    granule = tmp_path / "EMIT_fake.nc"
    with h5py.File(granule, "w") as f:
        d = f.create_dataset("radiance", data=cube)
        d.attrs["_FillValue"] = [-9999.0]
        g = f.create_group("sensor_band_parameters")
        g.create_dataset("wavelengths", data=wl)
        g.create_dataset("fwhm", data=np.full_like(wl, 8.5))

    # npz checkpoint for the flagship model
    model = SegmentationModel(
        ["mag1c", "TOA_AVIRIS_640nm", "TOA_AVIRIS_550nm", "TOA_AVIRIS_460nm"],
        model_type="unet_semseg",
    )
    state, _ = create_train_state(
        model, jax.random.PRNGKey(0),
        jnp.zeros((1, 4, 32, 32), jnp.float32),
    )
    ckpt = save_checkpoint(str(tmp_path), state, name="best")

    out = tmp_path / "out"
    rc = infer_main([str(granule), "--checkpoint", ckpt, "--output", str(out),
                     "--column-step", "16", "--num-iter", "3"])
    assert rc == 0
    from starcop_tpu.data.geotiff import read_geotiff

    pred, _ = read_geotiff(str(out / "prediction.tif"))
    assert pred.shape == (1, 64, 48) and np.all((pred >= 0) & (pred <= 1))
    assert (out / "mag1c.tif").exists()


def test_cache_dataset_skip_existing(tmp_path):
    from starcop_tpu.data.chip_cache import cache_dataset

    rng = np.random.default_rng(0)
    calls = {"n": 0}

    def read_products(row):
        calls["n"] += 1
        return {"mag1c": rng.uniform(0, 500, (64, 64)).astype(np.float32)}, None, {}

    rows = [{"id": "t0"}, {"id": "t1"}]
    cache_dataset(str(tmp_path), rows, read_products, output_size=(64, 64), num_workers=1)
    assert calls["n"] == 2
    # Second run: nothing recomputed, index rebuilt.
    index = cache_dataset(str(tmp_path), rows, read_products, output_size=(64, 64), num_workers=1)
    assert calls["n"] == 2
    assert os.path.exists(index)
