"""Aux subsystem tests: regression model, cloud detector, setup shims,
profiling, CLIs (mag1c + prepare-data end-to-end on synthetic scenes)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from starcop_tpu.config import Config


def test_regression_model():
    from starcop_tpu.models.regression import RegressionModel

    m = RegressionModel(
        [f"TOA_WV3_SWIR{i}" for i in range(1, 7)],
        ["TOA_WV3_SWIR8"],
        model_type="cnn_regression",
        loss_name="l1",
    )
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 6, 32, 32)), jnp.float32)
    y = x[:, :1] * 0.5
    variables = m.init(jax.random.PRNGKey(0), x)
    batch = m.batch_with_preds(variables, {"input": x, "output": y})
    assert batch["prediction"].shape == (2, 1, 32, 32)
    assert "residual" in batch
    loss = float(m.loss_fn(batch["prediction"], y))
    assert np.isfinite(loss)


def test_regression_inhibit_normalisation():
    from starcop_tpu.models.regression import RegressionModel

    m = RegressionModel(["mag1c"], ["mag1c"], inhibit_normalisation=True)
    assert m.normalizer is None
    x = jnp.full((1, 1, 16, 16), 5000.0, jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)
    # raw values flow through un-normalized
    out = m.apply(variables, x)
    assert out.shape == (1, 1, 16, 16)


def test_cloud_detector():
    from starcop_tpu.models.cloud import CloudDetector

    cd = CloudDetector()
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 13, 64, 64)), jnp.float32)
    variables = cd.init(jax.random.PRNGKey(0), x)
    pred = np.asarray(cd.predict(variables, x))
    assert pred.shape == (1, 64, 64)
    assert set(np.unique(pred)).issubset({0, 1, 2, 3})
    scene = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (13, 70, 45)), jnp.float32)
    mask = np.asarray(cd.predict_scene(variables, scene))
    assert mask.shape == (70, 45)


def test_setup_shims(tmp_path):
    from starcop_tpu.data.synthetic import write_synthetic_chip_dataset
    from starcop_tpu.setup_shims import get_dataset, get_model

    rng = np.random.default_rng(0)
    index = write_synthetic_chip_dataset(str(tmp_path), rng, n_tiles=2, size=256)
    cfg = Config()
    cfg.dataset.root_folder = str(tmp_path)
    cfg.dataset.train_csv = "index.csv"
    cfg.dataset.test_csv = "index.csv"
    dm = get_dataset(cfg)
    assert len(dm.train_rows) == 2
    cfg.model.model_type = "single"
    model = get_model(cfg)
    assert model.pos_weight == 15.0
    cfg.model.model_mode = "regression_output"
    cfg.model.loss = "l1"
    reg = get_model(cfg)
    assert reg.loss_name == "l1"


def test_pretrained_npz_roundtrip(tmp_path):
    from starcop_tpu.models import SegmentationModel
    from starcop_tpu.setup_shims import load_pretrained_variables
    from starcop_tpu.train import create_train_state, save_checkpoint

    m = SegmentationModel(["mag1c"], model_type="single")
    x = jnp.zeros((1, 1, 16, 16), jnp.float32)
    state, _ = create_train_state(m, jax.random.PRNGKey(0), x)
    save_checkpoint(str(tmp_path), state, name="best")
    variables = load_pretrained_variables(str(tmp_path))
    want = np.asarray(jax.tree.leaves(state.params)[0])
    got = np.asarray(jax.tree.leaves(variables["params"])[0])
    np.testing.assert_array_equal(got, want)


def test_stage_timer():
    from starcop_tpu.utils.profiling import StageTimer

    t = StageTimer(sync=False)
    with t.stage("a"):
        sum(range(1000))
    times = t.report(log=False)
    assert "a" in times and times["a"] >= 0


def test_mag1c_cli(tmp_path):
    from starcop_tpu.cli.mag1c import main
    from starcop_tpu.data.synthetic import aviris_swir_bands, synthetic_scene

    rng = np.random.default_rng(0)
    scene = synthetic_scene(rng, 64, 64, n_plumes=1)
    centers, fwhm = aviris_swir_bands()
    rad = tmp_path / "scene.npy"
    np.save(rad, scene["radiance"])
    np.save(tmp_path / "wl.npy", centers)
    np.save(tmp_path / "fwhm.npy", fwhm)
    out = tmp_path / "mf.npy"
    rc = main([
        str(rad), "--output", str(out),
        "--wavelengths", str(tmp_path / "wl.npy"), "--fwhm", str(tmp_path / "fwhm.npy"),
        "--column-step", "16", "--num-iter", "5",
    ])
    assert rc == 0
    mf = np.load(out)
    assert mf.shape == (64, 64) and np.isfinite(mf).all()
    # Detects the plume region
    assert mf.max() > 500


def test_prepare_data_cli_synthetic(tmp_path):
    from starcop_tpu.cli.prepare_data import main
    from starcop_tpu.data.dataset import read_index_csv

    out = tmp_path / "prep"
    rc = main(["--synthetic", "2", "--output", str(out), "--chip-size", "256",
               "--stats-overlap", "128", "--n-hard", "1", "--n-random", "1"])
    assert rc == 0
    assert (out / "stats_mag1c.json").exists()
    stats = json.loads((out / "stats_mag1c.json").read_text())
    assert len(stats) > 0
    index = out / "chips" / "index.csv"
    assert index.exists()
    rows = read_index_csv(str(index))
    assert len(rows) >= 2  # at least the mined negatives
    tile = rows[0]["folder"]
    from starcop_tpu.data.geotiff import read_geotiff

    m, meta = read_geotiff(os.path.join(tile, "mag1c.tif"))
    assert m.shape == (1, 256, 256)
    assert os.path.exists(os.path.join(tile, "TOA_WV3_SWIR5.tif"))
    # chips carry the window-offset geotransform + CRS of their scene
    assert meta.crs_epsg == 32613
    assert meta.transform[0] == 5.0 and meta.transform[4] == -5.0
    # scene products are georeferenced too
    _, scene_meta = read_geotiff(str(out / "scenes" / "synth000" / "mag1c.tif"))
    assert scene_meta.crs_epsg == 32613 and scene_meta.nodata == -9999.0
    assert "wavelengths" in scene_meta.tags
    assert scene_meta.descriptions == ["CH4 Absorption (ppm x m)"]


def test_jsonl_logger(tmp_path):
    from starcop_tpu.train.logging import JSONLLogger, make_logger

    lg = JSONLLogger(str(tmp_path / "m.jsonl"))
    lg.log({"loss": 0.5}, step=1)
    lg.log({"loss": 0.25, "f1": 0.8}, step=2)
    lg.log_image("grid", "/tmp/img.png", step=2)
    lines = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
    assert lines[0]["loss"] == 0.5 and lines[1]["step"] == 2
    assert lines[2]["image"] == "grid"
    # make_logger falls back to JSONL when wandb is unavailable
    lg2 = make_logger(str(tmp_path), wandb_project="starcop")
    lg2.log({"a": 1})
    assert (tmp_path / "metrics.jsonl").exists()


def test_orbax_checkpoint_roundtrip(tmp_path):
    from starcop_tpu.models import SegmentationModel
    from starcop_tpu.train import create_train_state
    from starcop_tpu.train.checkpoint import load_checkpoint_orbax, save_checkpoint_orbax

    m = SegmentationModel(["mag1c"], model_type="single")
    x = jnp.zeros((1, 1, 16, 16), jnp.float32)
    state, _ = create_train_state(m, jax.random.PRNGKey(0), x)
    path = save_checkpoint_orbax(str(tmp_path), state)
    mutated = state.replace(params=jax.tree.map(lambda p: p * 0.0, state.params))
    restored = load_checkpoint_orbax(path, mutated)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(restored.params)[0]),
        np.asarray(jax.tree.leaves(state.params)[0]),
    )


def test_plot_batch_smoke(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    from starcop_tpu.data.synthetic import synthetic_chip_batch
    from starcop_tpu.eval.plot import DIFFERENCES_COLORS, mask_to_rgb, plot_batch
    from starcop_tpu.models import SegmentationModel

    products = ["mag1c", "TOA_AVIRIS_640nm", "TOA_AVIRIS_550nm", "TOA_AVIRIS_460nm"]
    model = SegmentationModel(products, model_type="single")
    batch = synthetic_chip_batch(np.random.default_rng(0), batch_size=2, size=64)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(batch["input"]))
    enriched = model.batch_with_preds(variables, batch)
    fig = plot_batch(enriched, products, ["rgb_aviris", "mag1c", "label", "pred", "differences"])
    out = tmp_path / "grid.png"
    fig.savefig(out)
    assert out.stat().st_size > 1000
    rgb = mask_to_rgb(np.array([[0, 3], [2, 1]]), [0, 1, 2, 3], DIFFERENCES_COLORS)
    assert rgb.shape == (2, 2, 4)


def test_persistent_compilation_cache(tmp_path, monkeypatch):
    """enable_persistent_compilation_cache points JAX's persistent cache at
    the given dir (env-overridable, disable with =0) and compiled
    executables actually land there."""
    import jax

    from starcop_tpu.utils import enable_persistent_compilation_cache

    old = jax.config.jax_compilation_cache_dir
    try:
        cache = tmp_path / "xla"
        got = enable_persistent_compilation_cache(
            str(cache), min_compile_time_secs=0.0
        )
        assert got == str(cache) and cache.is_dir()
        assert jax.config.jax_compilation_cache_dir == str(cache)

        @jax.jit
        def f(a):
            return (a * 2.0 + 1.0).sum()

        x = jnp.arange(512, dtype=jnp.float32).reshape(16, 32)
        assert float(f(x)) == float(np.arange(512, dtype=np.float32).sum() * 2 + 512)
        assert any(cache.iterdir()), "no executable persisted"

        # env override + disable switch
        monkeypatch.setenv("STARCOP_COMPILE_CACHE", "0")
        assert enable_persistent_compilation_cache(str(cache)) is None
        monkeypatch.setenv("STARCOP_COMPILE_CACHE", str(tmp_path / "other"))
        assert enable_persistent_compilation_cache() == str(tmp_path / "other")
    finally:
        jax.config.update("jax_compilation_cache_dir", old)
