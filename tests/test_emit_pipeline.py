"""End-to-end EMIT tests with a synthetic raw granule (HDF5 .nc layout)."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from starcop_tpu.data.emit import (  # noqa: E402
    EMITEvalDataset,
    EMITRawScene,
    crop_to_multiple,
    renormalize_emit_to_aviris,
)
from starcop_tpu.data.synthetic import synthetic_scene  # noqa: E402
from starcop_tpu.scenes.emit_pipeline import emit_inference, emit_mag1c  # noqa: E402


@pytest.fixture(scope="module")
def fake_granule(tmp_path_factory):
    """Synthetic EMIT L1B granule: full-VSWIR band set with an injected plume
    in the 2.3um window, fill-value stripe, and a GLT."""
    rng = np.random.default_rng(0)
    rows, cols = 96, 64
    # Full EMIT-like wavelength grid (285 bands, ~7.4nm)
    wl = np.arange(380.0, 2490.0, 7.4)
    fwhm = np.full_like(wl, 8.5)
    swir = (wl >= 2122) & (wl <= 2488)

    scene = synthetic_scene(rng, rows, cols, n_plumes=1)
    # Build the full cube: random smooth radiance everywhere; replace the SWIR
    # window with the plume-bearing synthetic radiance (resampled band count).
    cube = rng.uniform(1.0, 8.0, size=(rows, cols, len(wl))).astype(np.float32)
    s_syn = scene["radiance"].shape[-1]
    idx = np.linspace(0, s_syn - 1, swir.sum()).astype(int)
    cube[..., swir] = scene["radiance"][..., idx]

    fill = -9999.0
    cube[:5, :3, :] = fill  # invalid corner

    # Identity-ish GLT (1-based), slightly larger grid.
    glt_y, glt_x = np.mgrid[1 : rows + 1, 1 : cols + 1]
    glt_x = np.pad(glt_x, ((0, 4), (0, 4)))
    glt_y = np.pad(glt_y, ((0, 4), (0, 4)))

    path = tmp_path_factory.mktemp("emit") / "EMIT_L1B_RAD_fake.nc"
    with h5py.File(path, "w") as f:
        d = f.create_dataset("radiance", data=cube)
        d.attrs["_FillValue"] = [fill]
        g = f.create_group("sensor_band_parameters")
        g.create_dataset("wavelengths", data=wl)
        g.create_dataset("fwhm", data=fwhm)
        loc = f.create_group("location")
        loc.create_dataset("glt_x", data=glt_x)
        loc.create_dataset("glt_y", data=glt_y)
        # real EMIT granules carry GDAL-order geotransform + spatial_ref WKT
        f.attrs["geotransform"] = [-103.0, 0.000542, 0.0, 32.5, 0.0, -0.000542]
        f.attrs["spatial_ref"] = (
            'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
            '298.257223563,AUTHORITY["EPSG","7030"]],AUTHORITY["EPSG","6326"]],'
            'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433],'
            'AUTHORITY["EPSG","4326"]]'
        )
    return str(path), scene


def test_raw_scene_reader(fake_granule):
    path, scene = fake_granule
    s = EMITRawScene(path)
    assert s.wavelengths.shape == s.fwhm.shape
    sel = s.band_slice()
    assert sel.sum() > 30
    cube = s.read_bands(sel)
    assert cube.shape[:2] == (96, 64)
    invalid = s.invalid_mask(cube)
    assert invalid[:5, :3].all() and not invalid[10:, 10:].any()
    rgb = s.read_rgb()
    assert rgb.shape == (96, 64, 3)
    s.close()


def test_raw_scene_reader_chunked_parity(fake_granule, tmp_path):
    """Chunked (real-EMIT-layout) granules read the dataset ONCE, and the
    cache is BAND-CAPPED.

    Real EMIT L1B granules are chunked with every band in each chunk and
    zlib-compressed, so any band-subset read decompresses the whole file;
    the reader caches one full read there (measured ~4x fewer decompression
    sweeps for the read_bands + read_rgb pattern) but retains only the bands
    the pipeline consumes — requested + RGB picks + the default filter
    window — so steady-state RSS is a fraction of the ~1.8 GB full f32 cube.
    Outputs must be bit-identical to the contiguous (uncached, partial-read)
    path."""
    path, _ = fake_granule
    with h5py.File(path, "r") as f:
        cube = np.asarray(f["radiance"][...], np.float32)
        wl = np.asarray(f["sensor_band_parameters"]["wavelengths"][:])
        fwhm = np.asarray(f["sensor_band_parameters"]["fwhm"][:])
    chunked = tmp_path / "EMIT_chunked.nc"
    with h5py.File(chunked, "w") as f:
        d = f.create_dataset(
            "radiance", data=cube,
            chunks=(32, cube.shape[1], cube.shape[2]),
            compression="gzip", compression_opts=1,
        )
        d.attrs["_FillValue"] = [-9999.0]
        g = f.create_group("sensor_band_parameters")
        g.create_dataset("wavelengths", data=wl)
        g.create_dataset("fwhm", data=fwhm)

    ref, new = EMITRawScene(path), EMITRawScene(str(chunked))
    # contiguous: no cache
    assert ref.radiance.chunks is None
    assert ref._cube_bands(np.asarray([0], np.int64)) is None
    assert new.radiance.chunks is not None
    sel = new.band_slice()
    np.testing.assert_array_equal(new.read_bands(sel), ref.read_bands(sel))
    assert new._full is not None  # the one cached (band-capped) read
    n_bands = new.wavelengths.size
    assert new._full.shape[-1] < n_bands  # capped, not the full cube
    assert new._full.shape[-1] >= int(np.asarray(sel).sum())
    cached_bands = new._full_bands.copy()
    np.testing.assert_array_equal(new.read_rgb(), ref.read_rgb())
    # the serving pattern (filter window + RGB) is served by the ONE read
    np.testing.assert_array_equal(new._full_bands, cached_bands)
    # a read outside the cached set re-caps to the widened union
    outside = np.asarray([0], np.int64)
    assert not np.isin(outside, cached_bands).all()
    np.testing.assert_array_equal(
        new.read_bands(outside), ref.radiance[:, :, [0]].astype(np.float32)
    )
    assert 0 in new._full_bands and np.isin(cached_bands, new._full_bands).all()
    # C-contiguity is part of the contract (native codec + device_put fast paths)
    assert new.read_bands(sel).flags.c_contiguous and new.read_rgb().flags.c_contiguous
    new.close()
    assert new._full is None  # close releases the (potentially large) cache
    ref.close()


def test_emit_mag1c_detects_plume(fake_granule):
    path, scene = fake_granule
    s = EMITRawScene(path)
    sel = s.band_slice()
    cube = s.read_bands(sel)
    invalid = s.invalid_mask(cube)
    mf, albedo = emit_mag1c(
        cube, s.wavelengths[sel], s.fwhm[sel], ~invalid, column_step=16, num_iter=10
    )
    s.close()
    assert mf.shape == (96, 64)
    assert (mf[:5, :3] == -9999.0).all()
    truth = scene["concentration"] > 1000
    if truth.sum() > 10:
        # matched filter lights up inside the plume much more than outside
        inside = np.median(mf[truth])
        outside = np.median(mf[~truth & (mf != -9999.0)])
        assert inside > outside + 200


def test_emit_inference_full(fake_granule):
    path, _ = fake_granule
    from starcop_tpu.models import SegmentationModel

    model = SegmentationModel(
        ["mag1c", "TOA_AVIRIS_640nm", "TOA_AVIRIS_550nm", "TOA_AVIRIS_460nm"],
        model_type="single",
    )
    x0 = jnp.zeros((1, 4, 32, 32), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0)

    s = EMITRawScene(path)
    out = emit_inference(
        s,
        lambda x: model.apply(variables, x, train=False),
        column_step=16,
        num_iter=5,
        georeference=True,
    )
    s.close()
    assert out["prediction"].shape == (96, 64)
    assert np.all((out["prediction"] >= 0) & (out["prediction"] <= 1))
    assert out["prediction_geo"].shape == (100, 68)
    assert out["mag1c_geo"].shape == (100, 68)
    # GLT padding area maps to fill
    assert (out["mag1c_geo"][96:, :] == -9999.0).all()


def test_renormalization_constants():
    m, rgb = renormalize_emit_to_aviris(np.full((4, 4), 480.0), np.full((3, 4, 4), 40.0))
    np.testing.assert_allclose(m, 2.0 * 1750.0)
    np.testing.assert_allclose(rgb, 2.0 * 60.0)


def test_crop_to_multiple():
    a = np.ones((1, 70, 45))
    out = crop_to_multiple([a], 32)[0]
    assert out.shape == (1, 64, 32)


def test_emit_eval_dataset():
    rng = np.random.default_rng(0)
    mags = [rng.uniform(0, 480, (70, 45)).astype(np.float32)]
    rgbs = [rng.uniform(0, 40, (70, 45, 3)).astype(np.float32)]
    labels = [(rng.uniform(size=(70, 45)) > 0.98).astype(np.float32) * 255]
    ds = EMITEvalDataset(mags, rgbs, labels, ids=["scene0"])
    item = ds[0]
    assert item["input"].shape == (4, 64, 32)
    assert item["output"].max() <= 1.0
    assert item["weight_loss"].min() == 1.0
    assert item["id"] == "scene0"


def test_load_emit_folder_dataset(tmp_path):
    from starcop_tpu.data.emit import load_emit_folder_dataset

    rng = np.random.default_rng(0)
    # scene A: npy layout under plume_events
    a = tmp_path / "plume_events" / "sceneA"
    a.mkdir(parents=True)
    np.save(a / "mag1c.npy", rng.uniform(0, 480, (64, 48)).astype(np.float32))
    np.save(a / "rgb.npy", rng.uniform(0, 40, (64, 48, 3)).astype(np.float32))
    np.save(a / "label.npy", (rng.uniform(size=(64, 48)) > 0.97).astype(np.float32))
    # scene B: ENVI-pair layout under confounders
    b = tmp_path / "confounders" / "sceneB"
    b.mkdir(parents=True)
    mag = rng.uniform(0, 480, (64, 48, 1)).astype(np.float32)
    rgb = rng.uniform(0, 40, (64, 48, 3)).astype(np.float32)
    mag.tofile(b / "sceneB_magic")
    rgb.tofile(b / "sceneB_RGB")
    for fname, bands in (("sceneB_magic.hdr", 1), ("sceneB_RGB.hdr", 3)):
        (b / fname).write_text(
            f"ENVI\nsamples = 48\nlines = 64\nbands = {bands}\nheader offset = 0\n"
            "data type = 4\ninterleave = bip\nbyte order = 0\n"
        )

    ds = load_emit_folder_dataset(str(tmp_path))
    assert len(ds) == 2
    ids = {item["id"] for item in ds.items}
    assert ids == {"plume_events/sceneA", "confounders/sceneB"}
    for item in ds.items:
        assert item["input"].shape == (4, 64, 32)  # crop x32


def test_raw_scene_geo_attrs(fake_granule):
    """EMITRawScene parses geotransform (GDAL order) + spatial_ref WKT ->
    framework Affine + EPSG (emit.py:_parse_geo_attrs)."""
    path, _ = fake_granule
    s = EMITRawScene(path)
    assert s.crs_epsg == 4326
    a, b, xoff, d, e, yoff = s.transform
    assert (xoff, yoff) == (-103.0, 32.5)
    assert a == 0.000542 and e == -0.000542 and b == 0.0 and d == 0.0
    s.close()


def test_infer_emit_cli_georeferenced_outputs(fake_granule, tmp_path):
    """--georeference writes *_geo.tif carrying the granule transform/CRS."""
    import jax
    import jax.numpy as jnp

    from starcop_tpu.cli.infer_emit import main as infer_main
    from starcop_tpu.data.geotiff import read_geotiff
    from starcop_tpu.models import SegmentationModel
    from starcop_tpu.train.checkpoint import save_checkpoint
    from starcop_tpu.train.loop import create_train_state

    path, _ = fake_granule
    model = SegmentationModel(
        ["mag1c", "TOA_AVIRIS_640nm", "TOA_AVIRIS_550nm", "TOA_AVIRIS_460nm"],
        model_type="unet_semseg",
    )
    state, _ = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 4, 32, 32), jnp.float32)
    )
    ckpt = save_checkpoint(str(tmp_path), state, name="best")
    out = tmp_path / "geo_out"
    rc = infer_main([path, "--checkpoint", ckpt, "--output", str(out),
                     "--column-step", "16", "--num-iter", "2", "--georeference"])
    assert rc == 0
    pred_geo, meta = read_geotiff(str(out / "prediction_geo.tif"))
    assert meta.crs_epsg == 4326
    assert meta.transform[0] == 0.000542 and meta.transform[2] == -103.0
    # ungeoreferenced products carry no transform (they live on the raw grid)
    _, meta_raw = read_geotiff(str(out / "prediction.tif"))
    assert meta_raw.transform is None


def test_emit_datamodule(tmp_path):
    """EMITDataModule parity surface (reference emit_as_datamodule.py:27-116):
    folder scan + test loader at batch_size=1."""
    from starcop_tpu.data.emit import EMITDataModule

    rng = np.random.default_rng(0)
    a = tmp_path / "plume_events" / "sceneA"
    a.mkdir(parents=True)
    np.save(a / "mag1c.npy", rng.uniform(0, 480, (64, 48)).astype(np.float32))
    np.save(a / "rgb.npy", rng.uniform(0, 40, (64, 48, 3)).astype(np.float32))
    np.save(a / "label.npy", (rng.uniform(size=(64, 48)) > 0.97).astype(np.float32))

    dm = EMITDataModule(str(tmp_path))
    batches = list(dm.test_loader())
    assert len(batches) == 1
    b = batches[0]
    assert b["input"].shape == (1, 4, 64, 32)
    assert b["id"] == ["plume_events/sceneA"]


def test_granule_to_mask_batched_matches_single():
    """The B-scene batched granule->mask program (scenes concatenated along
    the width axis before the column-blocked filter) reproduces B separate
    single-scene programs: no block straddles two scenes when each width is
    a multiple of column_step, so per-block statistics are identical.
    Tolerance mirrors the fusion-robustness contract of
    tests/test_mag1c.py::test_pallas_num_iter_zero_contract (XLA fuses the
    two program shapes differently; the pre-centered stats keep the residual
    at f32-associativity scale), plus exact detection-mask agreement."""
    from starcop_tpu.models import SegmentationModel
    from starcop_tpu.scenes.emit_pipeline import (
        emit_granule_to_mask,
        emit_granule_to_mask_batched,
    )

    h, w, bands, step = 64, 32, 16, 16
    template = -np.abs(np.sin(np.linspace(0.3, 3 * np.pi, bands)))
    scenes = [
        synthetic_scene(np.random.default_rng(7 + i), h, w, n_plumes=1,
                        template=template)
        for i in range(2)
    ]
    cubes = jnp.asarray(np.stack([s["radiance"] for s in scenes]))
    rgbs = jnp.asarray(np.stack([
        np.moveaxis(s["rgb"], -1, 0).astype(np.float32) for s in scenes
    ]))
    tpl = jnp.asarray(template, jnp.float32)

    model = SegmentationModel(
        ["mag1c", "TOA_AVIRIS_640nm", "TOA_AVIRIS_550nm", "TOA_AVIRIS_460nm"],
        model_type="single",
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 32, 32), jnp.float32))
    apply_fn = lambda x: model.apply(variables, x, train=False)  # noqa: E731

    fused_b = jax.jit(
        lambda c, r: emit_granule_to_mask_batched(
            c, r, tpl, apply_fn, column_step=step, num_iter=3
        )
    )
    pred_b, mf_b = fused_b(cubes, rgbs)
    assert pred_b.shape == (2, h, w) and mf_b.shape == (2, h, w)

    fused_1 = jax.jit(
        lambda c, r: emit_granule_to_mask(
            c, r, tpl, apply_fn, column_step=step, num_iter=3
        )
    )
    for i in range(2):
        pred_1, mf_1 = fused_1(cubes[i], rgbs[i])
        np.testing.assert_allclose(
            np.asarray(mf_b[i]), np.asarray(mf_1), rtol=1e-4, atol=2.0
        )
        assert (
            (np.asarray(mf_b[i]) > 500) == (np.asarray(mf_1) > 500)
        ).mean() >= 0.999
        np.testing.assert_allclose(
            np.asarray(pred_b[i]), np.asarray(pred_1), rtol=1e-4, atol=1e-4
        )

    # Non-divisible widths would merge statistics across scenes: loud error.
    with pytest.raises(ValueError, match="multiple of"):
        emit_granule_to_mask_batched(
            cubes[:, :, : w - 1], rgbs[:, :, :, : w - 1], tpl, apply_fn,
            column_step=step, num_iter=3,
        )
