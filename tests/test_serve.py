"""Serving pipeline tests: staged threading semantics, error isolation, and
end-to-end granule processing parity with the sequential path."""

import os
import threading
import time

import numpy as np
import pytest

from starcop_tpu.serve.pipeline import ScenePipeline


def test_pipeline_basic_order_and_results():
    log = []

    def read_fn(name):
        log.append(("r", name))
        return {"v": int(name)}

    def compute_fn(payload):
        return {"out": payload["v"] * 2}

    written = {}

    def write_fn(name, outputs):
        written[name] = outputs["out"]

    results = ScenePipeline(read_fn, compute_fn, write_fn).run(["1", "2", "3"])
    assert len(results) == 3 and all(r.error is None for r in results)
    assert written == {"1": 2, "2": 4, "3": 6}
    assert all("compute_s" in r.timings for r in results)


def test_pipeline_overlaps_stages():
    """Reader of scene N+1 must run while compute of scene N is in flight."""
    events = []
    lock = threading.Lock()

    def read_fn(name):
        with lock:
            events.append(f"read_start_{name}")
        time.sleep(0.05)
        with lock:
            events.append(f"read_end_{name}")
        return {}

    def compute_fn(payload):
        time.sleep(0.1)
        return {}

    t0 = time.time()
    ScenePipeline(read_fn, compute_fn).run(["a", "b", "c"])
    wall = time.time() - t0
    # Sequential would be 3 * (0.05 + 0.1) = 0.45s; pipelined ~ 0.05 + 3*0.1.
    assert wall < 0.42, wall
    # Second read started before... (it must appear before the last compute ends
    # by construction of the bound): all reads complete within the first
    # compute windows.
    assert events.index("read_end_b") < len(events)


def test_pipeline_error_isolation():
    def read_fn(name):
        if name == "bad":
            raise IOError("corrupt granule")
        return {"v": 1}

    results = ScenePipeline(read_fn, lambda p: {"o": p["v"]}).run(["ok1", "bad", "ok2"])
    by_name = {r.name: r for r in results}
    assert by_name["bad"].error and "corrupt" in by_name["bad"].error
    assert by_name["ok1"].error is None and by_name["ok2"].error is None


def test_emit_serving_pipeline_end_to_end(tmp_path):
    h5py = pytest.importorskip("h5py")
    import jax
    import jax.numpy as jnp

    from starcop_tpu.data.synthetic import synthetic_scene
    from starcop_tpu.models import SegmentationModel
    from starcop_tpu.serve.pipeline import emit_serving_pipeline

    # two fake granules
    rng = np.random.default_rng(0)
    wl = np.arange(2100.0, 2490.0, 7.4)
    fwhm = np.full_like(wl, 8.5)
    paths = []
    for i in range(2):
        scene = synthetic_scene(np.random.default_rng(i), 64, 48, n_plumes=1)
        cube = rng.uniform(1, 8, size=(64, 48, len(wl))).astype(np.float32)
        swir = (wl >= 2122) & (wl <= 2488)
        idx = np.linspace(0, scene["radiance"].shape[-1] - 1, swir.sum()).astype(int)
        cube[..., swir] = scene["radiance"][..., idx]
        path = tmp_path / f"EMIT_fake_{i}.nc"
        with h5py.File(path, "w") as f:
            d = f.create_dataset("radiance", data=cube)
            d.attrs["_FillValue"] = [-9999.0]
            g = f.create_group("sensor_band_parameters")
            g.create_dataset("wavelengths", data=wl)
            g.create_dataset("fwhm", data=fwhm)
        paths.append(str(path))

    model = SegmentationModel(
        ["mag1c", "TOA_AVIRIS_640nm", "TOA_AVIRIS_550nm", "TOA_AVIRIS_460nm"],
        model_type="single",
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 32, 32), jnp.float32))

    out_dir = tmp_path / "out"
    pipeline = emit_serving_pipeline(
        lambda x: model.apply(variables, x, train=False),
        str(out_dir),
        column_step=16,
        num_iter=3,
    )
    results = pipeline.run(paths)
    assert len(results) == 2 and all(r.error is None for r in results)
    from starcop_tpu.data.geotiff import read_geotiff

    for p in paths:
        base = out_dir / os.path.splitext(os.path.basename(p))[0]
        pred, _ = read_geotiff(str(base / "prediction.tif"))
        mag1c, meta = read_geotiff(str(base / "mag1c.tif"))
        assert pred.shape == (1, 64, 48) and mag1c.shape == (1, 64, 48)
        assert np.all((pred >= 0) & (pred <= 1))
        assert meta.nodata == -9999.0


def test_emit_serving_pipeline_multichip(tmp_path):
    """Scene-parallel serving across devices: one compute worker per chip
    draining a shared queue; identical outputs regardless of which chip
    computed a scene."""
    h5py = pytest.importorskip("h5py")
    import jax
    import jax.numpy as jnp

    from starcop_tpu.data.geotiff import read_geotiff
    from starcop_tpu.data.synthetic import synthetic_scene
    from starcop_tpu.models import SegmentationModel
    from starcop_tpu.serve.pipeline import emit_serving_pipeline

    devices = jax.devices()
    assert len(devices) >= 4  # conftest provisions 8 virtual CPU devices

    rng = np.random.default_rng(0)
    wl = np.arange(2100.0, 2490.0, 7.4)
    paths = []
    for i in range(5):
        scene = synthetic_scene(np.random.default_rng(i), 64, 48, n_plumes=1)
        cube = rng.uniform(1, 8, size=(64, 48, len(wl))).astype(np.float32)
        swir = (wl >= 2122) & (wl <= 2488)
        idx = np.linspace(0, scene["radiance"].shape[-1] - 1, swir.sum()).astype(int)
        cube[..., swir] = scene["radiance"][..., idx]
        path = tmp_path / f"EMIT_mc_{i}.nc"
        with h5py.File(path, "w") as f:
            d = f.create_dataset("radiance", data=cube)
            d.attrs["_FillValue"] = [-9999.0]
            g = f.create_group("sensor_band_parameters")
            g.create_dataset("wavelengths", data=wl)
            g.create_dataset("fwhm", data=np.full_like(wl, 8.5))
        paths.append(str(path))

    model = SegmentationModel(
        ["mag1c", "TOA_AVIRIS_640nm", "TOA_AVIRIS_550nm", "TOA_AVIRIS_460nm"],
        model_type="single",
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 32, 32), jnp.float32))
    apply_fn = lambda x: model.apply(variables, x, train=False)  # noqa: E731

    out_multi = tmp_path / "multi"
    pipeline = emit_serving_pipeline(
        apply_fn, str(out_multi), column_step=16, num_iter=3, devices=devices[:4]
    )
    results = pipeline.run(paths)
    assert len(results) == 5 and all(r.error is None for r in results)

    # single-device reference outputs match the multi-chip ones exactly
    out_single = tmp_path / "single"
    pipeline1 = emit_serving_pipeline(
        apply_fn, str(out_single), column_step=16, num_iter=3
    )
    pipeline1.run(paths[:1])
    name = os.path.splitext(os.path.basename(paths[0]))[0]
    a, _ = read_geotiff(str(out_multi / name / "prediction.tif"))
    b, _ = read_geotiff(str(out_single / name / "prediction.tif"))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_pipeline_narrow_upload_detection(tmp_path):
    """Halved-byte upload codecs vs the f32 upload, each at its documented
    contract (serve/pipeline.py docstring):

    * u16 (per-band affine quantization, ~1e-4 relative error): the SAME
      strict detection-equivalence contract as the pinned bf16-stream tests.
    * bf16 (plain rounding, ~0.4% relative): >=98.5% threshold-mask
      agreement — borderline background pixels near the threshold can be
      unpinned by the L1 regularizer (measured ~1%), which is why u16 is
      the recommended codec.
    """
    h5py = pytest.importorskip("h5py")
    import jax
    import jax.numpy as jnp

    from starcop_tpu.data.synthetic import synthetic_scene
    from starcop_tpu.models import SegmentationModel
    from starcop_tpu.ops.ch4_template import generate_template_from_bands
    from starcop_tpu.serve.pipeline import emit_serving_pipeline
    from tests.test_mag1c import assert_bf16_detection_equivalent

    # One plume-bearing granule whose SWIR window carries a REAL template
    # signal (so the matched filter produces decisive detections to compare).
    wl = np.arange(2100.0, 2490.0, 7.4)
    swir = (wl >= 2122) & (wl <= 2488)
    template = generate_template_from_bands(wl[swir], np.full_like(wl[swir], 8.5))[:, 1]
    scene = synthetic_scene(np.random.default_rng(3), 96, 64, n_plumes=2,
                            template=template)
    cube = np.random.default_rng(9).uniform(
        1, 8, size=(96, 64, len(wl))
    ).astype(np.float32)
    cube[..., swir] = scene["radiance"]
    cube[:2, :2, :] = -9999.0  # fill-marked corner: validity must survive narrowing
    path = tmp_path / "EMIT_up_0.nc"
    with h5py.File(path, "w") as f:
        d = f.create_dataset("radiance", data=cube)
        d.attrs["_FillValue"] = [-9999.0]
        g = f.create_group("sensor_band_parameters")
        g.create_dataset("wavelengths", data=wl)
        g.create_dataset("fwhm", data=np.full_like(wl, 8.5))

    model = SegmentationModel(
        ["mag1c", "TOA_AVIRIS_640nm", "TOA_AVIRIS_550nm", "TOA_AVIRIS_460nm"],
        model_type="single",
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 32, 32), jnp.float32))
    apply_fn = lambda x: model.apply(variables, x, train=False)  # noqa: E731

    outs, preds = {}, {}
    for tag, up in (
        ("f32", None),
        ("u12", "u12"),
        ("u10", "u10"),
        ("u16", jnp.uint16),
        ("bf16", jnp.bfloat16),
    ):
        out_dir = tmp_path / tag
        # download_dtype=None: isolate the UPLOAD codecs' error (the f16
        # download default has its own pinned contract in
        # test_pipeline_f16_download_contract).
        pipeline = emit_serving_pipeline(
            apply_fn, str(out_dir), column_step=16, num_iter=5, upload_dtype=up,
            download_dtype=None,
        )
        (res,) = pipeline.run([str(path)])
        assert res.error is None
        # fill-marked corner stays NODATA under every codec
        assert np.all(res.outputs["mag1c"][:2, :2] == -9999.0)
        outs[tag] = res.outputs["mag1c"].ravel()
        preds[tag] = res.outputs["prediction"].ravel()

    a = outs["f32"]
    assert (a > 1000).sum() > 50  # the scene carries decisive detections

    # u16: strict contract (identical decisive masks outside [250, 1000],
    # tight relative error on detections).
    big = a > 1000
    assert_bf16_detection_equivalent(a, outs["u16"])
    rel16 = np.abs(outs["u16"][big] - a[big]) / a[big]
    assert np.median(rel16) < 2e-3

    # u12: its own documented contract. The 12-bit grid step can re-ignite a
    # rare background pixel the f32 filter's L1 reweighting fully suppressed
    # (mf exactly 0 -> past threshold), which no f32-value "decisive band"
    # can exclude — so the contract is count-based: >=99.9% threshold-mask
    # agreement (measured 0.9992 here, 0.99980 on the 640x624 bench scene vs
    # u16's 0.99976) and u16-grade relative error on true detections.
    # Isolated one-pixel re-ignitions are removed by the baselines' binary
    # opening and are noise to the U-Net.
    thr = 500.0
    assert ((a > thr) == (outs["u12"] > thr)).mean() >= 0.999
    rel12 = np.abs(outs["u12"][big] - a[big]) / a[big]
    assert np.median(rel12) < 5e-3

    # u10: same contract class as u12 with one less bit of headroom —
    # count-based threshold-mask agreement and a 4x-of-u12 relative-error
    # bound on true detections. At the production config (640x624 scene,
    # 30 iterations) agreement measures 0.99980 — exactly u12's committed
    # bar there; THIS fixture runs num_iter=5 on a 96x64 scene, where the
    # barely-converged L1 reweighting leaves more borderline background
    # pixels for the 4x-coarser grid to flip (measured 0.9969 vs u12's
    # 0.9992 here), hence the looser bar.
    assert ((a > thr) == (outs["u10"] > thr)).mean() >= 0.995
    rel10 = np.abs(outs["u10"][big] - a[big]) / a[big]
    assert np.median(rel10) < 2e-2

    # bf16: documented weaker contract
    agree = ((a > thr) == (outs["bf16"] > thr)).mean()
    assert agree >= 0.985

    # Model predictions: under u12/u16 the RGB planes also ride the wire as
    # per-band affine u16 — probabilities must stay equivalent to the f32
    # pipeline (u16 tight everywhere; u12 inherits the mag1c channel's rare
    # borderline flips, so its contract is mean-error + 0.5-mask agreement).
    pf = preds["f32"]
    assert np.abs(preds["u16"] - pf).max() < 0.02
    assert np.abs(preds["u12"] - pf).mean() < 1e-3
    assert ((preds["u12"] > 0.5) == (pf > 0.5)).mean() >= 0.999
    # u10 inherits proportionally more of the mag1c channel's borderline
    # flips (0.9961 measured here at num_iter=5; see the mask-agreement
    # comment above).
    assert np.abs(preds["u10"] - pf).mean() < 2e-3
    assert ((preds["u10"] > 0.5) == (pf > 0.5)).mean() >= 0.995


def test_pipeline_f16_download_contract(tmp_path):
    """The default f16 result download vs bit-exact f32 download:

    * ONE stacked transfer either way (the two separate syncs each paid
      wire + RTT on the tunnel);
    * prediction error <= 2^-11 + identical 0.5-threshold masks away from
      the knife edge;
    * mag1c <= 2^-11 relative error (rides the wire scaled by 1/16, an
      exact power of 2, undone on host);
    * NODATA sentinels at invalid pixels restored EXACTLY from the
      reader's host-side valid mask.
    """
    h5py = pytest.importorskip("h5py")
    import jax
    import jax.numpy as jnp

    from starcop_tpu.data.synthetic import synthetic_scene
    from starcop_tpu.models import SegmentationModel
    from starcop_tpu.ops.ch4_template import generate_template_from_bands
    from starcop_tpu.serve.pipeline import emit_serving_pipeline

    wl = np.arange(2100.0, 2490.0, 7.4)
    swir = (wl >= 2122) & (wl <= 2488)
    template = generate_template_from_bands(wl[swir], np.full_like(wl[swir], 8.5))[:, 1]
    scene = synthetic_scene(np.random.default_rng(21), 96, 64, n_plumes=2,
                            template=template)
    cube = np.random.default_rng(22).uniform(
        1, 8, size=(96, 64, len(wl))
    ).astype(np.float32)
    cube[..., swir] = scene["radiance"]
    cube[:3, :5, :] = -9999.0  # fill corner: sentinel must survive f16 exactly
    path = tmp_path / "EMIT_dl_0.nc"
    with h5py.File(path, "w") as f:
        d = f.create_dataset("radiance", data=cube)
        d.attrs["_FillValue"] = [-9999.0]
        g = f.create_group("sensor_band_parameters")
        g.create_dataset("wavelengths", data=wl)
        g.create_dataset("fwhm", data=np.full_like(wl, 8.5))

    model = SegmentationModel(
        ["mag1c", "TOA_AVIRIS_640nm", "TOA_AVIRIS_550nm", "TOA_AVIRIS_460nm"],
        model_type="single",
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 32, 32), jnp.float32))
    apply_fn = lambda x: model.apply(variables, x, train=False)  # noqa: E731

    res = {}
    for tag, down in (("f32", None), ("f16", "f16")):
        pipeline = emit_serving_pipeline(
            apply_fn, str(tmp_path / tag), column_step=16, num_iter=5,
            upload_dtype="u10", download_dtype=down,
        )
        (r,) = pipeline.run([str(path)])
        assert r.error is None
        res[tag] = r.outputs

    mf32, mf16 = res["f32"]["mag1c"], res["f16"]["mag1c"]
    p32, p16 = res["f32"]["prediction"], res["f16"]["prediction"]

    # exact sentinels at the fill corner; everywhere else within f16 mantissa
    assert np.all(mf16[:3, :5] == -9999.0)
    valid = mf32 != -9999.0
    assert np.array_equal(valid, mf16 != -9999.0)
    denom = np.maximum(np.abs(mf32[valid]), 1.0)
    assert np.max(np.abs(mf16[valid] - mf32[valid]) / denom) <= 2 ** -11 + 1e-7

    assert np.max(np.abs(p16 - p32)) <= 2 ** -11 + 1e-7
    away = np.abs(p32 - 0.5) > 2e-3  # away from the knife edge
    assert np.array_equal((p16 > 0.5)[away], (p32 > 0.5)[away])
    # f16 stays a valid probability map
    assert np.all((p16 >= 0) & (p16 <= 1))


def test_pipeline_u10_odd_geometry(tmp_path):
    """u10 serving on a scene whose pixel count divides NEITHER the packer's
    pixel quads (4) NOR the valid mask's bit packing (8): 37x29 = 1073 px
    (1073 % 8 = 1, 1073 % 4 = 1). The device-side trims (q[: h*w], bit
    unpack [: h*w]) and the host packers' padding must round-trip exactly —
    compared against the f32-upload pipeline on the same granule."""
    h5py = pytest.importorskip("h5py")
    import jax
    import jax.numpy as jnp

    from starcop_tpu.data.synthetic import synthetic_scene
    from starcop_tpu.models import SegmentationModel
    from starcop_tpu.ops.ch4_template import generate_template_from_bands
    from starcop_tpu.serve.pipeline import emit_serving_pipeline

    wl = np.arange(2100.0, 2490.0, 7.4)
    swir = (wl >= 2122) & (wl <= 2488)
    template = generate_template_from_bands(wl[swir], np.full_like(wl[swir], 8.5))[:, 1]
    scene = synthetic_scene(np.random.default_rng(31), 37, 29, n_plumes=1,
                            template=template)
    cube = np.random.default_rng(32).uniform(
        1, 8, size=(37, 29, len(wl))
    ).astype(np.float32)
    cube[..., swir] = scene["radiance"]
    cube[36, 28, :] = -9999.0  # the LAST pixel (lives in the padded tail quads)
    cube[0, 3, 7] = -9999.0
    path = tmp_path / "EMIT_odd_0.nc"
    with h5py.File(path, "w") as f:
        d = f.create_dataset("radiance", data=cube)
        d.attrs["_FillValue"] = [-9999.0]
        g = f.create_group("sensor_band_parameters")
        g.create_dataset("wavelengths", data=wl)
        g.create_dataset("fwhm", data=np.full_like(wl, 8.5))

    model = SegmentationModel(
        ["mag1c", "TOA_AVIRIS_640nm", "TOA_AVIRIS_550nm", "TOA_AVIRIS_460nm"],
        model_type="single",
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 32, 32), jnp.float32))
    apply_fn = lambda x: model.apply(variables, x, train=False)  # noqa: E731

    res = {}
    for tag, up in (("f32", None), ("u10", "u10")):
        pipeline = emit_serving_pipeline(
            apply_fn, str(tmp_path / tag), column_step=16, num_iter=5,
            upload_dtype=up,
        )
        (r,) = pipeline.run([str(path)])
        assert r.error is None
        res[tag] = r.outputs

    mf_f, mf_u = res["f32"]["mag1c"], res["u10"]["mag1c"]
    assert mf_f.shape == (37, 29) and mf_u.shape == (37, 29)
    # both invalid pixels carry exact sentinels under both wires
    for m in (mf_f, mf_u):
        assert m[36, 28] == -9999.0 and m[0, 3] == -9999.0
    assert np.array_equal(mf_f == -9999.0, mf_u == -9999.0)
    valid = mf_f != -9999.0
    # u10's documented contract class on the valid pixels
    thr = 500.0
    assert ((mf_f > thr) == (mf_u > thr))[valid].mean() >= 0.995
    p_f, p_u = res["f32"]["prediction"], res["u10"]["prediction"]
    assert p_f.shape == (37, 29)
    assert np.abs(p_u - p_f).mean() < 5e-3


def test_pipeline_u12_odd_band_tail(tmp_path):
    """u12 upload with an ODD selected band count: band pairs pack 2-per-3-
    bytes, and the last unpaired band rides as a separate f32 plane
    (``q_tail``) re-concatenated inside the fused program
    (serve/pipeline.py ``has_tail`` branch). Real EMIT wavelength grids can
    select odd counts, so this pins the tail path against regression."""
    h5py = pytest.importorskip("h5py")
    import jax
    import jax.numpy as jnp

    from starcop_tpu.data.synthetic import synthetic_scene
    from starcop_tpu.models import SegmentationModel
    from starcop_tpu.ops.ch4_template import generate_template_from_bands
    from starcop_tpu.serve.pipeline import emit_serving_pipeline

    # This grid selects 49 bands in the default [2122, 2488] nm window.
    wl = np.arange(2104.0, 2490.0, 7.4)
    swir = (wl >= 2122) & (wl <= 2488)
    assert int(swir.sum()) % 2 == 1, "test premise: odd selected band count"
    template = generate_template_from_bands(wl[swir], np.full_like(wl[swir], 8.5))[:, 1]
    scene = synthetic_scene(np.random.default_rng(5), 96, 64, n_plumes=2,
                            template=template)
    cube = np.random.default_rng(11).uniform(
        1, 8, size=(96, 64, len(wl))
    ).astype(np.float32)
    cube[..., swir] = scene["radiance"]
    cube[:2, :2, :] = -9999.0
    path = tmp_path / "EMIT_odd_0.nc"
    with h5py.File(path, "w") as f:
        d = f.create_dataset("radiance", data=cube)
        d.attrs["_FillValue"] = [-9999.0]
        g = f.create_group("sensor_band_parameters")
        g.create_dataset("wavelengths", data=wl)
        g.create_dataset("fwhm", data=np.full_like(wl, 8.5))

    model = SegmentationModel(
        ["mag1c", "TOA_AVIRIS_640nm", "TOA_AVIRIS_550nm", "TOA_AVIRIS_460nm"],
        model_type="single",
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 32, 32), jnp.float32))
    apply_fn = lambda x: model.apply(variables, x, train=False)  # noqa: E731

    outs = {}
    for tag, up in (("f32", None), ("u12", "u12")):
        pipeline = emit_serving_pipeline(
            apply_fn, str(tmp_path / tag), column_step=16, num_iter=5,
            upload_dtype=up,
        )
        (res,) = pipeline.run([str(path)])
        assert res.error is None
        assert np.all(res.outputs["mag1c"][:2, :2] == -9999.0)
        outs[tag] = res.outputs["mag1c"].ravel()

    a = outs["f32"]
    assert (a > 1000).sum() > 50  # decisive detections present
    # Same count-based u12 contract as the even-band test.
    thr = 500.0
    assert ((a > thr) == (outs["u12"] > thr)).mean() >= 0.999
    big = a > 1000
    rel12 = np.abs(outs["u12"][big] - a[big]) / a[big]
    assert np.median(rel12) < 5e-3


def test_pipeline_u16_wire_nan_determinism(tmp_path):
    """A NaN at a VALID pixel must reach the u16 wire deterministically.

    band_minmax already excludes NaN from the per-band (lo, hi), but the
    quantization itself must nan_to_num BEFORE the uint16 cast: numpy's
    float->uint cast of NaN is platform-undefined (RuntimeWarning + an
    arbitrary value). Pins the same "NaN maps to grid point 0" contract the
    packed codecs carry (data/native_io.quantize_pack12/pack10) for the u16
    cube branch AND the shared RGB u16 wire (serve/pipeline.py)."""
    import warnings

    h5py = pytest.importorskip("h5py")
    import jax
    import jax.numpy as jnp

    from starcop_tpu.data.synthetic import synthetic_scene
    from starcop_tpu.models import SegmentationModel
    from starcop_tpu.serve.pipeline import emit_serving_pipeline

    wl = np.arange(2100.0, 2490.0, 7.4)
    scene = synthetic_scene(np.random.default_rng(7), 64, 48, n_plumes=1)
    cube = np.random.default_rng(13).uniform(
        1, 8, size=(64, 48, len(wl))
    ).astype(np.float32)
    swir = (wl >= 2122) & (wl <= 2488)
    idx = np.linspace(0, scene["radiance"].shape[-1] - 1, swir.sum()).astype(int)
    cube[..., swir] = scene["radiance"][..., idx]
    cube[10, 10, 5] = np.nan  # NaN at a VALID pixel (not fill-marked)
    cube[12, 12, 2] = np.nan  # ... including in an RGB-window band
    path = tmp_path / "EMIT_nan_0.nc"
    with h5py.File(path, "w") as f:
        d = f.create_dataset("radiance", data=cube)
        d.attrs["_FillValue"] = [-9999.0]
        g = f.create_group("sensor_band_parameters")
        g.create_dataset("wavelengths", data=wl)
        g.create_dataset("fwhm", data=np.full_like(wl, 8.5))

    model = SegmentationModel(
        ["mag1c", "TOA_AVIRIS_640nm", "TOA_AVIRIS_550nm", "TOA_AVIRIS_460nm"],
        model_type="single",
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 32, 32), jnp.float32))
    apply_fn = lambda x: model.apply(variables, x, train=False)  # noqa: E731

    for tag, up in (("u16", jnp.uint16), ("u10", "u10")):
        pipeline = emit_serving_pipeline(
            apply_fn, str(tmp_path / tag), column_step=16, num_iter=3,
            upload_dtype=up,
        )
        with warnings.catch_warnings():
            # The undefined cast announces itself: make it a hard failure.
            warnings.filterwarnings(
                "error", message=".*invalid value encountered in cast.*"
            )
            (res,) = pipeline.run([str(path)])
        assert res.error is None, (tag, res.error)
        assert np.isfinite(res.outputs["prediction"]).all(), tag


def test_serve_cli_end_to_end(tmp_path, capsys):
    """The serve CLI wires its flags (bf16-resident default model, upload
    codec, compression, column step) into the pipeline and processes a
    directory of granules in one pass — reference has no serving CLI; this
    pins the framework's own production entry point."""
    h5py = pytest.importorskip("h5py")
    import jax
    import jax.numpy as jnp

    from starcop_tpu.cli.serve import main as serve_main
    from starcop_tpu.data.synthetic import synthetic_scene
    from starcop_tpu.models import SegmentationModel
    from starcop_tpu.train import create_train_state, save_checkpoint

    rng = np.random.default_rng(0)
    wl = np.arange(2100.0, 2490.0, 7.4)
    gran_dir = tmp_path / "granules"
    gran_dir.mkdir()
    for i in range(2):
        scene = synthetic_scene(np.random.default_rng(i), 64, 48, n_plumes=1)
        cube = rng.uniform(1, 8, size=(64, 48, len(wl))).astype(np.float32)
        swir = (wl >= 2122) & (wl <= 2488)
        idx = np.linspace(0, scene["radiance"].shape[-1] - 1, swir.sum()).astype(int)
        cube[..., swir] = scene["radiance"][..., idx]
        with h5py.File(gran_dir / f"EMIT_cli_{i}.nc", "w") as f:
            d = f.create_dataset("radiance", data=cube)
            d.attrs["_FillValue"] = [-9999.0]
            g = f.create_group("sensor_band_parameters")
            g.create_dataset("wavelengths", data=wl)
            g.create_dataset("fwhm", data=np.full_like(wl, 8.5))

    model = SegmentationModel(
        ["mag1c", "TOA_AVIRIS_640nm", "TOA_AVIRIS_550nm", "TOA_AVIRIS_460nm"],
        model_type="unet_semseg",
    )
    state, _ = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 4, 32, 32), jnp.float32)
    )
    ckpt = save_checkpoint(str(tmp_path), state, name="best")

    out = tmp_path / "out"
    rc = serve_main([
        "--granules-dir", str(gran_dir), "--checkpoint", ckpt,
        "--output", str(out), "--column-step", "16", "--num-iter", "3",
        "--upload", "u10",
    ])
    assert rc == 0
    printed = capsys.readouterr().out
    assert printed.count(": ok") == 2, printed

    from starcop_tpu.data.geotiff import read_geotiff

    for i in range(2):
        base = out / f"EMIT_cli_{i}"
        pred, _ = read_geotiff(str(base / "prediction.tif"))
        assert pred.shape == (1, 64, 48)
        assert np.all((pred >= 0) & (pred <= 1)) and np.isfinite(pred).all()
