"""Verify drive: matched filter + u10 serving pipeline on the real TPU."""
import os, sys, tempfile, time
import numpy as np
import jax, jax.numpy as jnp

print("devices:", jax.devices())

from starcop_tpu.ops import generate_template_from_bands, mag1c_column_blocks
from starcop_tpu.eval.metrics import confusion_matrix

# ---- Flow 1: matched filter on synthetic plume ----
rng = np.random.default_rng(0)
H, W, S = 256, 192, 64
centers = np.linspace(2122.0, 2488.0, S)
fwhm = np.full(S, 7.4)
tpl = np.asarray(generate_template_from_bands(centers, fwhm))[:, 1]
yy, xx = np.mgrid[:H, :W]
plume = 4000.0 * np.exp(-(((yy - 120) / 22.0) ** 2 + ((xx - 90) / 30.0) ** 2))
albedo = rng.uniform(0.8, 1.2, (H, W, 1)).astype(np.float32)
base = rng.uniform(1.0, 3.0, (1, 1, S)).astype(np.float32)
x = albedo * base * np.exp(plume[..., None] * tpl / 1e5)
x = (x + rng.normal(0, 1e-3, x.shape)).astype(np.float32)
mask = np.ones((H, W), bool)
t0 = time.time()
mf, _ = mag1c_column_blocks(jnp.asarray(x), jnp.asarray(tpl, jnp.float32),
                            jnp.asarray(mask), column_step=32,
                            num_iter=30, alpha=1e-4)
mf = np.asarray(mf)
print(f"mag1c done in {time.time()-t0:.1f}s; mf range [{mf.min():.1f}, {mf.max():.1f}]")
cm = np.asarray(confusion_matrix(mf > 500, plume > 500))
tp, fp, fn = cm[1, 1], cm[0, 1], cm[1, 0]
f1 = 2 * tp / (2 * tp + fp + fn)
print(f"flow1 matched-filter F1 = {f1:.4f}")
assert f1 > 0.9, f"matched filter F1 too low: {f1}"

# ---- Flow 2: u10 serving pipeline end-to-end ----
import h5py
from starcop_tpu.data.synthetic import synthetic_scene
from starcop_tpu.models import SegmentationModel
from starcop_tpu.serve.pipeline import emit_serving_pipeline
from starcop_tpu.data.geotiff import read_geotiff

model = SegmentationModel(
    ["mag1c", "TOA_AVIRIS_640nm", "TOA_AVIRIS_550nm", "TOA_AVIRIS_460nm"],
    model_type="single",
)
variables = model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 4, 32, 32), jnp.float32))

with tempfile.TemporaryDirectory() as tmp:
    wl = np.arange(2100.0, 2490.0, 7.4)
    fwhm_g = np.full_like(wl, 8.5)
    scene = synthetic_scene(np.random.default_rng(3), 96, 64, n_plumes=1)
    cube = rng.uniform(1, 8, size=(96, 64, len(wl))).astype(np.float32)
    swir = (wl >= 2122) & (wl <= 2488)
    idx = np.linspace(0, scene["radiance"].shape[-1] - 1, swir.sum()).astype(int)
    cube[..., swir] = scene["radiance"][..., idx]
    path = os.path.join(tmp, "EMIT_verify.nc")
    with h5py.File(path, "w") as f:
        d = f.create_dataset("radiance", data=cube)
        d.attrs["_FillValue"] = [-9999.0]
        g = f.create_group("sensor_band_parameters")
        g.create_dataset("wavelengths", data=wl)
        g.create_dataset("fwhm", data=fwhm_g)
    out_dir = os.path.join(tmp, "out")
    pipe = emit_serving_pipeline(
        lambda x: model.apply(variables, x, train=False),
        out_dir, column_step=32, num_iter=5, upload_dtype="u10")
    res = pipe.run([path])
    assert len(res) == 1 and res[0].error is None, res[0].error
    base = os.path.join(out_dir, "EMIT_verify")
    outs = os.listdir(base)
    print("flow2 u10 serve outputs:", sorted(outs))
    mag = read_geotiff(os.path.join(base, "mag1c.tif"))[0]
    print("flow2 mag1c tif:", mag.shape, "finite:", np.isfinite(mag).all(),
          "max:", float(np.nanmax(mag)))
    assert np.isfinite(mag).all() and mag.shape[-2:] == (96, 64)

print("VERIFY OK")
