"""Ingest-layer tests: ENVI parsing/reading, column windows, band saving."""

import os

import numpy as np
import pytest

from starcop_tpu.data import ingest


@pytest.fixture(scope="module")
def envi_scene(tmp_path_factory):
    d = tmp_path_factory.mktemp("envi")
    rng = np.random.default_rng(0)
    lines, samples, bands = 40, 30, 12
    cube = rng.uniform(0, 10, size=(lines, samples, bands)).astype(np.float32)
    wl = np.linspace(2100, 2400, bands)

    # BIP file
    bip = str(d / "scene_img")
    cube.tofile(bip)
    with open(bip + ".hdr", "w") as fh:
        fh.write(
            "ENVI\nsamples = 30\nlines   = 40\nbands   = 12\nheader offset = 0\n"
            "data type = 4\ninterleave = bip\nbyte order = 0\n"
            "wavelength = {" + ", ".join(f"{v:.1f}" for v in wl) + "}\n"
            "fwhm = {" + ", ".join("5.5" for _ in wl) + "}\n"
        )
    # BSQ file
    bsq = str(d / "scene_bsq_img")
    np.moveaxis(cube, -1, 0).tofile(bsq)
    with open(bsq + ".hdr", "w") as fh:
        fh.write(
            "ENVI\nsamples = 30\nlines = 40\nbands = 12\nheader offset = 0\n"
            "data type = 4\ninterleave = bsq\nbyte order = 0\n"
        )
    return cube, bip, bsq


def test_parse_envi_header(envi_scene):
    cube, bip, _ = envi_scene
    meta = ingest.parse_envi_header(bip + ".hdr")
    assert meta["samples"] == 30 and meta["lines"] == 40 and meta["bands"] == 12
    assert meta["dtype"] == np.float32 and meta["interleave"] == "bip"
    assert meta["wavelengths"].shape == (12,)
    assert meta["fwhm"][0] == 5.5


def test_envi_reader_bip(envi_scene):
    cube, bip, _ = envi_scene
    r = ingest.ENVIReader(bip)
    np.testing.assert_array_equal(r.read_window(5, 7, 10, 12), cube[5:15, 7:19, :])
    np.testing.assert_array_equal(r.read_all(), cube)
    assert r.wavelengths is not None


def test_envi_reader_bsq(envi_scene):
    cube, _, bsq = envi_scene
    r = ingest.ENVIReader(bsq)
    np.testing.assert_array_equal(r.read_window(0, 3, 8, 9), cube[0:8, 3:12, :])


def test_column_windows():
    wins = ingest.column_windows(width=120, height=40, columns_read=50)
    assert wins == [(0, 0, 40, 50), (0, 50, 40, 50), (0, 100, 40, 20)]


def test_save_scene_bands(tmp_path):
    from starcop_tpu.data.geotiff import read_geotiff

    cube = np.random.default_rng(0).uniform(size=(8, 9, 3)).astype(np.float32)
    wl = np.array([2100.0, 2200.0, 2300.0])
    t = (5.0, 0.0, 500000.0, 0.0, -5.0, 4000000.0)
    path = ingest.save_scene_bands(cube, wl, np.full(3, 5.5), str(tmp_path / "bands"),
                                   transform=t, crs_epsg=32613)
    assert os.path.exists(path)
    band1, meta1 = read_geotiff(str(tmp_path / "bands" / "1.tif"))
    np.testing.assert_array_equal(band1[0], cube[..., 1])
    assert meta1.crs_epsg == 32613 and np.allclose(meta1.transform, t)
    assert meta1.tags["wavelength"] == "2200.00"
    import json

    meta = json.load(open(path))
    assert meta["wavelengths"] == [2100.0, 2200.0, 2300.0]


def test_download_gated(tmp_path):
    with pytest.raises(RuntimeError, match="network"):
        ingest.download_product("ftp://invalid.example/file.tar.gz", str(tmp_path))


def test_png_mask_to_binary(tmp_path):
    from PIL import Image

    # RGBA mask: alpha marks annotation
    rgba = np.zeros((16, 20, 4), np.uint8)
    rgba[4:8, 5:9, 3] = 255
    rgba[4:8, 5:9, 0] = 120
    p = tmp_path / "mask.png"
    Image.fromarray(rgba).save(p)
    mask = ingest.png_mask_to_binary(str(p))
    assert mask.shape == (16, 20)
    assert mask[5, 6] == 1.0 and mask[0, 0] == 0.0 and mask.sum() == 16
    # grayscale
    gray = np.zeros((8, 8), np.uint8)
    gray[2, 2] = 200
    p2 = tmp_path / "gray.png"
    Image.fromarray(gray).save(p2)
    assert ingest.png_mask_to_binary(str(p2)).sum() == 1
