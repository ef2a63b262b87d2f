"""Native IO library: windowed-read parity with numpy, batch path, fallback."""

import os

import numpy as np
import pytest

from starcop_tpu.data import native_io as nio


@pytest.fixture(scope="module")
def rasters(tmp_path_factory):
    d = tmp_path_factory.mktemp("rasters")
    rng = np.random.default_rng(0)
    arrs, paths = [], []
    for i in range(5):
        a = rng.normal(size=(256, 300)).astype(np.float32)
        p = str(d / f"a{i}.npy")
        np.save(p, a)
        arrs.append(a)
        paths.append(p)
    return arrs, paths


def test_npy_payload_info(rasters):
    arrs, paths = rasters
    off, shape, dtype = nio.npy_payload_info(paths[0])
    assert shape == (256, 300) and dtype == np.float32 and off in (128, 80, 64)


def test_read_window_r2(rasters):
    arrs, paths = rasters
    off, shape, dtype = nio.npy_payload_info(paths[0])
    out = nio.read_window(paths[0], shape, dtype, (10, 20, 50, 60), nio.LAYOUT_R2, off)
    np.testing.assert_array_equal(out, arrs[0][10:60, 20:80])


def test_read_windows_batch(rasters):
    arrs, paths = rasters
    wins = [(i, 2 * i, 32, 48) for i in range(5)]
    outs = nio.read_npy_windows_batch(paths, wins, n_threads=3)
    for a, o, w in zip(arrs, outs, wins):
        np.testing.assert_array_equal(o, a[w[0] : w[0] + w[2], w[1] : w[1] + w[3]])


def test_read_window_bip(tmp_path):
    rng = np.random.default_rng(1)
    cube = rng.normal(size=(40, 50, 7)).astype(np.float32)
    p = str(tmp_path / "cube.npy")
    np.save(p, cube)
    off, shape, dtype = nio.npy_payload_info(p)
    out = nio.read_window(p, shape, dtype, (3, 4, 10, 12), nio.LAYOUT_BIP, off)
    np.testing.assert_array_equal(out, cube[3:13, 4:16, :])


def test_read_window_bsq(tmp_path):
    rng = np.random.default_rng(2)
    cube = rng.normal(size=(5, 40, 50)).astype(np.float64)
    raw = str(tmp_path / "cube.bin")
    cube.tofile(raw)
    out = nio.read_window(raw, cube.shape, np.float64, (8, 9, 16, 20), nio.LAYOUT_BSQ, 0)
    np.testing.assert_array_equal(out, cube[:, 8:24, 9:29])


def test_numpy_fallback_matches(tmp_path, monkeypatch, rasters):
    arrs, paths = rasters
    off, shape, dtype = nio.npy_payload_info(paths[1])
    native = nio.read_window(paths[1], shape, dtype, (5, 6, 20, 21), nio.LAYOUT_R2, off)
    monkeypatch.setattr(nio, "_lib", None)
    monkeypatch.setattr(nio, "_tried", True)
    fallback = nio.read_window(paths[1], shape, dtype, (5, 6, 20, 21), nio.LAYOUT_R2, off)
    np.testing.assert_array_equal(native, fallback)
