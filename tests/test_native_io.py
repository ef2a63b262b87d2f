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


def _unpack12(packed, lo, scale):
    """Test-side decoder of the u12 wire format (3 byte planes -> values)."""
    b0, b1, b2 = (packed[i].astype(np.uint16) for i in range(3))
    q0 = b0 | ((b1 & 0xF) << 8)
    q1 = (b1 >> 4) | (b2 << 4)
    q = np.stack([q0, q1], axis=-1).reshape(packed.shape[1:-1] + (-1,))
    return q.astype(np.float32) * scale + lo


def test_band_minmax_valid_mask():
    rng = np.random.default_rng(4)
    cube = rng.uniform(1, 8, size=(40, 30, 6)).astype(np.float32)
    valid = rng.uniform(size=(40, 30)) > 0.2
    cube[~valid] = -9999.0  # fill values must not leak into the range
    lo, hi = nio.band_minmax(cube, valid)
    flat = cube.reshape(-1, 6)[valid.ravel()]
    np.testing.assert_allclose(lo, flat.min(axis=0))
    np.testing.assert_allclose(hi, flat.max(axis=0))
    # all-invalid mask pins a harmless (0, 1) range
    lo0, hi0 = nio.band_minmax(cube, np.zeros((40, 30), bool))
    assert np.all(lo0 == 0.0) and np.all(hi0 == 1.0)


def test_quantize_pack12_roundtrip():
    rng = np.random.default_rng(5)
    cube = rng.uniform(1, 8, size=(32, 24, 10)).astype(np.float32)
    lo, hi = nio.band_minmax(cube)
    scale = np.maximum((hi - lo) / 4095.0, 1e-12).astype(np.float32)
    packed = nio.quantize_pack12(cube, lo, scale)
    assert packed.shape == (3, 32, 24, 5) and packed.dtype == np.uint8
    rt = _unpack12(packed, np.repeat(lo[None], 1, 0)[0], scale)
    # half-step quantization bound per band
    assert np.all(np.abs(rt - cube) <= scale * 0.51 + 1e-7)
    # odd band counts are rejected (callers carry the tail band separately)
    with pytest.raises(ValueError):
        nio.quantize_pack12(cube[..., :9], lo[:9], scale[:9])


def test_quantize_pack12_numpy_fallback_matches(monkeypatch):
    rng = np.random.default_rng(6)
    cube = rng.uniform(1, 8, size=(16, 12, 8)).astype(np.float32)
    valid = rng.uniform(size=(16, 12)) > 0.1
    lo_n, hi_n = nio.band_minmax(cube, valid)
    scale = np.maximum((hi_n - lo_n) / 4095.0, 1e-12).astype(np.float32)
    packed_n = nio.quantize_pack12(cube, lo_n, scale)
    monkeypatch.setattr(nio, "_lib", None)
    monkeypatch.setattr(nio, "_tried", True)
    lo_f, hi_f = nio.band_minmax(cube, valid)
    np.testing.assert_allclose(lo_f, lo_n)
    np.testing.assert_allclose(hi_f, hi_n)
    packed_f = nio.quantize_pack12(cube, lo_f, scale)
    # native rounds half-up, numpy rounds half-to-even: exact-half grid
    # points may differ by one step; dequantized values by one scale step
    rt_n = _unpack12(packed_n, lo_n, scale)
    rt_f = _unpack12(packed_f, lo_n, scale)
    assert np.all(np.abs(rt_n - rt_f) <= scale + 1e-7)


def test_quantize_pack12_out_of_range_clamps():
    """Pixels far outside the [lo, lo+4095*scale] grid clamp to the grid ends.

    The exported C API has no masked-pixel precondition: a near-constant band
    gets its scale floored at 1e-12, so an out-of-range pixel (fill sentinel,
    masked spike) maps to ~1e16 grid steps — the native kernel must clamp in
    FLOAT before the int cast (casting out-of-int32-range floats is UB) and
    agree with the numpy fallback's clip."""
    cube = np.full((4, 4, 2), 5.0, np.float32)
    cube[0, 0, 0] = 1.0e9    # huge positive spike -> 4095, not int-cast UB
    cube[1, 1, 1] = -1.0e9   # huge negative -> 0
    lo = np.array([5.0, 5.0], np.float32)
    scale = np.array([1e-12, 1e-12], np.float32)  # floored near-constant band
    packed = nio.quantize_pack12(cube, lo, scale)
    rt_steps = (
        packed[0].astype(np.uint16) | ((packed[1].astype(np.uint16) & 0xF) << 8),
        (packed[1].astype(np.uint16) >> 4) | (packed[2].astype(np.uint16) << 4),
    )
    q = np.stack(rt_steps, axis=-1).reshape(4, 4, 2)
    assert q[0, 0, 0] == 4095
    assert q[1, 1, 1] == 0
    assert np.all((q >= 0) & (q <= 4095))


def _unpack10(packed, lo, scale, n_px):
    """Test-side decoder of the u10 wire format (5 byte planes -> values)."""
    b = packed.astype(np.uint16)  # (5, G, S)
    q0 = b[0] | ((b[1] & 0x3) << 8)
    q1 = (b[1] >> 2) | ((b[2] & 0xF) << 6)
    q2 = (b[2] >> 4) | ((b[3] & 0x3F) << 4)
    q3 = (b[3] >> 6) | (b[4] << 2)
    q = np.stack([q0, q1, q2, q3], axis=1).reshape(-1, packed.shape[-1])[:n_px]
    return q.astype(np.float32) * scale + lo


def test_quantize_pack10_roundtrip():
    """u10 wire format: any band count (no pad/tail cases — quads run along
    pixels), half-step reconstruction bound, and a trailing PARTIAL pixel
    quad (n_px % 4 != 0) round-trips the real pixels and zero-pads the rest."""
    rng = np.random.default_rng(8)
    for h, w, s in ((32, 24, 10), (32, 24, 9), (7, 5, 3)):  # 7*5=35 % 4 == 3
        cube = rng.uniform(1, 8, size=(h, w, s)).astype(np.float32)
        lo, hi = nio.band_minmax(cube)
        scale = np.maximum((hi - lo) / 1023.0, 1e-12).astype(np.float32)
        packed = nio.quantize_pack10(cube, lo, scale)
        n_px = h * w
        assert packed.shape == (5, (n_px + 3) // 4, s) and packed.dtype == np.uint8
        rt = _unpack10(packed, lo, scale, n_px).reshape(h, w, s)
        assert np.all(np.abs(rt - cube) <= scale * 0.51 + 1e-7)
        if n_px % 4:
            # pad pixels of the trailing partial quad carry q = 0
            b = packed.astype(np.uint16)
            q3 = (b[3][-1] >> 6) | (b[4][-1] << 2)
            assert np.all(q3 == 0)


def test_quantize_pack10_numpy_fallback_matches(monkeypatch):
    rng = np.random.default_rng(9)
    cube = rng.uniform(1, 8, size=(15, 11, 7)).astype(np.float32)  # 165 % 4 == 1
    lo, hi = nio.band_minmax(cube)
    scale = np.maximum((hi - lo) / 1023.0, 1e-12).astype(np.float32)
    packed_n = nio.quantize_pack10(cube, lo, scale)
    monkeypatch.setattr(nio, "_lib", None)
    monkeypatch.setattr(nio, "_tried", True)
    packed_f = nio.quantize_pack10(cube, lo, scale)
    # native rounds half-up, numpy rounds half-to-even: exact-half grid
    # points may differ by one step; dequantized values by one scale step
    n_px = 15 * 11
    rt_n = _unpack10(packed_n, lo, scale, n_px)
    rt_f = _unpack10(packed_f, lo, scale, n_px)
    assert np.all(np.abs(rt_n - rt_f) <= scale + 1e-7)


def test_quantize_pack10_out_of_range_and_nan():
    """Same clamp/NaN determinism contract as pack12: out-of-grid pixels
    clamp to the grid ends in FLOAT (no int-cast UB) and NaN maps to 0."""
    cube = np.full((4, 5, 2), 5.0, np.float32)  # 20 px: full quads
    cube[0, 0, 0] = 1.0e9
    cube[1, 1, 1] = -1.0e9
    cube[2, 2, 0] = np.nan
    lo = np.array([5.0, 5.0], np.float32)
    scale = np.array([1e-12, 1e-12], np.float32)
    packed = nio.quantize_pack10(cube, lo, scale)
    q = ((_unpack10(packed, np.zeros(2, np.float32), np.ones(2, np.float32), 20))
         .reshape(4, 5, 2).astype(np.int32))
    assert q[0, 0, 0] == 1023
    assert q[1, 1, 1] == 0
    assert q[2, 2, 0] == 0
    assert np.all((q >= 0) & (q <= 1023))


def test_band_minmax_nan_semantics_match_native(monkeypatch):
    """A NaN at a VALID pixel must not poison the band range: the native
    kernel skips NaN (C++ comparisons are false), so the numpy fallback must
    too — a propagated NaN would pin the band to (0, 1) and downstream
    quantization would flatten every real radiance to one level."""
    rng = np.random.default_rng(7)
    cube = rng.uniform(10, 80, size=(20, 15, 4)).astype(np.float32)
    cube[3, 3, 1] = np.nan  # NaN on an otherwise-valid pixel
    valid = np.ones((20, 15), bool)
    expected_lo = np.nanmin(cube.reshape(-1, 4), axis=0)
    expected_hi = np.nanmax(cube.reshape(-1, 4), axis=0)

    lo_n, hi_n = nio.band_minmax(cube, valid)
    monkeypatch.setattr(nio, "_lib", None)
    monkeypatch.setattr(nio, "_tried", True)
    lo_f, hi_f = nio.band_minmax(cube, valid)
    for lo, hi in ((lo_n, hi_n), (lo_f, hi_f)):
        np.testing.assert_allclose(lo, expected_lo)
        np.testing.assert_allclose(hi, expected_hi)

    # NaN input to the pack: deterministic 0 on both paths (never a raw
    # int cast of NaN).
    scale = np.maximum((hi_f - lo_f) / 4095.0, 1e-12).astype(np.float32)
    packed_f = nio.quantize_pack12(cube, lo_f, scale)
    q0 = packed_f[0].astype(np.uint16) | ((packed_f[1].astype(np.uint16) & 0xF) << 8)
    q1 = (packed_f[1].astype(np.uint16) >> 4) | (packed_f[2].astype(np.uint16) << 4)
    q = np.stack([q0, q1], axis=-1).reshape(20, 15, 4)
    assert q[3, 3, 1] == 0

def test_valid_band_minmax_fuses_sentinel_scan_and_range():
    """The fused pass must equal the composition it replaces in the serving
    read stage: valid = ~any(cube == fill, axis=-1) (emit.invalid_mask
    semantics) and band_minmax(cube, valid)."""
    rng = np.random.default_rng(11)
    fill = -9999.0
    cube = rng.uniform(1, 8, size=(24, 18, 7)).astype(np.float32)
    # pixels where a SINGLE band carries the sentinel are invalid too
    cube[2, 3, 0] = fill
    cube[5, 5, :] = fill
    cube[7, 1, 6] = fill  # sentinel only in the tail band
    cube[9, 9, 2] = np.nan  # NaN neither invalidates nor enters the range

    expected_valid = ~np.any(cube == np.float32(fill), axis=-1)
    expected_lo, expected_hi = nio.band_minmax(cube, expected_valid)

    valid, lo, hi = nio.valid_band_minmax(cube, fill)
    assert valid.dtype == bool and valid.shape == (24, 18)
    np.testing.assert_array_equal(valid, expected_valid)
    np.testing.assert_allclose(lo, expected_lo)
    np.testing.assert_allclose(hi, expected_hi)


def test_valid_band_minmax_prefix_bands_and_skip():
    """n_minmax_bands covers the u12 body while validity scans the odd tail;
    0 skips the range scan entirely (the f32/bf16 serving paths)."""
    rng = np.random.default_rng(12)
    fill = -9999.0
    cube = rng.uniform(1, 8, size=(10, 9, 5)).astype(np.float32)
    cube[4, 4, 4] = fill  # invalid via the tail band ONLY

    valid, lo, hi = nio.valid_band_minmax(cube, fill, n_minmax_bands=4)
    assert not valid[4, 4]  # the tail band still invalidates
    assert lo.shape == (4,) and hi.shape == (4,)
    exp_lo, exp_hi = nio.band_minmax(cube[..., :4], valid)
    np.testing.assert_allclose(lo, exp_lo)
    np.testing.assert_allclose(hi, exp_hi)

    valid_only, lo_none, hi_none = nio.valid_band_minmax(cube, fill, n_minmax_bands=0)
    np.testing.assert_array_equal(valid_only, valid)
    assert lo_none is None and hi_none is None

    with pytest.raises(ValueError):
        nio.valid_band_minmax(cube, fill, n_minmax_bands=6)


def test_valid_band_minmax_numpy_fallback_matches(monkeypatch):
    rng = np.random.default_rng(13)
    fill = 0.25  # not exactly representable games: compare in f32 on BOTH paths
    cube = rng.uniform(0.3, 4, size=(12, 8, 6)).astype(np.float32)
    cube[1, 1, 3] = np.float32(fill)
    cube[6, 0, :] = np.float32(fill)
    cube[3, 7, 5] = np.nan

    # all pixels invalid: ranges pin (0, 1) on both paths
    allfill = np.full((4, 3, 2), np.float32(fill), np.float32)

    valid_n, lo_n, hi_n = nio.valid_band_minmax(cube, fill)
    v_n, alo_n, ahi_n = nio.valid_band_minmax(allfill, fill)
    monkeypatch.setattr(nio, "_lib", None)
    monkeypatch.setattr(nio, "_tried", True)
    valid_f, lo_f, hi_f = nio.valid_band_minmax(cube, fill)
    v_f, alo_f, ahi_f = nio.valid_band_minmax(allfill, fill)

    np.testing.assert_array_equal(valid_n, valid_f)
    np.testing.assert_allclose(lo_n, lo_f)
    np.testing.assert_allclose(hi_n, hi_f)
    assert not valid_n[1, 1] and not valid_n[6, 0] and valid_n[3, 7]
    for v, alo, ahi in ((v_n, alo_n, ahi_n), (v_f, alo_f, ahi_f)):
        assert not v.any() and np.all(alo == 0.0) and np.all(ahi == 1.0)
