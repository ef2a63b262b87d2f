"""Roundtrip + plumbing tests for the framework's self-contained GeoTIFF codec.

The reference's deliverables are COGs with CRS/transform and wavelength tags
(/root/reference/starcop/process_aviris.py:93-133,224-241; chip COGs with
BLOCKSIZE 128 — sampling_dataset.py:358-394). These tests pin that the
framework's own codec preserves data + geo metadata exactly, interoperates
with an external TIFF implementation (PIL) both ways, and that the chip
cache / dataset layers thread geo metadata through.
"""

import os

import numpy as np
import pytest

from starcop_tpu.data.geo import window_transform
from starcop_tpu.data.geotiff import (
    GeoTIFFReader,
    find_raster,
    load_raster,
    read_geotiff,
    save_raster,
    write_geotiff,
)

T_UTM = (5.0, 0.0, 500000.0, 0.0, -5.0, 4000000.0)


def test_roundtrip_single_band_float32(tmp_path, rng):
    arr = rng.uniform(0, 10000, size=(300, 217)).astype(np.float32)
    path = str(tmp_path / "mf.tif")
    write_geotiff(
        path, arr, transform=T_UTM, crs_epsg=32613, nodata=-9999.0,
        tags={"wavelengths": "2122.0,2480.0", "mag1c": "acfwl1mf"},
        descriptions=["CH4 Absorption (ppm x m)"],
    )
    back, meta = read_geotiff(path)
    np.testing.assert_array_equal(back[0], arr)
    assert meta.crs_epsg == 32613
    assert meta.nodata == -9999.0
    assert np.allclose(meta.transform, T_UTM)
    assert meta.tags["mag1c"] == "acfwl1mf"
    assert meta.descriptions == ["CH4 Absorption (ppm x m)"]


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.int16, np.int32, np.float64])
def test_roundtrip_dtypes(tmp_path, rng, dtype):
    info = np.iinfo(dtype) if np.issubdtype(dtype, np.integer) else None
    arr = (
        rng.integers(info.min, info.max, size=(70, 53)).astype(dtype)
        if info
        else rng.normal(size=(70, 53)).astype(dtype)
    )
    path = str(tmp_path / "x.tif")
    write_geotiff(path, arr)
    back, _ = read_geotiff(path)
    assert back.dtype == dtype
    np.testing.assert_array_equal(back[0], arr)


def test_windowed_read_decodes_only_needed_tiles(tmp_path, rng):
    arr = rng.uniform(size=(513, 390)).astype(np.float32)
    path = str(tmp_path / "big.tif")
    write_geotiff(path, arr, tile_size=128)
    win, _ = read_geotiff(path, window=(100, 250, 130, 200))
    np.testing.assert_array_equal(win[0], arr[250:450, 100:230])
    # window clipped at the raster edge comes back zero-padded beyond extent
    edge, _ = read_geotiff(path, window=(380, 500, 20, 20))
    np.testing.assert_array_equal(edge[0, :13, :10], arr[500:, 380:])
    assert (edge[0, 13:, :] == 0).all() and (edge[0, :, 10:] == 0).all()


def test_multiband_rotated_transform_descriptions(tmp_path, rng):
    arr = rng.uniform(size=(4, 140, 131)).astype(np.float32)
    t_rot = (4.9, 0.3, 1000.0, 0.2, -5.1, 2000.0)  # rotated grid -> ModelTransformation
    path = str(tmp_path / "rgba.tif")
    write_geotiff(path, arr, transform=t_rot, crs_epsg=4326,
                  descriptions=["r", "g", "b", "a"])
    r = GeoTIFFReader(path)
    assert r.shape == (4, 140, 131)
    np.testing.assert_array_equal(r.read(), arr)
    np.testing.assert_array_equal(r.read(band=2, window=(10, 20, 30, 40)),
                                  arr[2, 20:60, 10:40])
    assert np.allclose(r.meta.transform, t_rot)
    assert r.meta.crs_epsg == 4326
    assert r.meta.descriptions == ["r", "g", "b", "a"]


def test_overviews_written_for_large_rasters(tmp_path, rng):
    arr = rng.uniform(size=(1024, 800)).astype(np.float32)
    path = str(tmp_path / "scene.tif")
    write_geotiff(path, arr, tile_size=128)
    r = GeoTIFFReader(path)
    assert r.overview_count >= 2  # COG essential: reduced-resolution IFDs
    np.testing.assert_array_equal(r.read()[0], arr)


def test_interop_with_external_tiff_reader(tmp_path, rng):
    """Our files open in PIL; PIL's strip TIFFs open in our reader."""
    PIL = pytest.importorskip("PIL.Image")
    arr = rng.uniform(0, 1, size=(90, 77)).astype(np.float32)
    ours = str(tmp_path / "ours.tif")
    write_geotiff(ours, arr)
    np.testing.assert_allclose(np.asarray(PIL.open(ours)), arr)

    theirs = str(tmp_path / "theirs.tif")
    PIL.fromarray(arr).save(theirs)
    back, _ = read_geotiff(theirs)
    np.testing.assert_allclose(back[0], arr)


def test_uncompressed_mode(tmp_path, rng):
    arr = rng.uniform(size=(64, 64)).astype(np.float32)
    path = str(tmp_path / "raw.tif")
    write_geotiff(path, arr, compress=False)
    back, _ = read_geotiff(path)
    np.testing.assert_array_equal(back[0], arr)


def test_integer_compress_level(tmp_path, rng):
    """``compress`` as an int zlib level: lossless round trip at every level,
    and the file header declares DEFLATE (8) for levels >= 1 / none (1) for 0.
    Level only trades writer CPU for size (serving passes 0/False)."""
    arr = rng.uniform(size=(3, 200, 160)).astype(np.float32)
    sizes = {}
    for level in (0, 1, 6):
        path = str(tmp_path / f"lvl{level}.tif")
        write_geotiff(path, arr, compress=level)
        back, _ = read_geotiff(path)
        np.testing.assert_array_equal(back, arr)
        sizes[level] = os.path.getsize(path)
    # Uncompressed must be the largest; compressed levels must not exceed it
    # by more than tile framing (random f32 barely compresses, so only the
    # ordering — not a ratio — is asserted).
    assert sizes[1] <= sizes[0]
    assert sizes[6] <= sizes[0]


def test_save_load_raster_dispatch(tmp_path, rng):
    arr = rng.uniform(size=(40, 30)).astype(np.float32)
    save_raster(str(tmp_path / "a.npy"), arr)
    save_raster(str(tmp_path / "b.tif"), arr, transform=T_UTM, crs_epsg=32613)
    np.testing.assert_array_equal(load_raster(str(tmp_path / "a.npy")), arr)
    np.testing.assert_array_equal(load_raster(str(tmp_path / "b.tif")), arr)
    np.testing.assert_array_equal(
        load_raster(str(tmp_path / "b.tif"), window=(5, 10, 12, 8)), arr[10:18, 5:17]
    )
    assert find_raster(str(tmp_path), "a").endswith("a.npy")
    assert find_raster(str(tmp_path), "b").endswith("b.tif")
    assert find_raster(str(tmp_path), "missing") is None


def test_window_transform():
    t = window_transform(T_UTM, 100, 200)
    assert t == (5.0, 0.0, 500000.0 + 100 * 5.0, 0.0, -5.0, 4000000.0 - 200 * 5.0)


def test_chip_cache_writes_georeferenced_tifs(tmp_path, rng):
    """cache_chip's .tif outputs carry the chip transform + CRS (reference
    per-tile COGs, sampling_dataset.py:358-394)."""
    from starcop_tpu.data.chip_cache import cache_chip

    mag1c = rng.uniform(0, 20000, size=(256, 256)).astype(np.float32)
    chip_t = window_transform(T_UTM, 512, 1024)
    cache_chip(
        str(tmp_path / "chip0"),
        {"mag1c": mag1c},
        output_size=(256, 256),
        transform=chip_t,
        crs_epsg=32613,
    )
    arr, meta = read_geotiff(str(tmp_path / "chip0" / "mag1c.tif"))
    np.testing.assert_array_equal(arr[0], np.clip(mag1c, 0, 10000))
    assert np.allclose(meta.transform, chip_t) and meta.crs_epsg == 32613
    assert meta.descriptions == ["mag1c"]
    # derived products georeferenced too
    _, wmeta = read_geotiff(str(tmp_path / "chip0" / "weight_mag1c.tif"))
    assert np.allclose(wmeta.transform, chip_t)


def test_chip_dataset_reads_tif_chips(tmp_path, rng):
    """ChipDataset consumes .tif chip folders identically to .npy ones."""
    from starcop_tpu.data.chip_cache import cache_chip
    from starcop_tpu.data.dataset import ChipDataset

    folder = tmp_path / "c0"
    mag1c = rng.uniform(0, 2000, size=(64, 64)).astype(np.float32)
    rgb = {f"TOA_AVIRIS_{w}nm": rng.uniform(0, 60, (64, 64)).astype(np.float32)
           for w in (640, 550, 460)}
    cache_chip(str(folder), {"mag1c": mag1c, **rgb}, output_size=(64, 64),
               transform=T_UTM, crs_epsg=32613)
    rows = [{
        "id": "c0", "folder": str(folder), "has_plume": False,
        "window_col_off": 8, "window_row_off": 4, "window_width": 32,
        "window_height": 16,
    }]
    ds = ChipDataset(rows, ["mag1c"] + list(rgb), weight_loss_product="weight_mag1c")
    sample = ds[0]
    assert sample["input"].shape == (4, 16, 32)
    np.testing.assert_allclose(sample["input"][0], mag1c[4:20, 8:40])
    assert sample["output"].shape == (1, 16, 32)
    assert sample["weight_loss"].shape == (1, 16, 32)


def test_lazy_windowed_read_does_not_load_file(tmp_path, rng):
    """Windowed reads over scene-sized rasters fetch only header + needed
    tiles (the chip cache reads hundreds of windows per scene product)."""
    arr = rng.uniform(size=(2048, 1536)).astype(np.float32)
    path = str(tmp_path / "scene.tif")
    write_geotiff(path, arr, tile_size=128)
    r = GeoTIFFReader(path)
    assert len(r._buf) <= r._HEAD  # header cache only, not the whole file
    win = r.read(window=(700, 900, 130, 140))
    np.testing.assert_array_equal(win[0], arr[900:1040, 700:830])
    r.close()


def test_classic_tiff_4gb_guard(tmp_path):
    class FakeBig(np.ndarray):
        pass

    # 1 band x 40000 x 40000 f32 uncompressed would exceed 4 GB: the writer
    # must refuse rather than emit corrupt 32-bit offsets. Use a strided
    # trick to avoid allocating it: np.broadcast_to keeps it virtual.
    big = np.broadcast_to(np.zeros((1, 1), np.float32), (40000, 40000))
    with pytest.raises(ValueError, match="32-bit"):
        write_geotiff(str(tmp_path / "big.tif"), big, compress=False, bigtiff=False)


def test_negative_and_overhanging_windows_zero_pad(tmp_path, rng):
    """Padded plume windows (permian.pad_window_to_size) go negative /
    overhang; both backends must zero-pad identically."""
    arr = rng.uniform(1, 2, size=(40, 30)).astype(np.float32)
    tif = str(tmp_path / "a.tif")
    npy = str(tmp_path / "a.npy")
    write_geotiff(tif, arr)
    np.save(npy, arr)
    for window in [(-2, -3, 10, 12), (25, 35, 10, 10), (-5, -5, 50, 45)]:
        a = load_raster(tif, window=window)
        b = load_raster(npy, window=window)
        np.testing.assert_array_equal(a, b)
        c0, r0, w, h = window
        assert a.shape == (h, w)
        # in-extent region matches the source
        ry0, ry1 = max(r0, 0), min(r0 + h, 40)
        rx0, rx1 = max(c0, 0), min(c0 + w, 30)
        np.testing.assert_array_equal(
            a[ry0 - r0 : ry1 - r0, rx0 - c0 : rx1 - c0], arr[ry0:ry1, rx0:rx1]
        )


def test_chunky_tiled_multiband_read(tmp_path, rng):
    """GDAL's default COG interleave is PIXEL (chunky) even when tiled; the
    reader must de-interleave (regression: assumed planar tiles)."""
    import struct
    import zlib

    from starcop_tpu.data import geotiff as gt

    c, h, w, ts = 3, 70, 50, 64
    arr = rng.uniform(0, 1, size=(c, h, w)).astype(np.float32)
    # build tiles by hand: (ts, ts, C) interleaved, row-major tile order
    chunky = np.zeros((ts * 2, ts, c), np.float32)
    chunky[:h, :w] = np.moveaxis(arr, 0, -1)
    tiles = [zlib.compress(chunky[t * ts : (t + 1) * ts].tobytes()) for t in range(2)]

    entries = [
        (gt._IMAGE_WIDTH, gt._T_LONG, (w,)),
        (gt._IMAGE_LENGTH, gt._T_LONG, (h,)),
        (gt._BITS_PER_SAMPLE, gt._T_SHORT, (32,) * c),
        (gt._COMPRESSION, gt._T_SHORT, (8,)),
        (gt._PHOTOMETRIC, gt._T_SHORT, (1,)),
        (gt._SAMPLES_PER_PIXEL, gt._T_SHORT, (c,)),
        (gt._PLANAR_CONFIG, gt._T_SHORT, (1,)),  # chunky
        (gt._TILE_WIDTH, gt._T_SHORT, (ts,)),
        (gt._TILE_LENGTH, gt._T_SHORT, (ts,)),
        (gt._TILE_OFFSETS, gt._T_LONG, [0, 0]),
        (gt._TILE_BYTE_COUNTS, gt._T_LONG, [0, 0]),
        (gt._SAMPLE_FORMAT, gt._T_SHORT, (3,) * c),
    ]
    entries.sort(key=lambda e: e[0])
    ifd_size = 2 + 12 * len(entries) + 4
    ext = sum(
        gt._padded_len(gt._value_len(t, v))
        for _tag, t, v in entries
        if gt._value_len(t, v) > 4
    )
    cursor = 8 + ifd_size + ext
    offs, cnts = [], []
    for blob in tiles:
        offs.append(cursor)
        cnts.append(len(blob))
        cursor += gt._padded_len(len(blob))
    entries = gt._finalize_entries(entries, offs, cnts)
    out = bytearray(struct.pack("<2sHI", b"II", 42, 8))
    out += gt._serialize_ifd(entries, 8, 0)
    for blob in tiles:
        out += blob + b"\x00" * (gt._padded_len(len(blob)) - len(blob))
    path = str(tmp_path / "chunky.tif")
    open(path, "wb").write(bytes(out))

    back, _ = read_geotiff(path)
    np.testing.assert_array_equal(back, arr)
    win = read_geotiff(path, band=1, window=(10, 60, 20, 15))[0]
    np.testing.assert_array_equal(win[:10], arr[1, 60:70, 10:30])
    assert (win[10:] == 0).all()  # overhang zero-padded


def test_bigtiff_forced_roundtrip(tmp_path, rng):
    """bigtiff=True emits a version-43 file (64-bit offsets) that roundtrips
    data, geo metadata, overviews and windowed reads identically."""
    arr = rng.uniform(0, 100, size=(3, 300, 280)).astype(np.float32)
    path = str(tmp_path / "big.tif")
    write_geotiff(
        path, arr, transform=T_UTM, crs_epsg=32613, nodata=-1.0,
        descriptions=["a", "b", "c"], bigtiff=True,
    )
    import struct

    with open(path, "rb") as fh:
        order, magic, offsize, zero, first_ifd = struct.unpack("<2sHHHQ", fh.read(16))
    assert (order, magic, offsize, zero, first_ifd) == (b"II", 43, 8, 0, 16)
    r = GeoTIFFReader(path)
    assert r._big and r.overview_count >= 1
    np.testing.assert_array_equal(r.read(), arr)
    np.testing.assert_array_equal(
        r.read(band=1, window=(13, 40, 100, 90)), arr[1, 40:130, 13:113]
    )
    assert r.meta.crs_epsg == 32613
    assert r.meta.descriptions == ["a", "b", "c"]
    assert np.allclose(r.meta.transform, T_UTM)
    r.close()


def test_bigtiff_auto_switch(tmp_path, rng, monkeypatch):
    """bigtiff='auto' (the default) switches to BigTIFF exactly when the laid-
    out file would overflow classic offsets (ceiling lowered for the test)."""
    from starcop_tpu.data import geotiff as gt

    arr = rng.uniform(size=(64, 64)).astype(np.float32)
    small = str(tmp_path / "small.tif")
    write_geotiff(small, arr)
    with open(small, "rb") as fh:
        assert fh.read(4)[2:] == b"\x2a\x00"  # classic magic 42 below the ceiling

    monkeypatch.setattr(gt, "_CLASSIC_MAX_OFFSET", 4096)
    auto = str(tmp_path / "auto.tif")
    gt.write_geotiff(auto, arr)
    with open(auto, "rb") as fh:
        assert fh.read(4)[2:] == b"\x2b\x00"  # BigTIFF magic 43 past the ceiling
    back, _ = read_geotiff(auto)
    np.testing.assert_array_equal(back[0], arr)
    with pytest.raises(ValueError, match="32-bit"):
        gt.write_geotiff(str(tmp_path / "refuse.tif"), arr, bigtiff=False)


def test_bigtiff_tile_beyond_4gb_sparse(tmp_path, rng):
    """A tile placed past the 4 GB boundary (sparse file — no real 4 GB of
    data) must read back exactly: true 64-bit offset handling end to end."""
    import struct

    from starcop_tpu.data import geotiff as gt

    ts = 16
    arr = rng.uniform(0, 1, size=(ts, ts)).astype(np.float32)
    far = 5 * 1024**3  # 5 GB, > any 32-bit offset
    entries = [
        (gt._IMAGE_WIDTH, gt._T_LONG, (ts,)),
        (gt._IMAGE_LENGTH, gt._T_LONG, (ts,)),
        (gt._BITS_PER_SAMPLE, gt._T_SHORT, (32,)),
        (gt._COMPRESSION, gt._T_SHORT, (1,)),
        (gt._PHOTOMETRIC, gt._T_SHORT, (1,)),
        (gt._SAMPLES_PER_PIXEL, gt._T_SHORT, (1,)),
        (gt._PLANAR_CONFIG, gt._T_SHORT, (1,)),
        (gt._TILE_WIDTH, gt._T_SHORT, (ts,)),
        (gt._TILE_LENGTH, gt._T_SHORT, (ts,)),
        (gt._TILE_OFFSETS, gt._T_LONG8, (far,)),
        (gt._TILE_BYTE_COUNTS, gt._T_LONG, (arr.nbytes,)),
        (gt._SAMPLE_FORMAT, gt._T_SHORT, (3,)),
    ]
    path = str(tmp_path / "sparse.tif")
    with open(path, "wb") as fh:
        fh.write(struct.pack("<2sHHHQ", b"II", 43, 8, 0, 16))
        fh.write(gt._serialize_ifd(entries, 16, 0, True))
        fh.seek(far)
        fh.write(arr.tobytes())
    back, _ = read_geotiff(path)
    np.testing.assert_array_equal(back[0], arr)


def test_write_geotiff_rejects_bad_compress_level(tmp_path):
    """An out-of-range zlib level fails fast at the call, not per-tile
    mid-write (zlib.error after the file is partially laid out)."""
    import pytest

    arr = np.zeros((8, 8), np.float32)
    with pytest.raises(ValueError, match="compress"):
        write_geotiff(str(tmp_path / "x.tif"), arr, compress=10)
