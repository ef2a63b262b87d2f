"""Tests for mask vectorization (reference 4-Corners GPKG flow,
process_data_jpl_4corners.py:100-136 — here GeoJSON, no OGR)."""

import json

import numpy as np

from starcop_tpu.data.geotiff import write_geotiff
from starcop_tpu.data.vectorize import (
    get_polygons,
    join_plume_collections,
    vectorize_mask_raster,
    write_geojson,
)


def _ring_area(ring):
    """Shoelace area of a closed ring."""
    xs = np.array([p[0] for p in ring])
    ys = np.array([p[1] for p in ring])
    return 0.5 * abs(np.sum(xs[:-1] * ys[1:] - xs[1:] * ys[:-1]))


def test_single_square():
    mask = np.zeros((10, 10), bool)
    mask[2:5, 3:7] = True
    polys = get_polygons(mask)
    assert len(polys) == 1
    ring = polys[0]["coordinates"][0]
    assert ring[0] == ring[-1]  # closed
    assert _ring_area(ring) == 3 * 4  # pixel-boundary polygon covers the pixels
    xs = [p[0] for p in ring]
    ys = [p[1] for p in ring]
    assert min(xs) == 3 and max(xs) == 7 and min(ys) == 2 and max(ys) == 5


def test_multiple_components_and_min_area():
    mask = np.zeros((12, 12), bool)
    mask[1:4, 1:4] = True     # area 9
    mask[8, 8] = True         # area 1
    assert len(get_polygons(mask)) == 2
    assert len(get_polygons(mask, min_area=2)) == 1


def test_l_shape_area():
    mask = np.zeros((8, 8), bool)
    mask[1:5, 1:3] = True
    mask[3:5, 3:6] = True
    polys = get_polygons(mask)
    assert len(polys) == 1
    assert _ring_area(polys[0]["coordinates"][0]) == mask.sum()


def test_world_transform_applied():
    mask = np.zeros((6, 6), bool)
    mask[2:4, 1:3] = True
    t = (5.0, 0.0, 1000.0, 0.0, -5.0, 2000.0)
    polys = get_polygons(mask, transform=t)
    ring = polys[0]["coordinates"][0]
    xs = [p[0] for p in ring]
    ys = [p[1] for p in ring]
    assert min(xs) == 1000.0 + 1 * 5.0 and max(xs) == 1000.0 + 3 * 5.0
    assert max(ys) == 2000.0 - 2 * 5.0 and min(ys) == 2000.0 - 4 * 5.0


def test_vectorize_raster_roundtrip(tmp_path):
    """RGBA mask GeoTIFF -> GeoJSON with world coords + CRS (the reference's
    band-4 validity convention)."""
    rgba = np.zeros((4, 32, 32), np.float32)
    rgba[3, 10:20, 5:15] = 255.0
    t = (5.0, 0.0, 500000.0, 0.0, -5.0, 4000000.0)
    tif = str(tmp_path / "ang20191018t141549_mask.tif")
    write_geotiff(tif, rgba, transform=t, crs_epsg=32613)
    out = vectorize_mask_raster(tif, str(tmp_path / "mask.geojson"))
    data = json.load(open(out))
    assert data["crs"]["properties"]["name"].endswith("32613")
    assert len(data["features"]) == 1
    ring = data["features"][0]["geometry"]["coordinates"][0]
    assert _ring_area(ring) == 10 * 10 * 25.0  # 100 px at 5m -> 2500 m^2

    # empty mask -> no file
    write_geotiff(str(tmp_path / "empty.tif"), np.zeros((4, 8, 8), np.float32))
    assert vectorize_mask_raster(str(tmp_path / "empty.tif"),
                                 str(tmp_path / "e.geojson")) is None


def test_join_collections(tmp_path):
    p1 = str(tmp_path / "ang20191018t141549.geojson")
    p2 = str(tmp_path / "ang20191021t160052.geojson")
    write_geojson(p1, get_polygons(np.ones((2, 2), bool)))
    write_geojson(p2, get_polygons(np.ones((3, 3), bool)))
    out = join_plume_collections([p1, p2], str(tmp_path / "all_plumes.geojson"))
    data = json.load(open(out))
    assert len(data["features"]) == 2
    props = data["features"][0]["properties"]
    assert props["file"].startswith("ang2019") and "sensing_time" in props


def test_pinch_vertex_rings_stay_valid():
    """A hole/notch touching the boundary diagonally (pinch vertex) must not
    produce a self-crossing ring (regression: nxt[a]=b overwrote one of the
    two outgoing edges and the trace looped the hole repeatedly)."""
    mask = np.array([[0, 1, 1], [1, 0, 1], [1, 1, 1]], bool)
    polys = get_polygons(mask)
    assert len(polys) == 1
    ring = polys[0]["coordinates"][0]
    assert ring[0] == ring[-1]
    # the weave through the pinch covers exactly the set pixels
    assert _ring_area(ring) == mask.sum()


def test_random_masks_rings_closed_and_area_bounded():
    from scipy import ndimage

    rng = np.random.default_rng(0)
    for _ in range(30):
        m = rng.uniform(size=(12, 12)) > 0.5
        labels, n = ndimage.label(m)
        polys = get_polygons(m)
        assert len(polys) == n
        total = 0.0
        for p in polys:
            ring = p["coordinates"][0]
            assert ring[0] == ring[-1] and len(ring) >= 5
            total += _ring_area(ring)
        filled = sum(
            ndimage.binary_fill_holes(labels == i).sum() for i in range(1, n + 1)
        )
        # exterior rings: at least the pixels, at most the hole-filled extent
        assert m.sum() - 1e-9 <= total <= filled + 1e-9
