"""Affine/window-alignment tests."""

import numpy as np
import pytest

from starcop_tpu.data import geo


def test_affine_roundtrip():
    t = (5.0, 0.0, 1000.0, 0.0, -5.0, 2000.0)  # 5m px, north-up
    x, y = geo.pixel_to_world(t, 10, 20)
    assert (x, y) == (1050.0, 1900.0)
    c, r = geo.world_to_pixel(t, x, y)
    assert np.isclose(c, 10) and np.isclose(r, 20)


def test_window_from_product():
    product_t = (5.0, 0.0, 1000.0, 0.0, -5.0, 2000.0)
    # plume starts 30 px right, 12 px down in the product grid
    plume_t = (5.0, 0.0, 1000.0 + 30 * 5, 0.0, -5.0, 2000.0 - 12 * 5)
    win = geo.window_from_product(plume_t, (64, 48), product_t)
    assert win == {
        "window_col_off": 30,
        "window_row_off": 12,
        "window_width": 48,
        "window_height": 64,
    }


def test_window_incompatible_grids():
    t1 = (5.0, 0.0, 0.0, 0.0, -5.0, 0.0)
    t2 = (10.0, 0.0, 0.0, 0.0, -10.0, 0.0)
    with pytest.raises(ValueError):
        geo.window_from_product(t1, (8, 8), t2)


def test_process_plume_windows_missing_product():
    t = (5.0, 0.0, 0.0, 0.0, -5.0, 0.0)
    rows = geo.process_plume_windows(
        [{"name": "a", "transform": t, "shape": (4, 4)},
         {"name": "missing", "transform": t, "shape": (4, 4)}],
        {"a": {"transform": t}},
    )
    assert rows[0]["window_col_off"] == 0
    assert rows[1]["window_col_off"] == -1
