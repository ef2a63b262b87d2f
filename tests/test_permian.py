"""Tests for the Permian-2019 dataframe assembly (reference
sampling_dataset.py:19-179,408-439: TEST_DATES split, bad-tile blacklist,
manual has_plume overrides, intersection flagging, negative sampling)."""

import numpy as np

from starcop_tpu.data.permian import (
    BAD_TEST_TILES,
    MANUAL_HAS_PLUME_OVERRIDES,
    TEST_DATES,
    flight_date,
    generate_permian_2019_split,
    pad_window_to_size,
    permian_mag1c_stats_rows,
    permian_plumes_rows,
    window_id,
)


def _plume_row(name, r, c, w=151, h=151, **kw):
    return dict(name=name, window_row_off=r, window_col_off=c,
                window_width=w, window_height=h, **kw)


def test_flight_date_parse():
    assert flight_date("ang20191018t141549") == "2019-10-18"
    assert flight_date("ang20190922t192642") == "2019-09-22"


def test_window_id_convention():
    row = _plume_row("ang20191018t141549", 8600, 403)
    assert window_id(row) == "ang20191018t141549_r8600_c403_w151_h151"


def test_test_dates_are_published_split():
    assert TEST_DATES == ["2019-10-25", "2019-10-21", "2019-10-18"]
    assert len(BAD_TEST_TILES) == 32
    assert len(MANUAL_HAS_PLUME_OVERRIDES) == 15


def test_plumes_rows_split_blacklist_and_padding():
    rows = [
        _plume_row("ang20191018t141549", 8600, 403),   # blacklisted
        _plume_row("ang20191018t141549", 100, 50),     # test date
        _plume_row("ang20190922t192642", 300, 20),     # train date
        _plume_row("ang20190922t192642", 10, -1),      # invalid window
    ]
    out = permian_plumes_rows(rows, output_size=(151, 151))
    ids = [r["id"] for r in out]
    assert "ang20191018t141549_r8600_c403_w151_h151" not in ids
    assert len(out) == 2
    by_id = {r["id"]: r for r in out}
    assert by_id["ang20191018t141549_r100_c50_w151_h151"]["subset"] == "test"
    assert by_id["ang20190922t192642_r300_c20_w151_h151"]["subset"] == "train"
    assert all(r["has_plume"] for r in out)

    # padding happens after id assignment, centered
    padded = permian_plumes_rows(rows[1:3], output_size=(511, 511))
    assert padded[0]["id"] == "ang20191018t141549_r100_c50_w151_h151"
    assert padded[0]["window_height"] == 511 and padded[0]["window_width"] == 511
    assert padded[0]["window_row_off"] == 100 - (511 - 151) // 2


def test_pad_window_never_shrinks():
    row = _plume_row("ang20190922t192642", 5, 5, w=600, h=600)
    out = pad_window_to_size(row, (512, 512))
    assert out["window_width"] == 600 and out["window_height"] == 600


def test_stats_rows_overrides_and_intersection():
    # flight line with one labeled plume at rows 2000-2151, cols 100-251
    plumes = permian_plumes_rows([_plume_row("ang20190922t192642", 2000, 100)])
    stats = [
        # intersects the labeled plume -> has_plume
        _plume_row("ang20190922t192642", 1792, 0, w=512, h=512, count=512 * 512, mean=40.0),
        # far away -> no plume
        _plume_row("ang20190922t192642", 9000, 0, w=512, h=512, count=512 * 512, mean=10.0),
        # manual override id (Big One)
        _plume_row("ang20190927t153023", 8192, 0, w=512, h=512, count=512 * 512, mean=90.0),
        # intersects the overridden window on the same flight -> has_plume
        _plume_row("ang20190927t153023", 8448, 256, w=512, h=512, count=512 * 512, mean=20.0),
        # different flight, same window as a plume elsewhere -> no plume
        _plume_row("ang20191011t152413", 1792, 0, w=512, h=512, count=512 * 512, mean=5.0),
    ]
    out = permian_mag1c_stats_rows(stats, plumes)
    flags = {r["id"]: r["has_plume"] for r in out}
    assert flags["ang20190922t192642_r1792_c0_w512_h512"] is True
    assert flags["ang20190922t192642_r9000_c0_w512_h512"] is False
    assert flags["ang20190927t153023_r8192_c0_w512_h512"] is True
    assert flags["ang20190927t153023_r8448_c256_w512_h512"] is True
    assert flags["ang20191011t152413_r1792_c0_w512_h512"] is False
    assert all(r["percentage_valids"] == 1.0 for r in out)


def test_generate_split_end_to_end():
    rng = np.random.default_rng(0)
    plume_rows = [
        _plume_row("ang20191018t141549", 100, 50),   # test flight
        _plume_row("ang20190922t192642", 2000, 100), # train flight
    ]
    stats_rows = []
    for name in ("ang20191018t141549", "ang20190922t192642"):
        for r in range(0, 8 * 256, 256):
            stats_rows.append(_plume_row(
                name, r, 0, w=512, h=512,
                count=int(512 * 512 * rng.uniform(0.85, 1.0)),
                mean=float(rng.uniform(5, 50)),
            ))
    train, test = generate_permian_2019_split(
        plume_rows, stats_rows, n_hard=1, n_random=1, seed=42,
        output_size=(512, 512),
    )
    # split is by flight date, for plumes and negatives alike
    assert all(flight_date(r["name"]) not in TEST_DATES for r in train)
    assert all(flight_date(r["name"]) in TEST_DATES for r in test)
    # each side: 1 padded plume + up to 2 mined negatives
    assert sum(r["has_plume"] for r in train) == 1
    assert sum(r["has_plume"] for r in test) == 1
    neg_train = [r for r in train if not r["has_plume"]]
    assert 1 <= len(neg_train) <= 2
    assert {r["difficulty"] for r in neg_train} <= {"hard", "random"}
    # plume windows were padded to the chip size
    plume_train = [r for r in train if r["has_plume"]][0]
    assert plume_train["window_width"] == 512
    # negatives never intersect a plume-flagged window (they came from
    # no-plume stats rows)
    for n in neg_train:
        assert not n["has_plume"]
    # deterministic under the same seed
    train2, test2 = generate_permian_2019_split(
        plume_rows, stats_rows, n_hard=1, n_random=1, seed=42,
        output_size=(512, 512),
    )
    assert [r["id"] for r in train2] == [r["id"] for r in train]
