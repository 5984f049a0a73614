"""P4: pure-python WKT merge / reprojection (ref misc/geo.py semantics)."""

from __future__ import annotations

import pytest

from ta2_minmod_kg_spark.functions.geo import (
    is_valid_wkt,
    merge_wkt,
    merge_wkts,
    reproject_wkt,
)


def test_is_valid_wkt():
    assert is_valid_wkt("POINT (1 2)")
    assert is_valid_wkt("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))")
    assert is_valid_wkt("POINT EMPTY")
    assert not is_valid_wkt("CIRCLE (1 2)")
    assert not is_valid_wkt("POINT (1 2")  # unbalanced
    assert not is_valid_wkt(None)
    assert not is_valid_wkt("not wkt at all")


def test_merge_wkt():
    assert merge_wkt([]) is None
    assert merge_wkt(["garbage", None]) is None
    assert merge_wkt(["POINT (1 2)"]) == "POINT (1 2)"
    assert (
        merge_wkt(["POINT (1 2)", "bad", "POINT (3 4)"])
        == "GEOMETRYCOLLECTION (POINT (1 2), POINT (3 4))"
    )


def test_reproject_wkt_point_golden():
    # forward transform of (-74, 40.7128) — same constants as the centroid
    # golden test
    out = reproject_wkt(
        "POINT (-8237642.318702244 4970071.579142425)", "EPSG:3857", "EPSG:4326"
    )
    nums = [float(x) for x in out[len("POINT ("):-1].split()]
    assert nums[0] == pytest.approx(-74.0, abs=1e-9)
    assert nums[1] == pytest.approx(40.7128, abs=1e-6)
    # identity and roundtrip
    assert reproject_wkt("POINT (1 2)", "EPSG:4326", "EPSG:4326") == "POINT (1 2)"
    rt = reproject_wkt(
        reproject_wkt("POINT (-74.0 40.7128)", "EPSG:4326", "EPSG:3857"),
        "EPSG:3857",
        "EPSG:4326",
    )
    nums = [float(x) for x in rt[len("POINT ("):-1].split()]
    assert nums[0] == pytest.approx(-74.0, abs=1e-9)
    assert nums[1] == pytest.approx(40.7128, abs=1e-9)


def test_reproject_polygon_all_pairs():
    poly = "POLYGON ((0 0, 1113194.9079327357 0, 0 1118889.9748579597, 0 0))"
    out = reproject_wkt(poly, "EPSG:3857", "EPSG:4326")
    # 1113194.9079 m = 10 degrees of longitude at the equator
    nums = [float(x) for x in out.replace("POLYGON ((", "").replace("))", "").replace(",", "").split()]
    assert nums[2] == pytest.approx(10.0, abs=1e-9)  # second vertex lon
    assert nums[5] == pytest.approx(10.0, abs=1e-6)  # third vertex lat


def test_unsupported_crs_pair_raises():
    with pytest.raises(NotImplementedError):
        reproject_wkt("POINT (1 2)", "EPSG:32633", "EPSG:4326")


def test_merge_wkts_semantics():
    # single CRS, single WKT
    assert merge_wkts([(5, "EPSG:4326", "POINT (1 2)")]) == (
        "EPSG:4326",
        "POINT (1 2)",
    )
    # only the top rank participates
    crs, wkt = merge_wkts(
        [(5, "EPSG:4326", "POINT (1 2)"), (1, "EPSG:4326", "POINT (9 9)")]
    )
    assert wkt == "POINT (1 2)"
    # missing crs defaults to 4326; distinct WKTs merge to a collection
    crs, wkt = merge_wkts(
        [(1, None, "POINT (1 2)"), (1, "EPSG:4326", "POINT (3 4)")]
    )
    assert crs == "EPSG:4326"
    assert wkt == "GEOMETRYCOLLECTION (POINT (1 2), POINT (3 4))"
    # mixed CRS converges on 4326 with reprojection
    crs, wkt = merge_wkts(
        [
            (1, "EPSG:4326", "POINT (10.0 0.0)"),
            (1, "EPSG:3857", "POINT (1113194.9079327357 0)"),
        ]
    )
    assert crs == "EPSG:4326"
    # both points are (10, 0) after reprojection → may or may not collapse
    # depending on lexical form; every coordinate must be ~(10, 0)
    import re

    for x, y in re.findall(r"(-?[\d.e+]+) (-?[\d.e+]+)", wkt):
        assert float(x) == pytest.approx(10.0, abs=1e-9)
        assert float(y) == pytest.approx(0.0, abs=1e-9)
