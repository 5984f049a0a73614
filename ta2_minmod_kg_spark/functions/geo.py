"""Geometry helpers without native deps (SURVEY §2.2 P3/P4).

Clean-room equivalents of `minmodkg/misc/geo.py` (merge_wkt / merge_wkts /
reproject_wkt), which route through shapely + pyproj.  Neither library is
in this sandbox, so:

- WKT handling is **textual**: geometries are validated by keyword +
  balanced parentheses and merged by wrapping in ``GEOMETRYCOLLECTION``
  (the reference's loads→dumps roundtrip additionally normalizes number
  formatting — a lexical, not semantic, divergence, documented here);
- reprojection transforms every coordinate pair in the WKT body with the
  spherical-mercator math (EPSG:3857 ⇄ EPSG:4326) — the same transform
  pyproj applies for 3857; other CRS pairs raise.

All functions are plain Python for use inside Arrow kernels — never
per-row UDFs.
"""

from __future__ import annotations

import math
import re
from typing import Iterable, Optional

_WGS84_R = 6378137.0

_WKT_TYPES = (
    "POINT",
    "LINESTRING",
    "POLYGON",
    "MULTIPOINT",
    "MULTILINESTRING",
    "MULTIPOLYGON",
    "GEOMETRYCOLLECTION",
)

_COORD_PAIR_RE = re.compile(
    r"(-?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?)\s+(-?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?)"
)


def is_valid_wkt(wkt: Optional[str]) -> bool:
    """Cheap structural validation: known type keyword, balanced parens,
    at least one coordinate pair (EMPTY allowed)."""
    if not isinstance(wkt, str):
        return False
    s = wkt.strip()
    up = s.upper()
    if not any(up.startswith(t) for t in _WKT_TYPES):
        return False
    if up.endswith("EMPTY"):
        return True
    depth = 0
    for c in s:
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth < 0:
                return False
    return depth == 0 and _COORD_PAIR_RE.search(s) is not None


def merge_wkt(wkts: Iterable[Optional[str]]) -> Optional[str]:
    """ref geo.py:12-30: skip unparseable entries; one geometry → itself;
    several → a GEOMETRYCOLLECTION; none → None."""
    geoms = [w.strip() for w in wkts if is_valid_wkt(w)]
    if not geoms:
        return None
    if len(geoms) == 1:
        return geoms[0]
    return "GEOMETRYCOLLECTION (" + ", ".join(geoms) + ")"


def _merc_inverse_xy(x: float, y: float) -> tuple[float, float]:
    lon = math.degrees(x / _WGS84_R)
    lat = math.degrees(math.atan(math.sinh(y / _WGS84_R)))
    return lon, lat


def _merc_forward_xy(lon: float, lat: float) -> tuple[float, float]:
    x = _WGS84_R * math.radians(lon)
    y = _WGS84_R * math.log(math.tan(math.pi / 4 + math.radians(lat) / 2))
    return x, y


def reproject_wkt(wkt: str, from_crs: str, to_crs: str) -> str:
    """ref geo.py:67-79: transform every coordinate pair.  Supported pairs:
    EPSG:3857 ⇄ EPSG:4326 (pure math); identical CRS is a no-op.

    NOTE axis order: the reference's pyproj Transformer.from_crs(3857,
    4326) yields (lat, lon) for EPSG:4326 in authority order; WKT
    convention (and the reference's stored POINTs) is (x y) = (lon lat),
    which is what this produces.
    """
    assert from_crs.startswith("EPSG:"), from_crs
    assert to_crs.startswith("EPSG:"), to_crs
    if from_crs == to_crs:
        return wkt
    if (from_crs, to_crs) == ("EPSG:3857", "EPSG:4326"):
        fn = _merc_inverse_xy
    elif (from_crs, to_crs) == ("EPSG:4326", "EPSG:3857"):
        fn = _merc_forward_xy
    else:
        raise NotImplementedError(
            f"{from_crs}->{to_crs} needs pyproj (not in this sandbox); "
            "3857<->4326 is supported natively"
        )

    def sub(m: re.Match) -> str:
        a, b = fn(float(m.group(1)), float(m.group(2)))
        return f"{a!r} {b!r}"

    return _COORD_PAIR_RE.sub(sub, wkt)


def merge_wkts(
    entries: list[tuple[int, Optional[str], str]],
    min_rank: Optional[int] = None,
) -> tuple[str, str]:
    """Semantics of ref geo.py:33-65 over (rank, crs, wkt) entries:

    - only entries at the top rank participate (or ``min_rank``+ if given);
    - a missing CRS defaults to EPSG:4326;
    - when several CRSes appear, everything converges on EPSG:4326 if
      present, else on an arbitrary member, via ``reproject_wkt``;
    - distinct surviving WKTs merge into one geometry (collection when >1).

    Returns ``(crs, wkt)`` — empty strings when nothing survives.
    """
    cutoff = min_rank if min_rank is not None else max(r for r, _, _ in entries)
    survivors = {}
    for rank, crs, wkt in entries:
        if rank >= cutoff:
            survivors.setdefault(crs or "EPSG:4326", []).append(wkt)

    if not survivors:
        return "", ""
    if len(survivors) == 1:
        target = next(iter(survivors))
        wkts = survivors[target]
    else:
        target = "EPSG:4326" if "EPSG:4326" in survivors else next(iter(survivors))
        wkts = []
        for crs, group in survivors.items():
            wkts.extend(reproject_wkt(w, crs, target) for w in group)

    distinct = sorted(set(wkts))
    if len(distinct) == 1:
        return target, distinct[0]
    merged = merge_wkt(distinct)
    return target, merged if merged is not None else ""
