"""Deterministic synthetic corpus (BASELINE.json ``input_hint``).

Generates the pipeline's front-door table
``(repo: string, path: string, commit: string, lang: string, content: string)``
where ``content`` is a JSON mineral-site record (FIXTURES.md §1-2), plus the
system/curated same-as edge tables.

Everything is a pure function of the row index (seeded arithmetic, no RNG
state), so generation is **distributed**: ``spark.range(n) → mapInPandas``.
The same function at n=10^3 and n=10^8 produces a prefix-consistent corpus —
the scale knob for benchmarking.

Built-in skew (by design, to exercise the skew handling):
- a few mega-repos hold ~half the rows (hot partitions at ingest);
- commodity popularity is Zipf-ish (hot keys in the grade-tonnage shuffle);
- one giant same-as cluster of ~1% of all sites (hot key in the dedup merge
  and a deep connected-components chain).

Same-as cluster layout (FIXTURES.md §4): after the giant cluster, sites
fall into repeating blocks of [8, 3, 2, 1, 1, 1]-sized clusters; cluster
members are index-consecutive so system edges are emitted locally (edge
(site(n-1), site(n)) whenever n is not the first member) — zero-shuffle
edge generation.

Expert duplicates: every 7th site also exists under an expert user with
refined attributes — the auto-link operator must merge them via
(source_id, record_id) equality, and the dedup merge must prefer the expert
values (SiteScore rules).
"""

from __future__ import annotations

import json
from typing import Iterator, Optional

import pandas as pd

from ..functions.ids import make_site_id
from . import vocab as V

MR = "https://minmod.isi.edu/resource/"

SYSTEM_USER = "https://minmod.isi.edu/users/s/ingestor"
EXPERT_USER = "https://minmod.isi.edu/users/u/alice"
SYSTEM_USERNAME = "ingestor"
EXPERT_USERNAME = "alice"

GIANT_FRACTION = 100  # 1/100 of sites in the giant cluster
_BLOCK = (8, 3, 2, 1, 1, 1)  # cluster sizes per 16-site block
_BLOCK_SIZE = sum(_BLOCK)


def _mix(n: int, salt: int) -> int:
    """Deterministic 64-bit mix (splitmix-style) for index-derived choice."""
    z = (n * 0x9E3779B97F4A7C15 + salt * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return z ^ (z >> 31)


def _choice(n: int, salt: int, k: int) -> int:
    return _mix(n, salt) % k


def giant_size(n_sites: int) -> int:
    return max(2, n_sites // GIANT_FRACTION)


def cluster_of(n: int, n_sites: int) -> tuple[int, int]:
    """(cluster id, position within cluster) for site index n."""
    g = giant_size(n_sites)
    if n < g:
        return 0, n
    m = n - g
    block, r = divmod(m, _BLOCK_SIZE)
    acc = 0
    for sub, size in enumerate(_BLOCK):
        if r < acc + size:
            return 1 + block * len(_BLOCK) + sub, r - acc
        acc += size
    raise AssertionError


def source_of(n: int, n_sites: int) -> int:
    """Source index — varies *within* a cluster so same-as edges cross
    sources (the realistic case)."""
    cid, pos = cluster_of(n, n_sites)
    return (cid * 13 + pos * 7) % V.N_SOURCES


def record_id_of(n: int, n_sites: int) -> str:
    cid, pos = cluster_of(n, n_sites)
    return f"rec-{cid}-{pos}"


def has_expert_dup(n: int) -> bool:
    return n % 7 == 0


def repo_of(n: int) -> str:
    # mega-repo skew: ~half the corpus in 3 repos
    h = _mix(n, 11)
    if h % 2 == 0:
        return f"megarepo-{h % 3}"
    return f"repo-{h % 97}"


def site_id_of(n: int, n_sites: int, expert: bool = False) -> str:
    username = EXPERT_USERNAME if expert else SYSTEM_USERNAME
    return make_site_id(
        username, V.source_uri(source_of(n, n_sites)), record_id_of(n, n_sites)
    )


# -- record synthesis ---------------------------------------------------------

_RANKS = ["A", "B", "C", "D", "E", "U"]
_TYPES = ["Mine", "Prospect", "Occurrence", "Past Producer", "Plant", "NotSpecified"]
_ZONES = [None, "north", "south", "zone 1", "zone 2"]
_DATES = [None, "1998", "2005-11", "2006-11", "2010-03-15", "2015", "2020-01", "2023-06"]
_ORE_UNITS = ["Q202", "Q200", "Q213", "Q215", "Q204"]  # Q204 unconvertible
_GRADE_UNITS = ["Q201", "Q203", "Q220", "Q217", "Q204"]  # Q204 unconvertible
_CAT_SETS = [
    ["Inferred"],
    ["Indicated"],
    ["Measured"],
    ["Inferred", "Indicated"],
    ["Proven"],
    ["Probable"],
    ["Proven", "Probable"],
    ["OriginalResource"],
    ["Extracted"],
    ["CumulativeExtracted"],
    ["Indicated", "Probable"],  # invalid mix — must be dropped by the model
    [],
]


def _ce(source: str, confidence: float, observed: Optional[str], uri: Optional[str]):
    d = {"source": source, "confidence": confidence}
    if observed is not None:
        d["observed_name"] = observed
    if uri is not None:
        d["normalized_uri"] = uri
    return d


def _commodity_idx(n: int, j: int) -> int:
    """Zipf-ish hot commodities: ~50% of inventories hit the top 4."""
    h = _mix(n, 100 + j)
    r = h % 100
    if r < 50:
        return h % 4
    if r < 80:
        return 4 + h % 12
    return 16 + h % (len(V.COMMODITY_NAMES) - 16)


def make_record(n: int, n_sites: int, expert: bool = False) -> dict:
    src = source_of(n, n_sites)
    country_i = _choice(n, 1, len(V.COUNTRY_NAMES))
    state_i = _choice(n, 2, len(V.STATE_NAMES))
    commodity_name = V.COMMODITY_NAMES[_commodity_idx(n, 0)]
    state_name = V.STATE_NAMES[state_i][0]

    rec: dict = {
        "source_id": V.source_uri(src),
        "record_id": record_id_of(n, n_sites),
        "created_by": EXPERT_USER if expert else SYSTEM_USER,
        "modified_at": (
            # experts edit later than the system ingest
            f"2024-0{1 + (n % 9)}-{10 + (n % 18):02d}T"
            f"{(10 + n) % 24:02d}:{n % 60:02d}:{(n * 7) % 60:02d}."
            f"{(n * 131) % 1000000:06d}Z"
            if not expert
            else f"2025-0{1 + (n % 9)}-{10 + (n % 18):02d}T"
            f"{n % 24:02d}:{(n * 3) % 60:02d}:{(n * 11) % 60:02d}."
            f"{(n * 733) % 1000000:06d}Z"
        ),
    }

    # names: some system records lack a name (the expert supplies one)
    if expert or _choice(n, 3, 10) != 0:
        suffix = " Deposit" if expert else " Project"
        rec["name"] = f"{commodity_name} {state_name}{suffix} {n % 1000}"
    if _choice(n, 4, 3) == 0:
        rec["aliases"] = [f"{commodity_name[:3].upper()}-{n % 500}"]
    if _choice(n, 5, 4) != 3:
        rec["site_rank"] = _RANKS[_choice(n, 6, len(_RANKS))]
    if _choice(n, 7, 4) != 3:
        rec["site_type"] = _TYPES[_choice(n, 8, len(_TYPES))]
    if _choice(n, 30, 5) == 0:
        rec["mineral_form"] = [V.MATERIAL_FORMS[_choice(n, 31, len(V.MATERIAL_FORMS))][0]]
    if _choice(n, 32, 6) == 0:
        rec["discovered_year"] = 1850 + _choice(n, 33, 170)

    # location: most sites have one; a few have the broken "nan" WKT.
    # A deterministic slice of system sites reports in a projected /
    # non-WGS84 CRS (the reference's own crs.csv vocabulary) — their
    # POINTs are the forward projection of a lon/lat inside the CRS's
    # validity area, so extraction must invert them (P3).
    loc_kind = _choice(n, 9, 20)
    crs_qid, crs_label = "Q1700", "WGS 84"
    if loc_kind < 17 or expert:
        lon = -180.0 + (_mix(n, 10) % 3_600_000) / 10_000.0
        lat = -90.0 + (_mix(n, 11) % 1_800_000) / 10_000.0
        crs_pick = _choice(n, 34, 16) if not expert else 16
        if crs_pick == 8:  # web mercator (clamped to its validity band)
            from ..functions.geo import _crs_transforms

            lat = max(-85.0, min(85.0, lat))
            x, y = _crs_transforms("EPSG:3857")[0](lon, lat)
            wkt = f"POINT ({x:.6f} {y:.6f})"
            crs_qid, crs_label = "Q1701", "EPSG:3857"
        elif crs_pick == 9:  # NAD27 geographic
            wkt = f"POINT ({lon:.4f} {lat:.4f})"
            crs_qid, crs_label = "Q1702", "NAD27"
        elif crs_pick == 10:  # NAD83 / UTM zone 12N
            from ..functions.geo import _crs_transforms

            lon = -114.0 + (_mix(n, 10) % 60_000) / 10_000.0
            lat = 30.0 + (_mix(n, 11) % 300_000) / 10_000.0
            x, y = _crs_transforms("EPSG:26912")[0](lon, lat)
            wkt = f"POINT ({x:.4f} {y:.4f})"
            crs_qid, crs_label = "Q1703", "EPSG:26912"
        elif crs_pick == 11:  # NAD83(HARN) / Oregon GIC Lambert (ft)
            from ..functions.geo import _crs_transforms

            lon = -124.0 + (_mix(n, 10) % 70_000) / 10_000.0
            lat = 42.0 + (_mix(n, 11) % 40_000) / 10_000.0
            x, y = _crs_transforms("EPSG:2994")[0](lon, lat)
            wkt = f"POINT ({x:.4f} {y:.4f})"
            crs_qid, crs_label = "Q1704", "EPSG:2994"
        else:
            wkt = f"POINT ({lon:.4f} {lat:.4f})"
    elif loc_kind == 17:
        wkt = "POINT (nan nan)"  # ref location.py:115 skips these
    else:
        wkt = None
    loc = {}
    if wkt is not None:
        loc["location"] = wkt
        loc["crs"] = _ce("algo-v1", 0.99, crs_label, MR + crs_qid)
    if _choice(n, 12, 10) != 9:
        loc["country"] = [
            _ce(
                "algo-v1",
                0.7 + (_mix(n, 13) % 30) / 100.0,
                V.COUNTRY_NAMES[country_i][0],
                MR + V.country_qid(country_i),
            )
        ]
    if _choice(n, 14, 10) < 7:
        loc["state_or_province"] = [
            _ce(
                "algo-v1",
                0.6 + (_mix(n, 15) % 40) / 100.0,
                state_name,
                MR + V.state_qid(state_i),
            )
        ]
    if loc:
        rec["location_info"] = loc

    # deposit-type candidates (0-3)
    n_dt = _choice(n, 16, 4)
    if n_dt:
        rec["deposit_type_candidate"] = [
            _ce(
                "algo-v1",
                round(0.3 + (_mix(n, 17 + i) % 70) / 100.0, 2),
                V.DEPOSIT_TYPES[(_choice(n, 18 + i, len(V.DEPOSIT_TYPES)))][0],
                (
                    MR + V.deposit_type_qid(_choice(n, 18 + i, len(V.DEPOSIT_TYPES)))
                    if _choice(n, 19 + i, 5) != 4
                    else None  # unlinked mention → entity-linking work
                ),
            )
            for i in range(n_dt)
        ]

    # sparse geology (per-subfield dedup merge must pick across sites)
    if _choice(n, 44, 5) < 2:
        geo: dict = {}
        if _choice(n, 45, 3) != 0:
            geo["alteration"] = f"alteration-{_choice(n, 46, 6)}"
        if _choice(n, 47, 3) != 0:
            geo["tectonic"] = f"belt-{_choice(n, 48, 4)}"
        if _choice(n, 49, 2) == 0:
            geo["host_rock"] = {"type": f"rock-{_choice(n, 50, 5)}"}
            if _choice(n, 51, 2) == 0:
                geo["host_rock"]["unit"] = f"unit-{_choice(n, 52, 3)}"
        if geo:
            rec["geology_info"] = geo

    # the single site-level reference (validators require exactly 1)
    doc_kind = _choice(n, 20, 3)
    if doc_kind == 0:
        document = {"title": f"Technical report {n % 10000} on {commodity_name}"}
    elif doc_kind == 1:
        document = {"doi": f"10.5066/rep{n % 100000}"}
    else:
        document = {"uri": f"https://repository.example.org/docs/{n % 100000}"}
    reference = {"document": document}
    if _choice(n, 21, 3) == 0:
        reference["page_info"] = [{"page": 1 + _choice(n, 22, 300)}]
    rec["reference"] = [reference]

    # inventories (expert rows carry one curated inventory)
    n_inv = 1 + _choice(n, 23, 4) if not expert else 1
    invs = []
    for j in range(n_inv):
        ci = _commodity_idx(n, j)
        inv: dict = {
            "commodity": _ce(
                "algo-v1" if not expert else "expert",
                0.9 if not expert else 1.0,
                V.COMMODITY_NAMES[ci],
                (
                    MR + V.commodity_qid(ci)
                    if _choice(n, 24 + j, 12) != 11
                    else None  # unlinked commodity mention
                ),
            ),
            "reference": reference,
        }
        date = _DATES[_choice(n, 40 + j, len(_DATES))]
        if date:
            inv["date"] = date
        zone = _ZONES[_choice(n, 41 + j, len(_ZONES))]
        if zone:
            inv["zone"] = zone
        cats = _CAT_SETS[_choice(n, 42 + j, len(_CAT_SETS))]
        if cats:
            inv["category"] = [
                _ce("algo-v1", 1.0, c, MR + c) for c in cats
            ]
        if _choice(n, 43 + j, 8) != 7:  # most inventories have ore+grade
            ore_v = round((_mix(n, 44 + j) % 500_000) / 100.0, 2)
            grade_v = round((_mix(n, 45 + j) % 2000) / 100.0, 3)
            if _choice(n, 46 + j, 25) == 24:
                grade_v = -grade_v  # negative → dropped by the model
            inv["ore"] = {
                "value": ore_v,
                "unit": _ce(
                    "algo-v1", 1.0, None, MR + _ORE_UNITS[_choice(n, 47 + j, 5)]
                ),
            }
            inv["grade"] = {
                "value": grade_v,
                "unit": _ce(
                    "algo-v1", 1.0, None, MR + _GRADE_UNITS[_choice(n, 48 + j, 5)]
                ),
            }
            if _choice(n, 49 + j, 6) == 5:
                mf = _choice(n, 50 + j, len(V.MATERIAL_FORMS))
                inv["material_form"] = _ce(
                    "algo-v1",
                    0.95,
                    V.MATERIAL_FORMS[mf][0],
                    MR + V.material_form_qid(mf),
                )
        invs.append(inv)
    rec["mineral_inventory"] = invs
    return rec


# -- Spark generation ----------------------------------------------------------


def _gen_batch(n_sites: int):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # column-wise accumulation (r06): identical rows/values, but
            # pandas builds the frame from ready columns instead of
            # re-inferring keys from a list of per-row dicts
            repos: list = []
            paths: list = []
            commits: list = []
            contents: list = []
            for n in pdf["id"]:
                n = int(n)
                src = source_of(n, n_sites)
                bucket = n % 64
                base = make_record(n, n_sites)
                repos.append(repo_of(n))
                paths.append(f"{SYSTEM_USERNAME}/src{src}/{bucket}/rec-{n}.json")
                commits.append(f"{_mix(n, 60):016x}")
                contents.append(json.dumps(base, sort_keys=True))
                if has_expert_dup(n):
                    dup = make_record(n, n_sites, expert=True)
                    repos.append(repo_of(n))
                    paths.append(
                        f"{EXPERT_USERNAME}/src{src}/{bucket}/rec-{n}.json"
                    )
                    commits.append(f"{_mix(n, 61):016x}")
                    contents.append(json.dumps(dup, sort_keys=True))
            yield pd.DataFrame(
                {
                    "repo": repos,
                    "path": paths,
                    "commit": commits,
                    "lang": ["json"] * len(repos),
                    "content": contents,
                },
                columns=["repo", "path", "commit", "lang", "content"],
            )

    return fn


def synthesize_ingest(spark, n_sites: int, partitions: int | None = None):
    """Distributed deterministic ingest table build."""
    from ..schemas import INGEST

    rng = spark.range(0, n_sites, 1, partitions or spark.sparkContext.defaultParallelism)
    return rng.mapInPandas(_gen_batch(n_sites), schema=INGEST)


def _edges_batch(n_sites: int):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ms1: list = []
            ms2: list = []
            for n in pdf["id"]:
                n = int(n)
                _, pos = cluster_of(n, n_sites)
                if pos > 0:
                    # members are index-consecutive → predecessor is n-1
                    ms1.append(site_id_of(n - 1, n_sites))
                    ms2.append(site_id_of(n, n_sites))
            yield pd.DataFrame(
                {"ms_1": ms1, "ms_2": ms2}, columns=["ms_1", "ms_2"]
            )

    return fn


def synthesize_system_edges(spark, n_sites: int, partitions: int | None = None):
    """System same-as edges (S3): intra-cluster chains, generated with zero
    shuffle (each edge derivable from the row index alone)."""
    from ..schemas import EDGE

    rng = spark.range(0, n_sites, 1, partitions or spark.sparkContext.defaultParallelism)
    return rng.mapInPandas(_edges_batch(n_sites), schema=EDGE)


def synthesize_curated_edges(n_sites: int) -> list[dict]:
    """Curated expert edges (S4) — small by nature, driver-side.

    - merge the first sites of clusters 1 and 2 (gold positive),
    - a positive edge between clusters 3 and 4 that an *older* negative edge
      cancels (G3 override rule, same_as.py:303-307: removal iff
      pos.time_ns >= neg.time_ns),
    - a positive edge between clusters 7 and 8 with a *newer* negative that
      does NOT cancel it (the reference keeps strictly-older positives),
    - a negative edge WITHOUT a matching positive — must be a no-op.
    """
    g = giant_size(n_sites)

    def first_of_cluster(c: int) -> int:
        # cluster ids 1.. map back to start indices per _BLOCK layout
        block, sub = divmod(c - 1, len(_BLOCK))
        return g + block * _BLOCK_SIZE + sum(_BLOCK[:sub])

    def sid(c):
        return site_id_of(first_of_cluster(c), n_sites)

    rows = [
        {"ms_1": sid(1), "ms_2": sid(2), "time_ns": 1_700_000_000_000_000_000, "is_same": 1},
        {"ms_1": sid(3), "ms_2": sid(4), "time_ns": 1_700_000_000_000_000_000, "is_same": 1},
        {"ms_1": sid(3), "ms_2": sid(4), "time_ns": 1_600_000_000_000_000_000, "is_same": 0},
        {"ms_1": sid(5), "ms_2": sid(6), "time_ns": 1_800_000_000_000_000_000, "is_same": 0},
        {"ms_1": sid(7), "ms_2": sid(8), "time_ns": 1_700_000_000_000_000_000, "is_same": 1},
        {"ms_1": sid(7), "ms_2": sid(8), "time_ns": 1_800_000_000_000_000_000, "is_same": 0},
    ]
    return rows


CURATED_EDGE_SCHEMA = "ms_1 string, ms_2 string, time_ns bigint, is_same bigint"


def curated_edges_df(spark, n_sites: int):
    """Curated edges as a DataFrame with an explicit schema (works in
    sessions without Arrow pandas conversion)."""
    return spark.createDataFrame(
        pd.DataFrame(synthesize_curated_edges(n_sites)),
        schema=CURATED_EDGE_SCHEMA,
    )
