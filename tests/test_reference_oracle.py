"""Triple P/R against the REFERENCE'S OWN ``to_triples`` (executed in-process).

This replaces the round-1 self-golden snapshot as the hard gate: the oracle
triples come from ``minmodkg.models.kg.mineral_site.MineralSite.from_dict(raw)
.to_triples()`` (rdf_model.py:214-266) running on the reference's fixture
corpus, with only import-placebo shims for its unavailable dependencies
(see tests/refshim.py — the schema machinery, id minting, and property
emission are the reference's real code).

Also: byte-parity of make_site_id / get_username / slugify against the
shimmed ``minmodkg.transformations``, and grade-tonnage model parity
against the reference's ``GradeTonnageModel``.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).parent))

from refshim import load_reference  # noqa: E402

from ta2_minmod_kg_spark.functions.ids import (  # noqa: E402
    get_username,
    make_site_id,
    slugify,
)
from ta2_minmod_kg_spark.functions.rdf import (  # noqa: E402
    precision_recall,
    site_to_triples,
)

FIXTURE_DIR = Path("/root/reference/tests/resources/kgdata/mineral-sites/json")

pytestmark = pytest.mark.skipif(
    not FIXTURE_DIR.exists(), reason="reference checkout not available"
)


@pytest.fixture(scope="module")
def ref():
    return load_reference()


def _records():
    recs = []
    for f in sorted(FIXTURE_DIR.glob("*.json")):
        recs.extend(json.load(open(f)))
    for i, r in enumerate(recs):
        r.setdefault("created_by", "https://minmod.isi.edu/users/s/inferlink")
        r.setdefault("modified_at", "2024-11-14T00:00:00.000000Z")
    return recs


def test_triple_pr_vs_reference_executed(ref):
    """BASELINE.md hard gate: P/R ≥ 0.95 vs the reference's emitted triple
    set — computed against reference-EXECUTED output, not a snapshot."""
    mine_all, oracle_all = [], []
    per_site = []
    for raw in _records():
        _, mine = site_to_triples(raw, include_extra=True)
        oracle = [
            (s, p, o)
            for s, p, o in ref.mineral_site.MineralSite.from_dict(raw).to_triples()
        ]
        pr = precision_recall(mine, oracle)
        per_site.append((pr["precision"], pr["recall"]))
        mine_all.extend(mine)
        oracle_all.extend(oracle)

    pr = precision_recall(mine_all, oracle_all)
    # the BASELINE gate is ≥ 0.95; the engine currently achieves exact
    # parity on the fixture corpus — assert it to catch any drift
    assert pr["precision"] >= 0.95 and pr["recall"] >= 0.95, (pr, per_site)
    assert pr["precision"] == 1.0 and pr["recall"] == 1.0, (pr, per_site)


def test_make_site_id_byte_parity(ref):
    cases = [
        ("inferlink", "https://api.cdr.land/v1/docs/documents", "02a000a83e"),
        ("admin", "https://mrdata.usgs.gov/mrds", "10014570"),
        ("usr-1", "https://example.org/db?a=1&b=2", "rec/4 spaces & (chars)"),
        ("s", "mining-report:Überschrift", "récord-№7"),
    ]
    for username, source_id, record_id in cases:
        assert make_site_id(username, source_id, record_id) == (
            ref.transformations.make_site_id(username, source_id, record_id)
        ), (username, source_id, record_id)


def test_get_username_parity(ref):
    import importlib

    ref_user = importlib.import_module("minmodkg.models.kgrel.user")
    for uri in (
        "https://minmod.isi.edu/users/s/inferlink",
        "https://minmod.isi.edu/users/u/someone",
        "https://minmod.isi.edu/users/a/admin",
        "not-a-user-uri",
    ):
        assert get_username(uri) == ref_user.get_username(uri)


def test_slugify_parity(ref):
    import slugify as shim_slugify  # the refshim fake (python-slugify subset)

    for s in ("Hello World", "UPPER_case-mix.ed", "a  b\tc", "éàüö", "x!!y"):
        assert slugify(s) == shim_slugify.slugify(s), s


def test_grade_tonnage_parity_vs_reference(ref):
    """Reference GradeTonnageModel vs engine compute_grade_tonnage on a
    spread of scenarios (categories × zones × dates × ties)."""
    from ta2_minmod_kg_spark.operators.grade_tonnage import (
        compute_grade_tonnage,
        total_grade_pct,
    )

    MR = "https://minmod.isi.edu/resource/"
    model = ref.grade_tonnage.GradeTonnageModel()

    cases = [
        [(("Inferred",), 100.0, 1.0, "2020-01", None)],
        [
            (("Inferred",), 100.0, 1.0, "2020-01", None),
            (("Indicated",), 50.0, 2.0, "2020-01", None),
        ],
        [   # tie on contained metal — later document position wins
            (("Inferred",), 20.0, 0.5, None, None),
            (("Inferred",), 10.0, 1.0, None, None),
        ],
        [   # zones summed, then max(site-level, zone-sum)
            (("Measured",), 10.0, 1.0, "2021-02", "zoneA"),
            (("Measured",), 15.0, 1.0, "2021-02", "zoneB"),
            (("Measured",), 20.0, 1.0, "2021-02", None),
        ],
        [   # reserves + cumulative extracted backfill
            (("Proven",), 30.0, 2.0, "2022-03", None),
            (("Extracted",), 5.0, 2.0, "2020-03", None),
            (("Extracted",), 7.0, 2.0, "2021-03", None),
        ],
        [   # original resource beats resource+extracted when larger
            (("Inferred", "Indicated"), 10.0, 1.0, "2019-01", None),
            (("OriginalResource",), 1000.0, 1.0, "2019-01", None),
        ],
        [   # invalid category mix is dropped
            (("Inferred", "Proven"), 10.0, 1.0, "2019-01", None),
            (("Indicated",), 5.0, 1.0, "2019-01", None),
        ],
        [   # multiple dates: most recent wins
            (("Inferred",), 100.0, 1.0, "2010-01", None),
            (("Inferred",), 40.0, 1.0, "2015-06", None),
        ],
    ]

    MI = ref.grade_tonnage.GradeTonnageModel.MineralInventory
    for scenario in cases:
        ref_invs = [
            MI(
                id=str(i),
                date=date,
                zone=zone,
                category=[MR + c for c in cats],
                material_form_conversion=None,
                ore_value=ore,
                ore_unit=MR + "Q202",
                grade_value=grade,
                grade_unit=MR + "Q201",
            )
            for i, (cats, ore, grade, date, zone) in enumerate(scenario)
        ]
        ref_out = model(ref_invs)

        engine_invs = [
            {
                "date": date,
                "zone": zone,
                "category": [MR + c for c in cats],
                "material_form_conversion": None,
                "ore_value": ore,
                "ore_unit": MR + "Q202",
                "grade_value": grade,
                "grade_unit": MR + "Q201",
            }
            for cats, ore, grade, date, zone in scenario
        ]
        got = compute_grade_tonnage(engine_invs)

        if ref_out is None or ref_out.total_estimate is None:
            assert got is None or got["total"] is None, (scenario, got)
            continue
        assert got is not None and got["total"] is not None, (scenario, ref_out)
        rt = ref_out.total_estimate
        assert got["total"][0] == pytest.approx(rt.tonnage), scenario
        assert got["total"][1] == pytest.approx(rt.contained_metal), scenario
        assert total_grade_pct(got["total"]) == pytest.approx(
            rt.get_grade()
        ), scenario


def test_grade_tonnage_fuzz_vs_reference(ref):
    """Hypothesis fuzz: random inventory lists (categories, zones, dates,
    ores, grades incl. ties/invalid mixes) — engine vs the reference's
    EXECUTED GradeTonnageModel on every generated case."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ta2_minmod_kg_spark.operators.grade_tonnage import (
        compute_grade_tonnage,
        total_grade_pct,
    )

    MR = "https://minmod.isi.edu/resource/"
    model = ref.grade_tonnage.GradeTonnageModel()
    MI = ref.grade_tonnage.GradeTonnageModel.MineralInventory

    CATS = [
        "Inferred", "Indicated", "Measured", "Proven", "Probable",
        "Extracted", "CumulativeExtracted", "OriginalResource",
    ]
    inv_st = st.tuples(
        st.lists(st.sampled_from(CATS), min_size=1, max_size=3, unique=True),
        st.floats(0.1, 1000.0, allow_nan=False),
        st.floats(0.01, 60.0, allow_nan=False),
        st.sampled_from([None, "2010-01", "2015-06", "2020-01", "2020"]),
        st.sampled_from([None, "zoneA", "zoneB"]),
    )

    @settings(max_examples=250, deadline=None)
    @given(st.lists(inv_st, min_size=1, max_size=6))
    def run(scenario):
        ref_invs = [
            MI(
                id=str(i), date=date, zone=zone,
                category=[MR + c for c in cats],
                material_form_conversion=None,
                ore_value=ore, ore_unit=MR + "Q202",
                grade_value=grade, grade_unit=MR + "Q201",
            )
            for i, (cats, ore, grade, date, zone) in enumerate(scenario)
        ]
        ref_out = model(ref_invs)
        engine_invs = [
            {
                "date": date, "zone": zone,
                "category": [MR + c for c in cats],
                "material_form_conversion": None,
                "ore_value": ore, "ore_unit": MR + "Q202",
                "grade_value": grade, "grade_unit": MR + "Q201",
            }
            for cats, ore, grade, date, zone in scenario
        ]
        got = compute_grade_tonnage(engine_invs)
        if ref_out is None or ref_out.total_estimate is None:
            assert got is None or got["total"] is None, (scenario, got)
            return
        assert got is not None and got["total"] is not None, (scenario, ref_out)
        rt = ref_out.total_estimate
        # BIT-EXACT since the r5 unit-conversion fix (functions/units.py
        # now divides in the reference's exact sequence instead of
        # multiplying by reciprocals — the old path diverged by ~1 ulp)
        assert got["total"][0] == rt.tonnage, scenario
        assert got["total"][1] == rt.contained_metal, scenario
        assert total_grade_pct(got["total"]) == rt.get_grade(), scenario

    run()


def test_triple_pr_vs_reference_on_synthetic_corpus(ref):
    """The same executed-reference triple parity, but over the engine's
    SYNTHETIC corpus (projected-CRS slices, twins, expert records,
    geology structs, multi-inventory sites) — P/R must stay exactly 1.0
    on record shapes the fixture corpus does not exercise."""
    from ta2_minmod_kg_spark.sources import synthetic

    # P/R per record (canonicalization across records would conflate the
    # reference's '<None>' uri-less-document subjects between records)
    for n in range(150):
        raw = synthetic.make_record(n, 150)
        _, mine = site_to_triples(raw, include_extra=True)
        oracle = [
            (s, p, o)
            for s, p, o in ref.mineral_site.MineralSite.from_dict(raw).to_triples()
        ]
        pr = precision_recall(mine, oracle)
        assert pr["precision"] == 1.0 and pr["recall"] == 1.0, (n, pr)


def test_merge_mut_parity_vs_reference(ref):
    """A8 parity: engine merge_records vs the reference's EXECUTED
    MineralSite.merge_mut across synthetic record pairs.

    Scope note: the reference's Reference.dedup ASSERTS when a document
    has neither doi nor uri (reference.py:99) — the engine merges those
    gracefully, so pairs containing such documents are excluded here
    (a documented divergence where the reference crashes outright)."""
    import json as _json

    from ta2_minmod_kg_spark.operators.merge_records import merge_records
    from ta2_minmod_kg_spark.sources import synthetic

    MS = ref.mineral_site.MineralSite

    def has_keyable_docs(rec):
        return all(
            (r.get("document") or {}).get("uri")
            or (r.get("document") or {}).get("doi")
            for r in rec.get("reference", [])
        )

    checked = 0
    for i in range(0, 120, 2):
        a = synthetic.make_record(i, 160)
        b = synthetic.make_record(i + 1, 160)
        if not (has_keyable_docs(a) and has_keyable_docs(b)):
            continue
        b["created_by"] = a["created_by"]
        a["modified_at"] = "2024-01-01T00:00:00.000000Z"
        b["modified_at"] = "2024-02-01T00:00:00.000000Z"
        ra = MS.from_dict(_json.loads(_json.dumps(a)))
        rb = MS.from_dict(_json.loads(_json.dumps(b)))
        ra.merge_mut(rb)
        want = ra.to_dict()
        got = merge_records([a, b])
        for k in ("name", "site_rank", "site_type", "modified_at",
                  "discovered_year"):
            assert want.get(k) == got.get(k), (i, k, want.get(k), got.get(k))
        # to_dict drops empty lists (makedict.without_none_or_empty_list);
        # normalize the shape before comparing list fields
        assert (want.get("aliases") or []) == (got.get("aliases") or []), i
        assert len(want.get("mineral_inventory", [])) == len(
            got.get("mineral_inventory", [])
        ), i
        assert len(want.get("reference", [])) == len(
            got.get("reference", [])
        ), i
        # location candidates merge with extend_unique on both sides
        wl, gl = want.get("location_info") or {}, got.get("location_info") or {}
        assert len(wl.get("country", []) or []) == len(gl.get("country", []) or []), i
        checked += 1
    assert checked >= 20, checked


def test_select_inventories_fuzz_vs_executed_reference(ref):
    """A5 tie-break parity (VERDICT r03 #10): the engine's
    select_inventories_group vs the reference's OWN ``select_inventories``
    (minmodkg/models/kgrel/dedup_mineral_site.py:316-383) executed on
    ≥200 random groups per run.

    The kgrel class tree is SQLAlchemy-bound (not importable here), so the
    method's source is extracted from the reference FILE by AST and exec'd
    against duck-typed inventories — the decision path that runs is the
    reference's verbatim code.  SiteScore / ExpertCmpKey / SystemCmpKey
    ARE imported and executed from the reference (their module is pure)."""
    import ast
    import importlib
    import random
    from types import SimpleNamespace

    # load the module FILE directly — the custom_types package __init__
    # pulls in shapely-backed siblings this container doesn't have
    spec = importlib.util.spec_from_file_location(
        "ref_site_and_score",
        "/root/reference/minmodkg/models/kgrel/custom_types/site_and_score.py",
    )
    sas = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = sas  # dataclass machinery resolves __module__
    spec.loader.exec_module(sas)
    SiteScore, SiteAndScore = sas.SiteScore, sas.SiteAndScore

    src_path = (
        "/root/reference/minmodkg/models/kgrel/dedup_mineral_site.py"
    )
    tree = ast.parse(open(src_path).read())
    fn = next(
        node
        for cls in ast.walk(tree)
        if isinstance(cls, ast.ClassDef) and cls.name == "DedupMineralSite"
        for node in cls.body
        if isinstance(node, ast.FunctionDef) and node.name == "select_inventories"
    )
    # strip annotations the exec namespace doesn't carry
    mod = ast.Module(body=[fn], type_ignores=[])
    ns = {
        "TypedDict": __import__("typing").TypedDict,
        # names the method body touches only inside type expressions
        "DedupMineralInventoryView": object,
        "MineralInventoryView": object,
        "InternalID": str,
        "bool": bool,
        "dict": dict,
        "list": list,
    }
    code = compile(ast.fix_missing_locations(mod), src_path, "exec")
    exec(code, ns)
    ref_select = ns["select_inventories"]

    class DuckView(SimpleNamespace):
        pass

    class DuckInv(SimpleNamespace):
        def to_dedup_view(self, site_id, dedup_site_id):
            return DuckView(
                commodity=self.commodity,
                contained_metal=self.contained_metal,
                tonnage=self.tonnage,
                grade=self.grade,
                date=self.date,
                site_id=site_id,
                dedup_site_id=dedup_site_id,
            )

    from ta2_minmod_kg_spark.operators.dedup import select_inventories_group

    SYS_PREF = "https://minmod.isi.edu/users/s/"
    rng = random.Random(20260817)
    dates = [None, "1998", "2005-11", "2010-03-15", "2020-01"]
    checked_groups = 0
    for _ in range(250):
        n_sites = rng.randint(1, 6)
        sites = []
        for s in range(n_sites):
            created_by = (
                SYS_PREF + "ingestor"
                if rng.random() < 0.7
                else "https://minmod.isi.edu/users/u/alice"
            )
            sites.append(
                {
                    "site_id": f"site{s}",
                    "created_by": created_by,
                    "source_id": f"src{rng.randint(0, 2)}",
                    "record_id": f"rec{rng.randint(0, 3)}",
                    # unique per site: on a FULL rank-key tie the reference
                    # falls back to Python sort stability (input order —
                    # nondeterministic distributed), while the engine
                    # breaks ties on site_id deterministically (documented
                    # improvement, operators/dedup.py _rank_key).  Ties on
                    # source/record remain to exercise the suborder.
                    "modified_at": rng.randint(1, 5) * 10**9 + s,
                    "source_score": rng.choice([None, -1.0, 0.3, 0.5, 0.8, 0.8]),
                }
            )
        id_to_invs = {}
        rows = []
        for site in sites:
            invs = []
            for _j in range(rng.randint(0, 4)):
                # few commodities + repeated metal values → real ties
                inv = {
                    "commodity": f"Q{rng.randint(0, 2)}",
                    "contained_metal": rng.choice([None, 10.0, 10.0, 25.0]),
                    "tonnage": rng.choice([None, 5.0]),
                    "grade": rng.choice([None, 2.0]),
                    "date": rng.choice(dates),
                }
                invs.append(inv)
            id_to_invs[site["site_id"]] = [DuckInv(**inv) for inv in invs]
            # engine rows: one per (site × inventory); inventory-less sites
            # still contribute a ranking row (commodity None)
            duck = SimpleNamespace(**site)
            ref_score = SiteScore.get_score(duck)
            site_row = {
                "site_id": site["site_id"],
                "is_expert": ref_score.is_from_user(),
                "score": ref_score.score,
                "source_id": site["source_id"],
                "record_id": site["record_id"],
                "modified_at": site["modified_at"],
            }
            if not invs:
                rows.append({**site_row, "commodity": None})
            for inv in invs:
                rows.append({**site_row, **inv})

        ranked = sorted(
            (
                SiteAndScore(
                    s["site_id"], SiteScore.get_score(SimpleNamespace(**s))
                )
                for s in sites
            ),
            key=lambda x: x.score,
            reverse=True,
        )
        want = ref_select(
            SimpleNamespace(ranked_sites=ranked, id="dedup_x"), id_to_invs
        )
        got = select_inventories_group("dedup_x", rows)

        want_map = {
            v.commodity: (v.site_id, v.contained_metal, v.date) for v in want
        }
        got_map = {
            g["commodity"]: (g["site_id"], g["contained_metal"], g["date"])
            for g in got
        }
        assert got_map == want_map, (sites, id_to_invs, got_map, want_map)
        if want_map:
            checked_groups += 1
    assert checked_groups >= 200, checked_groups


def test_from_sites_attr_merge_fuzz_vs_executed_reference(ref, spark):
    """A3 attribute-merge parity (VERDICT r04 #10): the engine's FULL
    Spark merge path (with_site_score → collect_list → merge_group kernel)
    vs the reference's OWN ``DedupMineralSite.from_sites``
    (dedup_mineral_site.py:204-294) executed on ≥200 random groups —
    covering rank-order first-non-null (name/type/rank/discovered_year),
    the first-non-empty list attrs, coordinates, the 7-field
    ``RefGeologyInfo.from_sites`` geology merge (ref_value.py:166-199,
    executed verbatim), top-5 deposit types with strict-greater tie-break,
    ranked_sites order, and modified_at.

    modified_at is globally unique so every in-group SiteScore total
    order is strict: the reference's stable input-order sort and the
    engine's deterministic site_id tie-break only diverge on EXACT
    SiteScore ties, which production timestamps (nanosecond) never
    produce.
    """
    import json as _json
    import random
    from types import SimpleNamespace as NS

    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from ref_dedup_exec import load_ref_dedup
    from ta2_minmod_kg_spark.operators.dedup import merge_dedup_sites
    from ta2_minmod_kg_spark.schemas import CANDIDATE_ENTITY, GEOLOGY_INFO

    rd = load_ref_dedup()
    rng = random.Random(20260817)
    MR = "https://minmod.isi.edu/resource/"
    SYS = "https://minmod.isi.edu/users/s/algo-v1"
    EXPERTS = [f"https://minmod.isi.edu/users/e{i}" for i in range(3)]

    def maybe(p, fn):
        return fn() if rng.random() < p else None

    def gen_geo():
        if rng.random() < 0.5:
            return None
        g = {
            "alteration": maybe(0.4, lambda: f"alt-{rng.randrange(4)}"),
            "concentration_process": maybe(0.3, lambda: f"cp-{rng.randrange(3)}"),
            "ore_control": maybe(0.3, lambda: f"oc-{rng.randrange(3)}"),
            "structure": maybe(0.3, lambda: f"st-{rng.randrange(3)}"),
            "tectonic": maybe(0.4, lambda: f"belt-{rng.randrange(4)}"),
        }
        for rock in ("host_rock", "associated_rock"):
            if rng.random() < 0.4:
                g[rock] = {
                    "unit": maybe(0.6, lambda: f"u-{rng.randrange(3)}"),
                    "type": maybe(0.6, lambda: f"r-{rng.randrange(4)}"),
                }
            else:
                g[rock] = None
        return g

    def gen_dts():
        out = []
        for i in range(rng.randrange(4)):
            out.append(
                {
                    "source": f"s{rng.randrange(3)}",
                    "confidence": rng.choice([0.5, 0.7, 0.9]),
                    "observed_name": None,
                    # None uri → skipped by both sides
                    "normalized_uri": rng.choice(
                        [None, MR + f"Q{rng.randrange(1, 5)}"]
                    ),
                }
            )
        return out

    ts_counter = [1_000_000]

    def gen_site(gid, i):
        ts_counter[0] += rng.randrange(1, 50)
        expert = rng.random() < 0.3
        has_coords = rng.random() < 0.6
        return {
            "dedup_site_id": gid,
            "site_id": f"{gid}__s{i}",
            "source_id": f"https://src.example.org/{rng.randrange(3)}",
            "source_score": rng.choice([None, None, 0.0, 0.2, 0.75, 1.0, -1.0]),
            "record_id": f"r{rng.randrange(1000)}",
            "created_by": rng.choice(EXPERTS) if expert else SYS,
            "modified_at": ts_counter[0],
            "name": maybe(0.6, lambda: f"Site {rng.randrange(100)}"),
            "type": maybe(0.6, lambda: rng.choice(["Mine", "Prospect"])),
            "rank": maybe(0.6, lambda: rng.choice(["A", "B", "U"])),
            "lat": rng.uniform(-60, 60) if has_coords else None,
            "lon": rng.uniform(-170, 170) if has_coords else None,
            "country": rng.choice([[], [f"Q{100 + rng.randrange(4)}"]]),
            "state_or_province": rng.choice(
                [[], [f"Q{200 + rng.randrange(4)}"], [f"Q{210}", f"Q{211}"]]
            ),
            "mineral_form": rng.choice([[], ["pyrite"], ["galena", "sphalerite"]]),
            "geology_info": gen_geo(),
            "discovered_year": maybe(0.3, lambda: 1850 + rng.randrange(170)),
            "deposit_type_candidates": gen_dts(),
        }

    n_groups = 220
    groups = {
        f"dg{k:04d}": [gen_site(f"dg{k:04d}", i) for i in range(rng.randrange(1, 7))]
        for k in range(n_groups)
    }

    # -- engine: one Spark job over every fuzz group through the real path --
    schema = StructType(
        [
            StructField("dedup_site_id", StringType(), False),
            StructField("site_id", StringType(), False),
            StructField("source_id", StringType(), False),
            StructField("source_score", DoubleType(), True),
            StructField("record_id", StringType(), False),
            StructField("created_by", StringType(), False),
            StructField("modified_at", LongType(), False),
            StructField("name", StringType(), True),
            StructField("type", StringType(), True),
            StructField("rank", StringType(), True),
            StructField("lat", DoubleType(), True),
            StructField("lon", DoubleType(), True),
            StructField("country", ArrayType(StringType()), True),
            StructField("state_or_province", ArrayType(StringType()), True),
            StructField("mineral_form", ArrayType(StringType()), True),
            StructField("geology_info", GEOLOGY_INFO, True),
            StructField("discovered_year", IntegerType(), True),
            StructField(
                "deposit_type_candidates", ArrayType(CANDIDATE_ENTITY), True
            ),
        ]
    )

    def rock_tuple(r):
        return None if r is None else (r.get("unit"), r.get("type"))

    rows = []
    for sites in groups.values():
        for s in sites:
            g = s["geology_info"]
            geo_t = (
                None
                if g is None
                else (
                    g["alteration"],
                    g["concentration_process"],
                    g["ore_control"],
                    rock_tuple(g["host_rock"]),
                    rock_tuple(g["associated_rock"]),
                    g["structure"],
                    g["tectonic"],
                )
            )
            dts_t = [
                (d["source"], d["confidence"], d["observed_name"], d["normalized_uri"])
                for d in s["deposit_type_candidates"]
            ]
            rows.append(
                (
                    s["dedup_site_id"],
                    s["site_id"],
                    s["source_id"],
                    s["source_score"],
                    s["record_id"],
                    s["created_by"],
                    s["modified_at"],
                    s["name"],
                    s["type"],
                    s["rank"],
                    s["lat"],
                    s["lon"],
                    s["country"],
                    s["state_or_province"],
                    s["mineral_form"],
                    geo_t,
                    s["discovered_year"],
                    dts_t,
                )
            )
    df = spark.createDataFrame(rows, schema)
    got_by_id = {r["dedup_site_id"]: r.asDict(True) for r in merge_dedup_sites(df).collect()}
    assert set(got_by_id) == set(groups)

    # -- reference: executed from_sites per group ---------------------------
    def duck(s):
        g = s["geology_info"]
        geo = None
        if g is not None:
            geo = NS(
                alteration=g["alteration"],
                concentration_process=g["concentration_process"],
                ore_control=g["ore_control"],
                structure=g["structure"],
                tectonic=g["tectonic"],
                host_rock=None if g["host_rock"] is None else NS(**g["host_rock"]),
                associated_rock=(
                    None
                    if g["associated_rock"] is None
                    else NS(**g["associated_rock"])
                ),
            )
        ms = NS(
            site_id=s["site_id"],
            dedup_site_id=s["dedup_site_id"],
            source_id=s["source_id"],
            source_score=s["source_score"],
            record_id=s["record_id"],
            created_by=s["created_by"],
            modified_at=s["modified_at"],
            name=s["name"],
            type=s["type"],
            rank=s["rank"],
            location_view=NS(
                lat=s["lat"],
                lon=s["lon"],
                country=list(s["country"]),
                state_or_province=list(s["state_or_province"]),
            ),
            mineral_form=list(s["mineral_form"]),
            geology_info=geo,
            discovered_year=s["discovered_year"],
            deposit_type_candidates=[
                NS(
                    normalized_uri=d["normalized_uri"],
                    source=d["source"],
                    confidence=d["confidence"],
                )
                for d in s["deposit_type_candidates"]
            ],
        )
        return NS(ms=ms, invs=[])

    def ref_opt(rv):
        return None if rv is None else {"value": rv.value, "refid": rv.refid}

    def sparse_geo(rg):
        """RefGeologyInfo → the engine's sparse dict shape."""
        if rg is None:
            return None
        out = {}
        for f in (
            "alteration",
            "concentration_process",
            "ore_control",
            "structure",
            "tectonic",
        ):
            v = getattr(rg, f)
            if v is not None:
                out[f] = {"value": v.value, "refid": v.refid}
        for f in ("host_rock", "associated_rock"):
            rock = getattr(rg, f)
            if rock is None:
                continue
            sub = {}
            if rock.unit is not None:
                sub["unit"] = {"value": rock.unit.value, "refid": rock.unit.refid}
            if rock.type is not None:
                sub["type"] = {"value": rock.type.value, "refid": rock.type.refid}
            if sub:
                out[f] = sub
        return out or None

    n_geo_checked = 0
    for gid, sites in groups.items():
        want = rd.from_sites([duck(s) for s in sites], dedup_site_id=gid).dms
        got = got_by_id[gid]
        assert got["name"] == ref_opt(want.name), gid
        assert got["type"] == ref_opt(want.type), gid
        assert got["rank"] == ref_opt(want.rank), gid
        assert got["discovered_year"] == ref_opt(want.discovered_year), gid
        assert got["top1_deposit_type"] == want.top1_deposit_type, gid
        want_dts = [
            {**dt.value.to_dict(), "refid": dt.refid}
            for dt in want.ranked_deposit_types
        ]
        assert got["ranked_deposit_types"] == want_dts, gid
        want_coords = (
            None
            if want.coordinates is None
            else {
                "lat": want.coordinates.value.lat,
                "lon": want.coordinates.value.lon,
                "refid": want.coordinates.refid,
            }
        )
        assert got["coordinates"] == want_coords, gid
        for f in ("country", "state_or_province", "mineral_form"):
            rv = getattr(want, f)
            assert got[f] == {"value": rv.value, "refid": rv.refid}, (gid, f)
        want_geo = sparse_geo(want.geology_info)
        got_geo = (
            None if got["geology_info"] is None else _json.loads(got["geology_info"])
        )
        assert got_geo == want_geo, gid
        if want_geo is not None:
            n_geo_checked += 1
        want_ranked = [
            {
                "site_id": s.site_id,
                "score": s.score.score,
                "is_expert": s.score.suborder.is_expert,
            }
            for s in want.ranked_sites
        ]
        assert got["ranked_sites"] == want_ranked, gid
        assert got["modified_at"] == want.modified_at, gid
    assert len(groups) >= 200 and n_geo_checked >= 50, (len(groups), n_geo_checked)
