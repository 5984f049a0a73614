"""P6 constrained-type parity: the engine's predicate tree
(operators/constrained.py) vs the reference's OWN deserializer
(`get_dataclass_deserializer(MineralSite)` executed via refshim) —
accept/reject must agree on every record (VERDICT r02 #3)."""

from __future__ import annotations

import copy
import glob
import json
import sys
from pathlib import Path

import pandas as pd
import pytest

from ta2_minmod_kg_spark.operators import extract
from ta2_minmod_kg_spark.operators.constrained import constrained_type_error
from ta2_minmod_kg_spark.sources import synthetic

sys.path.insert(0, str(Path(__file__).parent))

from refshim import load_reference  # noqa: E402

REF_JSON = "/root/reference/tests/resources/kgdata/mineral-sites/json/*.json"
INVALID_FIXTURE = (
    "/root/reference/tests/resources/validators/test-mineral-sites/"
    "invalid_units.json"
)


def _ref_rejects(deser, site: dict) -> bool:
    try:
        deser(site)
    except Exception:
        return True
    # validators.py:336-339 additionally requires modified_at in the dict
    return "modified_at" not in site


@pytest.fixture(scope="module")
def ref_deser():
    ref = load_reference()
    return ref.deserializer.get_dataclass_deserializer(ref.mineral_site.MineralSite)


def _sites_of(path: str) -> list[dict]:
    data = json.load(open(path))
    return data["MineralSite"] if isinstance(data, dict) else data


def test_parity_on_reference_fixture_corpus(ref_deser):
    """Every record of the reference's own test corpus (including the two
    it genuinely rejects: a padded ' Nickel' observed_name and a padded
    measure-unit observed_name) must classify identically."""
    n = rejected = 0
    for p in glob.glob(REF_JSON):
        for s in _sites_of(p):
            n += 1
            ref_bad = _ref_rejects(ref_deser, s)
            mine = constrained_type_error(s)
            assert ref_bad == (mine is not None), (p, mine)
            rejected += int(ref_bad)
    assert n >= 14 and rejected >= 2  # corpus really exercised both ways


def test_parity_on_invalid_units_fixture(ref_deser):
    """The reference's planted-invalid fixture must be rejected by both
    (its record_id is an int, violating CleanedNotEmptyStr)."""
    for s in _sites_of(INVALID_FIXTURE):
        assert _ref_rejects(ref_deser, s)
        assert constrained_type_error(s) is not None


def _base() -> dict:
    # find a synthetic record that has every field the plants mutate
    for n in range(200):
        rec = synthetic.make_record(n, 200)
        try:
            invs = rec["mineral_inventory"]
            if (
                rec.get("location_info", {}).get("country")
                and invs
                and invs[0].get("ore", {}).get("value") is not None
                and rec.get("name")
            ):
                assert constrained_type_error(rec) is None
                return rec
        except (KeyError, IndexError, AttributeError):
            continue
    raise AssertionError("no suitable base record found")


PLANTS = [
    ("name", lambda r: r.update(name="  padded  ")),
    ("name_empty", lambda r: r.update(name="")),
    ("record_id_int", lambda r: r.update(record_id=7)),
    ("source_id_ws", lambda r: r.update(source_id="mining-report.pdf ")),
    ("modified_at_missing", lambda r: r.pop("modified_at")),
    (
        "confidence_oob",
        lambda r: r["location_info"]["country"][0].update(confidence=1.5),
    ),
    (
        "confidence_string",
        lambda r: r["location_info"]["country"][0].update(confidence="0.5"),
    ),
    (
        "uri_invalid",
        lambda r: r["location_info"]["country"][0].update(
            normalized_uri="not a url"
        ),
    ),
    (
        "uri_no_scheme",
        lambda r: r["location_info"]["country"][0].update(
            normalized_uri="minmod.isi.edu/resource/Q1"
        ),
    ),
    (
        "measure_nonnumeric",
        lambda r: r["mineral_inventory"][0]["ore"].update(value="abc"),
    ),
    (
        "ce_source_empty",
        lambda r: r["mineral_inventory"][0]["commodity"].update(source=""),
    ),
    (
        "observed_name_padded",
        lambda r: r["mineral_inventory"][0]["commodity"].update(
            observed_name=" Nickel"
        ),
    ),
    ("aliases_not_list", lambda r: r.update(aliases="single")),
    ("aliases_padded_elem", lambda r: r.update(aliases=["ok", " pad"])),
    ("discovered_year_str", lambda r: r.update(discovered_year="abc")),
    ("inventory_not_list", lambda r: r.update(mineral_inventory={"a": 1})),
    (
        "doc_uri_space",
        lambda r: r["mineral_inventory"][0]["reference"]["document"].update(
            uri="https://example.org/a b"
        ),
    ),
    # round-3 ADVICE: values whose validation path RAISES internally —
    # int(nan) ValueError, int(inf) OverflowError, urlparse('http://[')
    # ValueError — must reject the record, not blow up the validator.
    ("discovered_year_nan", lambda r: r.update(discovered_year=float("nan"))),
    ("discovered_year_inf", lambda r: r.update(discovered_year=float("inf"))),
    (
        "doc_uri_bad_ipv6",
        lambda r: r["mineral_inventory"][0]["reference"]["document"].update(
            uri="http://["
        ),
    ),
]

ACCEPT_PLANTS = [
    # deserialize_int accepts integral floats and int-strings
    ("discovered_year_float", lambda r: r.update(discovered_year=1912.0)),
    ("discovered_year_intstr", lambda r: r.update(discovered_year="1912")),
    # deserialize_float accepts numeric strings for Measure.value
    (
        "measure_numeric_string",
        lambda r: r["mineral_inventory"][0]["ore"].update(value="2.41"),
    ),
    # unknown keys are ignored
    ("unknown_key", lambda r: r.update(totally_unknown_field=123)),
    ("confidence_int_one", lambda r: r["location_info"]["country"][0].update(confidence=1)),
]


@pytest.mark.parametrize("label,mutate", PLANTS)
def test_planted_invalid_rejected_by_both(ref_deser, label, mutate):
    rec = copy.deepcopy(_base())
    mutate(rec)
    assert _ref_rejects(ref_deser, rec), label
    assert constrained_type_error(rec) is not None, label


@pytest.mark.parametrize("label,mutate", ACCEPT_PLANTS)
def test_planted_lenient_accepted_by_both(ref_deser, label, mutate):
    rec = copy.deepcopy(_base())
    mutate(rec)
    assert not _ref_rejects(ref_deser, rec), label
    assert constrained_type_error(rec) is None, label


def test_synthetic_corpus_fully_accepted(ref_deser):
    """No synthetic record may trip the constrained checks (they would be
    quarantined and every downstream count would shift)."""
    for n in range(200):
        rec = synthetic.make_record(n, 200)
        assert constrained_type_error(rec) is None, n
        assert not _ref_rejects(ref_deser, rec), n


def test_split_violations_quarantines_constrained(spark):
    """End-to-end: a planted padded-name record lands in the violations
    side with its field path as the reason; clean records pass."""
    good = synthetic.make_record(1, 80)
    bad = synthetic.make_record(2, 80)
    bad["name"] = "  padded  "
    rows = [
        {"repo": "r", "path": f"data/p{i}.json", "commit": "c", "lang": "json",
         "content": json.dumps(rec)}
        for i, rec in enumerate([good, bad])
    ]
    ingest = spark.createDataFrame(
        pd.DataFrame(rows),
        schema="repo string, path string, commit string, lang string, content string",
    )
    ok, vio = extract.split_violations(extract.parse_sites(ingest))
    assert ok.count() == 1
    v = vio.select("path", "violation_reason").collect()
    assert len(v) == 1
    assert v[0]["path"] == "data/p1.json" and v[0]["violation_reason"] == "name"
