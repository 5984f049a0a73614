"""P7 vocabulary-membership validation (ref validators.py:354-419)."""

from __future__ import annotations

import json

import pandas as pd

from ta2_minmod_kg_spark.operators import extract
from ta2_minmod_kg_spark.operators.validation import (
    candidate_mentions,
    vocab_membership_violations,
)
from ta2_minmod_kg_spark.sources import synthetic, vocab


def test_clean_corpus_has_no_violations(spark):
    ingest = synthetic.synthesize_ingest(spark, 80, partitions=4)
    parsed, _ = extract.split_violations(extract.parse_sites(ingest))
    vio = vocab_membership_violations(parsed, vocab.vocab_dataframes(spark))
    assert vio.count() == 0


def test_planted_violations_detected(spark):
    MR = "https://minmod.isi.edu/resource/"
    rec = synthetic.make_record(3, 80)
    # out-of-vocab commodity on inventory 0 + bogus category + bad unit
    rec["mineral_inventory"][0]["commodity"]["normalized_uri"] = MR + "Q99999"
    rec["mineral_inventory"][0]["category"] = [
        {"source": "t", "confidence": 1.0, "normalized_uri": MR + "NotACategory"}
    ]
    rec["mineral_inventory"][0]["ore"]["unit"]["normalized_uri"] = MR + "Q999"
    rec["location_info"] = {
        "country": [
            {"source": "t", "confidence": 1.0, "normalized_uri": MR + "Q1303"},
            {"source": "t", "confidence": 1.0, "normalized_uri": MR + "BadCountry"},
        ],
        "crs": {"source": "t", "confidence": 1.0, "normalized_uri": MR + "Q1700"},
    }
    rows = [
        {
            "repo": "r",
            "path": "data/p0.json",
            "commit": "c",
            "lang": "json",
            "content": json.dumps(rec),
        }
    ]
    ingest = spark.createDataFrame(
        pd.DataFrame(rows),
        schema="repo string, path string, commit string, lang string, content string",
    )
    parsed, _ = extract.split_violations(extract.parse_sites(ingest))
    vio = (
        vocab_membership_violations(parsed, vocab.vocab_dataframes(spark))
        .toPandas()
        .sort_values(["field", "uri"])
    )
    got = set(zip(vio["field"], vio["uri"]))
    assert got == {
        ("mineral_inventory.commodity", MR + "Q99999"),
        ("mineral_inventory.category", MR + "NotACategory"),
        ("mineral_inventory.ore", MR + "Q999"),
        ("location_info.country", MR + "BadCountry"),
    }


def test_mentions_skip_nulls(spark):
    rec = synthetic.make_record(5, 80)
    # unlinked mention: observed name only, no normalized_uri → not a violation
    rec["deposit_type_candidate"] = [
        {"source": "t", "confidence": 0.5, "observed_name": "mystery type"}
    ]
    rows = [
        {
            "repo": "r",
            "path": "data/p1.json",
            "commit": "c",
            "lang": "json",
            "content": json.dumps(rec),
        }
    ]
    ingest = spark.createDataFrame(
        pd.DataFrame(rows),
        schema="repo string, path string, commit string, lang string, content string",
    )
    parsed = extract.parse_sites(ingest)
    m = candidate_mentions(parsed).toPandas()
    assert not (m["field"] == "deposit_type_candidate").any()
    assert m["uri"].notna().all()


def test_merc_inverse_golden():
    """EPSG:3857 → 4326 pure-math reprojection against the projection's
    published constants (web-mercator bounds and a known city point)."""
    from ta2_minmod_kg_spark.operators.extract import _merc_inverse, _wkt_centroid

    lat, lon = _merc_inverse(0.0, 0.0)
    assert lat == 0.0 and lon == 0.0
    lat, lon = _merc_inverse(20037508.342789244, 20037508.342789244)
    assert abs(lon - 180.0) < 1e-9
    assert abs(lat - 85.05112877980659) < 1e-9  # mercator latitude bound
    # NYC: x,y from the standard forward transform of (-74, 40.7128)
    lat, lon = _merc_inverse(-8237642.318702244, 4970071.579142425)
    assert abs(lon - (-74.0)) < 1e-9
    assert abs(lat - 40.7128) < 1e-6

    lat, lon = _wkt_centroid("POINT (-8237642.318702244 4970071.579142425)", "EPSG:3857")
    assert abs(lon - (-74.0)) < 1e-9 and abs(lat - 40.7128) < 1e-6
    # unknown CRS still yields nulls here (violation row emitted separately)
    assert _wkt_centroid("POINT (1 2)", "EPSG:32633") == (None, None)


def test_3857_location_reprojected_in_normalize(spark):
    rec = synthetic.make_record(7, 80)
    rec["location_info"] = {
        "crs": {
            "source": "t",
            "confidence": 1.0,
            "normalized_uri": "https://minmod.isi.edu/resource/Q1701",  # EPSG:3857
        },
        "location": "POINT (-8237642.318702244 4970071.579142425)",
    }
    rows = [
        {"repo": "r", "path": "data/p2.json", "commit": "c", "lang": "json",
         "content": json.dumps(rec)}
    ]
    ingest = spark.createDataFrame(
        pd.DataFrame(rows),
        schema="repo string, path string, commit string, lang string, content string",
    )
    parsed, _ = extract.split_violations(extract.parse_sites(ingest))
    sites = extract.normalize_sites(parsed, vocab.vocab_dataframes(spark)).toPandas()
    assert abs(sites["lon"].iloc[0] - (-74.0)) < 1e-9
    assert abs(sites["lat"].iloc[0] - 40.7128) < 1e-6
    # a supported CRS is NOT a violation
    from ta2_minmod_kg_spark.operators.validation import location_crs_violations

    assert location_crs_violations(parsed, vocab.vocab_dataframes(spark)).count() == 0


def test_unsupported_crs_routed_to_violations(spark):
    from ta2_minmod_kg_spark.operators.validation import location_crs_violations

    MR = "https://minmod.isi.edu/resource/"
    rec = synthetic.make_record(9, 80)
    rec["location_info"] = {
        "crs": {"source": "t", "confidence": 1.0, "normalized_uri": MR + "Q1799"},
        "location": "POINT (500000 4649776)",
    }
    rows = [
        {"repo": "r", "path": "data/p3.json", "commit": "c", "lang": "json",
         "content": json.dumps(rec)}
    ]
    ingest = spark.createDataFrame(
        pd.DataFrame(rows),
        schema="repo string, path string, commit string, lang string, content string",
    )
    parsed, _ = extract.split_violations(extract.parse_sites(ingest))
    vio = location_crs_violations(parsed, vocab.vocab_dataframes(spark)).toPandas()
    assert list(vio["field"]) == ["location_info.crs.unsupported"]
    assert list(vio["uri"]) == [MR + "Q1799"]
