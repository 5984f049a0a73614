"""A7/A8: same-user record merge + reference dedup."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from ta2_minmod_kg_spark.operators.merge_records import (
    dedup_references,
    merge_duplicate_records,
    merge_records,
)

USER = "https://minmod.isi.edu/users/s/ingestor"


def _rec(modified_at, **kw):
    base = {
        "source_id": "https://src.example.org/db",
        "record_id": "r1",
        "created_by": USER,
        "modified_at": modified_at,
        "reference": [{"document": {"uri": "https://doc.org/1"}}],
    }
    base.update(kw)
    return base


def test_scalar_first_non_null_and_lists():
    a = _rec(
        "2024-01-01T00:00:00.000000Z",
        name="Site A",
        aliases=["X"],
        mineral_inventory=[{"commodity": {"source": "s", "confidence": 1.0}}],
    )
    b = _rec(
        "2024-02-01T00:00:00.000000Z",
        site_rank="A",
        aliases=["X", "Y"],
        mineral_inventory=[{"commodity": {"source": "s2", "confidence": 0.5}}],
    )
    m = merge_records([b, a])  # order must not matter (sorted by modified_at)
    assert m["name"] == "Site A"  # from the older record (first non-null)
    assert m["site_rank"] == "A"
    assert m["aliases"] == ["X", "Y"]
    assert len(m["mineral_inventory"]) == 2
    assert m["modified_at"] == "2024-02-01T00:00:00.000000Z"


def test_location_merge():
    ce1 = {"source": "s", "confidence": 0.9, "normalized_uri": "u1"}
    ce2 = {"source": "s", "confidence": 0.8, "normalized_uri": "u2"}
    a = _rec(
        "2024-01-01T00:00:00.000000Z",
        location_info={"country": [ce1]},
    )
    b = _rec(
        "2024-02-01T00:00:00.000000Z",
        location_info={
            "country": [ce1, ce2],
            "location": "POINT (1 2)",
            "crs": {"source": "s", "confidence": 1.0, "normalized_uri": "crs1"},
        },
    )
    m = merge_records([a, b])
    loc = m["location_info"]
    assert loc["country"] == [ce1, ce2]  # extend_unique, no dup of ce1
    # location absent in the first record → taken (with its crs) from b
    assert loc["location"] == "POINT (1 2)"
    assert loc["crs"]["normalized_uri"] == "crs1"


def test_reference_dedup_by_uri_and_doi():
    refs = [
        {"document": {"uri": "https://d/1", "title": None}},
        {"document": {"uri": "https://d/1", "title": "T1"}},  # merges into first
        {"document": {"doi": "10.1/x"}},
        {"document": {"doi": "10.1/x", "uri": None}, "comment": "c"},  # distinct key
        {"document": {"title": "only title"}},
    ]
    out = dedup_references(refs)
    # uri-dup collapses; doi refs differ by comment → 2 refs; title-only kept
    assert len(out) == 4
    uri_doc = [r["document"] for r in out if r["document"].get("uri") == "https://d/1"]
    assert len(uri_doc) == 1 and uri_doc[0]["title"] == "T1"  # field-wise merge


def test_spark_merge_duplicate_records(spark):
    import json

    rows = [
        ("site__x", json.dumps(_rec("2024-01-01T00:00:00.000000Z", name="N1"))),
        ("site__x", json.dumps(_rec("2024-02-01T00:00:00.000000Z", site_rank="B"))),
        ("site__y", json.dumps(_rec("2024-01-01T00:00:00.000000Z", record_id="r2"))),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["site_id", "content"]))
    out = merge_duplicate_records(df).toPandas()
    assert len(out) == 2
    merged = json.loads(
        out[out["site_id"].str.contains("r1")]["content"].iloc[0]
    )
    assert merged["name"] == "N1" and merged["site_rank"] == "B"
