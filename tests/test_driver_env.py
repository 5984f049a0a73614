"""Regression tests for the driver-harness environment (round-1 red rows).

The driver runs queries() in a vanilla ``SparkSession.builder.getOrCreate()``
session where ``spark.sql.execution.arrow.pyspark.enabled`` is false, so any
``createDataFrame`` relying on Arrow-assisted schema inference over all-None
columns dies with CANNOT_DETERMINE_TYPE. These tests reproduce that session
shape via ``newSession()`` + Arrow off, and exercise every driver-contract
local-DataFrame construction.
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def vanilla(spark):
    """A sibling session with Arrow pandas conversion disabled — the exact
    inference path the driver's harness session takes."""
    s = spark.newSession()
    s.conf.set("spark.sql.execution.arrow.pyspark.enabled", "false")
    s.conf.set("spark.sql.execution.arrow.pyspark.fallback.enabled", "false")
    yield s


def test_vocab_dataframes_no_arrow(vanilla):
    from ta2_minmod_kg_spark.sources.vocab import VOCAB_SCHEMAS, vocab_dataframes

    dfs = vocab_dataframes(vanilla)
    assert set(dfs) == set(VOCAB_SCHEMAS)
    # all-None columns carried a real type, not NullType
    assert dict(dfs["commodity"].dtypes)["parent"] == "string"
    assert dict(dfs["data_source"].dtypes)["connection"] == "string"
    assert dfs["commodity"].where("parent IS NOT NULL").count() == 0
    assert dfs["data_source"].count() > 0


def test_curated_edges_no_arrow(vanilla):
    from ta2_minmod_kg_spark.sources.synthetic import curated_edges_df

    df = curated_edges_df(vanilla, 400)
    assert df.count() == 6
    assert dict(df.dtypes) == {
        "ms_1": "string",
        "ms_2": "string",
        "time_ns": "bigint",
        "is_same": "bigint",
    }


def test_kg_queries_no_arrow(vanilla):
    """The four round-1 driver crashers run end-to-end in a non-Arrow session."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for name in (
        "kg_dedup_sites",
        "kg_grade_tonnage",
        "kg_entity_linking",
        "kg_sameas_triples",
        "mm_image_stats",  # r3: binary mapInPandas entry
    ):
        df = qs[name](vanilla, "/root/testdata/sf0.001")
        assert df.count() > 0, name
