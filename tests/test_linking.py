"""Entity linking: feature kernels + broadcast scoring + blocking."""

from __future__ import annotations

import pandas as pd
import pytest

from ta2_minmod_kg_spark.functions import strsim


def test_feature_kernels():
    assert strsim.levenshtein_similarity("abc", "abc") == 1.0
    assert strsim.levenshtein_similarity("abc", "") == 0.0
    # textbook jaro-winkler value
    assert strsim.jaro_winkler_similarity("martha", "marhta") == pytest.approx(
        0.9611, abs=1e-3
    )
    assert strsim.monge_elkan_similarity(["nickel", "mine"], ["nickel", "mine"]) == 1.0
    assert strsim.hybrid_jaccard_similarity(["nickel"], ["nickel"]) == 1.0
    # ordinal guard: equal digits → 1.0; mismatched digits → 0.0
    assert strsim.does_ordinal_match("Zone 12", "zone 12", 0.9, 0.7) == 1.0
    assert strsim.does_ordinal_match("Zone 12", "zone 13", 0.9, 0.7) == 0.0
    assert strsim.does_ordinal_match("Zone", "area", 0.3, 0.7) == 0.4


def test_exact_label_scores_highest():
    labels = [["Nickel", "nickel", "NIC"], ["Copper", "copper"], ["Cobalt"]]
    scores = [strsim.score("nickel", ls) for ls in labels]
    assert scores[0] == max(scores)
    assert scores[0] == 1.0


def test_link_mentions(spark):
    from ta2_minmod_kg_spark.operators import linking
    from ta2_minmod_kg_spark.sources import vocab

    vdfs = vocab.vocab_dataframes(spark)
    docs = linking.vocab_docs(vdfs["commodity"])
    mentions = spark.createDataFrame(
        pd.DataFrame(
            {
                "mention_id": ["m1", "m2", "m3", "m4"],
                "text": ["Nickel", "nickle", "LITHIUM", "xyzzy quux"],
            }
        )
    )
    out = linking.link_mentions(mentions, docs).toPandas().set_index("mention_id")
    assert out.loc["m1"]["entity_id"] == "Q1000"  # Nickel
    assert out.loc["m2"]["entity_id"] == "Q1000"  # typo still links
    assert out.loc["m3"]["entity_id"] == "Q1001"  # Lithium
    assert out.loc["m1"]["score"] == pytest.approx(1.0)
    # thresholding drops junk
    out2 = (
        linking.link_mentions(mentions, docs, threshold=0.8)
        .toPandas()
        .set_index("mention_id")
    )
    assert out2.loc["m4"]["entity_id"] is None


def test_link_with_blocking(spark):
    """L3: state mentions constrained to the already-linked country."""
    from ta2_minmod_kg_spark.operators import linking

    docs = [
        {"id": "S1", "labels": ["Springfield"], "prop": "US"},
        {"id": "S2", "labels": ["Springfield"], "prop": "CA"},
    ]
    mentions = spark.createDataFrame(
        pd.DataFrame(
            {
                "mention_id": ["a", "b"],
                "text": ["springfield", "springfield"],
                "block": ["US", "CA"],
            }
        )
    )
    out = linking.link_mentions(mentions, docs).toPandas().set_index("mention_id")
    assert out.loc["a"]["entity_id"] == "S1"
    assert out.loc["b"]["entity_id"] == "S2"
