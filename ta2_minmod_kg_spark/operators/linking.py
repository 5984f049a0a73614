"""Entity linking (SURVEY §2.6 L1-L3).

The reference scores each mention against *every* vocabulary doc in Python
(`entity_linking.py:95-111`, a driver-side loop).  Spark-first version:

- the vocabulary (id, labels, props) is tiny → **broadcast** to executors
  once (a plain Python broadcast var consumed inside Arrow batches — the
  docs are also exposed as a DataFrame for the crossJoin formulation);
- mentions stream through ``mapInPandas``; each Arrow batch deduplicates
  its query strings first (mentions repeat heavily: "Nickel" appears
  millions of times at corpus scale) and scores each distinct query once —
  a batch-local memo that cuts kernel work by orders of magnitude on
  skewed mention distributions;
- optional **blocking**: a ``block`` column on mentions restricted against
  a doc property (e.g. state mentions only score docs of the already-linked
  country — ref L3), turning O(mentions × vocab) into O(mentions ×
  block-bucket).

Returns the argmax doc + score per mention (ties: lowest doc id, stable).
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from ..functions.strsim import extract_features

LINKED_SCHEMA = StructType(
    [
        StructField("mention_id", StringType()),
        StructField("text", StringType()),
        StructField("entity_id", StringType()),
        StructField("score", DoubleType()),
    ]
)


def vocab_docs(
    vocab_df: DataFrame,
    id_col: str = "minmod_id",
    name_col: str = "name",
    alias_col: Optional[str] = "aliases",
    prop_col: Optional[str] = None,
) -> list[dict]:
    """Collect a vocabulary table into broadcastable docs
    (id, labels, prop).  Labels = name + '|'-split aliases
    (ref kgrel_entity.py alias handling + entity_linking.py:37-57)."""
    cols = [F.col(id_col).alias("id"), F.col(name_col).alias("name")]
    cols.append(
        F.split(F.coalesce(F.col(alias_col), F.lit("")), r"\|").alias("aliases")
        if alias_col
        else F.array().alias("aliases")
    )
    cols.append(
        F.col(prop_col).alias("prop") if prop_col else F.lit(None).alias("prop")
    )
    rows = vocab_df.select(*cols).collect()
    return [
        {
            "id": r["id"],
            "labels": [r["name"]] + [a for a in (r["aliases"] or []) if a],
            "prop": r["prop"],
        }
        for r in rows
    ]


def _link_batch_fn(docs_bc, threshold: float):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        docs = docs_bc.value
        by_prop: dict = {}
        for d in docs:
            by_prop.setdefault(d["prop"], []).append(d)
        memo: dict = {}
        for pdf in batches:
            has_block = "block" in pdf.columns
            ids, texts, ents, scores = [], [], [], []
            for row in pdf.itertuples(index=False):
                text = row.text
                block = row.block if has_block else None
                key = (text, block)
                if key not in memo:
                    cands = by_prop.get(block, docs if block is None else [])
                    best_id, best_s = None, -1.0
                    for d in cands:
                        s = float(extract_features(text, d["labels"]).mean())
                        if s > best_s:
                            best_id, best_s = d["id"], s
                    memo[key] = (best_id, best_s)
                best_id, best_s = memo[key]
                ids.append(row.mention_id)
                texts.append(text)
                ents.append(best_id if best_s >= threshold else None)
                scores.append(best_s if best_id is not None else None)
            yield pd.DataFrame(
                {
                    "mention_id": ids,
                    "text": texts,
                    "entity_id": ents,
                    "score": scores,
                }
            )

    return fn


def link_mentions(
    mentions: DataFrame,
    docs: list[dict],
    threshold: float = 0.0,
) -> DataFrame:
    """L1: mentions(mention_id, text[, block]) → best entity per mention.

    ``docs`` from ``vocab_docs``; broadcast once per job.
    """
    spark = mentions.sparkSession
    docs_bc = spark.sparkContext.broadcast(docs)
    return mentions.mapInPandas(_link_batch_fn(docs_bc, threshold), LINKED_SCHEMA)


def unlinked_mentions(sites_rel: DataFrame, kind: str) -> DataFrame:
    """Mentions whose ``normalized_uri`` is missing — the linking work list.

    kind ∈ {deposit_type, commodity}: explodes the matching candidate array.
    """
    if kind == "deposit_type":
        exploded = sites_rel.select(
            "site_id", F.posexplode("deposit_type_candidates").alias("i", "ce")
        )
        prefix = "dt"
    elif kind == "commodity":
        exploded = sites_rel.select(
            "site_id", F.posexplode("inventories").alias("i", "inv")
        ).select("site_id", "i", F.col("inv.commodity").alias("ce"))
        prefix = "comm"
    else:
        raise ValueError(kind)
    return exploded.filter(
        F.col("ce.normalized_uri").isNull() & F.col("ce.observed_name").isNotNull()
    ).select(
        F.concat_ws("::", F.lit(prefix), "site_id", F.col("i").cast("string")).alias(
            "mention_id"
        ),
        F.col("ce.observed_name").alias("text"),
    )
