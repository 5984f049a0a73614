"""Explicit skew salting for hot-key joins and aggregations.

AQE's skew-join splitting (on by default in session.py) handles most
skew at runtime; these helpers are the EXPLICIT form for the cases AQE
cannot rewrite — e.g. a hot key feeding a single aggregation group, or a
join where one side must be replicated deliberately (SURVEY §7 /
BASELINE "skew handled explicitly via salting").

Both are deterministic: the salt is a hash of the row's own columns, not
``rand()`` — a task retry or speculative duplicate re-derives the same
salt, so exactly-once semantics survive recomputation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, cols: list[str] | None = None) -> DataFrame:
    """Deterministic per-row salt in [0, n_salts): xxhash64 over the
    row's columns (or ``cols``)."""
    basis = cols or df.columns
    return df.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in basis]), F.lit(n_salts)).cast("int"),
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join a skew-keyed DataFrame against ``other`` with the hot keys
    spread over ``n_salts`` partitions: the skewed side gets a
    deterministic row salt, the other side is replicated n_salts× (one
    copy per salt), and the join runs on ``on + [_salt]`` — a hot key's
    rows land on n_salts reducers instead of one.

    Use when ``other`` is too big to broadcast but small enough that
    n_salts× replication is cheaper than one straggler task; result is
    row-identical to the unsalted join (tests/test_skew.py).

    Only left-sided join types are allowed: under right/full-outer the
    replicated side's unmatched rows would surface once PER SALT.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join supports left-sided joins only, got {how!r} "
            "(the replicated side would duplicate unmatched rows)"
        )
    left = with_salt(skewed, n_salts)
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(n_salts - 1))
    ).alias("_salt")
    right = other.select("*", salts)
    return left.join(right, on + ["_salt"], how).drop("_salt")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for hot grouping keys: partial-aggregate by
    ``keys + [_salt]`` (hot key spread over n_salts reducers), then
    final-aggregate by ``keys``.  ``aggs`` are (partial_expr,
    final_expr_builder) pairs — e.g. a global count:

        salted_agg(df, ["k"], [(F.count(F.lit(1)).alias("c"),
                                lambda: F.sum("c").alias("c"))])
    """
    partial = with_salt(df, n_salts).groupBy(*keys, "_salt").agg(
        *[p for p, _ in aggs]
    )
    return partial.groupBy(*keys).agg(*[f() for _, f in aggs])
