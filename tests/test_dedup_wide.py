"""Equivalence: the mega-group SQL merge path vs the Arrow kernel path.

merge_dedup_sites_wide is the skew fallback (pure column expressions with
map-side partial aggregation) — it must agree with the kernel on every
field it covers, including on the planted giant cluster.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from ta2_minmod_kg_spark.operators import canonicalize, dedup, extract
from ta2_minmod_kg_spark.sources import synthetic, vocab

N = 220


def test_wide_merge_matches_kernel(spark):
    ingest = synthetic.synthesize_ingest(spark, N, partitions=4)
    parsed, _ = extract.split_violations(extract.parse_sites(ingest))
    sites = extract.normalize_sites(parsed, vocab.vocab_dataframes(spark))
    edges = synthetic.synthesize_system_edges(spark, N, partitions=4)
    membership = canonicalize.build_membership(sites, edges, None)
    swd = sites.drop("dedup_site_id").join(membership, "site_id").persist()

    kernel = dedup.merge_dedup_sites(swd).toPandas().set_index("dedup_site_id")
    wide = (
        dedup.merge_dedup_sites_wide(swd).toPandas().set_index("dedup_site_id")
    )
    assert sorted(kernel.index) == sorted(wide.index)
    # giant cluster present (the skew case the wide path exists for)
    assert int(wide["n_sites"].max()) >= synthetic.giant_size(N)

    for gid in kernel.index:
        k, w = kernel.loc[gid], wide.loc[gid]
        for field in ("name", "type", "rank", "discovered_year"):
            kv = k[field]
            wv = w[field]
            if kv is None:
                assert wv is None, (gid, field, wv)
            else:
                assert wv is not None and dict(wv) == dict(kv), (gid, field)
        # coordinates
        if k["coordinates"] is None:
            assert w["coordinates"] is None
        else:
            assert dict(w["coordinates"]) == dict(k["coordinates"]), gid
        # list attrs: kernel defaults empty-with-refid; wide yields null when
        # no non-empty value exists — compare the value payloads
        for field in ("country", "state_or_province", "mineral_form"):
            kv = dict(k[field])
            if len(kv["value"]) == 0:
                assert w[field] is None or len(w[field]["value"]) == 0
            else:
                assert list(w[field]["value"]) == list(kv["value"]), (gid, field)
                assert w[field]["refid"] == kv["refid"], (gid, field)
        assert w["modified_at"] == k["modified_at"], gid
        assert w["top1_deposit_type"] == k["top1_deposit_type"], gid
        assert int(w["n_sites"]) == len(k["ranked_sites"]), gid
    swd.unpersist()


def _swd(spark, n):
    ingest = synthetic.synthesize_ingest(spark, n, partitions=4)
    parsed, _ = extract.split_violations(extract.parse_sites(ingest))
    sites = extract.normalize_sites(parsed, vocab.vocab_dataframes(spark))
    edges = synthetic.synthesize_system_edges(spark, n, partitions=4)
    membership = canonicalize.build_membership(sites, edges, None)
    return sites.drop("dedup_site_id").join(membership, "site_id").persist()


def _rows_json(df):
    return sorted(df.orderBy("dedup_site_id").toJSON().collect())


def test_sql_mega_group_path_matches_kernel_exactly(spark):
    """_merge_big_groups_sql over the ENTIRE corpus must be byte-identical
    (JSON row serialization) to the Arrow kernel — every field, including
    geology JSON, ranked_sites order, and ranked top-5 deposit types."""
    swd = _swd(spark, 240)
    kernel = dedup.merge_dedup_sites(swd, big_group_threshold=10**9)
    sql = dedup._merge_big_groups_sql(dedup.with_site_score(swd))
    assert _rows_json(kernel) == _rows_json(sql)
    swd.unpersist()


def test_sql_mega_group_plan_has_no_window(spark):
    """Scale guard (VERDICT r02 #1): the mega-group path must be pure
    partial aggregates — no window function, which would sort a whole
    mega-group's wide rows inside one task."""
    swd = _swd(spark, 120)
    sql = dedup._merge_big_groups_sql(dedup.with_site_score(swd))
    plan = sql._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    swd.unpersist()


def test_dispatch_routes_giant_group(spark):
    """With the threshold below the planted giant cluster, the dispatch
    splits the plan (big groups → SQL path) yet the merged output is
    identical to the kernel-only run."""
    swd = _swd(spark, 200)
    thr = synthetic.giant_size(200)  # giant cluster >= threshold → SQL path
    dispatched = dedup.merge_dedup_sites(swd, big_group_threshold=thr)
    kernel_only = dedup.merge_dedup_sites(swd, big_group_threshold=10**9)
    assert _rows_json(dispatched) == _rows_json(kernel_only)
    # the giant group really is present and really took the SQL branch
    narrow = dedup.with_site_score(swd)
    from pyspark.sql import functions as F2

    big = (
        narrow.groupBy("dedup_site_id")
        .agg(F2.count(F2.lit(1)).alias("n"))
        .filter(F2.col("n") >= thr)
    )
    assert big.count() >= 1
    swd.unpersist()


def test_ranked_sites_cap_truncates_exactly(spark):
    """VERDICT r03 #7: with ranked_sites_cap set, a group over the cap
    returns EXACTLY the top-K prefix of the uncapped ranked_sites (same
    order, same structs) while every other merged field is unchanged;
    groups under the cap are byte-identical to the uncapped run.  Default
    (None) preserves full-list reference parity."""
    swd = _swd(spark, 200)
    thr = synthetic.giant_size(200)
    cap = max(2, thr // 2)  # below the giant group's size → truncation real

    full = dedup.merge_dedup_sites(swd, big_group_threshold=thr)
    capped = dedup.merge_dedup_sites(
        swd, big_group_threshold=thr, ranked_sites_cap=cap
    )
    f = {r["dedup_site_id"]: r for r in full.collect()}
    c = {r["dedup_site_id"]: r for r in capped.collect()}
    assert set(f) == set(c)
    truncated = 0
    for gid in f:
        fr, cr = f[gid], c[gid]
        want = fr["ranked_sites"][:cap] if len(fr["ranked_sites"]) > cap and gid in {
            g for g in f if len(f[g]["ranked_sites"]) >= thr
        } else fr["ranked_sites"]
        # mega groups truncate to the top-cap prefix; small groups (kernel
        # path) keep the full list
        if len(fr["ranked_sites"]) >= thr:
            assert cr["ranked_sites"] == fr["ranked_sites"][:cap], gid
            truncated += 1
        else:
            assert cr["ranked_sites"] == fr["ranked_sites"], gid
        for field in ("name", "type", "rank", "coordinates", "geology_info",
                      "country", "modified_at", "top1_deposit_type"):
            assert cr[field] == fr[field], (gid, field)
    assert truncated >= 1  # the planted giant group actually got capped
    swd.unpersist()
