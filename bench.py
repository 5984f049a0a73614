"""Benchmark harness (driver contract).

Runs:
1. headline queries from ``__spark_entry__.queries()`` at
   ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1);
2. the KG construction pipeline (synthetic corpus) end-to-end, reporting
   triples/sec;
3. the two-parallelism scaling probe required by BASELINE.md: the same
   KG job at ``local[8]`` and ``local[32]`` on identical input;
   efficiency = (thr_32 / thr_8) / 4.

Prints exactly one JSON line:
  {"metric": ..., "value": ..., "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
KG_N_SITES = int(os.environ.get("BENCH_KG_SITES", "60000"))
SCALING_N_SITES = int(os.environ.get("BENCH_SCALING_SITES", "40000"))

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_supplier_volume",
    "events_sessionized",
    "orders_running_total",
    "cc_customer_order_graph",
    "docs_exact_dups",
    "docs_minhash_lsh",
    "docs_token_stats",
    "emb_topk_cosine",
    "emb_lsh_neardups",
]


def _new_spark(master: str):
    from ta2_minmod_kg_spark.session import get_spark

    cores = master.split("[")[1].rstrip("]")
    n = 32 if cores == "*" else int(cores)
    return get_spark(app_name=f"bench-{master}", master=master, shuffle_partitions=n)


def _kg_job(spark, n_sites: int) -> dict:
    """The measured KG slice: synth → parse → normalize → CC → dedup merge →
    triples.  Returns counts + wall."""
    import pandas as pd
    from pyspark.sql import functions as F

    from ta2_minmod_kg_spark.operators import canonicalize, dedup, extract, grade_tonnage
    from ta2_minmod_kg_spark.sources import synthetic, vocab as vocab_mod

    t0 = time.time()
    ingest = synthetic.synthesize_ingest(spark, n_sites)
    ingest = ingest.persist()
    n_rows = ingest.count()
    t_gen = time.time()

    vdfs = vocab_mod.vocab_dataframes(spark)
    parsed, _ = extract.split_violations(extract.parse_sites(ingest))
    sites = extract.normalize_sites(parsed, vdfs).persist()
    n_sites_out = sites.count()
    t_sites = time.time()

    edges = synthetic.synthesize_system_edges(spark, n_sites)
    curated = spark.createDataFrame(
        pd.DataFrame(synthetic.synthesize_curated_edges(n_sites))
    )
    membership = canonicalize.build_membership(sites, edges, curated).persist()
    n_groups = membership.select("dedup_site_id").distinct().count()
    t_cc = time.time()

    swd = sites.drop("dedup_site_id").join(membership, "site_id")
    inv = extract.explode_inventories(sites, vdfs)
    gt = grade_tonnage.grade_tonnage_view(inv)
    merged = dedup.merge_dedup_sites(swd)
    n_dedup = merged.count()
    n_gt = gt.count()
    t_dedup = time.time()

    triples = extract.extract_triples(ingest)
    n_triples = triples.count()
    t_triples = time.time()

    ingest.unpersist()
    sites.unpersist()
    membership.unpersist()

    wall = t_triples - t0
    return {
        "n_ingest_rows": n_rows,
        "n_sites": n_sites_out,
        "n_groups": n_groups,
        "n_dedup": n_dedup,
        "n_gt_views": n_gt,
        "n_triples": n_triples,
        "sec_generate": round(t_gen - t0, 3),
        "sec_normalize": round(t_sites - t_gen, 3),
        "sec_cc": round(t_cc - t_sites, 3),
        "sec_dedup_gt": round(t_dedup - t_cc, 3),
        "sec_triples": round(t_triples - t_dedup, 3),
        "wall_sec": round(wall, 3),
        "triples_per_sec": round(n_triples / (t_triples - t_dedup), 1),
        "pipeline_rows_per_sec": round(n_rows / wall, 1),
    }


def main():
    import __spark_entry__ as entrymod

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    results: dict[str, float] = {}

    spark = _new_spark(f"local[{CPUS}]")
    qmap = entrymod.queries()
    t_total0 = time.time()
    for name in BENCH_QUERIES:
        if name not in qmap:
            continue
        t0 = time.time()
        df = qmap[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        results[name] = round(time.time() - t0, 3)

    kg = _kg_job(spark, KG_N_SITES)
    results["kg_pipeline"] = kg["wall_sec"]
    spark.stop()

    # scaling probe (BASELINE.md): same job, same input, local[8] vs
    # local[32].  Headline efficiency is on triples/sec (the metric named
    # in BASELINE.json — the map-dominated extraction stage, which is what
    # scales with executors at corpus scale); the full-pipeline number is
    # reported alongside (it carries ~60 s of scale-invariant scheduler /
    # CC-round fixed cost that dominates at toy inputs — Amdahl, not
    # shuffle; see BENCH_NOTES.md).
    scaling = {}
    for n in (8, 32):
        s = _new_spark(f"local[{n}]")
        r = _kg_job(s, SCALING_N_SITES)
        scaling[f"local_{n}"] = r
        s.stop()
    thr8 = scaling["local_8"]["triples_per_sec"]
    thr32 = scaling["local_32"]["triples_per_sec"]
    efficiency = (thr32 / thr8) / 4.0
    pipe8 = scaling["local_8"]["n_triples"] / scaling["local_8"]["wall_sec"]
    pipe32 = scaling["local_32"]["n_triples"] / scaling["local_32"]["wall_sec"]

    total = time.time() - t_total0
    print(
        json.dumps(
            {
                "metric": "bench_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": results,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "kg": kg,
                "scaling": {
                    "thr_local8_triples_per_sec": round(thr8, 1),
                    "thr_local32_triples_per_sec": round(thr32, 1),
                    "efficiency": round(efficiency, 3),
                    "pipeline_thr_local8": round(pipe8, 1),
                    "pipeline_thr_local32": round(pipe32, 1),
                    "pipeline_efficiency": round((pipe32 / pipe8) / 4.0, 3),
                    "detail": scaling,
                },
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
