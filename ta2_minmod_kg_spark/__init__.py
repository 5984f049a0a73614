"""ta2_minmod_kg_spark — a from-scratch PySpark-native knowledge-graph
construction engine with the capabilities of DARPA-CRITICALMAAS/ta2-minmod-kg.

The reference (read-only at /root/reference) is a single-node Python ETL +
FastAPI service.  This package re-expresses every capability Spark-first:

- ``schemas``    — StructType constants for the raw mineral-site record, the
                   ingest table ``(repo, path, commit, lang, content)``, the
                   triples table and the relational views.
- ``functions``  — deterministic id minting (slugify/shorten/site ids), unit
                   conversion, string-similarity kernels, text analytics.
- ``sources``    — entity vocabularies, same-as edge files, the synthetic
                   deterministic ingest generator.
- ``operators``  — triple extraction, grade-tonnage aggregation, entity
                   linking, connected components, dedup-site merge,
                   text dedup (minhash/simhash), ANN similarity search.
- ``plans``      — the end-to-end pipeline with per-partition checkpoints +
                   lineage, and the serving query surface.
- ``streaming``  — event-log driven incremental maintenance.

No per-row Python UDFs anywhere: all transforms are DataFrame ops or
Arrow-vectorized pandas UDFs (``pandas_udf`` / ``applyInPandas`` /
``mapInPandas``).
"""

__version__ = "0.1.0"
