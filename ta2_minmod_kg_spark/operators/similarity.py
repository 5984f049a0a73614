"""Similarity search over an embedding column (array<float>).

- ``brute_force_topk``   — exact cosine top-k neighbors per query vector:
                           broadcast the (small) query side, JVM dot
                           products (``zip_with`` + ``aggregate``), window
                           top-k.  The correctness baseline.
- ``lsh_topk``           — random-hyperplane LSH: sign-bit sketch →
                           bucket-join on band keys → exact cosine re-rank
                           within candidates.  The 100 TB path: shuffle is
                           on uniform sketch keys, fan-out bounded by
                           bucket size, no cross join anywhere.
- ``embedding_near_duplicates`` — all-pairs near-dups above a cosine
                           threshold via the same LSH bucketing.

Hyperplanes are seeded/deterministic (numpy PCG64) and enter the plan as
literal arrays — no RNG at execution time, restart-stable.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double"),
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def with_unit_vectors(df: DataFrame, col: str = "embedding") -> DataFrame:
    n = _norm(F.col(col))
    unit = F.transform(
        F.col(col), lambda x: x.cast("double") / F.when(n > 0, n).otherwise(F.lit(1.0))
    )
    return df.withColumn("unit_vec", unit)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rank) — exact.

    The query side is broadcast; the corpus is scanned once.  Use when
    queries ≪ corpus (the typical serving shape).
    """
    c = with_unit_vectors(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("unit_vec").alias("cv")
    )
    q = F.broadcast(
        with_unit_vectors(queries, vec_col).select(
            F.col(id_col).alias("query_id"), F.col("unit_vec").alias("qv")
        )
    )
    scored = (
        c.join(q, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", _dot("qv", "cv").alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, nbits: int, seed: int = 7) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((nbits, dim)).tolist()


def _sketch_bands(vec_col, planes: list[list[float]], bands: int):
    """Sign-bit sketch split into band keys (array<bigint>)."""
    nbits = len(planes)
    width = nbits // bands
    bits = [
        (
            _dot(vec_col, F.array(*[F.lit(float(x)) for x in p])) > 0
        ).cast("int")
        for p in planes
    ]
    return F.array(
        *[
            F.xxhash64(
                F.lit(b),
                F.concat(*[c.cast("string") for c in bits[b * width : (b + 1) * width]]),
            )
            for b in range(bands)
        ]
    )


def lsh_topk(
    corpus: DataFrame,
    k: int = 10,
    nbits: int = 16,
    bands: int = 4,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """Self top-k: approximate nearest neighbors for every corpus vector.

    Candidates = vectors sharing ≥1 sketch band; exact cosine re-rank.
    Recall rises with bands; cost with bucket size.
    """
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    planes = _hyperplanes(dim, nbits, seed)
    u = with_unit_vectors(corpus, vec_col).select(
        F.col(id_col).alias("id"),
        "unit_vec",
        F.posexplode(_sketch_bands(F.col("unit_vec"), planes, bands)).alias(
            "band", "bucket"
        ),
    )
    left = u.select("band", "bucket", F.col("id").alias("query_id"), F.col("unit_vec").alias("qv"))
    right = u.select("band", "bucket", F.col("id").alias("neighbor_id"), F.col("unit_vec").alias("cv"))
    cand = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "qv", "cv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id", "neighbor_id", _dot("qv", "cv").alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def embedding_near_duplicates(
    corpus: DataFrame,
    threshold: float = 0.95,
    nbits: int = 16,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a, id_b, cosine) pairs above the cosine threshold (LSH-bucketed)."""
    dim = len(corpus.select(vec_col).first()[0])
    planes = _hyperplanes(dim, nbits)
    u = with_unit_vectors(corpus, vec_col).select(
        F.col(id_col).alias("id"),
        "unit_vec",
        F.posexplode(_sketch_bands(F.col("unit_vec"), planes, bands)).alias(
            "band", "bucket"
        ),
    )
    left = u.select("band", "bucket", F.col("id").alias("id_a"), F.col("unit_vec").alias("va"))
    right = u.select("band", "bucket", F.col("id").alias("id_b"), F.col("unit_vec").alias("vb"))
    return (
        left.join(right, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", _dot("va", "vb").alias("cosine"))
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("cosine") >= threshold)
    )


# -- IVF (inverted-file) ANN ----------------------------------------------------


def _kmeans_centroids(
    corpus: DataFrame,
    k: int,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic Lloyd iterations, Spark-side assignment.

    Init = the k vectors with the smallest ``xxhash64(id)`` (a seedless
    deterministic sample); each iteration assigns via a numpy-matmul Arrow
    kernel and averages per cluster with a JVM aggregate.  Centroids stay
    driver-side (k × dim floats — broadcast-sized by construction).
    """
    u = with_unit_vectors(corpus, vec_col)
    init = (
        u.withColumn("h", F.xxhash64(F.col(id_col)))
        .orderBy("h")
        .limit(k)
        .select("unit_vec")
        .collect()
    )
    centroids = np.array([r["unit_vec"] for r in init], dtype=np.float64)
    for _ in range(iters):
        assigned = _assign_clusters(u, centroids)
        rows = (
            assigned.select("cluster", F.posexplode("unit_vec").alias("i", "x"))
            .groupBy("cluster", "i")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new = centroids.copy()
        sums: dict[int, np.ndarray] = {}
        counts: dict[int, int] = {}
        for r in rows:
            sums.setdefault(r["cluster"], np.zeros(centroids.shape[1]))[r["i"]] = r["s"]
            counts[r["cluster"]] = r["n"]
        for c, vec in sums.items():
            new[c] = vec / max(counts[c], 1)
            norm = np.linalg.norm(new[c])
            if norm > 0:
                new[c] /= norm
        centroids = new
    return centroids


def _assign_clusters(u: DataFrame, centroids: np.ndarray) -> DataFrame:
    """cluster = argmax cosine to centroid — numpy matmul per Arrow batch."""
    import pandas as pd

    C = centroids.T.copy()

    def fn(batches):
        for pdf in batches:
            M = np.array([np.asarray(v, dtype=np.float64) for v in pdf["unit_vec"]])
            cl = (M @ C).argmax(axis=1) if len(M) else np.array([], dtype=int)
            out = pdf.copy()
            out["cluster"] = cl.astype("int32")
            yield out

    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in u.schema.fields
    )
    return u.mapInPandas(fn, f"{fields}, cluster int")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: partition the corpus into centroid cells, probe the
    ``nprobe`` nearest cells per query, exact cosine re-rank inside.

    The 100 TB shape: the corpus shuffles ONCE on cluster id (and would be
    written bucketed-by-cluster for reuse); each query touches
    nprobe/n_centroids of the data.  Recall is tunable via nprobe.
    """
    cents = _kmeans_centroids(corpus, n_centroids, id_col=id_col, vec_col=vec_col)
    cu = _assign_clusters(with_unit_vectors(corpus, vec_col), cents).select(
        F.col(id_col).alias("neighbor_id"), F.col("unit_vec").alias("cv"), "cluster"
    )

    qu = with_unit_vectors(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("unit_vec").alias("qv")
    )
    import pandas as pd

    C = cents.T.copy()
    nb = min(nprobe, len(cents))

    def probe(batches):
        for pdf in batches:
            M = np.array([np.asarray(v, dtype=np.float64) for v in pdf["qv"]])
            order = np.argsort(-(M @ C), axis=1)[:, :nb] if len(M) else np.zeros((0, nb), int)
            out = pdf.loc[pdf.index.repeat(nb)].reset_index(drop=True)
            out["cluster"] = order.reshape(-1).astype("int32")
            yield out

    q_probed = qu.mapInPandas(
        probe, "query_id bigint, qv array<double>, cluster int"
    )
    scored = (
        q_probed.join(cu, "cluster")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", _dot("qv", "cv").alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
