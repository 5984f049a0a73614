"""Document deduplication suite (training-data pipeline surface).

Operates on the ``documents`` table (doc_id, text, lang, source, n_chars).
Hashing stays JVM-side everywhere (``xxhash64``); the one place dense
per-bit math dominates (the SimHash vote matrix) runs as a vectorized
Arrow kernel.

- ``exact_duplicates``    — hash-groupBy on a normalized fingerprint.
- ``minhash_signatures``  — word-shingle MinHash (H hash functions as
                            column expressions over ``xxhash64(seed, s)``).
- ``lsh_candidate_pairs`` — banding: split the signature into B bands,
                            bucket-join on (band, band-hash); candidates
                            verified with exact shingle Jaccard.
- ``simhash_signatures``  — 64-bit SimHash: JVM token hashes, numpy
                            majority vote; near-dup join on 16-bit bands
                            (pigeonhole: any pair with Hamming distance
                            ≤ 3 shares ≥1 band).
- ``ngram_jaccard_pairs`` — exact Jaccard over shingle sets for a candidate
                            pair list (the verify stage).

Scale notes: banding bounds the join fan-out — the bucket join shuffles on
(band_id, hash) which is uniform by construction; the only quadratic work
is *within* buckets, bounded by duplicate-cluster size.  At 100 TB you'd
also salt the degenerate all-identical bucket (guard with a bucket-size cap
here, ``max_bucket`` below).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import fingerprint64, shingles


def exact_duplicates(documents: DataFrame) -> DataFrame:
    """Groups of byte-identical (normalized) docs: (fingerprint, doc_ids,
    n_dups), only groups with >1 member."""
    return (
        documents.select(
            fingerprint64(F.col("text")).alias("fingerprint"), "doc_id"
        )
        .groupBy("fingerprint")
        .agg(
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
            F.count(F.lit(1)).alias("n_dups"),
        )
        .filter(F.col("n_dups") > 1)
    )


def _seeded_hash(i: int):
    """Closure factory: a `lambda s, i=i:` would be introspected by PySpark
    as a TWO-parameter transform lambda, making `i` the element INDEX
    instead of the seed — every 'hash function' collapses to one
    position-sensitive hash and LSH recall silently craters."""
    return lambda s: F.xxhash64(F.lit(i), s)


def minhash_signatures(
    documents: DataFrame, num_hashes: int = 32, shingle_k: int = 3
) -> DataFrame:
    """(doc_id, sig: array<bigint>[num_hashes]).

    Shape: explode shingles once, then ``num_hashes`` MIN aggregates in a
    single groupBy pass (map-side partials).  The tempting alternative —
    ``array_min(transform(shingles, h_i))`` per signature position —
    re-inlines the whole shingle-construction expression into every one of
    the 32 columns (Catalyst collapses the projection), paying 32×
    shingle building per row; measured 6× slower at sf0.1."""
    ex = documents.select(
        "doc_id", F.explode(shingles(F.col("text"), shingle_k)).alias("s")
    )
    mins = ex.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64(F.lit(i), F.col("s"))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    )
    return mins.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def lsh_candidate_pairs(
    documents: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    max_bucket: int = 1000,
) -> DataFrame:
    """MinHash-LSH near-duplicate candidates, verified with exact Jaccard.

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b.
    """
    assert num_hashes % bands == 0
    rows = num_hashes // bands
    sigs = minhash_signatures(documents, num_hashes, shingle_k)
    banded = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.col("sig")[b * rows + r] for r in range(rows)]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")

    # bucket-size cap guards the degenerate all-identical bucket.
    # NOTE (r06): rebuilding this on the _bucket_pairs collect_list
    # kernel was MEASURED SLOWER at sf0.1 (2.0 s vs 1.35 s best-of-3) —
    # the minhash bucket table is almost entirely singleton buckets, so
    # the window+self-join (whose exchange Catalyst reuses across the
    # aliases) beats a python pair kernel here; kept as-is.
    sized = banded.withColumn(
        "bsz", F.count(F.lit(1)).over(Window.partitionBy("band", "bucket"))
    ).filter(F.col("bsz") <= max_bucket)

    left = sized.select("band", "bucket", F.col("doc_id").alias("doc_a"))
    right = sized.select("band", "bucket", F.col("doc_id").alias("doc_b"))
    cand = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return ngram_jaccard_pairs(cand, documents, shingle_k)


def ngram_jaccard_pairs(
    pairs: DataFrame, documents: DataFrame, shingle_k: int = 3
) -> DataFrame:
    """Exact word-shingle Jaccard for (doc_a, doc_b) pairs."""
    sh = documents.select(
        "doc_id", F.array_distinct(shingles(F.col("text"), shingle_k)).alias("sh")
    )
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (inter / F.when(union > 0, union).otherwise(F.lit(1))).alias("jaccard"),
        )
    )


def simhash_signatures(documents: DataFrame, nbits: int = 64) -> DataFrame:
    """(doc_id, bits array<int>[nbits], sig array<bigint>[nbits/32],
    band keys array<bigint>[4]).

    Per-bit majority vote over token hashes — token hashing JVM-side
    (exact ``xxhash64`` parity), the nbits x n_tokens vote as a
    vectorized numpy kernel (see the inline note).  ``sig`` packs the
    bits into 32-bit halves (big-endian within each half, matching the
    SQL ``aggregate(slice(bits,…), acc*2+b)`` fold used by the
    driver-entry invariant) so downstream Hamming is two JVM
    ``bit_count(xor)`` ops instead of an interpreted 64-step fold.
    """
    toks = F.transform(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda w: F.xxhash64(w)
    )

    # hybrid: the token hashing stays JVM-side (exact xxhash64 parity, one
    # interpreted pass of ~n_tokens ops per doc) but the nbits x n_tokens
    # majority vote moves to a numpy kernel — as nbits interpreted
    # ``aggregate`` folds it was 64 x n_tokens lambda steps per doc
    # (measured 24 s at sf0.1; the bit matrix is two vectorized shifts)
    import numpy as np
    import pandas as pd

    shifts = np.arange(nbits, dtype=np.int64)
    n_halves = nbits // 32
    pack_w = np.left_shift(
        np.int64(1), np.arange(31, -1, -1, dtype=np.int64)
    )

    def vote_fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            bits_out, sig_out = [], []
            for th in pdf["th"]:
                h = np.asarray(th, dtype=np.int64)
                ones = ((h[:, None] >> shifts) & 1).sum(axis=0)
                votes = 2 * ones - len(h)
                bits = (votes > 0).astype(np.int32)
                bits_out.append(bits)
                b64 = bits.astype(np.int64)
                sig_out.append(
                    [
                        int((b64[j * 32 : (j + 1) * 32] * pack_w).sum())
                        for j in range(n_halves)
                    ]
                )
            out = pdf[["doc_id"]].copy()
            out["bits"] = bits_out
            out["sig"] = sig_out
            yield out

    df = documents.select("doc_id", toks.alias("th")).mapInPandas(
        vote_fn, "doc_id bigint, bits array<int>, sig array<bigint>"
    )
    band_width = nbits // 4
    bands = F.array(
        *[
            F.xxhash64(
                F.lit(b),
                F.array_join(
                    F.transform(
                        F.slice(F.col("bits"), b * band_width + 1, band_width),
                        lambda x: x.cast("string"),
                    ),
                    "",
                ),
            )
            for b in range(4)
        ]
    )
    return df.withColumn("bands", bands)


def simhash_near_duplicates(
    documents: DataFrame,
    max_hamming: int = 3,
    nbits: int = 64,
    sigs: DataFrame | None = None,
    max_bucket: int = 1000,
) -> DataFrame:
    """(doc_a, doc_b, hamming) for pairs within max_hamming bits.

    Banding on 4×(nbits/4)-bit keys guarantees recall for distance ≤ 3.

    r06 rebuild (VERDICT r05 #2 — the one dedup path without a
    degenerate-bucket guard): candidate pairs come from the capped
    ids-only ``_bucket_pairs`` idiom shared with the embedding path
    (operators/similarity.py) — each doc_id is shuffled once per band as
    a (band, bucket, id) triple instead of carrying the 64-int ``bits``
    array through a bucket self-join; Hamming is computed JVM-side as
    ``bit_count(sig_a ^ sig_b)`` over the kernel-packed 2×bigint
    signatures instead of an interpreted zip_with+aggregate fold per
    pair.  ``max_bucket`` skips (and counts — see _bucket_pairs) any
    degenerate bucket of identical banded keys, exactly like the
    MinHash (max_bucket=1000) and embedding (max_bucket=10_000) paths.

    ``sigs``: optionally pass a precomputed ``simhash_signatures``
    DataFrame (e.g. checkpointed) so callers that also need the
    signatures pay the tokenize+vote pass once.
    """
    from .similarity import _bucket_pairs

    if sigs is None:
        sigs = simhash_signatures(documents, nbits)
    u = sigs.select(
        F.col("doc_id").alias("id"), F.posexplode("bands").alias("band", "bucket")
    )
    pairs = _bucket_pairs(u, max_bucket=max_bucket).select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
    )
    s = sigs.select("doc_id", "sig")
    hamming = None
    for j in range(nbits // 32):
        term = F.bit_count(F.col("sig_a")[j].bitwiseXOR(F.col("sig_b")[j]))
        hamming = term if hamming is None else hamming + term
    return (
        pairs.join(
            s.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a")),
            "doc_a",
        )
        .join(
            s.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b")),
            "doc_b",
        )
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
