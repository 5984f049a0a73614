"""Expected-VALUES oracles computed driver-side in pure Python
(VERDICT r04 #4) for driver entries whose math is not DuckDB-expressible.

Unlike the static SQL in ORACLE_SQL / kg_oracles.py, these depend on the
input data (the parquet ``documents`` table) or on numeric kernels
(float32 luma means), so they are built LAZILY when ``oracle_sql()`` is
called, against the same scale-factor directory the harness registers as
DuckDB views (``$ORACLE_SF_DIR``, default the driver's sf0.01).

- ``docs_simhash``: per-document 64-bit simhash signatures recomputed with
  the PURE-PYTHON xxh64 (functions/xxh.py — spec implementation,
  cross-checked against Spark's JVM xxhash64 in tests/test_backup.py),
  then EXACT all-pairs Hamming ≤ 3 — no banding, no Spark.  The 4-band
  pigeonhole guarantees the engine's bucketed join has recall 1.0 at
  distance ≤ 3 and its final filter caps precision, so the exact pair set
  is the complete expected output.
- ``mm_image_stats``: per-format stats recomputed from the asset
  GENERATION FORMULA (operators/multimodal.py synth_real_assets: the
  index-derived gradient), bypassing both the BMP/PPM encoders and
  decoders entirely — an encode or decode bug on the engine side breaks
  the match.  Only the resize kernel (resize_luma, pytest-covered) is
  shared, because the engine's mean_luma is defined over the 8x8
  nearest-neighbor thumbnail.
"""

from __future__ import annotations

import os
import re

DEFAULT_ORACLE_SF_DIR = "/root/testdata/sf0.01"


def oracle_sf_dir() -> str:
    return os.environ.get("ORACLE_SF_DIR", DEFAULT_ORACLE_SF_DIR)


def _read_documents(sf_dir: str):
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return list(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


# Java \s is ASCII-only: [ \t\n\x0B\f\r] — mirror it exactly (python \s
# would also split on unicode whitespace).  The lower()/strip(' ') mirror
# below additionally assumes ASCII text: Java String.toLowerCase and
# python str.lower diverge on some non-ASCII code points (e.g. 'İ', 'ẞ'),
# so _simhash64 asserts isascii() — a future non-ASCII corpus fails
# loudly at oracle-build time instead of as a driver hash mismatch
# (ADVICE r05).
_JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _simhash64(text: str) -> int:
    """Restatement of operators/text_dedup.simhash_signatures' math with
    the pure-python xxh64 at Spark's seed 42 over UTF-8 bytes:
    tokens = split(lower(trim(text)), \\s+); per-bit ±1 vote over token
    hashes; bit j set iff the vote is > 0."""
    from ..functions.xxh import xxh64

    assert text.isascii(), (
        "docs_simhash oracle mirrors Spark lower()/trim() with python "
        "str methods, which is only exact for ASCII text — see _JAVA_WS note"
    )
    toks = _JAVA_WS.split(text.strip(" ").lower())
    votes = [0] * 64
    for w in toks:
        h = xxh64(w.encode("utf-8"), seed=42)
        for j in range(64):
            votes[j] += 1 if (h >> j) & 1 else -1
    sig = 0
    for j in range(64):
        if votes[j] > 0:
            sig |= 1 << j
    return sig


def docs_simhash_oracle_sql(sf_dir: str | None = None) -> str:
    docs = _read_documents(sf_dir or oracle_sf_dir())
    sigs = [(did, _simhash64(txt)) for did, txt in docs]
    pairs = []
    for i in range(len(sigs)):
        a, sa = sigs[i]
        for j in range(i + 1, len(sigs)):
            b, sb = sigs[j]
            ham = bin(sa ^ sb).count("1")
            if ham <= 3:
                lo, hi = (a, b) if a < b else (b, a)
                pairs.append((lo, hi, ham))
    pairs.sort()
    if not pairs:
        return (
            "SELECT CAST(NULL AS BIGINT) AS doc_a, CAST(NULL AS BIGINT) AS"
            " doc_b, CAST(NULL AS INT) AS hamming WHERE false"
        )
    values = ",\n".join(f"({a},{b},{h})" for a, b, h in pairs)
    return f"""
SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b,
       CAST(hamming AS INT) AS hamming
FROM (VALUES
{values}) AS t(doc_a, doc_b, hamming)
ORDER BY doc_a, doc_b
"""


def mm_image_stats_oracle_sql(n: int = 96) -> str:
    import numpy as np

    from ..operators.multimodal import resize_luma

    acc: dict[str, dict] = {}
    for i in range(n):
        w, h = 16 + (i * 5) % 48, 16 + (i * 3) % 32
        fmt = "bmp" if i % 2 == 0 else "ppm"
        xs = np.arange(w)[None, :]
        ys = np.arange(h)[:, None]
        # the generation formula (synth_real_assets rgb closure), not the
        # codec round-trip
        r = (xs * 7 + i) % 256
        g = (ys * 11 + 2 * i) % 256
        b = (xs + ys + 3 * i) % 256
        luma = ((0.299 * r + 0.587 * g + 0.114 * b) / 255.0).astype(np.float32)
        thumb = resize_luma(luma, 8, 8)
        s = acc.setdefault(
            fmt, {"n": 0, "sum_w": 0, "sum_h": 0, "lumas": []}
        )
        s["n"] += 1
        s["sum_w"] += w
        s["sum_h"] += h
        s["lumas"].append(float(thumb.mean()))
    rows = []
    for fmt in sorted(acc):
        s = acc[fmt]
        avg = round(sum(s["lumas"]) / len(s["lumas"]), 6)
        rows.append(f"('{fmt}',{s['n']},{s['sum_w']},{s['sum_h']},{avg!r})")
    values = ",\n".join(rows)
    return f"""
SELECT format, CAST(n_assets AS BIGINT) AS n_assets,
       CAST(sum_width AS BIGINT) AS sum_width,
       CAST(sum_height AS BIGINT) AS sum_height,
       CAST(avg_luma AS DOUBLE) AS avg_luma
FROM (VALUES
{values}) AS t(format, n_assets, sum_width, sum_height, avg_luma)
ORDER BY format
"""


def build_data_oracles() -> dict[str, str]:
    """All lazily-built data-dependent oracle SQL strings, keyed like
    QUERIES.  Called from __spark_entry__.oracle_sql()."""
    return {
        "docs_simhash": docs_simhash_oracle_sql(),
        "mm_image_stats": mm_image_stats_oracle_sql(),
        "emb_ivf_recall": emb_ivf_recall_oracle_sql(),
        "emb_ivf_topk": emb_ivf_topk_oracle_sql(),
    }


def _read_embeddings(sf_dir: str):
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    return list(zip(t["vec_id"].to_pylist(), t["embedding"].to_pylist()))


def emb_ivf_recall_oracle_sql(sf_dir: str | None = None) -> str:
    """Expected per-query IVF-vs-exact hit counts, recomputed entirely
    driver-side in numpy (VERDICT r04 #1: 'emb_ivf_topk with nprobe<k is
    approximate by construction and needs a recall-vs-exact hard row').

    Independent restatement of BOTH sides of the entry:

    - exact top-3: unit-normalized float64 cosine, ties by neighbor_id;
    - IVF: Spark's ``xxhash64(bigint)`` init restated with the pure-python
      XXH64 over the 8-byte little-endian encoding at seed 42 (signed
      ordering, verified bit-equal vs the JVM), 3 Lloyd iterations
      (argmax-cosine assignment, per-cluster mean, renormalize, empty
      cells keep their previous centroid), top-``nprobe`` cell probing,
      exact re-rank within the probed cells.

    Only INTEGER intersection counts are inlined, so ulp-level
    float-summation-order differences between the distributed engine path
    and this single-process recomputation cannot flip the expected values
    (a flip would need a genuine cosine tie at ~1e-15, which the random
    synthetic embeddings do not produce).
    """
    exact, ivf = _ivf_pipeline(sf_dir or oracle_sf_dir())
    values = []
    for qid, ranked in ivf.items():
        n_hit = len(set(ranked) & set(exact[qid]))
        values.append(f"({qid},{n_hit})")
    values.sort()
    body = ",\n".join(values)
    return f"""
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(n_hit AS BIGINT) AS n_hit
FROM (VALUES
{body}) AS t(query_id, n_hit)
ORDER BY query_id
"""


def _ivf_pipeline(
    sf_dir: str,
) -> tuple[dict[int, list[int]], dict[int, list[int]]]:
    """query_id → exact top-3 / IVF(nprobe=4) top-3 ORDERED neighbor-id
    lists, recomputed entirely driver-side in numpy (shared by the
    emb_ivf_recall and emb_ivf_topk oracles; see emb_ivf_recall_oracle_sql
    for the independence argument)."""
    import struct

    import numpy as np

    from ..functions.xxh import xxh64

    K, N_CENT, NPROBE, N_QUERIES = 3, 16, 4, 20
    rows = _read_embeddings(sf_dir)
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    V = np.array([np.asarray(r[1], dtype=np.float32) for r in rows])
    # unit vectors: float32 elementwise squares accumulated in float64
    U = V.astype(np.float64)
    norms = np.sqrt((V.astype(np.float64) * V.astype(np.float64)).sum(axis=1))
    U = U / np.where(norms > 0, norms, 1.0)[:, None]

    qmask = ids < N_QUERIES
    qids, Q = ids[qmask], U[qmask]

    def topk(scores: np.ndarray, qid: int) -> list[int]:
        # ties: cosine desc, neighbor_id asc; exclude self
        order = sorted(
            (i for i in range(len(ids)) if ids[i] != qid),
            key=lambda i: (-scores[i], ids[i]),
        )
        return [int(ids[i]) for i in order[:K]]

    exact = {int(q): topk(U @ Q[qi], int(q)) for qi, q in enumerate(qids)}

    def spark_xxh64_long(v: int) -> int:
        h = xxh64(struct.pack("<q", int(v)), seed=42)
        return h - (1 << 64) if h >= (1 << 63) else h

    init_order = sorted(range(len(ids)), key=lambda i: spark_xxh64_long(ids[i]))
    C = U[init_order[:N_CENT]].copy()
    for _ in range(3):
        assign = (U @ C.T).argmax(axis=1)
        newC = C.copy()
        for c in range(N_CENT):
            members = U[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                newC[c] = m / n if n > 0 else m
        C = newC
    assign = (U @ C.T).argmax(axis=1)
    probes = np.argsort(-(Q @ C.T), axis=1)[:, :NPROBE]

    ivf: dict[int, list[int]] = {}
    for qi, q in enumerate(qids):
        qid = int(q)
        cand = [
            i
            for i in range(len(ids))
            if assign[i] in set(probes[qi]) and ids[i] != qid
        ]
        scores = U[cand] @ Q[qi]
        order = sorted(range(len(cand)), key=lambda j: (-scores[j], ids[cand[j]]))
        ivf[qid] = [int(ids[cand[j]]) for j in order[:K]]
    return exact, ivf


def emb_ivf_topk_oracle_sql(sf_dir: str | None = None) -> str:
    """Expected (query_id, rank, neighbor_id) rows for the nprobe<k IVF
    search, from the same pure-numpy pipeline as emb_ivf_recall — the
    search's actual neighbor CHOICES are hash-checked, not just recall
    counts.  INTEGER-only output (the entry drops the cosine column —
    emb_ivf_topk_exact value-hashes the cosines through the shared
    re-rank kernel), so ulp-level summation-order differences between the
    engine and this recomputation cannot flip an expected value: a flip
    would need a genuine cosine tie at ~1e-15, absent in this data."""
    _, ivf = _ivf_pipeline(sf_dir or oracle_sf_dir())
    values = []
    for qid, ranked in sorted(ivf.items()):
        for rank, nid in enumerate(ranked, start=1):
            values.append(f"({qid},{rank},{nid})")
    body = ",\n".join(values)
    return f"""
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
       CAST(neighbor_id AS BIGINT) AS neighbor_id
FROM (VALUES
{body}) AS t(query_id, rank, neighbor_id)
ORDER BY query_id, rank
"""
