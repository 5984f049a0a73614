"""U6 backup write-back (ref `minmodkg/services/sync/backup_listener.py`)
+ the pure-python XXH64 it depends on."""

from __future__ import annotations

import json
import os

import pytest

from ta2_minmod_kg_spark.functions.ids import get_username, slugify
from ta2_minmod_kg_spark.functions.xxh import xxh64
from ta2_minmod_kg_spark.sources import synthetic
from ta2_minmod_kg_spark.streaming.backup import (
    apply_backup_events,
    backup_bucket_no,
    backup_filename,
    stream_backup,
)


def test_xxh64_spec_vector_and_jvm_parity(spark):
    """Empty-input spec vector + Spark's JVM xxhash64 (same algorithm,
    seed 42, UTF8 bytes) as the independent oracle."""
    from pyspark.sql import functions as F

    assert xxh64(b"") == 0xEF46DB3751D8E999
    strs = [
        "", "a", "abc", "hello world", "x" * 7, "y" * 8, "z" * 31,
        "w" * 32, "q" * 100, "record-00012345", "äöü-unicode-ß",
    ]
    df = spark.createDataFrame([(s,) for s in strs], "s string").select(
        "s", F.xxhash64("s").alias("h")
    )
    for r in df.collect():
        assert xxh64(r["s"].encode("utf-8"), seed=42) == r["h"] & ((1 << 64) - 1)


def test_bucket_no_formula():
    """bucket = xxh64(slugify(record_id.strip())) % 64 — the reference's
    PartitionFn (backup_listener.py:177-181)."""
    for rid in ("rec-001", "  Rec 002  ", 12345):
        expect = xxh64(slugify(str(rid).strip()).encode()) % 64
        assert backup_bucket_no(rid) == expect
        assert 0 <= backup_bucket_no(rid) < 64


def _site_event(n, ts, etype="site:add", **overrides):
    rec = synthetic.make_record(n, 400)
    rec.update(overrides)
    return {"id": n, "type": etype, "data": json.dumps(rec),
            "kg_synced": None, "timestamp": ts}


def test_site_roundtrip_and_upsert(tmp_path):
    """ingest → event → backup file equals the original record; an update
    to the same record_id replaces it in place."""
    repo = str(tmp_path / "backup_repo")
    names = {}
    ev = _site_event(3, 1000)
    site = json.loads(ev["data"])
    apply_backup_events([ev], repo, names)

    username = get_username(site["created_by"])
    fn = backup_filename(
        username, "unknown", backup_bucket_no(site["record_id"])
    )
    path = os.path.join(repo, "data/mineral-sites", fn)
    got = json.load(open(path))
    assert got == [site]  # byte-equal round trip

    # update replaces, preserving file membership
    site2 = dict(site, name="Renamed Site")
    ev2 = {**ev, "type": "site:update", "data": json.dumps(site2),
           "timestamp": 2000}
    apply_backup_events([ev2], repo, names)
    got = json.load(open(path))
    assert got == [site2]

    # a different record in the same bucket file appends, not clobbers
    # (the reference's replay has a len-1-before-append index bug here,
    # documented in streaming/backup.py)
    site3 = dict(site, record_id=site["record_id"] + "-b")
    ev3 = {**ev, "id": 99, "data": json.dumps(site3), "timestamp": 3000}
    apply_backup_events([ev3], repo, names)
    fn3 = backup_filename(
        username, "unknown", backup_bucket_no(site3["record_id"])
    )
    path3 = os.path.join(repo, "data/mineral-sites", fn3)
    all_rows = json.load(open(path3))
    assert any(r["record_id"] == site3["record_id"] for r in all_rows)
    if path3 == path:
        assert len(all_rows) == 2


def test_source_slug_naming(tmp_path):
    repo = str(tmp_path / "repo2")
    ev = _site_event(5, 1)
    site = json.loads(ev["data"])
    sid = site["source_id"].split("::")[-1]
    apply_backup_events([ev], repo, {sid: "My Fancy Source"})
    username = get_username(site["created_by"])
    fn = backup_filename(
        username, slugify("My Fancy Source"), backup_bucket_no(site["record_id"])
    )
    assert os.path.exists(os.path.join(repo, "data/mineral-sites", fn))


def test_sameas_csv_upsert(tmp_path):
    repo = str(tmp_path / "repo3")
    user = "https://minmod.isi.edu/users/u/alice"
    ev = {
        "id": 1, "type": "same-as:update", "kg_synced": None, "timestamp": 10,
        "data": json.dumps({"user_uri": user,
                            "groups": [["s1", "s2", "s3"]],
                            "diff_groups": {"s1": ["s9"]}}),
    }
    apply_backup_events([ev], repo, {})
    path = os.path.join(repo, "data/same-as/alice/same_as.csv")
    rows = [l.strip().split(",") for l in open(path)]
    assert rows[0] == ["ms_1", "ms_2", "time_ns", "is_same"]
    assert ["s1", "s2", "10", "1"] in rows and ["s1", "s9", "10", "0"] in rows

    # re-linking the same pair overwrites (keyed on (ms_1, ms_2))
    ev2 = {**ev, "id": 2, "timestamp": 20,
           "data": json.dumps({"user_uri": user,
                               "groups": [], "diff_groups": {"s1": ["s2"]}})}
    apply_backup_events([ev2], repo, {})
    rows = [l.strip().split(",") for l in open(path)]
    matches = [r for r in rows[1:] if r[0] == "s1" and r[1] == "s2"]
    assert matches == [["s1", "s2", "20", "0"]]


def test_stream_backup_checkpoint(spark, tmp_path):
    """foreachBatch wiring: events land via Structured Streaming; a second
    run with the same checkpoint does not double-apply."""
    events_dir = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    repo = str(tmp_path / "repo4")
    os.makedirs(events_dir)
    ev = _site_event(7, 100)
    with open(os.path.join(events_dir, "e1.json"), "w") as f:
        f.write(json.dumps(ev) + "\n")

    q = stream_backup(spark, events_dir, ckpt, repo, {})
    q.awaitTermination(60)
    site = json.loads(ev["data"])
    path = os.path.join(
        repo,
        "data/mineral-sites",
        backup_filename(
            get_username(site["created_by"]), "unknown",
            backup_bucket_no(site["record_id"]),
        ),
    )
    assert json.load(open(path)) == [site]

    # resume with no new input: no duplicate rows
    q2 = stream_backup(spark, events_dir, ckpt, repo, {})
    q2.awaitTermination(60)
    assert json.load(open(path)) == [site]
