"""Structured Streaming consumption of the event log (U5 surface)."""

from __future__ import annotations

import json
import os

import pandas as pd


def _write_event_file(path, events):
    with open(path, "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")


def test_stream_events_foreachbatch_and_resume(spark, tmp_path):
    from ta2_minmod_kg_spark.sources import synthetic
    from ta2_minmod_kg_spark.streaming.events import stream_events

    events_dir = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(events_dir)

    def ev(i, n):
        rec = synthetic.make_record(n, 50)
        return {
            "id": i,
            "type": "site:add",
            "data": json.dumps(rec),
            "kg_synced": "false",
            "timestamp": i,
        }

    _write_event_file(f"{events_dir}/b1.json", [ev(1, 0), ev(2, 1)])

    seen: list[tuple[int, int]] = []

    def on_batch(df, batch_id):
        seen.append((batch_id, df.count()))

    q = stream_events(spark, events_dir, ckpt, on_batch)
    q.awaitTermination(120)
    assert sum(n for _, n in seen) == 2

    # resume: new file only → checkpoint skips the already-consumed batch
    _write_event_file(f"{events_dir}/b2.json", [ev(3, 2)])
    seen.clear()
    q2 = stream_events(spark, events_dir, ckpt, on_batch)
    q2.awaitTermination(120)
    assert sum(n for _, n in seen) == 1


def test_stateful_sessionize_stream(spark, tmp_path):
    """applyInPandasWithState sessionization: sessions split on the gap and
    survive across micro-batches via the checkpointed state store."""
    import json as _json
    import time

    from ta2_minmod_kg_spark.streaming.events import sessionize_stream

    src = tmp_path / "stream_in"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def write_batch(name, rows):
        with open(src / name, "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")

    # batch 1: u1 two events 10s apart (one session), u2 one event
    write_batch(
        "b1.json",
        [
            {"user_id": "u1", "ts": "2026-01-01T10:00:00"},
            {"user_id": "u1", "ts": "2026-01-01T10:00:10"},
            {"user_id": "u2", "ts": "2026-01-01T10:00:05"},
        ],
    )

    stream = (
        spark.readStream.schema("user_id string, ts timestamp")
        .json(str(src))
    )
    out_dir = str(tmp_path / "sessions_out")
    sessions = sessionize_stream(stream, gap_seconds=60, watermark="0 seconds")
    q = (
        sessions.writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # batch 2: u1 event 2 minutes later → previous session closes, new opens
    write_batch(
        "b2.json",
        [
            {"user_id": "u1", "ts": "2026-01-01T10:02:30"},
            {"user_id": "u1", "ts": "2026-01-01T10:02:40"},
        ],
    )
    q2 = (
        sessionize_stream(
            spark.readStream.schema("user_id string, ts timestamp").json(str(src)),
            gap_seconds=60,
            watermark="0 seconds",
        )
        .writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", ckpt)  # SAME checkpoint → state resumes
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)

    rows = spark.read.parquet(out_dir).toPandas()
    u1 = rows[rows.user_id == "u1"].sort_values(["session_no", "closed"])
    # session 0 was reported live (2 events) in batch 1, then closed by the
    # gap in batch 2; session 1 is the new live session with 2 events
    closed0 = u1[(u1.session_no == 0) & u1.closed]
    assert len(closed0) == 1 and int(closed0.n_events.iloc[0]) == 2
    live1 = u1[(u1.session_no == 1) & ~u1.closed]
    assert len(live1) == 1 and int(live1.n_events.iloc[0]) == 2
    assert (rows[rows.user_id == "u2"].n_events == 1).all()


def test_dedup_stream(spark, tmp_path):
    """Streaming exact dedup keeps one row per key and evicts state via
    the watermark (dropDuplicatesWithinWatermark)."""
    import json as _json
    import os

    from ta2_minmod_kg_spark.streaming.events import dedup_stream

    src = str(tmp_path / "dups_in")
    out = str(tmp_path / "dups_out")
    ckpt = str(tmp_path / "dups_ckpt")
    os.makedirs(src)
    rows = [
        {"event_id": 1, "user_id": "u1", "ts": "2024-01-01T10:00:00", "v": 1},
        {"event_id": 1, "user_id": "u1", "ts": "2024-01-01T10:00:05", "v": 2},
        {"event_id": 2, "user_id": "u2", "ts": "2024-01-01T10:01:00", "v": 3},
        {"event_id": 2, "user_id": "u2", "ts": "2024-01-01T10:01:30", "v": 4},
        {"event_id": 3, "user_id": "u1", "ts": "2024-01-01T10:02:00", "v": 5},
    ]
    with open(os.path.join(src, "a.json"), "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")

    stream = (
        spark.readStream.schema(
            "event_id long, user_id string, ts timestamp, v long"
        ).json(src)
    )
    q = (
        dedup_stream(stream, ["event_id"], "ts", "10 minutes")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 3
    assert {r["event_id"] for r in got.collect()} == {1, 2, 3}
