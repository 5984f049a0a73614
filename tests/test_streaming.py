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
