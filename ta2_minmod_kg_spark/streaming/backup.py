"""U6: event → JSON-repo backup write-back (SURVEY §2.8).

Clean-room equivalent of the reference's ``BackupListener``
(`minmodkg/services/sync/backup_listener.py:23-186`):

- ``site:add`` / ``site:update`` events upsert the raw site record into
  ``data/mineral-sites/<username>/<source_slug>/b<bucket:03d>.json`` where
  ``bucket = xxh64(slugify(record_id)) % 64`` (`backup_listener.py:178-182`,
  reproduced bit-exactly via functions/xxh.py);
- ``same-as:update`` events append/overwrite ``(ms_1, ms_2)``-keyed rows in
  ``data/same-as/<username>/same_as.csv`` with header
  ``ms_1,ms_2,time_ns,is_same`` (`backup_listener.py:91-117``);
- the reference then git-commits the repo; the engine stops at the file
  write (no git in the execution environment) — the durable event table
  (streaming/events.py) covers crash durability.

Known divergence (documented): the reference's journal replay records a
new record's index as ``len(sites) - 1`` BEFORE appending
(`backup_listener.py:77-79`), so an update following two adds can clobber
the wrong record; this engine upserts by ``record_id`` correctly.

Execution shape: the handler runs driver-side inside ``foreachBatch``.
That is deliberate, not an accident: the backup is a read-modify-write of
shared small files (ultimately a git repo in the reference) — an
inherently serial, single-writer side channel.  Event micro-batches are
human-edit-scale (the reference also replays them serially in one
transaction), so the ``.collect()`` here is bounded by the micro-batch,
never by corpus size.
"""

from __future__ import annotations

import csv
import json
import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from ..functions.ids import get_username, slugify
from ..functions.xxh import xxh64

NUM_BUCKETS = 64  # ref backup_listener.py:174


def backup_bucket_no(record_id) -> int:
    """ref PartitionFn.get_bucket_no (backup_listener.py:177-181)."""
    enc = slugify(str(record_id).strip()).encode()
    return xxh64(enc) % NUM_BUCKETS


def backup_filename(username: str, source_slug: str, bucket_no: int) -> str:
    return f"{username}/{source_slug}/b{bucket_no:03d}.json"


def _source_slug(source_id: str, source_names: dict[str, str]) -> str:
    """ref backup_listener.py:130-146: strip the '<type>::' prefix, then
    the data-source's slugified name, else 'unknown'."""
    lst = source_id.split("::")
    if len(lst) > 1:
        source_id = lst[1]
    name = source_names.get(source_id)
    return slugify(name) if name else "unknown"


def apply_backup_events(
    events: list[dict], data_repo_dir: str, source_names: dict[str, str]
) -> None:
    """Replay one micro-batch of event rows into the backup repo layout.

    ``events``: dicts with keys (type, data, timestamp); site events carry
    the raw site JSON in ``data``; same-as events carry
    ``{"user_uri": ..., "groups": [[...]], "diff_groups": {...}}``.
    """
    site_journal: dict[tuple, list[dict]] = {}
    sameas_journal: dict[str, list[tuple]] = {}

    for ev in sorted(events, key=lambda e: e["timestamp"]):
        if ev["type"] in ("site:add", "site:update"):
            site = json.loads(ev["data"])
            username = get_username(site["created_by"])
            key = (
                username,
                _source_slug(site["source_id"], source_names),
                backup_bucket_no(site["record_id"]),
            )
            site_journal.setdefault(key, []).append(site)
            if ev["type"] == "site:add":
                # an add implies a (singleton) same-as group touch
                sameas_journal.setdefault(username, [])
        elif ev["type"] == "same-as:update":
            d = json.loads(ev["data"])
            username = get_username(d["user_uri"])
            recs = sameas_journal.setdefault(username, [])
            for group in d.get("groups", []):
                for target in group[1:]:
                    recs.append((group[0], target, ev["timestamp"], 1))
            for site_id, diffs in d.get("diff_groups", {}).items():
                for diff in diffs:
                    recs.append((site_id, diff, ev["timestamp"], 0))

    for (username, source_slug, bucket), sites in site_journal.items():
        outfile = os.path.join(
            data_repo_dir,
            "data/mineral-sites",
            backup_filename(username, source_slug, bucket),
        )
        if os.path.exists(outfile):
            existing = json.load(open(outfile))
            id2idx = {r["record_id"]: i for i, r in enumerate(existing)}
        else:
            existing, id2idx = [], {}
        for site in sites:
            rid = site["record_id"]
            if rid in id2idx:
                existing[id2idx[rid]] = site
            else:
                id2idx[rid] = len(existing)
                existing.append(site)
        os.makedirs(os.path.dirname(outfile), exist_ok=True)
        with open(outfile, "w") as f:
            json.dump(existing, f, indent=2)

    for username, links in sameas_journal.items():
        if not links:
            continue
        outfile = os.path.join(data_repo_dir, "data/same-as", username, "same_as.csv")
        header = ["ms_1", "ms_2", "time_ns", "is_same"]
        if os.path.exists(outfile):
            with open(outfile) as f:
                rows = list(csv.reader(f))
            assert rows[0] == header, rows[0]
            records = rows[1:]
        else:
            records = []
        key2idx = {(r[0], r[1]): i for i, r in enumerate(records)}
        drop = set()
        for s, o, ts, is_same in links:
            k = (s, o)
            if k in key2idx:
                drop.add(key2idx[k])
            records.append([s, o, str(ts), str(is_same)])
            key2idx[k] = len(records) - 1
        out = [r for i, r in enumerate(records) if i not in drop]
        if out:
            os.makedirs(os.path.dirname(outfile), exist_ok=True)
            with open(outfile, "w", newline="") as f:
                w = csv.writer(f)
                w.writerow(header)
                w.writerows(out)


def backup_listener(
    data_repo_dir: str, source_names: dict[str, str]
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` handler: micro-batch → backup repo write-back."""

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        events = [r.asDict() for r in batch_df.collect()]  # bounded: one micro-batch
        if events:
            apply_backup_events(events, data_repo_dir, source_names)

    return on_batch


def stream_backup(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    data_repo_dir: str,
    source_names: dict[str, str],
):
    """Wire the backup listener into the streaming event-log consumer
    (checkpointed: resumes after a crash without double-applying a
    committed batch)."""
    from .events import stream_events

    return stream_events(
        spark,
        events_dir,
        checkpoint_dir,
        backup_listener(data_repo_dir, source_names),
    )
