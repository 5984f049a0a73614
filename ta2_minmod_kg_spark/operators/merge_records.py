"""Same-user record merge + reference dedup (SURVEY §2.4 A7/A8).

Clean-room reimplementation of ``MineralSite.merge_mut``
(`minmodkg/models/kg/mineral_site.py:158-183`), ``LocationInfo.merge_mut``
(`location_info.py:50-67`), ``Document.dedup`` / ``Reference.dedup``
(`reference.py:55-101,214-227`):

- scalar fields: first non-null in merge order (the reference folds in
  file order; we sort by ``(modified_at, record-json)`` for a
  distribution-stable total order);
- aliases / deposit-type candidates / location countries+states:
  ``extend_unique`` (order-preserving set union keyed by value tuple);
- location WKT + crs travel together (crs is meaningless without its
  location);
- inventories concatenate;
- references: documents merge by uri then by doi (field-wise
  first-non-null), then references dedup by
  ``(doc key, sorted page infos, comment, property)``;
- ``modified_at`` = max;
- ``created_by`` must match (the operator groups by site_id, which embeds
  the user, so this holds by construction).

Spark surface: ``groupBy(site_id)`` + ``collect_list`` of the raw parsed
record → ``mapInPandas`` batch kernel (same tiny-group pattern as dedup).
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _extend_unique(base: list, extra: list, key=lambda x: x) -> list:
    seen = {key(x) for x in base}
    out = list(base)
    for x in extra:
        k = key(x)
        if k not in seen:
            out.append(x)
            seen.add(k)
    return out


def _ce_key(ce: dict) -> tuple:
    return (
        ce.get("source"),
        ce.get("confidence"),
        ce.get("observed_name"),
        ce.get("normalized_uri"),
    )


def _doc_key(doc: dict):
    if doc.get("doi") is not None:
        return ("doi", doc["doi"])
    if doc.get("uri") is not None:
        return ("uri", doc["uri"])
    # divergence from the reference (which asserts uri/doi present):
    # title-only documents key by title so merge never crashes on them
    return ("title", doc.get("title"))


def _doc_merge(a: dict, b: dict) -> dict:
    out = dict(a)
    for k in ("doi", "uri", "title"):
        if out.get(k) is None and b.get(k) is not None:
            out[k] = b[k]
    return out


def dedup_references(refs: list[dict]) -> list[dict]:
    """A7: Reference.dedup semantics over plain dicts."""
    # merge documents by uri, then by doi
    docs = [ref.get("document") or {} for ref in refs]
    uri2doc: dict = {}
    merged: list[dict] = []
    for doc in docs:
        if doc.get("uri") is None:
            merged.append(dict(doc))
        elif doc["uri"] not in uri2doc:
            uri2doc[doc["uri"]] = dict(doc)
        else:
            uri2doc[doc["uri"]] = _doc_merge(uri2doc[doc["uri"]], doc)
    merged.extend(uri2doc.values())

    doi2doc: dict = {}
    merged2: list[dict] = []
    for doc in merged:
        if doc.get("doi") is None:
            merged2.append(doc)
        elif doc["doi"] not in doi2doc:
            doi2doc[doc["doi"]] = dict(doc)
        else:
            doi2doc[doc["doi"]] = _doc_merge(doi2doc[doc["doi"]], doc)
    merged2.extend(doi2doc.values())

    by_uri = {d["uri"]: d for d in merged2 if d.get("uri") is not None}
    by_doi = {d["doi"]: d for d in merged2 if d.get("doi") is not None}
    by_title = {d.get("title"): d for d in merged2}

    def resolve(doc: dict) -> dict:
        if doc.get("uri") is not None:
            return by_uri[doc["uri"]]
        if doc.get("doi") is not None:
            return by_doi[doc["doi"]]
        return by_title.get(doc.get("title"), doc)

    def ref_key(ref: dict, doc: dict) -> tuple:
        pis = tuple(
            sorted(
                (
                    pi.get("page"),
                    tuple(sorted((pi.get("bounding_box") or {}).items()))
                    if pi.get("bounding_box")
                    else None,
                )
                for pi in (ref.get("page_info") or [])
            )
        )
        return (_doc_key(doc), pis, ref.get("comment"), ref.get("property"))

    out: dict[tuple, dict] = {}
    for ref in refs:
        doc = resolve(ref.get("document") or {})
        new_ref = {**ref, "document": doc}
        out[ref_key(ref, doc)] = new_ref
    return list(out.values())


def merge_records(records: list[dict]) -> dict:
    """A8: fold duplicate raw records of the same site into one."""
    records = sorted(
        records, key=lambda r: (r.get("modified_at") or "", json.dumps(r, sort_keys=True))
    )
    base = dict(records[0])
    base["aliases"] = list(base.get("aliases") or [])
    base["deposit_type_candidate"] = list(base.get("deposit_type_candidate") or [])
    base["mineral_inventory"] = list(base.get("mineral_inventory") or [])
    base["reference"] = list(base.get("reference") or [])

    for other in records[1:]:
        assert other["created_by"] == base["created_by"]
        for k in ("name", "site_rank", "site_type"):
            if base.get(k) is None:
                base[k] = other.get(k)
        base["aliases"] = _extend_unique(
            base["aliases"], other.get("aliases") or []
        )
        oloc = other.get("location_info")
        if base.get("location_info") is None:
            base["location_info"] = oloc
        elif oloc is not None:
            loc = dict(base["location_info"])
            loc["country"] = _extend_unique(
                list(loc.get("country") or []), oloc.get("country") or [], _ce_key
            )
            loc["state_or_province"] = _extend_unique(
                list(loc.get("state_or_province") or []),
                oloc.get("state_or_province") or [],
                _ce_key,
            )
            if loc.get("location") is None:
                # crs is determined by the location — they travel together
                loc["location"] = oloc.get("location")
                loc["crs"] = oloc.get("crs")
            base["location_info"] = loc
        base["deposit_type_candidate"] = _extend_unique(
            base["deposit_type_candidate"],
            other.get("deposit_type_candidate") or [],
            _ce_key,
        )
        base["mineral_inventory"].extend(other.get("mineral_inventory") or [])
        base["reference"] = dedup_references(
            base["reference"] + list(other.get("reference") or [])
        )
        base["modified_at"] = max(base["modified_at"], other["modified_at"])
    return base


def _merge_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from ..functions.ids import get_username, make_site_id

    for pdf in batches:
        out_ids, out_contents = [], []
        for contents in pdf["records"]:
            records = [json.loads(c) for c in contents]
            merged = merge_records(records)
            out_ids.append(
                make_site_id(
                    get_username(merged["created_by"]),
                    merged["source_id"],
                    str(merged["record_id"]),
                )
            )
            out_contents.append(json.dumps(merged, sort_keys=True))
        yield pd.DataFrame({"site_id": out_ids, "content": out_contents})


def merge_duplicate_records(ingest_with_site_id: DataFrame) -> DataFrame:
    """Spark surface: (site_id, content) rows → one merged content per
    site_id.  One collect_list shuffle + Arrow batch kernel."""
    grouped = ingest_with_site_id.groupBy("site_id").agg(
        F.collect_list("content").alias("records")
    )
    return grouped.mapInPandas(_merge_batch, "site_id string, content string")
