"""Common-Crawl CDX(J) index source — crawl planning before fetch.

A rolling-crawl pipeline does not read WARCs blind: it first scans the
crawl's CDX index (the per-capture catalog CC publishes alongside each
dump) to SELECT what to fetch — filter by status/mime, skip digests
already in the snapshot registry, group by warc file for locality.
This module reads the CDXJ dialect (pywb / CC "cdx-00000.gz" format,
public): one capture per line,

    <urlkey> <timestamp> <json-block>

where the JSON block carries ``url``, ``mime``, ``status``, ``digest``
(sha1-b32 of the payload), ``length``/``offset`` (the record's byte
span inside), and ``filename`` (the WARC it lives in). Timestamps are
14-digit ``YYYYMMDDhhmmss``.

Same head semantics as the JSONL source (S1 + P1-P3; reference
Application.scala:42-50): ``ray.data.read_text`` → per-line parse in
``map_batches``, comment lines dropped, malformed lines quarantined
into ``_malformed`` (or raised with ``on_error="raise"``). Scale
shape: the index is line-parallel text (gz handled by read_text's
arrow codec path); selection pushdown happens HERE — a fetch plan is
a filter + groupby over this slim table, never a WARC scan.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone

import pyarrow as pa

CDX_SCHEMA = pa.schema([
    ("urlkey", pa.string()),
    ("ts", pa.timestamp("us")),
    ("url", pa.string()),
    ("status", pa.int32()),
    ("mime", pa.string()),
    ("digest", pa.string()),
    ("warc_filename", pa.string()),
    ("offset", pa.int64()),
    ("length", pa.int64()),
    ("_malformed", pa.string()),
])


def _parse_ts(ts14: str) -> int:
    """14-digit CDX timestamp → µs since epoch (UTC)."""
    dt = datetime.strptime(ts14, "%Y%m%d%H%M%S").replace(
        tzinfo=timezone.utc)
    return int(dt.timestamp() * 1_000_000)


def parse_cdx_batch(batch: pa.Table,
                    on_error: str = "quarantine") -> pa.Table:
    cols: dict[str, list] = {f.name: [] for f in CDX_SCHEMA}

    def quarantine(line: str, err: str) -> None:
        for name in cols:
            cols[name].append(err if name == "_malformed" else None)

    for line in batch.column("text").to_pylist():
        if not line or line.startswith("#"):
            continue
        try:
            head, _, blob = line.rstrip().partition(" {")
            if not blob:
                raise ValueError("no JSON block")
            urlkey, _, ts14 = head.rpartition(" ")
            if not urlkey:
                raise ValueError("missing urlkey/timestamp")
            obj = json.loads("{" + blob)
            # parse every field BEFORE appending (no ragged columns)
            row = {
                "urlkey": urlkey,
                "ts": _parse_ts(ts14),
                "url": str(obj["url"]),
                # revisit/error records may carry no status
                "status": int(obj["status"]) if "status" in obj else None,
                "mime": str(obj.get("mime", "")),
                "digest": str(obj.get("digest", "")),
                "warc_filename": str(obj["filename"]),
                "offset": int(obj["offset"]),
                "length": int(obj["length"]),
                "_malformed": None,
            }
        except (KeyError, ValueError, TypeError) as e:
            if on_error == "raise":
                raise ValueError(
                    f"malformed CDX line: {line[:80]!r}: {e}") from e
            quarantine(line, f"{type(e).__name__}: {e}")
            continue
        for name, v in row.items():
            cols[name].append(v)
    return pa.table(
        {name: pa.array(cols[name], CDX_SCHEMA.field(name).type)
         for name in cols})


def read_cdx(path: str, on_error: str = "quarantine"):
    """CDXJ file(s) → capture-catalog Dataset (CDX_SCHEMA)."""
    import functools

    import ray

    return ray.data.read_text(path).map_batches(
        functools.partial(parse_cdx_batch, on_error=on_error),
        batch_format="pyarrow")


def plan_fetch(cdx_ds, *, statuses: tuple = (200,),
               mime_prefixes: tuple = ("text/html",),
               known_digests=None, num_buckets: int = 32):
    """Capture catalog → deduplicated fetch plan.

    Keeps clean captures with a wanted status + mime, drops digests
    whose payload a prior snapshot already holds (``known_digests``:
    a (digest,) Dataset — the :func:`stages.dedup.snapshot_hashes`
    analogue at index level, anti-joined WITHOUT broadcasting), keeps
    ONE capture per remaining digest (lowest (ts, urlkey): re-crawl
    duplicates cost fetch + extract, so they die at the plan), and
    returns the plan sorted per WARC file for sequential-read
    locality: (warc_filename, offset, length, url, ts, digest)."""
    import pyarrow.compute as pc

    from ..ops.hashagg import hash_aggregate
    from ..ops.join import hash_join

    def keep(t: pa.Table) -> pa.Table:
        m = pc.is_null(t["_malformed"])
        m = pc.and_(m, pc.is_in(t["status"], value_set=pa.array(
            list(statuses), pa.int32())))
        mime_ok = pc.equal(t["mime"], t["mime"])  # all-true
        any_prefix = None
        for p in mime_prefixes:
            hit = pc.starts_with(t["mime"], p)
            any_prefix = hit if any_prefix is None \
                else pc.or_(any_prefix, hit)
        if any_prefix is not None:
            mime_ok = any_prefix
        return t.filter(pc.and_(m, mime_ok)).drop_columns(["_malformed"])

    kept = cdx_ds.map_batches(keep, batch_format="pyarrow")
    body = pa.schema([(f.name, f.type) for f in CDX_SCHEMA
                      if f.name != "_malformed"])
    if known_digests is not None:
        kept = hash_join(kept, known_digests, on="digest",
                         how="anti", num_buckets=num_buckets,
                         left_schema=body,
                         right_schema=pa.schema([("digest", pa.string())]))
    # one capture per digest: winner = lowest (ts, urlkey)
    first = hash_aggregate(
        kept.map_batches(
            lambda t: pa.table({"digest": t["digest"], "ts": t["ts"]}),
            batch_format="pyarrow"),
        "digest", [("ts", "min", "ts")], num_buckets=num_buckets)
    plan = hash_join(
        kept, first, on=["digest", "ts"], num_buckets=num_buckets,
        left_schema=body,
        right_schema=pa.schema([("digest", pa.string()),
                                ("ts", pa.timestamp("us"))]))
    # (ts, digest) can still tie across urlkeys — keep the lowest urlkey
    from ..ops.exchange import bucketed_map_groups
    from ..ops.hashagg import append_bucket

    def pick_one(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:  # 0-row-safe exchange-kernel contract
            return g
        g = g.sort_by([("digest", "ascending"), ("urlkey", "ascending")])
        import numpy as np

        d = g["digest"].to_pandas().to_numpy()
        firsts = np.flatnonzero(
            np.concatenate([[True], d[1:] != d[:-1]]))
        return g.take(firsts)

    one = bucketed_map_groups(
        plan.map_batches(lambda t: append_bucket(t, ["digest"],
                                                 num_buckets),
                         batch_format="pyarrow"),
        num_buckets, pick_one)
    return one.sort(["warc_filename", "offset"])
