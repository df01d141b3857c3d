"""Line-oriented pages source: JSONL → the input_hint pages schema.

The direct analogue of the reference's line-file head (S1 + P1-P3):
``Source.fromFile(file).getLines()`` → per-line parse → header drop /
fail-fast (reference: src/main/scala/corwur/Application.scala:42-50).
Here: ``ray.data.read_text`` → vectorized per-line JSON parse inside
``map_batches`` with the reference's semantics made configurable:

  * comment lines (leading ``#``) are dropped silently — the Header
    case (gffparser/GffParser.scala:29,128; Application.scala:49);
  * malformed lines are either raised on (``on_error="raise"``, the
    reference's fail-fast, Application.scala:47) or quarantined with a
    reason into a ``_malformed`` column (our Writer-analogue default).

Line format: one JSON object per line with keys
``url`` (str), ``warc_ts`` (int µs since epoch), ``html`` (base64),
``lang`` (str), optional ``text``.
"""

from __future__ import annotations

import base64
import json
from datetime import timezone as _timezone

import pyarrow as pa

PARSED_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
    ("_malformed", pa.string()),  # null = clean; else the parse error
])


def parse_lines_batch(batch: pa.Table, on_error: str = "quarantine") -> pa.Table:
    urls, tss, htmls, texts, langs, errs = [], [], [], [], [], []
    for line in batch.column("text").to_pylist():
        if not line or line.startswith("#"):  # header/comment drop
            continue
        try:
            obj = json.loads(line)
            # parse every field BEFORE appending, so a failure cannot
            # leave ragged column lists
            u, ts = str(obj["url"]), int(obj["warc_ts"])
            h = base64.b64decode(obj["html"])
            tx, lg = obj.get("text", ""), str(obj.get("lang", "und"))
            urls.append(u)
            tss.append(ts)
            htmls.append(h)
            texts.append(tx)
            langs.append(lg)
            errs.append(None)
        except (KeyError, ValueError, TypeError) as e:
            if on_error == "raise":
                raise ValueError(f"malformed line: {line[:80]!r}: {e}") from e
            urls.append(None)
            tss.append(None)
            htmls.append(None)
            texts.append(None)
            langs.append(None)
            errs.append(f"{type(e).__name__}: {e}")
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "_malformed": pa.array(errs, pa.string()),
    })


def read_pages_jsonl(path: str, on_error: str = "quarantine"):
    """JSONL file/dir → pages Dataset (+ ``_malformed`` reason column)."""
    import functools

    import ray

    lines = ray.data.read_text(path)
    return lines.map_batches(
        functools.partial(parse_lines_batch, on_error=on_error),
        batch_format="pyarrow")


def write_pages_jsonl(pages_table: pa.Table, path: str) -> str:
    """Inverse writer (test fixture helper)."""
    with open(path, "w") as f:
        f.write("# pages corpus, one JSON object per line\n")
        for row in pages_table.to_pylist():
            f.write(json.dumps({
                "url": row["url"],
                "warc_ts": (row["warc_ts"] if isinstance(row["warc_ts"], int)
                            else int(row["warc_ts"]
                                     .replace(tzinfo=_timezone.utc)
                                     .timestamp() * 1_000_000)),
                "html": base64.b64encode(row["html"]).decode("ascii"),
                "text": row.get("text", ""),
                "lang": row["lang"],
            }) + "\n")
    return path
