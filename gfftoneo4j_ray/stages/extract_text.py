"""Stage 1: html → text extraction as a stateless ``map_batches`` transform.

Reference anchor: the line-parse + header-drop head of the pipeline
(reference: src/main/scala/corwur/Application.scala:42-50). Unlike the
reference (fail-fast throw on a bad line), undecodable pages are
quarantined with a reason string — the Writer-monad analogue
(genereader/Writer.scala:3-19) — and counted in lineage.

Scale notes:
  * Zero-copy Arrow in; the per-row regex work is unavoidable (HTML is
    a per-document payload), but all string ops are C-level.
  * The ``html`` binary column is DROPPED here — it must not travel
    past this stage (object-store pressure at 100 TB; SURVEY.md §4.2).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.text import extract_text_safe

OUT_COLUMNS = ["url", "warc_ts", "text", "lang", "quarantine_reason"]


def extract_text_batch(batch: pa.Table,
                       extractor=extract_text_safe) -> pa.Table:
    """(url, warc_ts, html, ...) → (url, warc_ts, text, lang, quarantine_reason).

    ``text`` is the extracted article text (byte-identical per url on
    well-formed input); ``quarantine_reason`` is null for clean rows.
    If the input batch carries a reference ``text`` column, a
    ``text_match`` bool column records the per-row byte-identity
    invariant (BASELINE.json input_hint) — vectorized equality.

    ``extractor`` is the profile surface (PipelineProfile
    .text_extractor): any ``bytes|None -> (text, reason)`` — the spec
    extractor by default, ``functions.boilerplate
    .extract_main_text_safe`` for arbitrary real-web HTML.
    """
    import pyarrow.compute as pc

    htmls = batch.column("html").to_pylist()
    texts: list[str] = []
    reasons: list[str | None] = []
    for h in htmls:
        t, r = extractor(h)
        texts.append(t)
        reasons.append(r)
    extracted = pa.array(texts, pa.string())
    cols = {
        "url": batch.column("url"),
        "warc_ts": batch.column("warc_ts"),
        "text": extracted,
        "lang": batch.column("lang"),
        "quarantine_reason": pa.array(reasons, pa.string()),
    }
    if "text" in batch.column_names:
        cols["text_match"] = pc.equal(extracted, batch.column("text"))
    return pa.table(cols)


def apply(pages, batch_size: int = 1024, extractor=None):
    """pages Dataset → extracted Dataset (html dropped, quarantine tagged)."""
    import functools

    fn = extract_text_batch if extractor is None else functools.partial(
        extract_text_batch, extractor=extractor)
    return pages.map_batches(fn, batch_format="pyarrow",
                             batch_size=batch_size)


def split_quarantine(extracted):
    """(clean_ds, quarantine_ds) — quarantine rows carry their reason.

    Two lazy filters over the same upstream. NOTE: each consumer
    re-executes the upstream extraction; in the checkpointed pipeline
    prefer committing the full extracted table once and filtering the
    committed Parquet (see clean_view / quarantine_view)."""
    return clean_view(extracted), quarantine_view(extracted)


def clean_view(extracted):
    """Filter to clean rows, dropping the reason column (cheap re-read
    when ``extracted`` is a committed Parquet dataset)."""
    import pyarrow.compute as pc

    return extracted.map_batches(
        lambda t: t.filter(pc.is_null(t["quarantine_reason"])).drop_columns(
            ["quarantine_reason"]),
        batch_format="pyarrow")


def quarantine_view(extracted):
    import pyarrow.compute as pc

    return extracted.map_batches(
        lambda t: t.filter(pc.is_valid(t["quarantine_reason"])).select(
            ["url", "quarantine_reason"]),
        batch_format="pyarrow")
