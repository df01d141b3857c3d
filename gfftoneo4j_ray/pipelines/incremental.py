"""Incremental KG update: re-run only what a new crawl snapshot changed.

At 10^12 documents, successive crawl snapshots share almost all of
their pages. A full re-run re-pays the expensive actor-pool stages
(triple extraction + entity linking — the model-inference analogues)
for every unchanged page. This pipeline reuses the previous
checkpointed run's committed ``triples`` and ``linked`` stages for
pages whose extracted text is unchanged and runs the expensive stages
ONLY over changed/new pages, then lets :func:`kg.run` resume from the
pre-committed stages and rebuild the (cheap, aggregate-only) mapping
+ graph sinks. The final node/edge tables are IDENTICAL to a fresh
full run on the new snapshot — pinned by test — because the graph
stages are pure aggregates over the linked multiset.

What still runs in full, and why it's the cheap part:
  * text extraction over the new snapshot (needed to diff, and ~free
    next to model stages);
  * the per-url text-hash diff join and the triples/linked reuse
    semi-joins — bucketed url-hash exchanges whose volume is
    (url, 20-byte hash) pairs plus one pass over the committed
    triples/linked tables (IO-bound, no model compute);
  * mapping + canonicalization + graph sinks — aggregate passes whose
    outputs cannot be patched in place because edge weights are
    corpus-wide mention counts.

Deleted pages fall out naturally: reuse is a semi-join against the
NEW snapshot's unchanged urls, so rows of vanished urls are never
carried forward.

Economics (measured, BASELINE.md round-4): the update's fixed cost is
text extraction + the slim hash diff + one pass over the committed
triples/linked tables; its saving is the model stages over unchanged
pages. With the sandbox's vectorized stand-in extractor (~0.1 ms/page)
the two sides break even (0.9-1.0× at 1% change, 3.2M pages); under
an explicitly modeled production extractor cost
(``RAYKG_MODELED_PAGE_COST_MS``, stages/triples.CostModeledExtractor)
the saving dominates — 1.8× at 1 ms/page and growing linearly with
per-page model cost, which is the regime (GPU OpenIE + cross-encoder
linking) this pipeline is designed for.
"""

from __future__ import annotations

import os

import pyarrow as pa

from ..stages import extract_text, linker, triples
from ..state.checkpoint import CheckpointedRun
from . import kg


_URL_TH = pa.schema([("url", pa.string()),
                     ("th1", pa.uint64()), ("th2", pa.uint64())])
_HASH_SIDE_DIR = "_text_hashes"  # '_' prefix: invisible to parquet
# dataset discovery; a DIRECTORY of parts so the write is distributed


def _text_hashes(text_stage_ds):
    """Committed text-stage rows → (url, th1, th2): a 128-bit
    vectorized row hash (two seeded polars ``hash_rows`` passes — no
    per-row Python) over everything the downstream stages can see:
    extracted text, lang (the triples gate), and the quarantine
    verdict. 128 bits keeps the missed-change collision probability
    negligible at 10^12 urls. Hash values are stable within one
    polars build; across upgrades a stored prev-side table simply
    mismatches everywhere and the update degrades to a full
    recompute — safe, never stale."""

    def to_hash(t: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(t.select(["text", "lang", "quarantine_reason"]))
        return pa.table({
            "url": t["url"],
            "th1": pa.array(df.hash_rows(seed=0).to_numpy()),
            "th2": pa.array(df.hash_rows(seed=1).to_numpy()),
        }).cast(_URL_TH)

    return text_stage_ds.map_batches(to_hash, batch_format="pyarrow")


def _hashes_for_run(root: str):
    """(url, th1, th2) for a run's committed text stage — from the
    stored side artifact when present (written by every incremental
    run: successive snapshots then never re-read the full prev text
    column, only this slim table), else computed from the stage."""
    import ray

    side = os.path.join(root, "text", _HASH_SIDE_DIR)
    if os.path.exists(os.path.join(side, "_DONE")):
        return ray.data.read_parquet(side)
    return _text_hashes(ray.data.read_parquet(
        os.path.join(root, "text"),
        columns=["url", "text", "lang", "quarantine_reason"]))


def _store_hashes(root: str, hashes_ds) -> None:
    """Persist the hash side artifact next to the text stage —
    distributed parquet write (no driver materialization), atomic
    dir tmp+rename."""
    import shutil

    side = os.path.join(root, "text", _HASH_SIDE_DIR)
    tmp = side + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    hashes_ds.write_parquet(tmp)
    shutil.rmtree(side, ignore_errors=True)
    os.rename(tmp, side)
    open(os.path.join(side, "_DONE"), "w").close()


def run_incremental(prev_root: str, pages_path: str, dict_path: str,
                    out_root: str, *, cfg: kg.KgConfig | None = None,
                    num_buckets: int = 64) -> dict:
    """Update ``prev_root``'s checkpointed KG run to a new snapshot.

    Returns :func:`kg.run`'s result dict plus delta counters
    (``n_changed`` / ``n_reused`` / ``n_prev``)."""
    import ray

    from ..ops.join import hash_join

    cfg = cfg or kg.KgConfig()
    prev = CheckpointedRun(prev_root, resume=True)
    for stage in ("text", "triples", "linked"):
        if not prev.completed(stage):
            raise ValueError(
                f"previous run at {prev_root!r} has no committed "
                f"{stage!r} stage — incremental update needs a "
                f"checkpointed prior run")

    dict_table = kg._load_dictionary(dict_path)
    pages = kg._read_pages(pages_path, cfg)
    fingerprint = kg.stage_fingerprint(pages_path, pages.count(), cfg,
                                       dict_table)
    ckpt = CheckpointedRun(out_root, resume=True)

    # ---- stage: text (always fresh — it is the diff basis) ---------------
    def text_stage(tmp: str) -> dict:
        kg._write_stage(
            extract_text.apply(pages, batch_size=cfg.extract_batch_size),
            tmp, kg._text_schema(cfg.verify_text))
        return {}

    ckpt.run_stage("text", text_stage, fingerprint)
    text_dir = os.path.join(out_root, "text")

    # ---- per-url change detection ----------------------------------------
    # hash once → slim side artifact (disk-backed, distributed write);
    # the join then reads (url, 16 bytes) per row on both sides, and
    # the NEXT snapshot's update never re-reads this run's text at all
    for root in (out_root, prev_root):
        # backfill the prev run too: its hashes are computed here
        # anyway, and storing them upgrades any older full run so the
        # NEXT snapshot's diff reads only the slim tables
        if not os.path.exists(os.path.join(root, "text", _HASH_SIDE_DIR,
                                           "_DONE")):
            _store_hashes(root, _text_hashes(ray.data.read_parquet(
                os.path.join(root, "text"),
                columns=["url", "text", "lang", "quarantine_reason"])))
    from ..ops.hashagg import hash_aggregate

    # ONE row per url on each side before the diff: the side tables are
    # per page ROW, and a url that appears in several rows would
    # multiply through the join and could land in both 'changed' and
    # 'unchanged' (inflating edge weights via reused-plus-fresh
    # triples). Aggregating per url (hash = min over rows, n = row
    # count) keeps the join key unique; a url with n != 1 on either
    # side is conservatively classified CHANGED — its fresh extraction
    # covers every new row, exactly what a full run does.
    new_agg = hash_aggregate(
        _hashes_for_run(out_root), "url",
        [("th1", "min", "th1"), ("th2", "min", "th2"),
         ("th1", "count", "tn")], num_buckets=num_buckets)
    prev_agg = hash_aggregate(
        _hashes_for_run(prev_root), "url",
        [("th1", "min", "p1"), ("th2", "min", "p2"),
         ("th1", "count", "pn")], num_buckets=num_buckets)
    diff = hash_join(
        new_agg, prev_agg, on="url", how="left", num_buckets=num_buckets,
        left_schema=pa.schema([("url", pa.string()),
                               ("th1", pa.uint64()), ("th2", pa.uint64()),
                               ("tn", pa.int64())]),
        right_schema=pa.schema([("url", pa.string()),
                                ("p1", pa.uint64()), ("p2", pa.uint64()),
                                ("pn", pa.int64())]))

    import pyarrow.compute as pc

    def classify(t: pa.Table) -> pa.Table:
        same = pc.and_(pc.and_(pc.is_valid(t["p1"]),
                               pc.equal(t["th1"], t["p1"])),
                       pc.equal(t["th2"], t["p2"]))
        single = pc.and_(pc.equal(t["tn"], pa.scalar(1, pa.int64())),
                         pc.equal(pc.fill_null(t["pn"], 0),
                                  pa.scalar(1, pa.int64())))
        return pa.table({"url": t["url"],
                         "unchanged": pc.fill_null(pc.and_(same, single),
                                                   False)})

    verdict = diff.map_batches(classify, batch_format="pyarrow")
    flt = (lambda keep: lambda t:
           t.filter(pc.equal(t["unchanged"], keep)).select(["url"]))
    changed = verdict.map_batches(flt(False), batch_format="pyarrow")
    unchanged = verdict.map_batches(flt(True), batch_format="pyarrow")
    url_only = pa.schema([("url", pa.string())])
    n_changed = changed.count()
    n_reused = unchanged.count()

    # ---- stage: triples (reuse ∪ fresh) ----------------------------------
    def triples_stage(tmp: str) -> dict:
        reused = hash_join(
            ray.data.read_parquet(os.path.join(prev_root, "triples")),
            unchanged, on="url", how="semi", num_buckets=num_buckets,
            left_schema=triples.TRIPLES_OUT_SCHEMA, right_schema=url_only)
        fresh_text = hash_join(
            extract_text.clean_view(ray.data.read_parquet(text_dir)),
            changed, on="url", how="semi", num_buckets=num_buckets,
            left_schema=pa.schema(
                [f for f in kg._text_schema(cfg.verify_text)
                 if f.name != "quarantine_reason"]),
            right_schema=url_only)
        fresh = triples.apply(fresh_text,
                              concurrency=cfg.triples_concurrency,
                              batch_size=cfg.triples_batch_size,
                              lang=cfg.lang, extractor_cls=cfg.extractor_cls)
        kg._write_stage(reused.union(fresh).repartition(128), tmp,
                        triples.TRIPLES_OUT_SCHEMA)
        return {"reused_urls": n_reused, "fresh_urls": n_changed}

    ckpt.run_stage("triples", triples_stage, fingerprint)
    triples_dir = os.path.join(out_root, "triples")

    # ---- stage: linked (reuse ∪ fresh-link of the fresh triples) ---------
    def linked_stage(tmp: str) -> dict:
        dict_ref = ray.put(dict_table)
        reused = hash_join(
            ray.data.read_parquet(os.path.join(prev_root, "linked")),
            unchanged, on="url", how="semi", num_buckets=num_buckets,
            left_schema=kg._linked_schema(), right_schema=url_only)
        fresh_triples = hash_join(
            ray.data.read_parquet(triples_dir), changed, on="url",
            how="semi", num_buckets=num_buckets,
            left_schema=triples.TRIPLES_OUT_SCHEMA, right_schema=url_only)
        fresh = linker.apply(fresh_triples, dict_ref=dict_ref,
                             concurrency=cfg.link_concurrency,
                             batch_size=cfg.link_batch_size)
        kg._write_stage(reused.union(fresh).repartition(128), tmp,
                        kg._linked_schema())
        return {"reused_urls": n_reused, "fresh_urls": n_changed}

    ckpt.run_stage("linked", linked_stage, fingerprint)

    # ---- remaining stages: resume adopts the pre-committed prefix --------
    res = kg.run(pages_path, dict_path, out_root, cfg=cfg, resume=True,
                 checkpointed=True)
    res.update({"n_changed": n_changed, "n_reused": n_reused,
                "n_prev": prev.manifest("text").get("rows")
                if prev.manifest("text") else None})
    return res
