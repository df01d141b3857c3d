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
"""

from __future__ import annotations

import os

import pyarrow as pa

from ..stages import extract_text, linker, triples
from ..state.checkpoint import CheckpointedRun
from . import kg


def _text_hashes(text_stage_ds):
    """Committed text-stage rows → (url, th) where ``th`` is the
    sha1 over everything the downstream stages can see: extracted
    text, lang (the triples gate), and the quarantine verdict."""
    import hashlib

    def to_hash(t: pa.Table) -> pa.Table:
        hs = []
        for u, tx, lg, q in zip(t["url"].to_pylist(),
                                t["text"].to_pylist(),
                                t["lang"].to_pylist(),
                                t["quarantine_reason"].to_pylist()):
            h = hashlib.sha1()
            for part in (tx, lg, q):
                h.update(b"\x1f" if part is None else part.encode())
                h.update(b"\x1e")
            hs.append(h.digest())
        return pa.table({"url": t["url"],
                         "th": pa.array(hs, pa.binary(20))})

    return text_stage_ds.map_batches(to_hash, batch_format="pyarrow")


_URL_TH = pa.schema([("url", pa.string()), ("th", pa.binary(20))])


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
    new_h = _text_hashes(ray.data.read_parquet(
        text_dir, columns=["url", "text", "lang", "quarantine_reason"]))
    prev_h = _text_hashes(ray.data.read_parquet(
        os.path.join(prev_root, "text"),
        columns=["url", "text", "lang", "quarantine_reason"])) \
        .map_batches(lambda t: t.rename_columns(["url", "th_prev"]),
                     batch_format="pyarrow")
    diff = hash_join(
        new_h, prev_h, on="url", how="left", num_buckets=num_buckets,
        left_schema=_URL_TH,
        right_schema=pa.schema([("url", pa.string()),
                                ("th_prev", pa.binary(20))]))

    import pyarrow.compute as pc

    def classify(t: pa.Table) -> pa.Table:
        same = pc.and_(pc.is_valid(t["th_prev"]),
                       pc.equal(t["th"], t["th_prev"]))
        return pa.table({"url": t["url"],
                         "unchanged": pc.fill_null(same, False)})

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
