"""The flagship pipeline: pages → text → triples → linking → canon → graph.

Composition of every stage (SURVEY.md §3.4 lifecycle), in two modes:

  * ``checkpointed=True`` (default): each stage commits Parquet under
    ``out_root/{stage}`` with a _SUCCESS manifest; ``resume=True``
    skips completed stages — the mid-pipeline resume contract.
  * ``checkpointed=False``: one lazy streaming composition, only the
    final node/edge tables are written — the max-throughput path.

Reference anchor for the overall spine: Application.importGffFile
(reference: src/main/scala/corwur/Application.scala:30-40) — read →
parse → group → assemble → sink — with each arrow re-expressed as a
Ray Data primitive and the two driver-side smalls (alias mapping,
entity node table) bounded by the dictionary universe, not the corpus.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import pyarrow as pa

from ..stages import canonicalize, extract_text, graph, linker, triples
from ..state.checkpoint import CheckpointedRun


@dataclass
class KgConfig:
    """Per-stage sizing knobs (defaults tuned for a 32-cpu node; on a
    cluster, scale ``*_concurrency`` with total cores)."""

    lang: str | None = "en"
    extract_batch_size: int = 2048
    triples_concurrency: int | tuple = (1, 4)
    triples_batch_size: int = 2048
    link_concurrency: int | tuple = (1, 4)
    link_batch_size: int = 8192
    canon_concurrency: int | tuple = (1, 4)
    canon_batch_size: int = 4096
    # extraction strategy (profile surface); None = stages.triples.TripleExtractor
    extractor_cls: type | None = None
    # html→text extractor (profile surface); None = the spec extractor
    # (functions.text.extract_text_safe), or e.g.
    # functions.boilerplate.extract_main_text_safe for real-web HTML
    text_extractor: object = None
    input_columns: tuple = ("url", "warc_ts", "html", "lang")
    # read the input's reference `text` column too and record the
    # per-row byte-identity invariant into lineage (input_hint)
    verify_text: bool = False
    emit_order_edges: bool = True
    # blocks for the input read; ≥ 8× cluster cores keeps every core fed
    # (None = Ray's row-group-based default)
    override_num_blocks: int | None = None
    # range buckets (= part files = reduce parallelism) of the final
    # node/edge sinks; power of two ≤ 256. None = sized to the cluster
    # (2×CPU, clamped) together with a pre-exchange coalesce — the
    # exchange's O(blocks × buckets) object count, not row volume,
    # dominates sink wall time when the product explodes (see
    # graph.sink_geometry)
    sink_buckets: int | None = None


def _read_pages(pages_path: str, cfg: KgConfig):
    import ray

    # prune at the read: never load the input `text` column — the engine
    # recomputes it (and verifies byte-identity downstream in tests)
    kwargs = {}
    if cfg.override_num_blocks:
        kwargs["override_num_blocks"] = cfg.override_num_blocks
    return ray.data.read_parquet(pages_path, columns=list(cfg.input_columns),
                                 **kwargs)


def _load_dictionary(dict_path: str) -> pa.Table:
    import pyarrow.parquet as pq

    return pq.read_table(dict_path)


def _text_schema(verify_text: bool) -> pa.Schema:
    fields = [("url", pa.string()), ("warc_ts", pa.timestamp("us")),
              ("text", pa.string()), ("lang", pa.string()),
              ("quarantine_reason", pa.string())]
    if verify_text:
        fields.append(("text_match", pa.bool_()))
    return pa.schema(fields)


def _linked_schema() -> pa.Schema:
    from ..stages.triples import TRIPLES_OUT_SCHEMA

    fields = [f for f in TRIPLES_OUT_SCHEMA if f.name != "sent"]
    for side in ("subj", "obj"):
        fields += [pa.field(f"{side}_key", pa.string()),
                   pa.field(f"{side}_type", pa.string()),
                   pa.field(f"{side}_resolved", pa.bool_())]
    return pa.schema(fields)


def _canonical_schema() -> pa.Schema:
    fields = list(_linked_schema())
    for side in ("subj", "obj"):
        fields += [pa.field(f"{side}_canon", pa.string()),
                   pa.field(f"{side}_node_id", pa.string())]
    return pa.schema(fields)


def stage_fingerprint(pages_path: str, n_pages: int, cfg: KgConfig,
                      dict_table: pa.Table) -> str:
    """The stage-resume identity: input path + row count + committed
    stage-format version + extractor + dictionary identity. Bumping
    ``fmt`` invalidates checkpoints whose committed schema changed;
    the dictionary id keeps a resume with a different --dictionary
    from silently reusing links made with the old one. Shared with
    the incremental pipeline, which pre-commits delta-merged stages
    under this exact fingerprint so ``run(resume=True)`` adopts them."""
    import hashlib as _hl

    extractor_name = (cfg.extractor_cls or triples.TripleExtractor).__name__
    if cfg.text_extractor is not None:
        # a resume with a different html→text extractor must re-extract
        extractor_name += ":" + getattr(cfg.text_extractor, "__name__",
                                        repr(cfg.text_extractor))
    dict_id = _hl.sha1(
        b"\x00".join(k.encode() for k in
                     dict_table.column("entity_key").to_pylist())
    ).hexdigest()[:12]
    # fmt3: range-bucketed sorted parts + _mention_counts side file
    return (f"{pages_path}:{n_pages}:fmt3"
            f":vt{int(cfg.verify_text)}:{extractor_name}"
            f":dict{dict_table.num_rows}-{dict_id}")


def _write_stage(ds, tmp: str, fallback_schema: pa.Schema) -> None:
    """write_parquet + guarantee ≥1 schema-correct part file: Ray writes
    NOTHING for an empty dataset (e.g. all pages filtered by lang),
    which breaks every downstream reader of the committed stage."""
    ds.write_parquet(tmp, compression="zstd")
    if not any(f.endswith(".parquet") for f in os.listdir(tmp)):
        graph.write_empty_parts(tmp, fallback_schema)


def run(pages_path: str, dict_path: str, out_root: str, *,
        cfg: KgConfig | None = None, resume: bool = True,
        checkpointed: bool = True) -> dict:
    """Run the full KG pipeline; returns paths + summary counters.

    Set RAYKG_PROFILE=1 to print per-phase wall times to stderr."""
    import sys
    import time

    import ray

    _prof = os.environ.get("RAYKG_PROFILE")
    _last = time.perf_counter()

    def mark(label: str) -> None:
        nonlocal _last
        now = time.perf_counter()
        if _prof:
            print(f"[kg] {label}: {now - _last:.2f}s", file=sys.stderr,
                  flush=True)
        _last = now

    cfg = cfg or KgConfig()
    ckpt = CheckpointedRun(out_root, resume=resume) if checkpointed else None
    dict_table = _load_dictionary(dict_path)
    dict_ref = ray.put(dict_table)

    if cfg.verify_text and "text" not in cfg.input_columns:
        cfg.input_columns = tuple(cfg.input_columns) + ("text",)
    pages = _read_pages(pages_path, cfg)

    if pages.count() == 0:
        # empty input → schema-correct empty graph, through the normal
        # commit machinery so stale outputs are cleared and the
        # _SUCCESS/manifest contract holds
        import shutil as _shutil

        nodes_dir = os.path.join(out_root, "nodes")
        edges_dir = os.path.join(out_root, "edges")
        empty_fp = f"{pages_path}:0:empty"
        if ckpt:
            ckpt.run_stage(
                "nodes",
                lambda tmp: graph.write_empty_parts(tmp, graph.NODES_SCHEMA),
                empty_fp)
            ckpt.run_stage(
                "edges",
                lambda tmp: graph.write_empty_parts(tmp, graph.EDGES_SCHEMA),
                empty_fp)
        else:
            for d, schema in ((nodes_dir, graph.NODES_SCHEMA),
                              (edges_dir, graph.EDGES_SCHEMA)):
                _shutil.rmtree(d, ignore_errors=True)
                graph.write_empty_parts(d, schema)
        return {"out_root": out_root, "nodes_dir": nodes_dir,
                "edges_dir": edges_dir, "n_canonical_entities": 0}
    # fingerprint = input identity + stage-format version: bumping the
    # version invalidates checkpoints whose committed schema changed.
    # The dictionary identity is included so a resume with a different
    # --dictionary cannot silently reuse links made with the old one.
    fingerprint = stage_fingerprint(pages_path, pages.count(), cfg,
                                    dict_table)

    # ---- stage: text ------------------------------------------------------
    # ONE extraction pass: commit ALL rows (clean + quarantined, with the
    # reason column); the clean/quarantine views are cheap column-pruned
    # filters over the committed Parquet — never a second extraction.
    def text_stage(tmp: str) -> dict:
        _write_stage(extract_text.apply(pages,
                                        batch_size=cfg.extract_batch_size,
                                        extractor=cfg.text_extractor),
                     tmp, _text_schema(cfg.verify_text))
        return {}

    if ckpt:
        extracted_ds = ckpt.run_stage("text", text_stage, fingerprint)
        # quarantine accounting: column-pruned read of the committed stage
        qrows = extract_text.quarantine_view(
            ray.data.read_parquet(os.path.join(out_root, "text"),
                                  columns=["url", "quarantine_reason"])
        ).take_all()
        ckpt.write_lineage("text_quarantine", qrows)
        if cfg.verify_text:
            import pyarrow.compute as pc

            mism = ray.data.read_parquet(
                os.path.join(out_root, "text"),
                columns=["url", "text_match", "quarantine_reason"]
            ).map_batches(
                lambda t: t.filter(pc.and_(
                    pc.is_null(t["quarantine_reason"]),
                    pc.invert(pc.fill_null(t["text_match"], True)))
                ).select(["url"]),
                batch_format="pyarrow").take_all()
            ckpt.write_lineage("text_mismatch", mism)
        text_ds = extract_text.clean_view(extracted_ds)
    else:
        # two consumers downstream (fused triples+link, page metadata) —
        # pin the extracted corpus once (object store spills if needed);
        # the checkpointed mode is the disk-backed equivalent at scale.
        # (Fusing extraction into the link pool and shipping page rows
        # as a tagged union was measured SLOWER at 3.2M pages / 16
        # cpus — 39 s vs 32-35 s — because every union consumer then
        # re-scans the interleaved page rows; the separate task-
        # parallel text pass stays.)
        text_ds = extract_text.clean_view(
            extract_text.apply(pages,
                               batch_size=cfg.extract_batch_size,
                               extractor=cfg.text_extractor)).materialize()

    mark("text")

    # ---- stage: triples ---------------------------------------------------
    def triples_stage(tmp: str) -> dict:
        from ..stages.triples import TRIPLES_OUT_SCHEMA

        _write_stage(triples.apply(text_ds,
                                   concurrency=cfg.triples_concurrency,
                                   batch_size=cfg.triples_batch_size,
                                   lang=cfg.lang,
                                   extractor_cls=cfg.extractor_cls)
                     .repartition(128),
                     tmp, TRIPLES_OUT_SCHEMA)
        return {}

    if ckpt:
        triples_ds = ckpt.run_stage("triples", triples_stage, fingerprint)
    else:
        triples_ds = None   # streaming fuses triple extraction into the
        # link pool (apply_fused below)

    # ---- stage: linked ----------------------------------------------------
    def linked_stage(tmp: str) -> dict:
        _write_stage(linker.apply(triples_ds, dict_ref=dict_ref,
                                  concurrency=cfg.link_concurrency,
                                  batch_size=cfg.link_batch_size)
                     .repartition(128), tmp, _linked_schema())
        return {}

    if ckpt:
        linked_ds = ckpt.run_stage("linked", linked_stage, fingerprint)
        mark("triples+linked")
    else:
        # streaming: the ONE fused extract+link actor pool is created
        # and drained inside the sink section below — its pinned block
        # refs feed the mapping's map side AND the sink emit wave
        # directly, with no repartition/materialize barrier between
        # the link stream and the sink exchange.
        linked_ds = None

    # ---- canonical mapping (driver-small, dictionary-bounded) -------------
    if ckpt:
        mapping = canonicalize.build_canonical_mapping(linked_ds)
        map_ref = ray.put(mapping)
        mark("mapping")

        canon_ds = canonicalize.apply(linked_ds, mapping,
                                      concurrency=cfg.canon_concurrency)

        def canon_stage(tmp: str) -> dict:
            _write_stage(canon_ds.repartition(128), tmp, _canonical_schema())
            return {"canonical_entities": len({v[1] for v in mapping.values()})}
        canon_committed = ckpt.run_stage("canonical", canon_stage, fingerprint)
        mark("canon")
    else:
        # streaming: NO materialized canonical table at all — the
        # mapping lookup is fused into the sink emit wave over the
        # pinned linked blocks (graph.launch_emit_splits below). The
        # checkpointed mode keeps the committed full-width canonical
        # stage for resume granularity.
        canon_committed = None

    # ---- graph ------------------------------------------------------------
    sink_buckets, sink_coalesce = graph.sink_geometry(cfg.sink_buckets)
    type_of = dict(zip(dict_table.column("entity_key").to_pylist(),
                       dict_table.column("entity_type").to_pylist()))

    # page metadata consumers (page nodes, order edges) need only
    # (url, warc_ts) — column-pruned re-read of the committed text
    # stage, never the text payload
    if ckpt:
        page_meta = extract_text.clean_view(ray.data.read_parquet(
            os.path.join(out_root, "text"),
            columns=["url", "warc_ts", "quarantine_reason"]))
    else:
        page_meta = text_ds.select_columns(["url", "warc_ts"])
    page_meta = page_meta.repartition(sink_coalesce)

    # edges first: the deduped `mentions` edge weights double as the
    # per-entity mention counts (one aggregation instead of two)
    if ckpt:
        edge_partials = canon_committed.map_batches(
            graph.emit_asserts_mentions_alias, batch_format="pyarrow")
        if cfg.emit_order_edges:
            order = graph.order_edges(page_meta).map_batches(
                lambda t: t.rename_columns(
                    ["src", "dst", "type", "pred", "w"]),
                batch_format="pyarrow")
            edge_partials = edge_partials.union(order)

    nodes_dir = os.path.join(out_root, "nodes")
    edges_dir = os.path.join(out_root, "edges")
    _settle_fsspec_http()
    import shutil as _shutil

    # fused edge sink: dedup + sort + sorted-part write + mention-count
    # partials in ONE exchange, input consumed once (no materialize, no
    # separate counts pass, no sample+sort) — see graph.py
    if ckpt:
        known_ids = {nid for _, nid in mapping.values()}

        def edges_stage(tmp: str) -> dict:
            n, _ = graph.finalize_sort_write_edges(
                edge_partials, tmp, known_ids, num_buckets=sink_buckets,
                coalesce_blocks=sink_coalesce)
            return {"edges": n}
        ckpt.run_stage("edges", edges_stage, fingerprint)
        counts = graph.load_mention_counts(edges_dir)
        mark("edges sink")

        ent_nodes = ray.data.from_arrow(
            graph.entity_nodes_from_mapping(mapping, counts, type_of))
        # NIL partials flow straight into the sink exchange (dedup_key):
        # no separate distinct exchange, and the whole nodes pipeline is
        # one lazy pass ending in the range-sorted sink
        nil_partials = graph.nil_entity_node_partials(canon_committed,
                                                      known_ids)
        nodes_ds = ent_nodes.union(graph.page_nodes(page_meta)) \
            .union(nil_partials)

        def nodes_stage(tmp: str) -> dict:
            n = graph.range_sorted_write(nodes_ds, "node_id", ["node_id"],
                                         tmp, graph.NODES_SCHEMA,
                                         graph.encode_nodes_hex,
                                         num_buckets=sink_buckets,
                                         dedup_key=True,
                                         coalesce_blocks=sink_coalesce)
            return {"nodes": n}
        ckpt.run_stage("nodes", nodes_stage, fingerprint)
        mark("nodes sink")
    else:
        os.makedirs(out_root, exist_ok=True)
        # clear stale parts: a rerun into the same out_root must not
        # mix old and new rows
        _shutil.rmtree(edges_dir, ignore_errors=True)
        _shutil.rmtree(nodes_dir, ignore_errors=True)

        # STREAMING graph sink with NO driver barrier between the link
        # stream and the sink exchange:
        #   * the fused extract+link stream drains ONCE into pinned
        #     block refs; the canonical mapping's map side (distinct
        #     (surface, entity_key) pair partials) launches as blocks
        #     land, so when the stream ends only the alias-bounded
        #     pair exchange + driver merge remain
        #     (canonicalize.launch_pair_partials);
        #   * page-side partials (page nodes + order edges — they need
        #     no mapping) tag+split in a worker thread CONCURRENTLY
        #     with the link stream (the sanctioned two-upstream overlap,
        #     ops/exchange.py module doc);
        #   * edge/NIL-node partial emission then runs as ONE fused
        #     emit+tag+split raw-task wave directly over the pinned
        #     refs (graph.launch_emit_splits) — no linked
        #     repartition/materialize AllToAll, no second linked scan
        #     for the mapping, no actor-pool startup between the link
        #     stream and the sink exchange.
        # Downstream, the dictionary-bounded entity/alias node table is
        # built by ONE task fed by the edge buckets' count partials and
        # sliced per node bucket; each node bucket's merge+write fires
        # the moment its sorted partials and entity slice are ready.
        # The only driver waits are the link stream, the (small) pair
        # exchange, and the final ray.get.
        import threading

        from ..ops.exchange import split_refs

        B = sink_buckets
        page_splits: list = []
        page_err: list = []

        def _page_side() -> None:
            try:
                parts = graph.page_node_partials(page_meta)
                if cfg.emit_order_edges:
                    order = graph.order_edges(page_meta).map_batches(
                        lambda t: graph._tag_edges(t.rename_columns(
                            ["src", "dst", "type", "pred", "w"])),
                        batch_format="pyarrow")
                    parts = parts.union(order)
                bucketed = parts.map_batches(
                    lambda t: graph._tag_bucket_table(t, B),
                    batch_format="pyarrow")
                page_splits.extend(split_refs(bucketed, 2 * B))
            except BaseException as e:  # noqa: BLE001 — re-raised on join
                page_err.append(e)

        th = threading.Thread(target=_page_side, name="page-side-splits")
        th.start()

        linked = linker.apply_fused(
            text_ds, dict_ref=dict_ref, lang=cfg.lang,
            concurrency=cfg.link_concurrency,
            batch_size=cfg.triples_batch_size,
            extractor_cls=cfg.extractor_cls)
        block_refs, block_rows, pair_refs = [], [], []
        comp_refs: list = []  # second-level pair compressions
        group: list = []
        for bundle in linked.iter_internal_ref_bundles():
            for blk, bmeta in bundle.blocks:
                if not bmeta.num_rows:
                    # empty blocks (possibly zero-column Ray sentinels,
                    # e.g. every page filtered by the lang gate) carry
                    # nothing and may lack the linked schema — skip
                    continue
                block_refs.append(blk)
                block_rows.append(bmeta.num_rows)
                group.append(blk)
                if len(group) >= 32:
                    pair_refs.append(
                        canonicalize.launch_pair_partials(group))
                    group = []
                    if len(pair_refs) >= 8:
                        # compress DURING the stream: after it drains,
                        # only a tiny driver union-find merge remains
                        comp_refs.append(
                            canonicalize.launch_pair_compress(pair_refs))
                        pair_refs = []
        if group:
            pair_refs.append(canonicalize.launch_pair_partials(group))
        if pair_refs:
            comp_refs.append(canonicalize.launch_pair_compress(pair_refs))
        mark("link stream")

        mapping = canonicalize.mapping_from_compressed(comp_refs)
        map_ref = ray.put(mapping)
        known_ids = {nid for _, nid in mapping.values()}
        mark("mapping")

        emit_splits, count_refs = graph.launch_emit_splits(
            map_ref, block_refs, block_rows, B, sink_coalesce)
        th.join()
        if page_err:
            raise page_err[0]
        edge_refs, n1 = graph.launch_graph_sink_from_splits(
            page_splits + emit_splits, edges_dir, known_ids, B)
        mark("sink upstreams")

        # the mention-count partials come from the EMIT wave (map-side
        # sums — same totals as the per-bucket aggregates), so the
        # entity build + node merges overlap the edge sort+write IO;
        # edge_refs must then be awaited explicitly in the final gather
        ent = graph.launch_entity_node_slices(map_ref, type_of,
                                              count_refs, B)
        writes = graph.launch_merge_write_nodes(n1, ent, nodes_dir, B)
        side = graph.launch_counts_side_file(edges_dir, count_refs)
        ray.get(writes + [side] + edge_refs)
        del block_refs  # release the pinned linked blocks
        for d, schema in ((edges_dir, graph.EDGES_SCHEMA),
                          (nodes_dir, graph.NODES_SCHEMA)):
            if not any(f.endswith(".parquet") and not f.startswith("_")
                       for f in os.listdir(d)):
                graph.write_empty_parts(d, schema)
        mark("graph sinks")

    return {
        "out_root": out_root,
        "nodes_dir": nodes_dir if not ckpt else os.path.join(out_root, "nodes"),
        "edges_dir": edges_dir if not ckpt else os.path.join(out_root, "edges"),
        "n_canonical_entities": len({v[1] for v in mapping.values()}),
    }


def _settle_fsspec_http() -> None:
    """Pre-settle ``fsspec.implementations.http`` before threaded writes.

    Ray's write path probes this module (absent aiohttp it raises
    ModuleNotFoundError, which Ray handles). Two concurrent FIRST
    probes from worker threads can observe a partially-initialized
    module and raise a bare ImportError Ray does not handle — probe
    once on the main thread; if the probe fails, cache a minimal stub
    (only ever used in an isinstance check) so later probes are
    deterministic."""
    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
    except ModuleNotFoundError:
        import sys
        import types

        m = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # minimal stand-in for isinstance checks
            pass

        m.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = m
    except ImportError:
        pass


def graph_datasets(result: dict):
    """Re-open the committed node/edge tables of a finished run."""
    import ray

    return (ray.data.read_parquet(result["nodes_dir"]),
            ray.data.read_parquet(result["edges_dir"]))
