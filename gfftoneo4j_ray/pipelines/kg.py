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
    extract_batch_size: int = 1024
    triples_concurrency: int | tuple = (1, 4)
    triples_batch_size: int = 512
    link_concurrency: int | tuple = (1, 4)
    link_batch_size: int = 1024
    canon_concurrency: int | tuple = (1, 4)
    salt_buckets: int = 16
    input_columns: tuple = ("url", "warc_ts", "html", "lang")
    emit_order_edges: bool = True


def _read_pages(pages_path: str, cfg: KgConfig):
    import ray

    # prune at the read: never load the input `text` column — the engine
    # recomputes it (and verifies byte-identity downstream in tests)
    return ray.data.read_parquet(pages_path, columns=list(cfg.input_columns))


def _load_dictionary(dict_path: str) -> pa.Table:
    import pyarrow.parquet as pq

    return pq.read_table(dict_path)


def mention_counts(canon_ds, salt_buckets: int) -> dict:
    """entity node_id → mention count, via salted two-phase aggregation."""
    def explode(t: pa.Table) -> pa.Table:
        col = pa.concat_arrays([
            t.column("subj_node_id").combine_chunks(),
            t.column("obj_node_id").combine_chunks(),
        ])
        return pa.table({"node_id": col})

    ds = canon_ds.map_batches(explode, batch_format="pyarrow")
    agg = canonicalize.aggregate_counts(ds, "node_id", salt_buckets=salt_buckets)
    out = {}
    for b in agg.iter_batches(batch_format="pyarrow", batch_size=65536):
        for nid, n in zip(b.column("node_id").to_pylist(),
                          b.column("n").to_pylist()):
            out[nid] = int(n)
    return out


def run(pages_path: str, dict_path: str, out_root: str, *,
        cfg: KgConfig | None = None, resume: bool = True,
        checkpointed: bool = True) -> dict:
    """Run the full KG pipeline; returns paths + summary counters."""
    import ray

    cfg = cfg or KgConfig()
    ckpt = CheckpointedRun(out_root, resume=resume) if checkpointed else None
    dict_table = _load_dictionary(dict_path)
    dict_ref = ray.put(dict_table)

    pages = _read_pages(pages_path, cfg)
    fingerprint = f"{pages_path}:{pages.count()}"

    # ---- stage: text ------------------------------------------------------
    def text_stage(tmp: str) -> dict:
        extracted = extract_text.apply(pages, batch_size=cfg.extract_batch_size)
        clean, quar = extract_text.split_quarantine(extracted)
        clean.write_parquet(tmp)
        qrows = quar.take_all()
        ckpt.write_lineage("text_quarantine", qrows)
        return {"quarantined": len(qrows)}

    if ckpt:
        text_ds = ckpt.run_stage("text", text_stage, fingerprint)
    else:
        text_ds, _ = extract_text.split_quarantine(
            extract_text.apply(pages, batch_size=cfg.extract_batch_size))

    # ---- stage: triples ---------------------------------------------------
    def triples_stage(tmp: str) -> dict:
        triples.apply(text_ds, concurrency=cfg.triples_concurrency,
                      batch_size=cfg.triples_batch_size,
                      lang=cfg.lang).write_parquet(tmp)
        return {}

    if ckpt:
        triples_ds = ckpt.run_stage("triples", triples_stage, fingerprint)
    else:
        triples_ds = triples.apply(text_ds, concurrency=cfg.triples_concurrency,
                                   batch_size=cfg.triples_batch_size,
                                   lang=cfg.lang)

    # ---- stage: linked ----------------------------------------------------
    def linked_stage(tmp: str) -> dict:
        linker.apply(triples_ds, dict_ref=dict_ref,
                     concurrency=cfg.link_concurrency,
                     batch_size=cfg.link_batch_size).write_parquet(tmp)
        return {}

    if ckpt:
        linked_ds = ckpt.run_stage("linked", linked_stage, fingerprint)
    else:
        linked_ds = linker.apply(triples_ds, dict_ref=dict_ref,
                                 concurrency=cfg.link_concurrency,
                                 batch_size=cfg.link_batch_size)
        # the streaming path consumes linked twice (mapping + canon);
        # materialize once so extraction/linking doesn't run twice
        linked_ds = linked_ds.materialize()

    # ---- canonical mapping (driver-small, dictionary-bounded) -------------
    mapping = canonicalize.build_canonical_mapping(linked_ds)
    canon_ds = canonicalize.apply(linked_ds, mapping,
                                  concurrency=cfg.canon_concurrency)

    if ckpt:
        def canon_stage(tmp: str) -> dict:
            canon_ds.write_parquet(tmp)
            return {"canonical_entities": len({v[1] for v in mapping.values()})}
        canon_committed = ckpt.run_stage("canonical", canon_stage, fingerprint)
    else:
        # consumed by three sinks (counts, edges, nil nodes) — pin once
        canon_committed = canon_ds.materialize()

    # ---- graph ------------------------------------------------------------
    counts = mention_counts(canon_committed, cfg.salt_buckets)
    type_of = dict(zip(dict_table.column("entity_key").to_pylist(),
                       dict_table.column("entity_type").to_pylist()))

    known_ids = {nid for _, nid in mapping.values()}
    ent_nodes = ray.data.from_arrow(
        graph.entity_nodes_from_mapping(mapping, counts, type_of))
    nodes_ds = ent_nodes.union(graph.page_nodes(text_ds)) \
                        .union(graph.nil_entity_nodes(canon_committed, known_ids))

    edge_partials = canon_committed.map_batches(
        graph.emit_asserts_mentions_alias, batch_format="pyarrow")
    if cfg.emit_order_edges:
        order = graph.order_edges(text_ds).map_batches(
            lambda t: t.rename_columns(["src", "dst", "type", "pred", "w"]),
            batch_format="pyarrow")
        edge_partials = edge_partials.union(order)
    edges_ds = graph.finalize_edges(edge_partials)

    nodes_dir = os.path.join(out_root, "nodes")
    edges_dir = os.path.join(out_root, "edges")
    if ckpt:
        def nodes_stage(tmp: str) -> dict:
            nodes_ds.sort("node_id").write_parquet(tmp)
            return {}
        def edges_stage(tmp: str) -> dict:
            edges_ds.sort(["src", "type", "dst"]).write_parquet(tmp)
            return {}
        ckpt.run_stage("nodes", nodes_stage, fingerprint)
        ckpt.run_stage("edges", edges_stage, fingerprint)
    else:
        os.makedirs(out_root, exist_ok=True)
        nodes_ds.sort("node_id").write_parquet(nodes_dir)
        edges_ds.sort(["src", "type", "dst"]).write_parquet(edges_dir)

    return {
        "out_root": out_root,
        "nodes_dir": nodes_dir if not ckpt else os.path.join(out_root, "nodes"),
        "edges_dir": edges_dir if not ckpt else os.path.join(out_root, "edges"),
        "n_canonical_entities": len({v[1] for v in mapping.values()}),
    }


def graph_datasets(result: dict):
    """Re-open the committed node/edge tables of a finished run."""
    import ray

    return (ray.data.read_parquet(result["nodes_dir"]),
            ray.data.read_parquet(result["edges_dir"]))
