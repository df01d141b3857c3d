"""Generate the committed golden parquet artifacts for the driver's
DuckDB oracle (see __ray_entry__.oracle_sql):

  * kg_nodes / kg_edges  — from the SEQUENTIAL reference engine
    (gfftoneo4j_ray/compat/seqref.py): one process, no Ray shuffles;
    the distributed pipeline must reproduce it bit-for-bit.
  * simhash / fingerprint / langid — from the pure per-doc functions
    (determinism goldens: the distributed map must equal the local
    function application).

Run from the repo root after any change to the pages generator or to
one of the underlying kernels:

    python tools/make_goldens.py

Goldens are pinned to the driver's correctness scale factor
(/root/testdata/sf0.01) — the side-by-side oracle comparison runs at
that scale only.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.01"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "gfftoneo4j_ray", "goldens")


def main() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from gfftoneo4j_ray.compat.seqref import sequential_kg_build
    from gfftoneo4j_ray.functions.hashing import fingerprint64
    from gfftoneo4j_ray.functions.textstats import lang_id
    from gfftoneo4j_ray.gen.pages import dictionary_table
    from gfftoneo4j_ray.sources.pages import derive_pages
    from gfftoneo4j_ray.stages.dedup import simhash64

    os.makedirs(OUT, exist_ok=True)

    # --- kg goldens (sequential reference build) ---------------------------
    pages = derive_pages(SF).to_pandas().to_dict("records")
    nodes, edges = sequential_kg_build(pages, dictionary_table())
    pq.write_table(nodes.select(["node_id", "label", "key", "entity_type",
                                 "n_mentions"]),
                   os.path.join(OUT, "sf0_01_kg_nodes.parquet"))
    pq.write_table(edges, os.path.join(OUT, "sf0_01_kg_edges.parquet"))
    print("kg goldens:", nodes.num_rows, "nodes,", edges.num_rows, "edges")

    # --- kg_triples golden (sequential single-batch extraction) ------------
    # the sequential form of __ray_entry__.q_kg_triples: extract text,
    # drop quarantined pages, lang-gate to "en", run the SAME
    # TripleExtractor kernel over ONE batch in one process — the
    # distributed map_batches assembly must reproduce it exactly.
    from gfftoneo4j_ray.functions.text import extract_text_safe
    from gfftoneo4j_ray.stages.triples import TripleExtractor

    clean = []
    for p in pages:
        text, reason = extract_text_safe(p["html"])
        if reason is None and p["lang"] == "en":
            clean.append((p["url"], text))
    tri = TripleExtractor()(pa.table({
        "url": pa.array([u for u, _ in clean], pa.string()),
        "text": pa.array([t for _, t in clean], pa.string()),
        "lang": pa.array(["en"] * len(clean), pa.string()),
    }))
    pq.write_table(tri.select(["url", "sent_idx", "subj", "pred", "obj"]),
                   os.path.join(OUT, "sf0_01_kg_triples.parquet"))
    print("kg_triples golden:", tri.num_rows, "triples")

    # --- multimodal goldens (deterministic fake featurizer/sampler) --------
    from gfftoneo4j_ray.stages.multimodal import FrameSampler, PayloadFeaturizer

    pages_t = pa.table({
        "url": pa.array([p["url"] for p in pages], pa.string()),
        "html": pa.array([p["html"] for p in pages], pa.binary()),
    })
    feats = PayloadFeaturizer()(pages_t)
    pq.write_table(feats.select(["url", "n_bytes", "payload_sha1"]),
                   os.path.join(OUT, "sf0_01_mm_features.parquet"))
    frames = FrameSampler()(pages_t)
    pq.write_table(frames.select(["url", "frame_idx", "frame_sha1"]),
                   os.path.join(OUT, "sf0_01_mm_frames.parquet"))
    print("mm goldens:", feats.num_rows, "features,", frames.num_rows,
          "frames")

    # --- per-doc function goldens ------------------------------------------
    docs = pq.read_table(os.path.join(SF, "documents.parquet"),
                         columns=["doc_id", "text"])
    ids = docs["doc_id"].to_pylist()
    texts = docs["text"].to_pylist()
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "simhash": pa.array([simhash64(t or "") for t in texts], pa.int64()),
    }), os.path.join(OUT, "sf0_01_simhash.parquet"))
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "fingerprint": pa.array([fingerprint64(t or "") for t in texts],
                                pa.int64()),
    }), os.path.join(OUT, "sf0_01_fingerprint.parquet"))
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "lang_pred": pa.array([lang_id(t or "") for t in texts], pa.string()),
    }), os.path.join(OUT, "sf0_01_langid.parquet"))
    print("doc-function goldens:", len(ids), "docs")
    ray.shutdown()


if __name__ == "__main__":
    main()
