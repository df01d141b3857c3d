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

    # --- k-core golden (q_kg_analytics 'kcore' slice): SEQUENTIAL,
    # INDEPENDENT Batagelj-Zaversnik peel over the golden edges'
    # undirected distinct view — the distributed h-index fixpoint
    # (ops/graph_algos.py::core_numbers) must reproduce the integer
    # coreness exactly ------------------------------------------------
    import collections as _col

    adj: dict = _col.defaultdict(set)
    for s, d in zip(edges["src"].to_pylist(), edges["dst"].to_pylist()):
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    rem = {v: len(ns) for v, ns in adj.items()}
    core: dict = {}
    peak = 0
    while rem:
        v = min(rem, key=lambda x: (rem[x], x))
        peak = max(peak, rem[v])
        core[v] = peak
        for u in adj[v]:
            if u in rem and u != v:
                rem[u] -= 1
        del rem[v]
    knodes = sorted(core)
    pq.write_table(pa.table({
        "node": pa.array(knodes, pa.string()),
        "core": pa.array([core[k] for k in knodes], pa.int64()),
    }), os.path.join(OUT, "sf0_01_kcore.parquet"))
    print("kcore golden:", len(knodes), "nodes, max core",
          max(core.values(), default=0))

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

    # kg_triples_pr golden: the P/R-vs-oracle-extractor artifact's
    # asserted fixed point — the distributed extraction must match the
    # sequential oracle set exactly at this scale (P = R = 1), so any
    # divergence (missed page, extra/dropped triple) flips a count and
    # fails the value hash.
    nt = tri.num_rows
    pq.write_table(pa.table({
        "n_expected": pa.array([nt], pa.int64()),
        "n_got": pa.array([nt], pa.int64()),
        "n_match": pa.array([nt], pa.int64()),
        "precision_c": pa.array([10000], pa.int64()),
        "recall_c": pa.array([10000], pa.int64()),
    }), os.path.join(OUT, "sf0_01_kg_pr.parquet"))

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

    # --- corpus-prep goldens (q_corpus_prep 'pack' and 'mixture'
    # slices): SEQUENTIAL, INDEPENDENT reimplementations of the two
    # non-SQL-expressible ops — a plain-python FFD pass per doc-id-hash
    # bucket and a driver-side pandas-siphash keep decision — so the
    # committed rows pin distributed == sequential, not merely
    # run-to-run determinism ------------------------------------------
    import re as _re

    import numpy as np
    import pandas as pd

    docs_pd = pq.read_table(os.path.join(SF, "documents.parquet"),
                            columns=["doc_id", "text", "source"]).to_pandas()
    B, budget = 32, 2048  # must match q_corpus_prep's pack_sequences call
    ntok = docs_pd["text"].map(
        lambda t: len([x for x in _re.split(r"\s+", t or "") if x])) \
        .astype("int64")
    bucket = (docs_pd["doc_id"].to_numpy().astype(np.uint64)
              % np.uint64(B)).astype(int)
    rows = []
    for b in range(B):
        sub = pd.DataFrame({"doc_id": docs_pd.loc[bucket == b, "doc_id"],
                            "n_tokens": ntok[bucket == b]})
        sub = sub.sort_values(["n_tokens", "doc_id"],
                              ascending=[False, True], kind="mergesort")
        fills: list[int] = []
        for did, n in zip(sub["doc_id"], sub["n_tokens"]):
            n = int(n)
            for i in range(len(fills)):      # first fit
                if fills[i] + n <= budget:
                    fills[i] += n
                    idx = i
                    break
            else:
                fills.append(n)
                idx = len(fills) - 1
            rows.append(((b << 32) + idx, int(did), n))
    pq.write_table(pa.table({
        "pack_id": pa.array([r[0] for r in rows], pa.int64()),
        "doc_id": pa.array([r[1] for r in rows], pa.int64()),
        "n_tokens": pa.array([r[2] for r in rows], pa.int64()),
    }), os.path.join(OUT, "sf0_01_pack.parquet"))
    print("pack golden:", len(rows), "assignments,",
          len({r[0] for r in rows}), "packs")

    rates = {f"src{i}": i / 20 for i in range(20)}  # must match q_corpus_prep
    h = pd.util.hash_pandas_object(
        pd.Series(docs_pd["doc_id"].tolist(), dtype="object"), index=False,
        hash_key="raykg-stable-64b").to_numpy(np.uint64) % np.uint64(10000)
    thr = docs_pd["source"].map(
        lambda s: int(round(rates.get(s, 0.0) * 10000))).to_numpy(np.int64)
    keep = h.astype(np.int64) < thr
    mix = docs_pd.loc[keep, ["doc_id", "source"]]
    pq.write_table(pa.table({
        "doc_id": pa.array(mix["doc_id"].to_numpy(np.int64), pa.int64()),
        "source": pa.array(mix["source"].to_numpy(), pa.string()),
    }), os.path.join(OUT, "sf0_01_mixture.parquet"))
    print("mixture golden:", len(mix), "of", len(docs_pd), "kept")

    # --- quality-classifier golden (q_corpus_prep 'clf' slice):
    # SEQUENTIAL, INDEPENDENT plain dict/loop reimplementation of
    # hashed-BoW featurize → int64-quantized full-batch GD with
    # momentum → scoring. Must mirror ops/classifier.py's
    # q_quality_classifier constants (dim=256, iters=100, lr=8.0,
    # momentum=0.9) — the committed rows pin distributed TRAINING
    # bit-exact to sequential --------------------------------------
    from gfftoneo4j_ray.functions.hashing import stable_hash64
    from gfftoneo4j_ray.ops.classifier import (
        GRAD_SCALE, SCORE_SCALE, planted_weights)

    dim, iters, lr, mom = 256, 100, 8.0, 0.9
    feats = []
    for text in docs_pd.sort_values("doc_id")["text"].tolist():
        toks = [x for x in _re.split(r"[^a-z0-9_'-]+", (text or "").lower())
                if x]
        counts: dict[int, float] = {}
        for tok in toks:
            hh = int(stable_hash64([tok])[0]) % dim  # int() BEFORE mod
            counts[hh] = counts.get(hh, 0.0) + 1.0
        norm = np.sqrt(sum(v * v for v in counts.values())) or 1.0
        pairs = sorted((k, v / norm) for k, v in counts.items())
        pairs.append((dim, 1.0))
        feats.append(pairs)
    wstar = planted_weights(dim)
    ys = [1 if sum(v * wstar[k] for k, v in pairs) > 0 else 0
          for pairs in feats]
    w = np.zeros(dim + 1)
    vel = np.zeros(dim + 1)
    for _ in range(iters):
        grad = np.zeros(dim + 1, np.int64)
        for pairs, yi in zip(feats, ys):
            z = sum(v * w[k] for k, v in pairs)
            r = 1.0 / (1.0 + np.exp(-z)) - yi
            for k, v in pairs:
                grad[k] += np.int64(np.floor(v * r * GRAD_SCALE + 0.5))
        gf = grad.astype(np.float64) / GRAD_SCALE / len(feats)
        vel = mom * vel - lr * gf
        w = w + vel
    clf_ids = docs_pd.sort_values("doc_id")["doc_id"].tolist()
    score_c, pred = [], []
    for pairs in feats:
        z = sum(v * w[k] for k, v in pairs)
        p = 1.0 / (1.0 + np.exp(-z))
        score_c.append(int(np.floor(p * SCORE_SCALE + 0.5)))
        pred.append(1 if z > 0 else 0)
    pq.write_table(pa.table({
        "doc_id": pa.array(clf_ids, pa.int64()),
        "score_c": pa.array(score_c, pa.int64()),
        "pred": pa.array(pred, pa.int64()),
        "y": pa.array(ys, pa.int64()),
    }), os.path.join(OUT, "sf0_01_clf.parquet"))
    acc = sum(int(a == b) for a, b in zip(pred, ys)) / len(ys)
    print(f"clf golden: {len(ys)} docs, seq train accuracy {acc:.3f}")

    # --- HLL estimate golden (deterministic sketch; the oracle joins
    # this against a real SQL COUNT(DISTINCT) and recomputes err_c) ----
    from gfftoneo4j_ray.ops.windowed import hll_distinct

    ev = ray.data.read_parquet(os.path.join(SF, "events.parquet"),
                               columns=["event_type", "user_id"])
    est = hll_distinct(ev, key="user_id", group="event_type",
                       out_name="est_n").to_pandas().sort_values("event_type")
    pq.write_table(pa.table({
        "event_type": pa.array(est["event_type"], pa.string()),
        "est_n": pa.array(est["est_n"].astype("int64")),
    }), os.path.join(OUT, "sf0_01_hll_users.parquet"))
    print("hll golden:", len(est), "groups")

    # --- ANN recall golden --------------------------------------------
    # The exact top-k side is recomputed here with PLAIN NUMPY over the
    # whole embeddings table (independent of the distributed
    # brute_force_topk merge); LSH/IVF run through the library. The
    # committed rows therefore pin BOTH the approximate methods'
    # determinism and the distributed exact path's agreement with a
    # one-process matmul.
    import math

    import numpy as np

    from gfftoneo4j_ray.stages.similarity import ivf_topk, lsh_topk

    emb = pq.read_table(os.path.join(SF, "embeddings.parquet"),
                        columns=["vec_id", "embedding"])
    vids = np.asarray(emb["vec_id"].to_pylist(), dtype=np.int64)
    mat = np.array(emb["embedding"].to_pylist(), dtype=np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
    qids, k = list(range(8)), 5
    qmask = np.isin(vids, qids)
    sims = mat[qmask] @ mat[~qmask].T
    simc = np.floor(sims * 10000 + 0.5).astype(np.int64)
    cids = vids[~qmask]
    eset = set()
    for qi, qid in enumerate(vids[qmask]):
        order = np.lexsort((cids, -simc[qi]))[:k]
        eset.update((int(qid), int(cids[o])) for o in order)

    emb_ds = ray.data.read_parquet(os.path.join(SF, "embeddings.parquet"),
                                   columns=["vec_id", "embedding"])
    # n_bits=4 matches __ray_entry__.q_ann_recall (see its docstring)
    rows = []
    for method, fn in (("ivf", ivf_topk),
                       ("lsh", lambda ds, **kw: lsh_topk(ds, n_bits=4,
                                                         **kw))):
        got = fn(emb_ds, query_ids=qids, k=k).to_pandas()
        gset = set(zip(got["query_id"].astype(int),
                       got["neighbor_id"].astype(int)))
        inter = len(gset & eset)
        rows.append((method, len(eset), len(gset), inter,
                     int(math.floor(inter / max(len(eset), 1) * 10000
                                    + 0.5))))
    pq.write_table(pa.table({
        "method": pa.array([r[0] for r in rows], pa.string()),
        "n_expected": pa.array([r[1] for r in rows], pa.int64()),
        "n_got": pa.array([r[2] for r in rows], pa.int64()),
        "n_match": pa.array([r[3] for r in rows], pa.int64()),
        "recall_c": pa.array([r[4] for r in rows], pa.int64()),
    }), os.path.join(OUT, "sf0_01_ann_recall.parquet"))
    print("ann recall golden:", rows)

    # --- Count-Min sketch golden (local function application) ----------
    # The CMS matrix is a pure ORDER-INDEPENDENT function of the corpus
    # word-count table (each cell is a sum of per-word counts), so the
    # golden applies the cell spec (ops/windowed.cms_columns) to exact
    # counts computed by DuckDB — no Ray, no batching, no exchange. The
    # distributed sketch (cms_sketch) must reproduce the same
    # estimates; the exact side of the driver comparison is REAL SQL.
    import duckdb as _dd

    import numpy as _np

    from gfftoneo4j_ray.ops.windowed import (CMS_D, cms_columns,
                                             cms_estimate)

    wc = _dd.sql(f"""
        SELECT w AS word, COUNT(*) AS n
        FROM (SELECT unnest(regexp_extract_all(lower(text),
                            '[a-z0-9_''-]+')) AS w
              FROM read_parquet('{SF}/documents.parquet'))
        GROUP BY w ORDER BY n DESC, word
    """).fetchdf()
    cms_w = 32  # matches __ray_entry__.q_cms_error (see its docstring)
    cols = cms_columns(wc["word"].tolist(), cms_w)
    mat = _np.zeros((CMS_D, cms_w), _np.int64)
    cnts = wc["n"].to_numpy().astype(_np.int64)
    for j in range(CMS_D):
        _np.add.at(mat[j], cols[j], cnts)
    top = wc.head(30)
    est = cms_estimate(mat, top["word"].tolist())
    pq.write_table(pa.table({
        "word": pa.array(top["word"], pa.string()),
        "est_n": pa.array(est.astype("int64"), pa.int64()),
    }), os.path.join(OUT, "sf0_01_cms.parquet"))
    print("cms golden:", len(top), "words, max overestimate:",
          int((est - top["n"].to_numpy()).max()))

    # --- SemDeDup golden (sequential plain-numpy reference) ------------
    # compat/seqref.sequential_semdedup: single process, whole table,
    # straight-line integer spec — the distributed stages/semdedup.py
    # pipeline must reproduce it bit-for-bit (pinned in
    # tests/test_semdedup.py at sf0.001; this golden pins sf0.01 for
    # the driver's DuckDB oracle).
    from gfftoneo4j_ray.compat.seqref import sequential_semdedup

    edf = pq.read_table(os.path.join(SF, "embeddings.parquet"),
                        columns=["vec_id", "embedding"]).to_pandas()
    sem = sequential_semdedup(edf["vec_id"].to_numpy(),
                              np.array(edf["embedding"].to_list()))
    pq.write_table(sem, os.path.join(OUT, "sf0_01_semdedup.parquet"))
    print("semdedup golden:", sem.num_rows, "rows,",
          int(pa.compute.sum(pa.compute.invert(sem["kept"])).as_py() or 0),
          "dropped")

    # --- BPE merges golden (sequential dict/Counter reference) ---------
    # compat/seqref.sequential_bpe: the independent classic trainer;
    # the distributed stages/bpe.py trainer must reproduce it exactly
    # (pinned in tests/test_bpe.py at sf0.001; this golden pins sf0.01
    # for the driver's DuckDB oracle).
    from gfftoneo4j_ray.compat.seqref import sequential_bpe

    texts = pq.read_table(os.path.join(SF, "documents.parquet"),
                          columns=["text"])["text"].to_pylist()
    merges = sequential_bpe(texts, 40)
    pq.write_table(pa.table({
        "rank": pa.array([m[0] for m in merges], pa.int64()),
        "left": pa.array([m[1] for m in merges], pa.string()),
        "right": pa.array([m[2] for m in merges], pa.string()),
        "pair_count": pa.array([m[3] for m in merges], pa.int64()),
    }), os.path.join(OUT, "sf0_01_bpe.parquet"))
    print("bpe golden:", len(merges), "merges, top:",
          merges[0] if merges else None)
    ray.shutdown()


if __name__ == "__main__":
    main()
