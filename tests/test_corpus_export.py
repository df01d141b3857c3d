"""End-to-end corpus → training shards (pipelines/corpus_export.py)."""

from __future__ import annotations

import os
import re
from collections import defaultdict

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from gfftoneo4j_ray.compat.seqref import bpe_replay_segment, sequential_bpe
from gfftoneo4j_ray.ops.analytics import quality_gate_stats
from gfftoneo4j_ray.ops.export import shuffle_keys
from gfftoneo4j_ray.pipelines.corpus_export import run_corpus_export

_BUDGET = 512


def _input_docs() -> pa.Table:
    """sf0.001 documents + injected exact duplicates (higher ids) so
    the dedup stage has real work."""
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text"])
    dup = t.slice(10, 25)
    dup = pa.table({
        "doc_id": pa.array(
            (dup["doc_id"].to_numpy() + 1_000_000), pa.int64()),
        "text": dup["text"]})
    return pa.concat_tables([t, dup])


def _expected_kept(docs: pa.Table) -> dict:
    keep, _, _, _ = quality_gate_stats(docs["text"])
    ids = docs["doc_id"].to_numpy()[keep]
    texts = np.array(docs["text"].to_pylist(), object)[keep]
    first: dict = {}
    for i, x in sorted(zip(ids.tolist(), texts.tolist())):
        first.setdefault(x, i)
    return {i: x for x, i in first.items()}  # min-id survivor per text


def _read_shards(d: str):
    parts = sorted(os.listdir(d))
    return pa.concat_tables(
        [pq.read_table(os.path.join(d, p)) for p in parts]), parts


def test_corpus_export_end_to_end(ray_session, tmp_path):
    import ray

    docs = _input_docs()
    kept = _expected_kept(docs)
    merges = sequential_bpe(list(kept.values()), 30)
    tok = re.compile(r"[\w'-]+")

    def n_bpe(text: str) -> int:
        return sum(len(bpe_replay_segment(w, merges))
                   for w in tok.findall((text or "").lower()))

    out = str(tmp_path / "shards")
    summary = run_corpus_export(
        ray.data.from_arrow(docs).repartition(4), out, n_merges=30,
        budget_tokens=_BUDGET, seed=5, num_shards=6, pack_buckets=8,
        join_buckets=8)
    assert summary["n_exported"] == len(kept)
    assert summary["n_merges"] == 30

    got, _ = _read_shards(out)
    assert got.column_names == ["pack_id", "doc_id", "n_tokens", "text"]
    # 1. every gate+dedup survivor exactly once, with its text intact
    assert sorted(got["doc_id"].to_pylist()) == sorted(kept)
    for i, x in zip(got["doc_id"].to_pylist(), got["text"].to_pylist()):
        assert kept[i] == x
    # 2. n_tokens is the REAL BPE count under the trained merges
    for i, n in zip(got["doc_id"].to_pylist(),
                    got["n_tokens"].to_pylist()):
        assert n == n_bpe(kept[i])
    # 3. pack invariants: budget respected unless singleton-oversized
    per_pack = defaultdict(list)
    for p, n in zip(got["pack_id"].to_pylist(),
                    got["n_tokens"].to_pylist()):
        per_pack[p].append(n)
    for p, ns in per_pack.items():
        assert sum(ns) <= _BUDGET or len(ns) == 1
    # 4. global order == seeded permutation of pack ids; pack members
    #    adjacent, doc_id ascending within a pack
    pack_seq = got["pack_id"].to_numpy()
    order_of = {}
    for p in pack_seq:
        order_of.setdefault(int(p), len(order_of))
    upacks = np.array(sorted(order_of), np.uint64)
    keys = shuffle_keys(upacks, 5)
    want_order = upacks[np.lexsort((upacks, keys))].tolist()
    assert list(order_of) == [int(p) for p in want_order]
    seen_done = set()
    prev = None
    prev_doc = None
    for p, i in zip(got["pack_id"].to_pylist(),
                    got["doc_id"].to_pylist()):
        if p != prev:
            assert p not in seen_done  # adjacency: packs never split
            if prev is not None:
                seen_done.add(prev)
            prev, prev_doc = p, i
        else:
            assert i > prev_doc
            prev_doc = i


def test_corpus_export_deterministic_across_partitioning(ray_session,
                                                         tmp_path):
    import ray

    docs = _input_docs()
    outs = []
    for nparts in (1, 5):
        d = str(tmp_path / f"p{nparts}")
        run_corpus_export(
            ray.data.from_arrow(docs).repartition(nparts), d,
            n_merges=20, budget_tokens=_BUDGET, seed=2, num_shards=4,
            pack_buckets=8, join_buckets=8)
        outs.append(_read_shards(d)[0])
    assert outs[0].equals(outs[1])


def test_corpus_export_tokenizer_reuse(ray_session, tmp_path):
    """merges_path: first run trains and saves; second run over a
    DIFFERENT dump loads the same vocabulary (no retraining) and its
    token counts come from the saved merges, not a fresh training."""
    import ray

    docs = _input_docs()
    mp = str(tmp_path / "tokenizer.parquet")
    s1 = run_corpus_export(
        ray.data.from_arrow(docs), str(tmp_path / "d1"), n_merges=25,
        budget_tokens=_BUDGET, seed=1, num_shards=3, pack_buckets=8,
        join_buckets=8, merges_path=mp)
    assert s1["tokenizer_trained"] and s1["n_merges"] == 25
    assert os.path.exists(mp)
    saved = pq.read_table(mp)

    dump2 = docs.slice(0, 200)
    s2 = run_corpus_export(
        ray.data.from_arrow(dump2), str(tmp_path / "d2"), n_merges=99,
        budget_tokens=_BUDGET, seed=1, num_shards=3, pack_buckets=8,
        join_buckets=8, merges_path=mp)
    assert not s2["tokenizer_trained"]
    assert s2["n_merges"] == 25  # loaded, n_merges=99 ignored
    got, _ = _read_shards(str(tmp_path / "d2"))
    merges = [(r["rank"], r["left"], r["right"]) for r in saved.to_pylist()]
    tok = re.compile(r"[\w'-]+")
    kept2 = _expected_kept(dump2)
    for i, n in zip(got["doc_id"].to_pylist(), got["n_tokens"].to_pylist()):
        want = sum(len(bpe_replay_segment(w, merges))
                   for w in tok.findall(kept2[i].lower()))
        assert n == want
