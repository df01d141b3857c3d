"""Distributed BPE trainer vs the sequential dict/Counter reference."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from gfftoneo4j_ray.compat.seqref import sequential_bpe
from gfftoneo4j_ray.stages.bpe import train_bpe


def _as_tuples(t: pa.Table) -> list[tuple]:
    return [(r["rank"], r["left"], r["right"], r["pair_count"])
            for r in t.to_pylist()]


def test_bpe_matches_sequential_reference_sf0001(ray_session):
    """40 merges over the real sf0.001 documents table, distributed ==
    sequential, and invariant to the input partitioning."""
    import ray

    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                         columns=["text"])
    want = sequential_bpe(docs["text"].to_pylist(), 40)
    assert len(want) == 40
    for nparts in (1, 5):
        ds = ray.data.from_arrow(docs).repartition(nparts)
        got = _as_tuples(train_bpe(ds, n_merges=40, num_buckets=4))
        assert got == want


def test_bpe_greedy_overlap_and_ties(ray_session):
    """Same-symbol runs (the l == r overlap case) and count ties are
    resolved exactly like the sequential left-to-right scan."""
    import ray

    texts = ["aaaa aaaa aaa baba bab", "aaaa abab abab zz zz zz"]
    want = sequential_bpe(texts, 12)
    ds = ray.data.from_arrow(
        pa.table({"text": pa.array(texts, pa.string())})).repartition(2)
    got = _as_tuples(train_bpe(ds, n_merges=12, num_buckets=2))
    assert got == want
    # the run case actually exercised: first merge is (a, a)
    assert (want[0][1], want[0][2]) == ("a", "a")


def test_bpe_early_stop_when_pairs_exhaust(ray_session):
    """A corpus whose vocabulary collapses to single symbols stops
    early with fewer than n_merges rows."""
    import ray

    texts = ["ab ab ab", "ab"]
    want = sequential_bpe(texts, 50)
    ds = ray.data.from_arrow(
        pa.table({"text": pa.array(texts, pa.string())}))
    got = _as_tuples(train_bpe(ds, n_merges=50))
    assert got == want
    assert len(got) < 50
    # nulls/empties are dropped by the tokenizer
    ds2 = ray.data.from_arrow(
        pa.table({"text": pa.array(["", None], pa.string())}))
    assert train_bpe(ds2, n_merges=5).num_rows == 0
