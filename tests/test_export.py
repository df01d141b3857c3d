"""Seeded global shuffle + sharded training export (ops/export.py)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from gfftoneo4j_ray.ops.export import (_shard_of, shuffle_export,
                                       shuffle_keys)


def _read_all(out_dir: str) -> pa.Table:
    parts = sorted(os.listdir(out_dir))
    return pa.concat_tables(
        [pq.read_table(os.path.join(out_dir, p)) for p in parts])


def _expected_order(ids: np.ndarray, seed: int) -> np.ndarray:
    keys = shuffle_keys(ids.astype(np.uint64), seed)
    return ids[np.lexsort((ids, keys))]


def test_shuffle_keys_bijective_and_seed_sensitive():
    ids = np.arange(200_000, dtype=np.uint64)
    k0, k1 = shuffle_keys(ids, 0), shuffle_keys(ids, 1)
    assert len(np.unique(k0)) == len(ids)  # bijection ⇒ no collisions
    assert (k0 != k1).mean() > 0.999
    # shard split covers the full range and is near-uniform
    sh = _shard_of(k0, 16)
    assert sh.min() == 0 and sh.max() == 15
    counts = np.bincount(sh, minlength=16)
    assert counts.min() > 0.8 * len(ids) / 16
    assert counts.max() < 1.2 * len(ids) / 16


def test_shuffle_export_is_the_seeded_permutation(ray_session, tmp_path):
    """Shard order + within-shard order == the arithmetic permutation,
    invariant to input partitioning; different seeds permute
    differently; multiset of rows is preserved."""
    import ray

    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"])
    ids = docs["doc_id"].to_numpy()
    want = _expected_order(ids, seed=7)

    outs = {}
    for nparts in (1, 4):
        d = str(tmp_path / f"p{nparts}")
        ds = ray.data.from_arrow(docs).repartition(nparts)
        n = shuffle_export(ds, d, seed=7, num_shards=8)
        assert n == len(ids)
        got = _read_all(d)
        assert got["doc_id"].to_numpy().tolist() == want.tolist()
        outs[nparts] = got
    assert outs[1].equals(outs[4])  # bit-stable across partitionings
    # payload carried intact (same rows, new order)
    assert (outs[1].sort_by("doc_id").equals(docs.sort_by("doc_id")))

    d2 = str(tmp_path / "seed9")
    shuffle_export(ray.data.from_arrow(docs), d2, seed=9, num_shards=8)
    got9 = _read_all(d2)["doc_id"].to_numpy()
    assert got9.tolist() == _expected_order(ids, 9).tolist()
    assert got9.tolist() != want.tolist()


def test_shuffle_export_resume_rewrites_only_missing(ray_session,
                                                     tmp_path):
    import ray

    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "n_chars"])
    d = str(tmp_path / "resume")
    ds = ray.data.from_arrow(docs)
    n1 = shuffle_export(ds, d, seed=3, num_shards=6)
    full = _read_all(d)
    mtimes = {p: os.path.getmtime(os.path.join(d, p))
              for p in os.listdir(d)}
    victim = sorted(mtimes)[2]
    os.remove(os.path.join(d, victim))
    n2 = shuffle_export(ray.data.from_arrow(docs), d, seed=3,
                        num_shards=6)
    assert n2 == n1
    assert _read_all(d).equals(full)
    for p, old in mtimes.items():
        if p != victim:
            assert os.path.getmtime(os.path.join(d, p)) == old
    # all-present fast path: no files touched at all
    snap = {p: os.path.getmtime(os.path.join(d, p))
            for p in os.listdir(d)}
    assert shuffle_export(ray.data.from_arrow(docs), d, seed=3,
                          num_shards=6) == n1
    assert snap == {p: os.path.getmtime(os.path.join(d, p))
                    for p in os.listdir(d)}


def test_shuffle_export_empty_and_single_shard(ray_session, tmp_path):
    import ray

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "text": pa.array([], pa.string())})
    d = str(tmp_path / "empty")
    assert shuffle_export(ray.data.from_arrow(empty), d,
                          num_shards=4) == 0
    assert sorted(os.listdir(d)) == [f"shard-{b:05d}.parquet"
                                     for b in range(4)]
    for p in os.listdir(d):
        t = pq.read_table(os.path.join(d, p))
        assert t.num_rows == 0
        assert t.column_names == ["doc_id", "text"]

    docs = pa.table({"doc_id": pa.array([5, 1, 9], pa.int64()),
                     "text": pa.array(list("abc"))})
    d1 = str(tmp_path / "one")
    assert shuffle_export(ray.data.from_arrow(docs), d1, seed=2,
                          num_shards=1) == 3
    got = _read_all(d1)["doc_id"].to_numpy()
    assert got.tolist() == _expected_order(
        np.array([5, 1, 9]), 2).tolist()


def test_shard_of_range_split_is_monotone():
    """Range sharding must preserve global key order across shards."""
    keys = np.sort(shuffle_keys(np.arange(50_000, dtype=np.uint64), 4))
    sh = _shard_of(keys, 7)
    assert (np.diff(sh) >= 0).all()
    with pytest.raises(Exception):
        _shard_of(np.array([], np.uint64), 0)
