"""Deterministic global shuffle + sharded export — the last mile of a
training-data pipeline.

Training loaders need the corpus in a SEEDED RANDOM ORDER, split into
fixed-count shards with stable names, so that (a) the order is
reproducible run-to-run, (b) a failed export resumes per shard, and
(c) each trainer rank streams its own shard files without cross-rank
coordination. ``Dataset.random_shuffle`` is a full materializing
AllToAll with non-deterministic block layout; this module instead
defines the permutation ARITHMETICALLY — ``key = splitmix64(id ^
seed)`` (Steele et al. 2014, the JDK SplittableRandom finalizer; a
bijection on uint64, so distinct ids never collide to equal keys
under one seed) — and realizes it as a range-bucket exchange:

  * map side: one vectorized uint64 key per row, shard = high-range of
    key (``key // ceil(2^64 / num_shards)``) — shard id is dense and
    known map-side, so the raw-task bucket exchange applies (no
    sampling / sort negotiation);
  * reduce side: one task per shard sorts its rows by (key, id) and
    writes ``shard-{i:05d}.parquet`` via atomic tmp+rename (idempotent
    under Ray task retry);
  * shard order + within-shard order = the global key order, i.e. the
    full seeded permutation, by construction of the range split.

Scale shape: exactly one all-to-all of the payload (unavoidable for a
global shuffle), uniform shards (splitmix64 is uniform), no driver
materialization, resumable per shard. Reference anchor: the reference
writes its node/edge output in one fixed file order
(GenesToNeo4j.scala); a training exporter needs the opposite — a
seeded order — hence this operator extends §2.9's corpus-prep surface
(packing/mixture) with the export step they feed.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_C1 = np.uint64(0xBF58476D1CE4E5B9)
_C2 = np.uint64(0x94D049BB133111EB)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def shuffle_keys(ids: np.ndarray, seed: int) -> np.ndarray:
    """splitmix64 finalizer over ``id ^ (seed * golden)`` — vectorized
    uint64, bijective per seed (distinct ids → distinct keys)."""
    seed_mix = np.uint64((seed * 0x9E3779B97F4A7C15) & (2**64 - 1))
    z = ids.astype(np.uint64) ^ seed_mix
    z = (z + _GOLDEN)
    z = (z ^ (z >> np.uint64(30))) * _C1
    z = (z ^ (z >> np.uint64(27))) * _C2
    return z ^ (z >> np.uint64(31))


def _shard_of(keys: np.ndarray, num_shards: int) -> np.ndarray:
    if num_shards == 1:
        return np.zeros(len(keys), np.int64)
    q = np.uint64(-(-(2**64) // num_shards))  # ceil(2^64 / n), fits: n≥2
    return (keys // q).astype(np.int64)


def shuffle_export(ds, out_dir: str, *, seed: int = 0,
                   num_shards: int = 16, id_col: str = "doc_id",
                   order_cols: tuple = (), resume: bool = True) -> int:
    """Export ``ds`` to ``out_dir/shard-{i:05d}.parquet`` in the seeded
    global shuffle order; returns total rows written. With ``resume``,
    shards whose files already exist are not rewritten (their row
    counts are read from parquet metadata) — a failed export reruns
    only its missing shards.

    When ``id_col`` is not unique per row (e.g. pack_id when exporting
    packed sequences — all members of a pack share the key and shuffle
    as a unit), pass ``order_cols`` to fix the within-group row order
    deterministically (full sort: key, id, *order_cols)."""
    from .exchange import bucket_exchange

    os.makedirs(out_dir, exist_ok=True)
    paths = [os.path.join(out_dir, f"shard-{b:05d}.parquet")
             for b in range(num_shards)]
    if resume and all(os.path.exists(p) for p in paths):
        return sum(pq.read_metadata(p).num_rows for p in paths)

    schema = ds.schema()
    base = pa.schema([(n, t) for n, t in
                      zip(schema.names, schema.types)])

    def add_shard(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        keys = shuffle_keys(ids, seed)
        t = t.append_column("_key", pa.array(keys, pa.uint64()))
        return t.append_column(
            "_rb", pa.array(_shard_of(keys, num_shards), pa.int64()))

    def write_shard(b: int, t: pa.Table | None, base=base) -> int:
        path = os.path.join(out_dir, f"shard-{b:05d}.parquet")
        if resume and os.path.exists(path):
            return pq.read_metadata(path).num_rows
        if t is None or t.num_rows == 0:
            body = base.empty_table()
        else:
            tail = [t[c].to_numpy(zero_copy_only=False)
                    for c in reversed(order_cols)]
            order = np.lexsort(tuple(tail) + (
                t[id_col].to_numpy(zero_copy_only=False),
                t["_key"].to_numpy(zero_copy_only=False)))
            body = t.take(order).drop_columns(["_key"])
        tmp = path + f".tmp-{os.getpid()}"
        pq.write_table(body, tmp)
        os.replace(tmp, path)
        return body.num_rows

    mapped = ds.map_batches(add_shard, batch_format="pyarrow")
    counts = bucket_exchange(mapped, num_shards, write_shard)
    if not counts:  # zero-block input: still lay down the fixed layout
        counts = [write_shard(b, None) for b in range(num_shards)]
    return int(sum(counts))
