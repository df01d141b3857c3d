"""Unit tests for the raw-task bucket exchange primitives
(ops/exchange.py) — the fixed-partition shuffle every bucketed operator
now routes through. Pins the two contract points of
``bucketed_map_groups`` that differ from Dataset map_groups: the kernel
never sees the bucket column, and empty buckets surface as
schema-correct 0-row tables (not skipped)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from gfftoneo4j_ray.ops.exchange import (bucket_exchange,
                                         bucketed_map_groups)
from gfftoneo4j_ray.ops.hashagg import append_bucket


def _events(n=10_000, seed=11):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "k": rng.integers(0, 97, n).astype(np.int64),
        "v": rng.integers(0, 1000, n).astype(np.int64),
    })


def test_bucketed_map_groups_equals_dataset_groupby(ray_session):
    import ray

    df = _events()
    B = 16
    ds = ray.data.from_pandas(df).repartition(8)
    mapped = ds.map_batches(lambda t: append_bucket(t, ["k"], B),
                            batch_format="pyarrow")

    def per_bucket(g: pa.Table) -> pa.Table:
        assert "bucket" not in g.column_names  # stripped by the exchange
        out = g.group_by(["k"]).aggregate([("v", "sum")])
        return out.rename_columns(["k", "v_sum"])

    got = bucketed_map_groups(mapped, B, per_bucket).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    want = df.groupby("k", as_index=False)["v"].sum() \
        .rename(columns={"v": "v_sum"}).sort_values("k") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_empty_buckets_reach_kernel_with_schema(ray_session):
    """With 3 distinct keys and 64 buckets most buckets are empty: the
    kernel must see schema-correct 0-row tables for them and its typed
    0-row outputs must coexist with the real ones in one Dataset."""
    import ray

    df = pd.DataFrame({"k": np.array([1, 2, 3] * 100, np.int64),
                       "v": np.arange(300, dtype=np.int64)})
    B = 64
    seen = {"empty": 0}

    def per_bucket(g: pa.Table) -> pa.Table:
        # 0-row input must still carry the full exchange schema
        assert g.schema.names == ["k", "v"]
        out = g.group_by(["k"]).aggregate([("v", "count")])
        return out.rename_columns(["k", "n"])

    ds = ray.data.from_pandas(df).repartition(4).map_batches(
        lambda t: append_bucket(t, ["k"], B), batch_format="pyarrow")
    got = bucketed_map_groups(ds, B, per_bucket).to_pandas()
    assert sorted(got["k"]) == [1, 2, 3]
    assert set(got["n"]) == {100}


def test_blocking_bucket_exchange_reduce_once_per_bucket(ray_session):
    """bucket_exchange calls reduce_fn exactly once per bucket id, in
    bucket order, with the bucket column stripped."""
    import ray

    df = pd.DataFrame({"k": np.arange(40, dtype=np.int64)})
    B = 8
    ds = ray.data.from_pandas(df).repartition(4).map_batches(
        lambda t: append_bucket(t, ["k"], B, name="_rb"),
        batch_format="pyarrow")

    def reduce_fn(b: int, t):
        return (b, 0 if t is None else t.num_rows,
                [] if t is None else t.column_names)

    out = bucket_exchange(ds, B, reduce_fn)
    assert [r[0] for r in out] == list(range(B))
    assert sum(r[1] for r in out) == 40
    assert all(r[2] == ["k"] for r in out if r[1])

def test_zero_block_map_groups_keeps_schema(ray_session):
    """A zero-block input (limit(0) prunes every block) must still
    yield a TYPED empty Dataset: the exchange probes the kernel with a
    0-row table of the input schema, so downstream column access works
    (r3 advice: an empty upstream must not produce a schema-less
    Dataset)."""
    import ray

    t = pa.table({"k": pa.array([1, 2], pa.int64()),
                  "v": pa.array([3, 4], pa.int64())})
    ds = ray.data.from_arrow(append_bucket(t, ["k"], 4)).limit(0)

    def per_bucket(g: pa.Table) -> pa.Table:
        out = g.group_by(["k"]).aggregate([("v", "sum")])
        return out.rename_columns(["k", "v_sum"])

    got = bucketed_map_groups(ds, 4, per_bucket)
    assert got.schema().names == ["k", "v_sum"]
    # the part the r3 advice called out: column access must not raise
    assert got.select_columns(["v_sum"]).count() == 0


def test_zero_block_hash_aggregate_keeps_schema(ray_session):
    import ray

    from gfftoneo4j_ray.ops.hashagg import hash_aggregate

    t = pa.table({"k": pa.array([1, 2], pa.int64()),
                  "v": pa.array([3, 4], pa.int64())})
    ds = ray.data.from_arrow(t).limit(0)
    got = hash_aggregate(ds, "k", [("v", "sum", "s"), ("v", "mean", "m")],
                         num_buckets=4)
    assert got.schema().names == ["k", "s", "m"]
    assert got.select_columns(["s"]).count() == 0
