"""Distributed bucketed shuffle hash join (ops/join.py).

Reference anchor: the T2 co-grouped lookup join
(reference: src/main/scala/corwur/gffparser/GeneReader.scala:159-163).
Correctness is checked against pandas merges on the same data,
including list-typed payloads (Acero rejects nested payload columns —
the operator joins on (keys, row index) and gathers payloads with
``take``)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from gfftoneo4j_ray.ops.join import hash_join


@pytest.fixture(scope="module")
def tables(ray_session):
    import ray

    rng = np.random.default_rng(5)
    left = pa.table({
        "k": pa.array(rng.integers(0, 50, size=400), pa.int64()),
        "lv": pa.array(np.arange(400), pa.int64()),
    })
    right = pa.table({
        "rk": pa.array(rng.integers(0, 60, size=120), pa.int64()),
        "rv": pa.array(np.arange(120) * 10, pa.int64()),
    })
    lds = ray.data.from_arrow(left).repartition(7)
    rds = ray.data.from_arrow(right).repartition(3)
    return left.to_pandas(), right.to_pandas(), lds, rds


def _sorted(df):
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_inner(tables):
    lp, rp, lds, rds = tables
    got = hash_join(lds, rds, on="k", right_on="rk", how="inner",
                    num_buckets=8).to_pandas()
    exp = lp.merge(rp.rename(columns={"rk": "k"}), on="k", how="inner")
    pd.testing.assert_frame_equal(_sorted(got), _sorted(exp))


def test_left(tables):
    lp, rp, lds, rds = tables
    got = hash_join(lds, rds, on="k", right_on="rk", how="left",
                    num_buckets=8).to_pandas()
    exp = lp.merge(rp.rename(columns={"rk": "k"}), on="k", how="left")
    got["rv"] = got["rv"].astype("float64")
    pd.testing.assert_frame_equal(_sorted(got), _sorted(exp))


def test_semi_anti_partition(tables):
    """semi ∪ anti == left side exactly (no dups, no loss)."""
    lp, rp, lds, rds = tables
    semi = hash_join(lds, rds, on="k", right_on="rk", how="semi",
                     num_buckets=8).to_pandas()
    anti = hash_join(lds, rds, on="k", right_on="rk", how="anti",
                     num_buckets=8).to_pandas()
    keys = set(rp["rk"])
    exp_semi = lp[lp["k"].isin(keys)]
    exp_anti = lp[~lp["k"].isin(keys)]
    pd.testing.assert_frame_equal(_sorted(semi), _sorted(exp_semi))
    pd.testing.assert_frame_equal(_sorted(anti), _sorted(exp_anti))
    both = pd.concat([semi, anti])
    pd.testing.assert_frame_equal(_sorted(both), _sorted(lp))


def test_list_payload(ray_session):
    """Nested (list) payload columns survive the join (Acero would
    reject them as join fields — the take-based gather must not)."""
    import ray

    left = pa.table({"k": pa.array([1, 2, 3], pa.int64())})
    right = pa.table({
        "k": pa.array([1, 1, 3, 4], pa.int64()),
        "vals": pa.array([[1, 2], [3], [], [9]], pa.list_(pa.int64())),
    })
    got = hash_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                    on="k", how="inner", num_buckets=4).to_pandas()
    got = got.sort_values(["k"]).reset_index(drop=True)
    assert len(got) == 3
    assert sorted(map(list, got["vals"])) == [[], [1, 2], [3]]


def test_empty_right(ray_session):
    import ray

    left = pa.table({"k": pa.array([1, 2], pa.int64()),
                     "lv": pa.array([5, 6], pa.int64())})
    right = pa.schema([("k", pa.int64()),
                       ("rv", pa.int64())]).empty_table()
    lds = ray.data.from_arrow(left)
    rds = ray.data.from_arrow(right)
    assert hash_join(lds, rds, on="k", how="inner").count() == 0
    anti = hash_join(lds, rds, on="k", how="anti").to_pandas()
    assert sorted(anti["k"]) == [1, 2]


def test_dtype_mismatch_raises(ray_session):
    import ray

    left = ray.data.from_arrow(pa.table({"k": pa.array([1], pa.int64())}))
    right = ray.data.from_arrow(pa.table({"k": pa.array([1], pa.int32()),
                                          "v": pa.array([2], pa.int64())}))
    with pytest.raises(TypeError):
        hash_join(left, right, on="k")


def test_name_collision_raises(ray_session):
    import ray

    left = ray.data.from_arrow(pa.table({"k": pa.array([1], pa.int64()),
                                         "v": pa.array([1], pa.int64())}))
    right = ray.data.from_arrow(pa.table({"k": pa.array([1], pa.int64()),
                                          "v": pa.array([2], pa.int64())}))
    with pytest.raises(ValueError):
        hash_join(left, right, on="k")


def test_full_outer_matches_pandas(ray_session):
    """full outer: unmatched rows survive on both sides with coalesced
    keys; cross-checked against pandas merge(how='outer')."""
    import numpy as np
    import pandas as pd
    import ray

    rng = np.random.default_rng(3)
    left = pd.DataFrame({"k": rng.integers(0, 40, 120).astype("int64"),
                         "lv": np.arange(120, dtype="int64")})
    right = pd.DataFrame({"k": (rng.integers(20, 60, 80) * 1).astype("int64"),
                          "rv": np.arange(80, dtype="int64")})
    right = right.drop_duplicates("k")
    lds = ray.data.from_arrow(pa.Table.from_pandas(left)).repartition(5)
    rds = ray.data.from_arrow(pa.Table.from_pandas(right)).repartition(3)
    got = hash_join(lds, rds, on="k", how="full", num_buckets=8).to_pandas()
    exp = left.merge(right, on="k", how="outer")
    key = lambda df: sorted(map(tuple, df[["k", "lv", "rv"]]
                                .fillna(-1).itertuples(index=False)))
    assert key(got) == key(exp)
    # right-only keys present with null lv
    right_only = set(right["k"]) - set(left["k"])
    assert right_only and right_only <= set(got[got["lv"].isna()]["k"])


def test_mixed_strategy_budget_paths_agree(ray_session):
    """q_join_enrich / q_semi_join keep a broadcast fast-path behind an
    explicit row budget; forcing the budget to 0 routes the customer
    leg through the shuffle hash join — both paths must be identical
    (VERDICT r2 item 5: no driver .to_pandas() of a table that grows
    with scale factor)."""
    from gfftoneo4j_ray.ops import relational as R

    sf = "/root/testdata/sf0.001"

    def norm(ds, keys):
        return ds.to_pandas().sort_values(keys).reset_index(drop=True)

    a = norm(R.q_join_enrich(sf), ["n_name"])
    b = norm(R.q_join_enrich(sf, broadcast_budget_rows=0), ["n_name"])
    assert len(a) and a.equals(b)

    c = norm(R.q_semi_join(sf), ["l_orderkey", "l_linenumber"])
    d = norm(R.q_semi_join(sf, broadcast_budget_rows=0),
             ["l_orderkey", "l_linenumber"])
    assert len(c) and c.equals(d)


def test_schema_hint_cast_heals_dtype_drift(ray_session):
    """Schema hints are ENFORCED: blocks are cast to the declared
    layout before the exchange, so an int32 parquet column under an
    int64 hint (the c_nationkey drift) yields one consistent block
    schema instead of an un-concatenatable mix — and the join result
    carries the hinted type."""
    import ray

    left = pa.table({
        "k": pa.array([1, 2, 3, 4], pa.int64()),
        "lv": pa.array([10, 20, 30, 40], pa.int32()),   # actual int32
    })
    right = pa.table({
        "rk": pa.array([2, 3, 5], pa.int64()),
        "rv": pa.array([7, 8, 9], pa.int16()),          # actual int16
    })
    out = hash_join(
        ray.data.from_arrow(left).repartition(2),
        ray.data.from_arrow(right).repartition(2),
        on="k", right_on="rk", num_buckets=4,
        # hints declare WIDER types than the actual blocks carry
        left_schema=pa.schema([("k", pa.int64()), ("lv", pa.int64())]),
        right_schema=pa.schema([("rk", pa.int64()), ("rv", pa.int64())]),
    ).to_pandas().sort_values("k").reset_index(drop=True)
    assert list(out["k"]) == [2, 3]
    assert list(out["lv"]) == [20, 30]
    assert list(out["rv"]) == [7, 8]

def test_zero_block_both_sides_keeps_schema(ray_session):
    """Both sides with no ref bundles at all (from_items([])): the
    declared layout supplies the typed empty output schema."""
    import ray

    got = hash_join(
        ray.data.from_items([]), ray.data.from_items([]), on="k",
        num_buckets=4,
        left_schema=pa.schema([("k", pa.int64()), ("a", pa.string())]),
        right_schema=pa.schema([("k", pa.int64()), ("b", pa.float64())]))
    assert got.schema().names == ["k", "a", "b"]
    assert got.select_columns(["b"]).count() == 0
