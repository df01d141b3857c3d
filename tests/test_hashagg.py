"""Unit tests for the bucketed two-phase hash aggregate — the engine's
wide-aggregate primitive (correctness vs pandas groundtruth, negative
keys, string and composite keys, extreme skew)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from gfftoneo4j_ray.ops.hashagg import hash_aggregate, hash_count


@pytest.fixture()
def skewed_df():
    rng = np.random.default_rng(5)
    n = 50_000
    # one key owns ~90% of rows (the hot-entity shape)
    keys = np.where(rng.random(n) < 0.9, 7,
                    rng.integers(0, 500, n)).astype(np.int64)
    return pd.DataFrame({
        "k": keys,
        "v": rng.standard_normal(n),
        "s": np.array([f"s{abs(x) % 37}" for x in keys]),
    })


def _ray_df(ray_session, df, blocks=16):
    import ray

    return ray.data.from_pandas(df).repartition(blocks)


def test_sum_count_min_max_mean_vs_pandas(ray_session, skewed_df):
    ds = _ray_df(ray_session, skewed_df)
    got = hash_aggregate(ds, "k", [
        ("v", "sum", "v_sum"), ("v", "count", "n"),
        ("v", "min", "v_min"), ("v", "max", "v_max"),
        ("v", "mean", "v_mean"),
    ], num_buckets=8).to_pandas().sort_values("k").reset_index(drop=True)
    want = skewed_df.groupby("k")["v"].agg(
        v_sum="sum", n="count", v_min="min", v_max="max", v_mean="mean") \
        .reset_index()
    pd.testing.assert_frame_equal(
        got.astype({"n": "int64"}), want.astype({"n": "int64"}),
        check_exact=False, rtol=1e-9)


def test_negative_and_sentinel_keys(ray_session):
    df = pd.DataFrame({"k": [-1, -1, -(2**62), 0, 5],
                       "v": [1.0, 2.0, 3.0, 4.0, 5.0]})
    got = hash_aggregate(_ray_df(ray_session, df, blocks=3), "k",
                         [("v", "sum", "s")]).to_pandas()
    want = {(-1, 3.0), (-(2**62), 3.0), (0, 4.0), (5, 5.0)}
    assert set(map(tuple, got.itertuples(index=False))) == want


def test_string_and_composite_keys(ray_session, skewed_df):
    ds = _ray_df(ray_session, skewed_df)
    got = hash_aggregate(ds, ["s", "k"], [("v", "count", "n")],
                         num_buckets=8).to_pandas() \
        .sort_values(["s", "k"]).reset_index(drop=True)
    want = skewed_df.groupby(["s", "k"]).size().reset_index(name="n")
    pd.testing.assert_frame_equal(got.astype({"n": "int64"}),
                                  want.astype({"n": "int64"}))


def test_hash_count_and_bucket_invariance(ray_session, skewed_df):
    ds = _ray_df(ray_session, skewed_df)
    a = hash_count(ds, "k", num_buckets=2).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    b = hash_count(ds.repartition(37), "k", num_buckets=64).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert int(a.set_index("k").loc[7, "n"]) > 40_000  # the hot key
