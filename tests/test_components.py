"""Distributed connected components (ops/components.py) — min-label
propagation over the bucketed shuffle primitives; replaces driver-side
union-find for unbounded pair sets (dedup group assembly)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from gfftoneo4j_ray.ops.components import connected_components, dup_group_map
from gfftoneo4j_ray.state.unionfind import UnionFind


def _via_unionfind(pairs):
    uf = UnionFind()
    for a, b in pairs:
        uf.union(a, b)
    return {k: v for k, v in uf.mapping().items()}


def test_cross_partition_chain(ray_session):
    """A dup cluster spanning partitions: a 0-1-2-…-7 chain split
    across 5 blocks must collapse to one component (multi-round
    propagation), plus an unrelated pair."""
    import ray

    pairs = [(i, i + 1) for i in range(7)] + [(100, 101)]
    t = pa.table({"doc_a": [a for a, _ in pairs],
                  "doc_b": [b for _, b in pairs]})
    m = dup_group_map(ray.data.from_arrow(t).repartition(5))
    assert m == _via_unionfind(pairs)
    assert all(m[i] == 0 for i in range(8))
    assert m[100] == 100 and m[101] == 100


def test_multiple_components_and_dup_edges(ray_session):
    import ray

    pairs = [(3, 9), (9, 4), (20, 21), (21, 22), (22, 20), (3, 9), (9, 3)]
    t = pa.table({"doc_a": [a for a, _ in pairs],
                  "doc_b": [b for _, b in pairs]})
    m = dup_group_map(ray.data.from_arrow(t).repartition(3))
    assert m == _via_unionfind(pairs)
    assert m[3] == m[9] == m[4] == 3
    assert m[20] == m[21] == m[22] == 20


def test_empty_pairs(ray_session):
    import ray

    t = pa.schema([("doc_a", pa.int64()),
                   ("doc_b", pa.int64())]).empty_table()
    labels = connected_components(ray.data.from_arrow(t))
    assert labels.count() == 0
    assert dup_group_map(ray.data.from_arrow(t)) == {}


@pytest.mark.parametrize("nparts", [1, 4])
def test_star_converges_fast(ray_session, nparts):
    """Boilerplate-star shape (the common web near-dup cluster):
    converges regardless of partitioning."""
    import ray

    pairs = [(0, i) for i in range(1, 30)]
    t = pa.table({"doc_a": [a for a, _ in pairs],
                  "doc_b": [b for _, b in pairs]})
    m = dup_group_map(ray.data.from_arrow(t).repartition(nparts))
    assert m == {i: 0 for i in range(30)}
