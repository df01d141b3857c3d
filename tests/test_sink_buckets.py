"""Range-sorted sink geometry: >256 buckets (2-byte prefix) must
produce the identical globally-sorted output as the 1-byte regime."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from gfftoneo4j_ray.functions.hashing import content_id_bin
from gfftoneo4j_ray.stages import graph


def _fixture_nodes(n: int = 4000) -> pa.Table:
    ids = [content_id_bin("k", str(i)) for i in range(n)]
    t = pa.table({
        "node_id": pa.array(ids, pa.binary(20)),
        "label": pa.array(["entity"] * n, pa.string()),
        "key": pa.array([f"k{i}" for i in range(n)], pa.string()),
        "entity_type": pa.array([None] * n, pa.string()),
        "surface_forms": pa.array([None] * n, pa.list_(pa.string())),
        "n_mentions": pa.array([None] * n, pa.int64()),
    })
    # duplicate every row (bit-identical) so dedup_key is exercised
    return pa.concat_tables([t, t])


def _read_sorted_dir(d: str) -> pa.Table:
    files = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
    tabs = [pq.read_table(os.path.join(d, f)) for f in files]
    return pa.concat_tables([t for t in tabs if t.num_rows > 0])


@pytest.mark.parametrize("big", [512, 1024])
def test_wide_bucket_sink_identical(tmp_path, ray_session, big):
    import ray

    table = _fixture_nodes()
    outs = {}
    for buckets in (16, big):
        ds = ray.data.from_arrow(table).repartition(8)
        d = str(tmp_path / f"b{buckets}")
        n = graph.range_sorted_write(ds, "node_id", ["node_id"], d,
                                     graph.NODES_SCHEMA,
                                     graph.encode_nodes_hex,
                                     num_buckets=buckets, dedup_key=True)
        assert n == 4000  # dups collapsed
        t = _read_sorted_dir(d)
        # filename order == global order: the concatenated column is
        # globally sorted
        col = t["node_id"].to_pylist()
        assert col == sorted(col)
        outs[buckets] = t
    assert outs[16].equals(outs[big])


def test_two_byte_prefix_matches_one_byte_semantics():
    """For B ≤ 256 the 2-byte form must reproduce the original 1-byte
    bucketing bit-for-bit (first byte >> (8 - log2 B))."""
    import numpy as np

    ids = [content_id_bin("x", str(i)) for i in range(1000)]
    t = pa.table({"node_id": pa.array(ids, pa.binary(20))})
    for b in (1, 2, 16, 64, 256):
        rb = graph._append_range_bucket(t, "node_id", b)["_rb"] \
            .to_numpy(zero_copy_only=False)
        first = np.array([v[0] for v in ids], dtype=np.uint8)
        assert (rb == (first >> (8 - (b.bit_length() - 1)))).all()
    rb = graph._append_range_bucket(t, "node_id", 1024)["_rb"] \
        .to_numpy(zero_copy_only=False)
    two = np.array([(v[0] << 8) | v[1] for v in ids], dtype=np.uint16)
    assert (rb == (two >> 6)).all()
