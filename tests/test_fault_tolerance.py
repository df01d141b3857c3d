"""Fault-injection tests for the raw-task bucket exchange.

ops/exchange.py documents its fault behavior: both waves are stateless
pure tasks that Ray retries on worker failure, and sink reduce kernels
write via atomic tmp+rename so retries are idempotent. These tests pin
that claim by killing a reduce worker mid-task (os._exit — a system
failure, the class of fault Ray's default task retry covers) and
asserting the exchange still produces the exact no-crash result with
no duplicate or partial sink files.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from gfftoneo4j_ray.ops.exchange import bucket_exchange
from gfftoneo4j_ray.ops.hashagg import append_bucket


def _bucketed_ds(ray, B: int):
    df = pd.DataFrame({"k": np.arange(40, dtype=np.int64),
                       "v": np.arange(40, dtype=np.int64) * 10})
    return ray.data.from_pandas(df).repartition(4).map_batches(
        lambda t: append_bucket(t, ["k"], B, name="_rb"),
        batch_format="pyarrow")


def test_reduce_retry_after_worker_crash(ray_session, tmp_path):
    """Kill the bucket-1 reduce worker on its first attempt: Ray must
    retry the task and the exchange must return the same per-bucket
    sums as an uninjected run."""
    ray = ray_session
    B = 8
    marker = str(tmp_path / "crashed-once")

    def reduce_fn(b: int, t: pa.Table | None):
        if b == 1 and t is not None:
            try:
                # atomic create: exactly ONE attempt crashes
                os.close(os.open(marker, os.O_CREAT | os.O_EXCL))
                os._exit(1)
            except FileExistsError:
                pass  # retry attempt — proceed normally
        if t is None:
            return (b, 0)
        return (b, int(pa.compute.sum(t["v"]).as_py()))

    out = bucket_exchange(_bucketed_ds(ray, B), B, reduce_fn)
    assert os.path.exists(marker), "injection never fired"
    want_total = sum(range(40)) * 10
    assert sum(s for _, s in out) == want_total
    assert [b for b, _ in out] == list(range(B))


def test_sink_write_retry_idempotent(ray_session, tmp_path):
    """A sink reduce kernel (tmp+rename parquet part per bucket, the
    same discipline as the graph sink) crashed right after its rename
    must, on retry, overwrite the same deterministic filename: exactly
    one part per non-empty bucket, no .tmp litter, exact row totals."""
    ray = ray_session
    B = 8
    outdir = tmp_path / "parts"
    outdir.mkdir()
    marker = str(tmp_path / "crashed-once")

    def reduce_fn(b: int, t: pa.Table | None):
        if t is None:
            return 0
        path = outdir / f"part-{b:05d}.parquet"
        tmpf = f"{path}.tmp.{os.getpid()}"
        pq.write_table(t, tmpf)
        os.replace(tmpf, path)
        if b == 2:
            try:
                os.close(os.open(marker, os.O_CREAT | os.O_EXCL))
                os._exit(1)  # crash AFTER the rename: worst case —
                # the retry re-writes an already-committed part
            except FileExistsError:
                pass
        return t.num_rows

    counts = bucket_exchange(_bucketed_ds(ray, B), B, reduce_fn)
    assert os.path.exists(marker), "injection never fired"
    assert sum(counts) == 40
    parts = sorted(p.name for p in outdir.iterdir())
    assert parts == [f"part-{b:05d}.parquet" for b in range(B)
                     if counts[b]], f"unexpected sink contents: {parts}"
    got = pq.read_table(str(outdir)).to_pandas().sort_values("k")
    assert list(got["k"]) == list(range(40))
    assert list(got["v"]) == [k * 10 for k in range(40)]
