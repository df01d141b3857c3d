"""Bucketed two-phase hash aggregation — the engine's wide-aggregate
primitive.

``Dataset.groupby(key).aggregate(...)`` in Ray 2.49 runs a sort-based
exchange whose map phase is expensive per block for high-cardinality
keys. This operator implements the classic combiner + hash-partition
layout instead, measured ~2.5× faster at 600k rows / 150k keys:

  map side   : per-batch ``pyarrow.Table.group_by`` partial aggregate
               (C kernel) + a ``bucket = stable_hash(keys) % B`` column
  shuffle    : the raw-task bucket exchange (ops.exchange) on the
               dense map-side bucket id — no sampling, no sort
  reduce side: per-bucket ``group_by`` final aggregate (C kernel)

The shuffle volume is bounded by (distinct keys per batch × batches),
the combiner rule of SURVEY.md §4.2; hot keys are spread map-side by
the partial aggregation (one partial row per key per batch regardless
of the key's row count). ``num_buckets`` is the reduce parallelism —
size ≈ 2× cluster cores at scale.

Supported aggregate ops (pyarrow kernel names): sum, count, min, max,
mean (decomposed into sum+count automatically).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import stable_hash64

_MERGE_OF = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def _bucket_column(t: pa.Table, keys: list[str], num_buckets: int) -> pa.Array:
    """bucket = hash(keys) % B — fully vectorized.

    Integers: arrow bit/mod kernels. Strings/tuples: polars hash_rows
    (Rust, no Python-object conversion); bucket assignment only needs
    same-key → same-bucket within one run, which any of these give."""
    if len(keys) == 1 and pa.types.is_integer(t.schema.field(keys[0]).type):
        # two's-complement wrap (numpy astype), NOT an arrow checked
        # cast — negative keys (e.g. a -1 sentinel) must bucket fine
        v = t[keys[0]].to_numpy(zero_copy_only=False).astype(np.int64)
        h = v.astype(np.uint64) % np.uint64(num_buckets)
        return pa.array(h.astype(np.int32), pa.int32())
    try:
        import polars as pl

        h = pl.from_arrow(t.select(keys)).hash_rows(seed=42).to_numpy()
    except ImportError:  # pragma: no cover - polars is in the image
        combined = t[keys[0]].cast(pa.string())
        for k in keys[1:]:
            combined = pc.binary_join_element_wise(
                combined, t[k].cast(pa.string()), "\x1f")
        h = stable_hash64(combined.to_pylist())
    return pa.array((h % np.uint64(num_buckets)).astype(np.int32), pa.int32())


def append_bucket(t: pa.Table, keys: list[str], num_buckets: int,
                  name: str = "bucket") -> pa.Table:
    """Append the bucket column, stripping schema metadata first —
    parquet pandas-metadata dicts on blocks entering a groupby make
    Ray's schema-dedup hashing fail (log noise in every reduce task)."""
    return t.replace_schema_metadata(None).append_column(
        name, _bucket_column(t, keys, num_buckets))


def hash_aggregate(ds, keys: str | list[str],
                   aggs: list[tuple[str, str, str]],
                   num_buckets: int = 64):
    """Aggregate ``ds`` by ``keys``.

    ``aggs``: list of (column, op, out_name); op ∈ sum|count|min|max|mean.
    Returns a Dataset with columns keys + out_names (count/sum emitted
    with their natural pyarrow output types)."""
    keys = [keys] if isinstance(keys, str) else list(keys)

    # decompose means into sum+count with derived finalization
    plan = []      # (src_col, op, partial_name, merge_op, out_name|None)
    means = []     # (out_name, sum_partial, cnt_partial)
    for col, op, out in aggs:
        if op == "mean":
            plan.append((col, "sum", f"__s_{out}", "sum", None))
            plan.append((col, "count", f"__c_{out}", "sum", None))
            means.append((out, f"__s_{out}", f"__c_{out}"))
        else:
            plan.append((col, op, f"__p_{out}", _MERGE_OF[op], out))

    def _checked_rename(g: pa.Table, expect_aggs: list[str],
                        new_names: list[str]) -> pa.Table:
        # keys-first ordering is what pyarrow 16.x emits; assert rather
        # than silently mis-assign if an upgrade reorders the output
        expected = keys + expect_aggs
        if g.column_names != expected:
            raise AssertionError(
                f"pyarrow group_by output order changed: "
                f"got {g.column_names}, expected {expected}")
        return g.rename_columns(keys + new_names)

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(keys).aggregate([(col, op) for col, op, *_ in plan])
        g = _checked_rename(g, [f"{col}_{op}" for col, op, *_ in plan],
                            [p[2] for p in plan])
        # strip parquet pandas-metadata: blocks with dict metadata break
        # Ray's schema-dedup hashing in the exchange (log noise per task)
        g = g.replace_schema_metadata(None)
        return g.append_column("bucket", _bucket_column(g, keys, num_buckets))

    def final(g: pa.Table) -> pa.Table:
        out = g.group_by(keys).aggregate(
            [(p[2], p[3]) for p in plan])
        out = _checked_rename(out, [f"{p[2]}_{p[3]}" for p in plan],
                              [p[2] for p in plan])
        cols = {k: out[k] for k in keys}
        for col, op, pname, merge, oname in plan:
            if oname is not None:
                cols[oname] = out[pname]
        for oname, s, c in means:
            cols[oname] = pc.divide(pc.cast(out[s], pa.float64()),
                                    pc.cast(out[c], pa.float64()))
        return pa.table(cols)

    # the exchange is the raw-task bucket exchange (ops.exchange), not
    # Dataset.groupby: the bucket id is already a dense map-side int,
    # so the Dataset sort-based AllToAll's sample/sort machinery is
    # pure overhead — measured 6.6 s vs 1.3 s cold and 1.6 s vs 0.9 s
    # warm for the one-level lineitem aggregate at sf0.1 / 32 cpus.
    # Every post-`partial` block carries the full partial schema, so
    # empty buckets reduce over schema-correct 0-row slices and
    # `final` returns a typed empty table — no schema hints needed.
    # Results stay in the object store (from_arrow_refs), one block
    # per bucket.
    # NOTE: executes eagerly at call time (the exchange drains the
    # upstream) — a lazy upstream shared with another eager consumer
    # is recomputed once per consumer; materialize() shared upstreams.
    from .exchange import bucket_exchange_ds

    def reduce(b: int, t: pa.Table | None) -> pa.Table:
        if t is None:  # zero-block input (unreachable via `partial`)
            return pa.table({})
        return final(t)

    # derive the typed output schema for the zero-block case (an input
    # dataset with no ref bundles at all) by running the partial+final
    # kernels on a 0-row table of the input schema, when it is known —
    # keeps empty pipelines schema-correct for downstream column access
    empty_schema = None
    try:
        base = getattr(ds.schema(fetch_if_missing=False), "base_schema",
                       None)
        if base is not None:
            empty_schema = final(
                partial(base.empty_table()).drop_columns(["bucket"])).schema
    except Exception:
        pass

    mapped = ds.map_batches(partial, batch_format="pyarrow")
    return bucket_exchange_ds(mapped, num_buckets, reduce,
                              bucket_col="bucket",
                              empty_schema=empty_schema)


def hash_count(ds, keys: str | list[str], out_name: str = "n",
               num_buckets: int = 64):
    """Row count per key via the same two-phase layout."""
    keys_l = [keys] if isinstance(keys, str) else list(keys)
    first = keys_l[0]
    return hash_aggregate(ds, keys_l, [(first, "count", out_name)],
                          num_buckets=num_buckets)
