"""Raw-task bucket exchange — the sink shuffle primitive.

``Dataset.groupby(bucket).map_groups(fn)`` in Ray 2.49 runs a
sample+sort-based AllToAll whose fixed overhead dominates when the
partitioning is already known: on the KG edge sink's 13.2M partial
rows (32 blocks × 32 buckets) the Dataset exchange measures 63.7 s,
push-based shuffle 27.0 s, and this two-wave raw-task exchange 12.1 s
— identical outputs. Since the bucket id is a small dense int computed
map-side (range or hash bucket), no sampling, sorting, or boundary
negotiation is needed: split each block by bucket (one sort +
zero-copy slices), then one reduce task per bucket concatenates its
slices and runs the caller's kernel.

This is the documented "raw Ray tasks as a last resort" case
(a deterministic fixed-partition exchange the Dataset API cannot
express without a general sort): the partitioning assumption is that
``bucket_col`` holds dense ints in [0, num_buckets) — both
``ops.hashagg.append_bucket`` and ``stages.graph._append_range_bucket``
guarantee it. Object count is O(blocks × buckets) zero-copy slices;
wave 2 is ``num_buckets`` tasks, so size buckets ≈ 2× cluster cores.

The primitives compose at the ObjectRef level so sinks can OVERLAP:
``split_refs`` launches wave 1 while the caller's Dataset streams;
``reduce_refs`` launches wave 2 un-gotten (optionally with an extra
per-bucket input ref that becomes ready later — Ray then delays just
that bucket's reduce, with no driver barrier anywhere). The blocking
``bucket_exchange`` keeps the original convenience contract.

Fault behavior matches Dataset tasks: both waves are stateless pure
tasks, retried by Ray on failure; sink reduce kernels write via
atomic tmp+rename so retries are idempotent.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _split_one(t: pa.Table, bucket_col: str, num_buckets: int):
    """Sort a block by bucket id and cut zero-copy slices per bucket."""
    t = t.sort_by([(bucket_col, "ascending")])
    rb = t[bucket_col].to_numpy(zero_copy_only=False)
    bounds = np.searchsorted(rb, np.arange(num_buckets + 1))
    body = t.drop_columns([bucket_col])
    return tuple(body.slice(bounds[b], bounds[b + 1] - bounds[b])
                 for b in range(num_buckets))


def split_refs(ds, num_buckets: int, *, bucket_col: str = "_rb") -> list:
    """Wave 1: consume ``ds`` (blocks carrying ``bucket_col`` dense
    ints in [0, num_buckets)) and launch one split task per block.
    Returns a list of per-block ref tuples (each ``num_buckets`` long;
    empty list for an empty dataset). BLOCKS the calling thread while
    the upstream pipeline streams — run in a worker thread to overlap
    two exchanges' upstreams."""
    import ray

    @ray.remote(num_returns=max(num_buckets, 2))
    def split_block(t):
        if bucket_col not in t.column_names:
            # Dataset unions can emit empty sentinel blocks with a
            # zero-column schema that bypass the upstream map_batches —
            # they carry no rows, so they bucket to nothing
            if t.num_rows == 0:
                return (None,) * max(num_buckets, 2)
            raise KeyError(f"block missing bucket column {bucket_col!r}")
        parts = _split_one(t, bucket_col, num_buckets)
        # pad to ≥2 returns (ray num_returns≥2 contract kept uniform)
        return parts + (None,) * (max(num_buckets, 2) - num_buckets)

    splits = []
    for bundle in ds.iter_internal_ref_bundles():
        for blk, _ in bundle.blocks:
            splits.append(split_block.remote(blk))
    return splits


def reduce_refs(splits: list, num_buckets: int, reduce_fn, *,
                extra_inputs: list | None = None) -> list:
    """Wave 2: launch ``reduce_fn(bucket_id, table)`` once per bucket
    id over the concatenated bucket slices and return the UN-GOTTEN
    refs in bucket order. Empty buckets (and an empty split list) give
    ``table=None``. ``extra_inputs`` optionally appends one more table
    ref per bucket (e.g. a small side table computed downstream of
    another exchange) — that bucket's reduce waits for it without any
    driver-side synchronization."""
    import ray

    @ray.remote
    def reduce_bucket(b, *tables):
        tabs = [x for x in tables if x is not None]
        t = pa.concat_tables(tabs, promote_options="default") if tabs \
            else None
        return reduce_fn(b, t)

    if not splits and extra_inputs is None:
        return []
    out = []
    for b in range(num_buckets):
        ins = [s[b] for s in splits]
        if extra_inputs is not None:
            ins.append(extra_inputs[b])
        out.append(reduce_bucket.remote(b, *ins))
    return out


def _probe_empty_schema(ds, bucket_col: str, reduce_fn) -> pa.Schema:
    """Derive the output schema of a zero-block exchange by running
    ``reduce_fn`` once, driver-side, on a 0-row table of the input
    dataset's schema (bucket column stripped — the same shape a reduce
    task sees). Every exchange kernel is 0-row-safe by contract, so the
    probe is exact whenever the input schema is recoverable; when it
    isn't (a truly schema-less empty dataset), fall back to the old
    zero-column behavior."""
    try:
        s = ds.schema(fetch_if_missing=False)
        base = getattr(s, "base_schema", None)
        if base is None:
            return pa.schema([])
        probe_in = base.empty_table()
        if bucket_col in probe_in.column_names:
            probe_in = probe_in.drop_columns([bucket_col])
        return reduce_fn(0, probe_in).schema
    except Exception:
        return pa.schema([])


def bucket_exchange(ds, num_buckets: int, reduce_fn, *,
                    bucket_col: str = "_rb") -> list:
    """Exchange ``ds`` (a Dataset whose blocks carry ``bucket_col``
    dense ints in [0, num_buckets)) and run ``reduce_fn(bucket_id,
    table)`` EXACTLY ONCE PER BUCKET ID on the concatenated bucket
    rows (the bucket column is stripped; a bucket with no rows gets
    ``table=None``). Returns the ray.get results in bucket order, or
    ``[]`` for an empty input — keep results small (counts, paths,
    partial tables)."""
    import ray

    splits = split_refs(ds, num_buckets, bucket_col=bucket_col)
    if not splits:
        return []
    return ray.get(reduce_refs(splits, num_buckets, reduce_fn))


def bucketed_map_groups(ds, num_buckets: int, fn, *,
                        bucket_col: str = "bucket", empty_schema=None):
    """Drop-in for ``ds.groupby(bucket_col).map_groups(fn)`` when the
    bucket column holds dense map-side ints in [0, num_buckets) — runs
    the raw-task exchange instead of the Dataset sort-based AllToAll
    (same measured rationale as the module docstring).

    Contract differences the caller's ``fn`` must satisfy (checked at
    each converted call site):
      * ``fn`` never sees the bucket column (the exchange strips it);
      * ``fn`` must be 0-row-safe: empty buckets receive a
        schema-correct 0-row table (Dataset map_groups skips empty
        groups entirely) and must return a 0-row table of the OUTPUT
        schema — all-vectorized kernels do this for free.

    Executes EAGERLY at call time (the exchange drains the upstream):
    a lazy upstream shared with another eager consumer is recomputed
    once per consumer — ``materialize()`` shared upstreams.
    """
    def reduce(b: int, t: pa.Table | None) -> pa.Table:
        if t is None:  # zero-block input
            return pa.table({})
        return fn(t)

    return bucket_exchange_ds(ds, num_buckets, reduce,
                              bucket_col=bucket_col,
                              empty_schema=empty_schema)


def bucket_exchange_ds(ds, num_buckets: int, reduce_fn, *,
                       bucket_col: str = "_rb", empty_schema=None):
    """Like ``bucket_exchange`` but the per-bucket results (pyarrow
    Tables) stay in the object store and come back as a Dataset
    (``from_arrow_refs`` over the un-gotten reduce refs) — for
    exchanges that feed further pipeline stages rather than the
    driver. ``empty_schema`` supplies the result schema when the
    input has no ref bundles at all (a filter-to-empty upstream still
    emits schema-correct 0-row blocks and never hits this path); when
    it is omitted, the zero-block result schema is derived by probing
    ``reduce_fn`` with a 0-row input of the dataset's schema, falling
    back to a zero-column table only when no schema is recoverable —
    so downstream column access keeps working on empty pipelines.

    NOTE this operator executes EAGERLY at call time (``split_refs``
    drains the upstream): a lazy upstream shared with another eager
    consumer is recomputed once per consumer — ``materialize()`` shared
    upstreams at the call site (see stages/dedup.line_dedup)."""
    import ray

    splits = split_refs(ds, num_buckets, bucket_col=bucket_col)
    if not splits:
        if empty_schema is None:
            empty_schema = _probe_empty_schema(ds, bucket_col, reduce_fn)
        return ray.data.from_arrow(empty_schema.empty_table())
    return ray.data.from_arrow_refs(
        reduce_refs(splits, num_buckets, reduce_fn))
