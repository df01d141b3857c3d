"""Distributed bucketed shuffle hash join — the fact×fact join primitive.

The reference's T2 lookup (reference:
src/main/scala/corwur/gffparser/GeneReader.scala:159-163) is
semantically a join whose build side is co-grouped rows, i.e. a
shuffle join; the broadcast-lookup pattern elsewhere in this engine
(ops/relational.q_join_enrich) only covers the dimension-sized build
side. This operator covers the case where BOTH sides are fact-scale:

  map side   : each side gets ``__jbucket = hash(keys) % B`` (the
               hashagg layout — reuse of ``_bucket_column`` so one
               partitioning function serves aggregate and join) plus a
               ``__jside`` tag; the two sides are padded to one common
               schema (missing columns filled with typed nulls) so a
               single ``union`` stream carries both.
  shuffle    : ONE exchange — the raw-task bucket exchange
               (ops.exchange) over ``__jbucket``; both sides of every
               key land in the same bucket by construction, with no
               sampling or sort-boundary negotiation.
  reduce side: per-bucket ``pyarrow.Table.join`` (Acero C++ hash join)
               after splitting the bucket back into its two sides.

Shuffle volume = |left| + |right| rows, each moved exactly once; hot
keys are bounded by bucket granularity (salt the key upstream if one
key exceeds a worker's heap — same contract as hash_aggregate).
``num_buckets`` is the reduce parallelism: size ≈ 2× cluster cores.

Join types: inner, left (left outer), full (full outer), semi (left
semi), anti (left anti) — each mapped onto the corresponding Acero
join; full-outer keys are the coalesced join keys.
"""

from __future__ import annotations

import pyarrow as pa

from .hashagg import _bucket_column

_ACERO_TYPE = {
    "inner": "inner",
    "left": "left outer",
    "full": "full outer",
    "semi": "left semi",
    "anti": "left anti",
}


def _null_column(n: int, typ: pa.DataType) -> pa.Array:
    return pa.nulls(n, typ)


def hash_join(left_ds, right_ds, on, *, right_on=None, how: str = "inner",
              num_buckets: int = 64, left_schema: pa.Schema | None = None,
              right_schema: pa.Schema | None = None):
    """Join two Datasets on equality keys via one bucketed shuffle.

    ``on``: left key column name(s). ``right_on``: right key names
    (default: same as ``on``); right keys are renamed onto the left
    names in the output. Non-key column names must be disjoint between
    the sides (rename upstream — no implicit suffixing).

    ``left_schema`` / ``right_schema``: optional schema hints. A lazy
    Dataset whose plan can't report its schema is otherwise pinned with
    a ``materialize()`` (an extra execution barrier); passing the known
    schema avoids that probe. The join itself executes eagerly at call
    time (the bucket exchange consumes both sides as they stream);
    the returned Dataset wraps the per-bucket results in the object
    store.

    Output columns: left columns (keys under their left names), then —
    for inner/left/full — the right side's non-key columns. semi/anti emit
    left columns only. Key dtypes must match exactly on both sides
    (cast upstream): the bucket hash is value-based per dtype, and a
    silent cross-dtype hash mismatch would drop matches.
    """
    if how not in _ACERO_TYPE:
        raise ValueError(f"how must be one of {sorted(_ACERO_TYPE)}")
    lkeys = [on] if isinstance(on, str) else list(on)
    rkeys = ([right_on] if isinstance(right_on, str) else list(right_on)) \
        if right_on is not None else list(lkeys)
    if len(lkeys) != len(rkeys):
        raise ValueError("on and right_on must have the same length")

    # schema() on a LAZY dataset triggers a partial execution that the
    # later real execution repeats (and nested joins compound it
    # exponentially) — if the plan doesn't already know its schema,
    # pin the side in the object store first. The exchange would
    # materialize the same bytes anyway, so this costs no extra I/O.
    def _ensure_schema(ds, hint):
        if hint is not None:
            return ds, hint
        s = ds.schema(fetch_if_missing=False)
        if s is None:
            ds = ds.materialize()
            s = ds.schema()
        if s is None:  # empty materialized datasets report no schema
            raise ValueError(
                "join side has no recoverable schema (empty dataset?) — "
                "pass left_schema/right_schema")
        return ds, s.base_schema

    left_ds, lschema = _ensure_schema(left_ds, left_schema)
    right_ds, rschema = _ensure_schema(right_ds, right_schema)
    lcols = list(lschema.names)
    rcols_all = list(rschema.names)
    rpayload = [c for c in rcols_all if c not in rkeys]
    overlap = (set(lcols) & set(rpayload)) | \
        (set(rpayload) & set(lkeys))
    if overlap:
        raise ValueError(f"non-key column name collision: {sorted(overlap)};"
                         " rename upstream")
    for lk, rk in zip(lkeys, rkeys):
        lt, rt = lschema.field(lk).type, rschema.field(rk).type
        if lt != rt:
            raise TypeError(f"key dtype mismatch {lk}:{lt} vs {rk}:{rt};"
                            " cast upstream")

    # one common layout: left cols (right keys live under left names),
    # then right payload cols, then side tag + bucket
    layout = [(c, lschema.field(c).type) for c in lcols] + \
             [(c, rschema.field(c).type) for c in rpayload]

    # Every padded block is CAST to the declared layout (no-op when the
    # types already match): the schema hints are enforced, not trusted,
    # so a hint/parquet dtype drift cannot produce blocks of mixed
    # types inside one exchange — and the bucket hash runs on the
    # casted keys, so both sides hash identical physical types.
    def pad_left(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {}
        for name, typ in layout:
            if name in lcols:
                cols[name] = t[name].cast(typ)
            else:
                cols[name] = _null_column(n, typ)
        out = pa.table({name: cols[name] for name, _ in layout})
        out = out.append_column("__jside",
                                pa.repeat(pa.scalar(0, pa.int8()), n))
        return out.append_column(
            "__jbucket", _bucket_column(out, lkeys, num_buckets))

    def pad_right(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {}
        for name, typ in layout:
            if name in lkeys:
                cols[name] = t[rkeys[lkeys.index(name)]].cast(typ)
            elif name in rpayload:
                cols[name] = t[name].cast(typ)
            else:
                cols[name] = _null_column(n, typ)
        out = pa.table({name: cols[name] for name, _ in layout})
        out = out.append_column("__jside",
                                pa.repeat(pa.scalar(1, pa.int8()), n))
        return out.append_column(
            "__jbucket", _bucket_column(out, lkeys, num_buckets))

    both = left_ds.map_batches(pad_left, batch_format="pyarrow").union(
        right_ds.map_batches(pad_right, batch_format="pyarrow"))

    jt = _ACERO_TYPE[how]
    out_names = lcols + (rpayload if how in ("inner", "left", "full") else [])

    def join_bucket(g: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        side = g["__jside"]
        lt = g.filter(pc.equal(side, 0)).select(lcols)
        rt = g.filter(pc.equal(side, 1)).select(lkeys + rpayload)
        # Acero rejects nested (list/struct) payload columns, so the
        # join itself runs on (keys, row-index) only; payloads of any
        # type are then gathered with `take` (C kernel, null-safe for
        # the left-outer miss rows)
        ltk = lt.select(lkeys).append_column(
            "__lidx", pa.array(np.arange(lt.num_rows, dtype=np.int64)))
        if how in ("semi", "anti"):
            keep = ltk.join(rt.select(lkeys), keys=lkeys, right_keys=lkeys,
                            join_type=jt)
            return lt.take(keep["__lidx"]).select(out_names)
        rtk = rt.select(lkeys).append_column(
            "__ridx", pa.array(np.arange(rt.num_rows, dtype=np.int64)))
        idx = ltk.join(rtk, keys=lkeys, right_keys=lkeys, join_type=jt,
                       coalesce_keys=True)
        # keys come from the join's coalesced key columns (for full
        # outer, right-only rows have no left index to take from);
        # non-key columns gather via take, null-safe on miss indices
        cols = {k: idx[k] for k in lkeys}
        lidx = idx["__lidx"]
        for c in lcols:
            if c not in lkeys:
                cols[c] = lt[c].take(lidx)
        ridx = idx["__ridx"]
        for c in rpayload:
            cols[c] = rt[c].take(ridx)
        return pa.table({name: cols[name] for name in out_names})

    # raw-task bucket exchange instead of Dataset.groupby — the bucket
    # id is a dense map-side int, so the sort-based AllToAll's
    # sample/sort phases are pure overhead (same measured rationale as
    # ops.hashagg). Padded blocks always carry the full union layout,
    # so empty buckets join schema-correct 0-row sides and emit a
    # typed empty table; per-bucket results stay in the object store.
    from .exchange import bucket_exchange_ds

    def reduce(b: int, g: pa.Table | None) -> pa.Table:
        if g is None:  # zero-block input (both sides empty of blocks)
            return pa.table({})
        return join_bucket(g)

    # the output layout is fully declared, so the zero-block case (both
    # sides with no ref bundles at all) gets a typed empty schema —
    # downstream column access keeps working on empty pipelines
    typ = dict(layout)
    empty_schema = pa.schema([(n, typ[n]) for n in out_names])
    return bucket_exchange_ds(both, num_buckets, reduce,
                              bucket_col="__jbucket",
                              empty_schema=empty_schema)
