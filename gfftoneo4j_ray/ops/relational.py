"""Relational operator library over the benchmark tables — Ray Data forms
of every relational operator class in SURVEY.md §2, each with a DuckDB
oracle (see __ray_entry__.oracle_sql).

Conventions shared with the oracle SQL (the driver hash-compares values):
  * monetary / fractional aggregates are emitted as scaled BIGINTs via
    ``floor(x * scale + 0.5)`` — identical formula on both sides, so a
    last-ulp difference in double summation order cannot flip the value
    (half-away rounding without engine-specific ROUND semantics).
  * every computed column is explicitly named, identically in both.
  * results are small (aggregates / bounded row sets) — fine to return
    as Datasets the driver materializes.

Scale notes are per function; the common rules: prune columns at
``read_parquet``, pre-aggregate inside ``map_batches`` before any
groupby (combiner), broadcast dimension tables instead of shuffling
fact tables, and express per-group windows as ``map_groups`` over an
explicitly sorted group.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _read(sf_dir: str, table: str, columns=None):
    from .. import read_parquet_clean

    # metadata-free schema at the source (see read_parquet_clean)
    return read_parquet_clean(f"{sf_dir}/{table}.parquet", columns=columns)


def _scaled(arr, scale: int = 100) -> pa.Array:
    """floor(x*scale + 0.5) as int64 — the shared exact-compare convention."""
    a = np.asarray(arr, dtype=np.float64)
    return pa.array(np.floor(a * scale + 0.5).astype(np.int64), pa.int64())


# ---------------------------------------------------------------------------
# P: per-record parse / project / filter  (GffParser analogues, §2.2)
# ---------------------------------------------------------------------------

def q_parse_attrs(sf_dir: str):
    """Semi-structured attribute parse (P7-P12 analogue): extract the
    numeric ``k`` attribute from the events ``props`` kv-string column.

    Vectorized: one compiled-regex `pc.extract_regex` per batch."""
    ds = _read(sf_dir, "events", columns=["event_id", "props"])

    def parse(t: pa.Table) -> pa.Table:
        ex = pc.extract_regex(t["props"], r'"k": (?P<k>\d+)')
        kv = pc.struct_field(ex, "k")
        return pa.table({
            "event_id": t["event_id"],
            "k_val": pc.cast(kv, pa.int64()),
        })

    return ds.map_batches(parse, batch_format="pyarrow")


def q_filter_project(sf_dir: str):
    """Filter + computed projection (P3-P6, P13): lineitems shipped
    before 1995-06-01, revenue = price*(1-discount) in scaled cents."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linenumber", "l_shipdate",
                        "l_extendedprice", "l_discount"])
    cutoff = pa.scalar(np.datetime64("1995-06-01T00:00:00", "us"),
                       pa.timestamp("us"))

    def fn(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["l_shipdate"], cutoff))
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "l_linenumber": t["l_linenumber"],
            "revenue_c": _scaled(rev.to_numpy(zero_copy_only=False)),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# G: grouped aggregation with map-side combiners (§2.4)
# ---------------------------------------------------------------------------

def q_lineitem_agg(sf_dir: str):
    """TPC-H-Q1-shaped rollup (G2/G7): per (returnflag, linestatus) sums
    and counts via the engine's bucketed two-phase hash aggregate
    (combiner rule §4.2 — the shuffle moves per-batch partials)."""
    from .hashagg import hash_aggregate

    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity",
                        "l_extendedprice", "l_discount"])

    def derive(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "qty": t["l_quantity"],
            "price": t["l_extendedprice"],
            "rev": rev,
        })

    agg = hash_aggregate(
        ds.map_batches(derive, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        [("qty", "sum", "sum_qty_raw"),
         ("price", "sum", "sum_price_raw"),
         ("rev", "sum", "sum_rev_raw"),
         ("qty", "count", "n_rows")],
        num_buckets=8)

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "sum_qty_c": _scaled(t["sum_qty_raw"].to_numpy(zero_copy_only=False)),
            "sum_price_c": _scaled(t["sum_price_raw"].to_numpy(zero_copy_only=False)),
            "sum_rev_c": _scaled(t["sum_rev_raw"].to_numpy(zero_copy_only=False)),
            "n_rows": pc.cast(t["n_rows"], pa.int64()),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


def q_two_level_rollup(sf_dir: str):
    """Two chained shuffles (G3→G4, the exon→splicing→gene shape):
    lineitem → per-order quantity, then orders joined on via the
    distributed bucketed shuffle hash join (both sides fact-scale; no
    driver materialization), then per-customer totals."""
    from .hashagg import hash_aggregate
    from .join import hash_join

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
    per_order = hash_aggregate(li, "l_orderkey",
                               [("l_quantity", "sum", "order_qty")])

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    enriched = hash_join(per_order, orders, on="l_orderkey",
                         right_on="o_orderkey", how="inner", num_buckets=32,
                         left_schema=pa.schema([("l_orderkey", pa.int64()),
                                                ("order_qty", pa.float64())]))
    per_cust = hash_aggregate(enriched, "o_custkey",
                              [("order_qty", "sum", "cust_qty_raw"),
                               ("order_qty", "count", "n_orders")],
                              num_buckets=16)

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": t["o_custkey"],
            "cust_qty_c": _scaled(t["cust_qty_raw"].to_numpy(zero_copy_only=False)),
            "n_orders": pc.cast(t["n_orders"], pa.int64()),
        })

    return per_cust.map_batches(finalize, batch_format="pyarrow")


def q_group_consistency(sf_dir: str):
    """T4 analogue: a group's derived key must be unique within the
    group, else the group is dropped (exactly-one-distinct constraint,
    reference GeneReader.scala:205-220): orders whose lineitems all
    share one returnflag → (o_orderkey, the_flag).

    Bucketed: the exchange groups hash(orderkey) % 32 small ints; whole
    buckets are processed with one vectorized run-boundary pass (a
    sorted run is all-equal iff its endpoints are equal) — no per-group
    Python dispatch over thousands of orders."""
    from .hashagg import append_bucket

    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag"])

    def add_bucket(t: pa.Table) -> pa.Table:
        return append_bucket(t, ["l_orderkey"], 32)

    def per_bucket(g: pa.Table) -> pa.Table:
        g = g.sort_by([("l_orderkey", "ascending"),
                       ("l_returnflag", "ascending")])
        keys = g["l_orderkey"].to_numpy(zero_copy_only=False)
        flags = g["l_returnflag"].to_numpy(zero_copy_only=False)
        if len(keys) == 0:
            return pa.schema([("o_orderkey", pa.int64()),
                              ("the_flag", pa.string())]).empty_table()
        starts = np.r_[0, np.flatnonzero(keys[1:] != keys[:-1]) + 1]
        ends = np.r_[starts[1:], len(keys)] - 1
        ok = flags[starts] == flags[ends]
        return pa.table({
            "o_orderkey": pa.array(keys[starts][ok], pa.int64()),
            "the_flag": pa.array(flags[starts][ok], pa.string()),
        })

    from .exchange import bucketed_map_groups

    # raw-task bucket exchange (ops.exchange rationale); per_bucket is
    # 0-row-safe and never reads the bucket column
    return bucketed_map_groups(
        ds.map_batches(add_bucket, batch_format="pyarrow"), 32, per_bucket)


def q_distinct(sf_dir: str):
    """D2/G6: distinct (returnflag, linestatus) combos via map-side
    distinct + tiny global dedup (never a full-row shuffle)."""
    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus"])

    from .exchange import bucketed_map_groups
    from .hashagg import append_bucket

    keys = ["l_returnflag", "l_linestatus"]

    def local_distinct(t: pa.Table) -> pa.Table:
        return append_bucket(t.group_by(keys).aggregate([]), keys, 8)

    def per_bucket(g: pa.Table) -> pa.Table:
        return g.group_by(keys).aggregate([])

    return bucketed_map_groups(
        ds.map_batches(local_distinct, batch_format="pyarrow"), 8, per_bucket)


# ---------------------------------------------------------------------------
# T: joins (broadcast small side, §2.3 T2)
# ---------------------------------------------------------------------------

#: rows at which a "dimension" side stops being broadcastable and must
#: route through the shuffle hash join instead. customer GROWS with
#: scale factor (it is a semi-dimension, unlike nation's fixed 25 rows)
#: — a driver `.to_pandas()` of it would be a scale bug past this bound
#: (VERDICT r2 item 5). ~2M keys ≈ 32 MB of int64 pairs per worker.
BROADCAST_BUDGET_ROWS = 2_000_000


def q_join_enrich(sf_dir: str,
                  broadcast_budget_rows: int = BROADCAST_BUDGET_ROWS):
    """Dimension enrichment, mixed strategy: when customer fits the
    broadcast budget it is shipped once (ray.put) and looked up per
    batch so only the final small per-nation aggregate shuffles; above
    the budget, orders ⋈ customer routes through the distributed
    shuffle hash join and only nation (fixed 25 rows) is broadcast.
    Semantically orders ⋈ customer ⋈ nation → revenue per nation."""
    import ray

    from .hashagg import hash_aggregate

    nat = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    n2name = dict(zip(nat["n_nationkey"], nat["n_name"]))
    cust_ds = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    if cust_ds.count() <= broadcast_budget_rows:
        cust = cust_ds.to_pandas()
        c2n = dict(zip(cust["c_custkey"], cust["c_nationkey"].map(n2name)))
        ref = ray.put(c2n)

        def enrich(t: pa.Table, _ref=ref) -> pa.Table:
            import ray as _r
            c2n_local = _r.get(_ref)
            names = [c2n_local.get(k) for k in t["o_custkey"].to_pylist()]
            out = pa.table({
                "n_name": pa.array(names, pa.string()),
                "o_totalprice": t["o_totalprice"],
            })
            g = out.group_by("n_name").aggregate([("o_totalprice", "sum")])
            return g.rename_columns(["n_name", "price_sum"])

        partials = orders.map_batches(enrich, batch_format="pyarrow")
    else:
        from .join import hash_join

        joined = hash_join(
            orders, cust_ds, on="o_custkey", right_on="c_custkey",
            how="inner", num_buckets=32,
            left_schema=pa.schema([("o_custkey", pa.int64()),
                                   ("o_totalprice", pa.float64())]),
            right_schema=pa.schema([("c_custkey", pa.int64()),
                                    ("c_nationkey", pa.int32())]))
        nref = ray.put(n2name)

        def name_partials(t: pa.Table, _ref=nref) -> pa.Table:
            import ray as _r
            n2n = _r.get(_ref)
            names = [n2n.get(k) for k in t["c_nationkey"].to_pylist()]
            out = pa.table({
                "n_name": pa.array(names, pa.string()),
                "o_totalprice": t["o_totalprice"],
            })
            g = out.group_by("n_name").aggregate([("o_totalprice", "sum")])
            return g.rename_columns(["n_name", "price_sum"])

        partials = joined.map_batches(name_partials, batch_format="pyarrow")

    agg = hash_aggregate(partials, "n_name",
                         [("price_sum", "sum", "total_raw")], num_buckets=8)

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table({
            "n_name": t["n_name"],
            "total_c": _scaled(t["total_raw"].to_numpy(zero_copy_only=False)),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# O: sort / top-k / adjacent pairs (§2.5)
# ---------------------------------------------------------------------------

def q_sort_topk(sf_dir: str):
    """O1 + limit: top-50 lineitems by extendedprice (deterministic
    tiebreak on orderkey, linenumber)."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linenumber", "l_extendedprice"])
    top = ds.sort(["l_extendedprice", "l_orderkey", "l_linenumber"],
                  descending=[True, False, False]).limit(50)

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "l_linenumber": t["l_linenumber"],
            "price_c": _scaled(t["l_extendedprice"].to_numpy(zero_copy_only=False)),
        })

    return top.map_batches(finalize, batch_format="pyarrow")


def q_adjacent_pairs(sf_dir: str):
    """O2 analogue (createPairs zip): per user, events sorted by
    (ts, event_id), consecutive pairs with the gap in microseconds —
    the order-edge chain as a relational query.

    Bucketed: hash(user_id) % 32 exchange; whole buckets sorted by
    (user_id, ts, event_id) and paired with one vectorized shift —
    the pair (i, i+1) is kept iff user_id[i] == user_id[i+1]."""
    from .hashagg import append_bucket

    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts"])

    def add_bucket(t: pa.Table) -> pa.Table:
        return append_bucket(t, ["user_id"], 32)

    PAIRS_SCHEMA = pa.schema([("user_id", pa.int64()),
                              ("event_id", pa.int64()),
                              ("next_event_id", pa.int64()),
                              ("gap_us", pa.int64())])

    def per_bucket(g: pa.Table) -> pa.Table:
        g = g.sort_by([("user_id", "ascending"), ("ts", "ascending"),
                       ("event_id", "ascending")])
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        ids = g["event_id"].to_numpy(zero_copy_only=False)
        ts = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        if len(ids) < 2:
            return PAIRS_SCHEMA.empty_table()
        same = uid[1:] == uid[:-1]
        return pa.table({
            "user_id": pa.array(uid[:-1][same], pa.int64()),
            "event_id": pa.array(ids[:-1][same], pa.int64()),
            "next_event_id": pa.array(ids[1:][same], pa.int64()),
            "gap_us": pa.array((ts[1:] - ts[:-1])[same], pa.int64()),
        })

    from .exchange import bucketed_map_groups

    # raw-task bucket exchange (ops.exchange rationale); per_bucket is
    # 0-row-safe and never reads the bucket column
    return bucketed_map_groups(
        ds.map_batches(add_bucket, batch_format="pyarrow"), 32, per_bucket)


def q_window_agg(sf_dir: str):
    """Streaming-shaped tumbling window (§2.7): per (event_type, 1h
    window) count + scaled value sum; window id = epoch_us // 3600e6 —
    computed identically in the SQL oracle."""
    from .hashagg import hash_aggregate

    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def windowed(t: pa.Table) -> pa.Table:
        w = pc.divide(pc.cast(t["ts"], pa.int64()), 3_600_000_000)
        return pa.table({
            "event_type": t["event_type"],
            "window_id": w,
            "value": t["value"],
        })

    agg = hash_aggregate(ds.map_batches(windowed, batch_format="pyarrow"),
                         ["event_type", "window_id"],
                         [("value", "count", "n_events"),
                          ("value", "sum", "value_raw")], num_buckets=16)

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "window_id": pc.cast(t["window_id"], pa.int64()),
            "n_events": pc.cast(t["n_events"], pa.int64()),
            "value_c": _scaled(t["value_raw"].to_numpy(zero_copy_only=False)),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


def q_hopping_window(sf_dir: str):
    """Hopping (sliding) window (§2.7): 1h windows hopping every 30min
    — each event lands in exactly 2 windows (window start ∈
    {bucket30(ts), bucket30(ts) − 30min}). The 2-way window assignment
    and hash_aggregate's per-batch partial combine are both map-side
    (Ray fuses the consecutive map_batches into one task), so the
    shuffle moves ~2×#distinct-windows partial rows, not 2× the event
    stream."""
    from .hashagg import hash_aggregate

    HOP_US = 1_800_000_000

    ds = _read(sf_dir, "events", columns=["ts", "value"])

    def assign(t: pa.Table) -> pa.Table:
        tus = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        w0 = (tus // HOP_US) * HOP_US
        ws = np.concatenate([w0, w0 - HOP_US])
        val = t["value"].to_numpy(zero_copy_only=False)
        return pa.table({
            "ws_us": pa.array(ws, pa.int64()),
            "value": pa.array(np.concatenate([val, val]), pa.float64()),
        })

    agg = hash_aggregate(ds.map_batches(assign, batch_format="pyarrow"),
                         ["ws_us"],
                         [("value", "count", "n_events"),
                          ("value", "sum", "value_raw")], num_buckets=8)

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table({
            "ws_us": pc.cast(t["ws_us"], pa.int64()),
            "n_events": pc.cast(t["n_events"], pa.int64()),
            "value_c": _scaled(t["value_raw"].to_numpy(zero_copy_only=False)),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


def q_semi_join(sf_dir: str,
                broadcast_budget_rows: int = BROADCAST_BUDGET_ROWS):
    """Semi-join, mixed strategy: when customer fits the broadcast
    budget its BUILDING key set is broadcast (ray.put once, map-side
    is_in filter on orders); above the budget orders ⋉ customer routes
    through the distributed shuffle hash join instead (customer never
    touches the driver). lineitem ⋉ filtered-orders is fact×fact and
    always runs through the shuffle join."""
    import ray

    from .join import hash_join

    cust_ds = _read(sf_dir, "customer",
                    columns=["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    if cust_ds.count() <= broadcast_budget_rows:
        cust = cust_ds.to_pandas()
        keys = pa.array(sorted(cust.loc[cust["c_mktsegment"] == "BUILDING",
                                        "c_custkey"]), pa.int64())
        ref = ray.put(keys)

        def building_orders(t: pa.Table, _r=ref) -> pa.Table:
            import ray as _ray
            ks = _ray.get(_r)
            return t.filter(pc.is_in(t["o_custkey"], value_set=ks)) \
                .select(["o_orderkey"])

        orders_f = orders.map_batches(building_orders, batch_format="pyarrow")
    else:
        def building_cust(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["c_mktsegment"], "BUILDING")) \
                .select(["c_custkey"])

        bc = cust_ds.map_batches(building_cust, batch_format="pyarrow")
        orders_f = hash_join(
            orders, bc, on="o_custkey", right_on="c_custkey", how="semi",
            num_buckets=32,
            left_schema=pa.schema([("o_orderkey", pa.int64()),
                                   ("o_custkey", pa.int64())]),
            right_schema=pa.schema([("c_custkey", pa.int64())])) \
            .select_columns(["o_orderkey"])

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linenumber", "l_quantity"])
    kept = hash_join(li, orders_f, on="l_orderkey", right_on="o_orderkey",
                     how="semi", num_buckets=32,
                     right_schema=pa.schema([("o_orderkey", pa.int64())]))

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "l_linenumber": t["l_linenumber"],
            "qty_c": _scaled(t["l_quantity"].to_numpy(zero_copy_only=False)),
        })

    return kept.map_batches(finalize, batch_format="pyarrow")


def q_anti_join(sf_dir: str):
    """Anti-join via the distributed shuffle hash join: customers with
    NO large (totalprice > 400k) order. The probe side (orders) is
    fact-scale — it is filtered map-side and shuffled, never collected
    on the driver."""
    from .join import hash_join

    def big(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t["o_totalprice"], 400000.0)) \
            .select(["o_custkey"])

    big_orders = _read(sf_dir, "orders",
                       columns=["o_custkey", "o_totalprice"]) \
        .map_batches(big, batch_format="pyarrow")
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    return hash_join(cust, big_orders, on="c_custkey", right_on="o_custkey",
                     how="anti", num_buckets=16,
                     right_schema=pa.schema([("o_custkey", pa.int64())]))


def q_shuffle_join(sf_dir: str):
    """Full fact×fact inner join (the T2 lookup as a real distributed
    join, reference GeneReader.scala:159-163): every lineitem enriched
    with its order's customer and priority. Both sides shuffle once on
    hash(orderkey) % B; per-bucket Acero hash join — no broadcast, no
    driver materialization of either side."""
    from .join import hash_join

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linenumber", "l_quantity"])
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderpriority"])
    joined = hash_join(li, orders, on="l_orderkey", right_on="o_orderkey",
                       how="inner", num_buckets=64)

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "l_linenumber": t["l_linenumber"],
            "qty_c": _scaled(t["l_quantity"].to_numpy(zero_copy_only=False)),
            "o_custkey": t["o_custkey"],
            "o_orderpriority": t["o_orderpriority"],
        })

    return joined.map_batches(finalize, batch_format="pyarrow")


def q_outer_join(sf_dir: str):
    """Full-outer fact×dimension join through the distributed shuffle
    join: open-order counts per customer FULL OUTER JOIN high-balance
    customers — unmatched rows survive on BOTH sides (customers with no
    open orders; open-order customers below the balance cut). Keys are
    the coalesced join keys, matching SQL COALESCE semantics."""
    from .hashagg import hash_aggregate
    from .join import hash_join

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey",
                                              "o_orderstatus"])

    def open_only(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["o_orderstatus"], "O")) \
            .select(["o_custkey", "o_orderkey"])

    per_cust = hash_aggregate(
        orders.map_batches(open_only, batch_format="pyarrow"),
        "o_custkey", [("o_orderkey", "count", "n_open")], num_buckets=16)

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_acctbal",
                                              "c_name"])

    def rich_only(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t["c_acctbal"], 5000.0)) \
            .select(["c_custkey", "c_name"])

    rich = cust.map_batches(rich_only, batch_format="pyarrow")
    joined = hash_join(per_cust, rich, on="o_custkey", right_on="c_custkey",
                       how="full", num_buckets=32,
                       left_schema=pa.schema([("o_custkey", pa.int64()),
                                              ("n_open", pa.int64())]),
                       right_schema=pa.schema([("c_custkey", pa.int64()),
                                               ("c_name", pa.string())]))

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table({
            "custkey": pc.cast(t["o_custkey"], pa.int64()),
            "n_open": pc.cast(t["n_open"], pa.int64()),
            "c_name": t["c_name"],
        })

    return joined.map_batches(finalize, batch_format="pyarrow")


def q_topk_per_group(sf_dir: str):
    """Windowed top-k (row_number ≤ 3 per group): the 3 most expensive
    lineitems per order — per-group sort inside map_groups over hash
    buckets (no per-group Python dispatch)."""
    from .hashagg import append_bucket

    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linenumber", "l_extendedprice"])

    def add_bucket(t: pa.Table) -> pa.Table:
        return append_bucket(t, ["l_orderkey"], 32)

    def topk(g: pa.Table) -> pa.Table:
        import numpy as np

        g = g.sort_by([("l_orderkey", "ascending"),
                       ("l_extendedprice", "descending"),
                       ("l_linenumber", "ascending")])
        keys = g["l_orderkey"].to_numpy(zero_copy_only=False)
        # rank within each run of equal keys (vectorized)
        starts = np.r_[0, np.flatnonzero(keys[1:] != keys[:-1]) + 1]
        rank = np.arange(len(keys)) - np.repeat(starts, np.diff(np.r_[starts, len(keys)]))
        mask = pa.array(rank < 3)
        kept = g.filter(mask)
        ranks = rank[rank < 3] + 1
        return pa.table({
            "l_orderkey": kept["l_orderkey"],
            "rnk": pa.array(ranks, pa.int64()),
            "l_linenumber": kept["l_linenumber"],
            "price_c": _scaled(kept["l_extendedprice"].to_numpy(zero_copy_only=False)),
        })

    from .exchange import bucketed_map_groups

    # raw-task bucket exchange; topk is vectorized and 0-row-safe
    return bucketed_map_groups(
        ds.map_batches(add_bucket, batch_format="pyarrow"), 32, topk)


def q_session_windows(sf_dir: str):
    """Gap-based sessionization (streaming-shaped §2.7): per user,
    events sorted by ts; a gap > 30 min starts a new session. Emits
    (user_id, session_id, n_events, dur_us). Matches the SQL
    lag + cumulative-sum window formulation exactly."""
    GAP_US = 1_800_000_000

    from .hashagg import append_bucket

    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts"])

    def add_bucket(t: pa.Table) -> pa.Table:
        return append_bucket(t, ["user_id"], 32)

    SESS_SCHEMA = pa.schema([("user_id", pa.int64()),
                             ("session_id", pa.int64()),
                             ("n_events", pa.int64()),
                             ("dur_us", pa.int64())])

    def per_bucket(g: pa.Table) -> pa.Table:
        g = g.sort_by([("user_id", "ascending"), ("ts", "ascending"),
                       ("event_id", "ascending")])
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        n = len(uid)
        if n == 0:
            return SESS_SCHEMA.empty_table()
        # one vectorized boundary pass over the whole bucket: a new
        # session starts at a user change OR a gap > GAP_US
        user_change = np.r_[True, uid[1:] != uid[:-1]]
        new_sess = user_change | np.r_[True, (ts[1:] - ts[:-1]) > GAP_US]
        sstart = np.flatnonzero(new_sess)
        send = np.r_[sstart[1:], n] - 1
        sess_user = uid[sstart]
        sidx = np.arange(len(sstart))
        # session_id restarts at 1 per user: subtract the user's first
        # session index (run-boundary repeat over the session list)
        ufirst = np.r_[0, np.flatnonzero(sess_user[1:] != sess_user[:-1]) + 1]
        first_of = np.repeat(sidx[ufirst],
                             np.diff(np.r_[ufirst, len(sstart)]))
        return pa.table({
            "user_id": pa.array(sess_user, pa.int64()),
            "session_id": pa.array(sidx - first_of + 1, pa.int64()),
            "n_events": pa.array(np.diff(np.r_[sstart, n]), pa.int64()),
            "dur_us": pa.array(ts[send] - ts[sstart], pa.int64()),
        })

    from .exchange import bucketed_map_groups

    # raw-task bucket exchange (ops.exchange rationale); per_bucket is
    # 0-row-safe and never reads the bucket column
    return bucketed_map_groups(
        ds.map_batches(add_bucket, batch_format="pyarrow"), 32, per_bucket)


def q_asof_join(sf_dir: str):
    """As-of join (guide pattern): for each 'purchase' event, the most
    recent prior-or-equal 'signup' event of the same user. Bucketed on
    hash(user_id) % 32; each bucket runs ONE ``pandas.merge_asof``
    (C kernel, by=user_id) over the sorted bucket — no per-user Python
    dispatch. Signups are deduped per (user, ts) keeping max event_id
    so tie semantics match DuckDB's ASOF JOIN exactly."""
    from .hashagg import append_bucket

    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts",
                                          "event_type"])

    def add_bucket(t: pa.Table) -> pa.Table:
        return append_bucket(t, ["user_id"], 32)

    ASOF_SCHEMA = pa.schema([("event_id", pa.int64()),
                             ("signup_event_id", pa.int64()),
                             ("gap_us", pa.int64())])

    def per_bucket(g: pa.Table) -> pa.Table:
        import pandas as pd

        df = g.to_pandas()
        df["tus"] = df["ts"].astype("int64")
        buys = df[df.event_type == "purchase"] \
            .sort_values("tus", kind="mergesort")[
                ["user_id", "event_id", "tus"]]
        subs = df[df.event_type == "signup"]
        if len(buys) == 0 or len(subs) == 0:
            return ASOF_SCHEMA.empty_table()
        # dedupe signups per (user, ts): keep max event_id (ties)
        subs = subs.sort_values(["tus", "event_id"], kind="mergesort") \
            .groupby(["user_id", "tus"], as_index=False).last()
        subs = subs[["user_id", "event_id", "tus"]] \
            .rename(columns={"event_id": "signup_event_id"})
        subs["signup_tus"] = subs["tus"]
        subs = subs.sort_values("tus", kind="mergesort")
        m = pd.merge_asof(buys, subs, on="tus", by="user_id",
                          direction="backward")
        m = m[m["signup_event_id"].notna()]
        return pa.table({
            "event_id": pa.array(m["event_id"].to_numpy(), pa.int64()),
            "signup_event_id": pa.array(
                m["signup_event_id"].to_numpy().astype("int64"), pa.int64()),
            "gap_us": pa.array(
                (m["tus"] - m["signup_tus"]).to_numpy().astype("int64"),
                pa.int64()),
        })

    from .exchange import bucketed_map_groups

    # raw-task bucket exchange (ops.exchange rationale); per_bucket is
    # 0-row-safe and never reads the bucket column
    return bucketed_map_groups(
        ds.map_batches(add_bucket, batch_format="pyarrow"), 32, per_bucket)


def q_range_join(sf_dir: str):
    """Range (band/interval) join — the non-equi join family member the
    Dataset API lacks: for each 'purchase' event, the number of 'click'
    events by the SAME user with ts in [purchase_ts − 1h, purchase_ts]
    (left-join semantics: purchases with no prior click emit 0).

    Layout: bucket on hash(user_id) % 32 (both sides ride the same
    exchange — events is read once); inside a bucket, clicks are sorted
    by a composite (user_id, ts) key packed into one int64, and every
    purchase's window becomes TWO vectorized ``np.searchsorted`` probes
    (count = right(hi) − left(lo)) — no per-user or per-row Python.
    The pack is exact while ts_span(bucket) × user_range fits in int64
    (asserted); at a span where it cannot, split buckets by time range
    first — the probe stays the same.

    Partitioning assumption (documented per the custom-operator rule):
    correctness needs all events of a user in one group, which the
    hash bucket guarantees; skew is bounded by per-user event counts."""
    from .hashagg import append_bucket

    WINDOW_US = 3_600_000_000

    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts",
                                          "event_type"])

    def add_bucket(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["event_type"],
                              value_set=pa.array(["purchase", "click"])))
        return append_bucket(t, ["user_id"], 32)

    RANGE_SCHEMA = pa.schema([("event_id", pa.int64()),
                              ("n_prior_clicks", pa.int64())])

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return RANGE_SCHEMA.empty_table()
        uid = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        etype = g["event_type"].to_numpy(zero_copy_only=False)
        t0 = ts.min()
        rel = ts - t0
        k = np.int64(1) << np.int64(int(rel.max() + WINDOW_US + 1)
                                    .bit_length())
        assert (uid.max() + 1) < (np.iinfo(np.int64).max // k), \
            "composite key overflow: split the bucket by time range"
        is_click = etype == "click"
        ck = np.sort(uid[is_click] * k + rel[is_click])
        is_buy = etype == "purchase"
        base = uid[is_buy] * k
        lo = np.maximum(rel[is_buy] - WINDOW_US, 0)
        n = (np.searchsorted(ck, base + rel[is_buy], side="right")
             - np.searchsorted(ck, base + lo, side="left"))
        return pa.table({
            "event_id": g["event_id"].to_numpy(zero_copy_only=False)[is_buy],
            "n_prior_clicks": pa.array(n.astype(np.int64), pa.int64()),
        })

    from .exchange import bucketed_map_groups

    # raw-task bucket exchange (ops.exchange rationale); per_bucket is
    # 0-row-safe and never reads the bucket column
    return bucketed_map_groups(
        ds.map_batches(add_bucket, batch_format="pyarrow"), 32, per_bucket)


# ---------------------------------------------------------------------------
# U: set ops (§2.6)
# ---------------------------------------------------------------------------

def q_union_counts(sf_dir: str):
    """union of two filtered subsets → per-user event counts (D/union)."""
    from .hashagg import hash_count

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def only(kind):
        return ds.map_batches(
            lambda t, _k=kind: t.filter(pc.equal(t["event_type"], _k)),
            batch_format="pyarrow")

    both = only("error").union(only("signup"))
    return hash_count(both, "user_id", out_name="n_events", num_buckets=8) \
        .select_columns(["user_id", "n_events"])
