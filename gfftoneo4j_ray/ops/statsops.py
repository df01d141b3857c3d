"""Statistical / analytical operators over the benchmark tables —
pivot, grouping sets, exact distinct counts, histogram quantiles,
arg-max, moment statistics, deterministic sampling — each as a Ray
Data pipeline with an exact DuckDB oracle (__ray_entry__.oracle_sql).

Exactness convention: every fractional input is scaled to an int64
(`floor(x*scale + 0.5)`) PER ROW before any aggregation, so all sums
and sums-of-squares are exact integer arithmetic and the engine and
the oracle cannot diverge by float-summation order. Divisions happen
once, at finalization, from identical integers with an identical
expression shape on both sides.

Scale notes per function; the shared rules are the hashagg combiner
layout (map-side partials, one small-int exchange) and domain-bounded
final kernels (a histogram bounded by the value domain, a pivot
bounded by the category set — never corpus-sized driver state).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashagg import append_bucket, hash_aggregate


def _read(sf_dir: str, table: str, columns=None):
    from .. import read_parquet_clean

    # metadata-free schema at the source (see read_parquet_clean)
    return read_parquet_clean(f"{sf_dir}/{table}.parquet", columns=columns)


def _cents(col, scale: int = 100) -> pa.Array:
    v = col.to_numpy(zero_copy_only=False).astype(np.float64)
    return pa.array(np.floor(v * scale + 0.5).astype(np.int64), pa.int64())


# ---------------------------------------------------------------------------
# Pivot (wide counts per category)
# ---------------------------------------------------------------------------

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_pivot(sf_dir: str):
    """Events pivoted to one column per event_type, one row per day.
    Category set is the domain-bounded pivot axis; indicators are
    vectorized casts, the shuffle carries per-day partial sums."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        # floor division (np.floor_divide == DuckDB's //), NOT pyarrow's
        # truncating divide — the two diverge for pre-1970 timestamps
        ts = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        day = pa.array(np.floor_divide(ts, 86400000000), pa.int64())
        cols = {"day_id": day}
        for et in EVENT_TYPES:
            cols[f"n_{et}"] = pc.cast(pc.equal(t["event_type"], et),
                                      pa.int64())
        return pa.table(cols)

    return hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"), "day_id",
        [(f"n_{et}", "sum", f"n_{et}") for et in EVENT_TYPES]
        + [("n_click", "count", "n_total")], num_buckets=16)


# ---------------------------------------------------------------------------
# Grouping sets (multi-level rollup from one fact pass)
# ---------------------------------------------------------------------------

def q_grouping_sets(sf_dir: str):
    """GROUPING SETS ((flag, status), (flag), ()) over lineitem with ONE
    pass over the fact table: coarser levels re-aggregate the finest
    level's (domain-bounded, ≤ |flag|×|status| rows) output — integer
    sums, so fine→coarse re-aggregation is exact."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity"])

    def derive(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "qty_c": _cents(t["l_quantity"]),
        })

    # materialize the (≤ |flag|×|status|-row) finest level ONCE: it is
    # consumed three times (itself + mid + top) and would otherwise
    # re-run the full fact scan per consumer
    fine = hash_aggregate(ds.map_batches(derive, batch_format="pyarrow"),
                          ["l_returnflag", "l_linestatus"],
                          [("qty_c", "sum", "sum_qty_c"),
                           ("qty_c", "count", "n_rows")],
                          num_buckets=4).materialize()
    mid = hash_aggregate(fine, "l_returnflag",
                         [("sum_qty_c", "sum", "sum_qty_c"),
                          ("n_rows", "sum", "n_rows")], num_buckets=1)
    top = hash_aggregate(
        fine.map_batches(
            lambda t: t.append_column("_all", pa.repeat(pa.scalar(
                1, pa.int8()), t.num_rows)), batch_format="pyarrow"),
        "_all", [("sum_qty_c", "sum", "sum_qty_c"),
                 ("n_rows", "sum", "n_rows")], num_buckets=1)

    def pad_fine(t: pa.Table) -> pa.Table:
        return t.select(["l_returnflag", "l_linestatus", "sum_qty_c",
                         "n_rows"]).set_column(
            3, "n_rows", pc.cast(t["n_rows"], pa.int64()))

    def pad_mid(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": pa.nulls(t.num_rows, pa.string()),
            "sum_qty_c": t["sum_qty_c"],
            "n_rows": pc.cast(t["n_rows"], pa.int64()),
        })

    def pad_top(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": pa.nulls(t.num_rows, pa.string()),
            "l_linestatus": pa.nulls(t.num_rows, pa.string()),
            "sum_qty_c": t["sum_qty_c"],
            "n_rows": pc.cast(t["n_rows"], pa.int64()),
        })

    return fine.map_batches(pad_fine, batch_format="pyarrow") \
        .union(mid.map_batches(pad_mid, batch_format="pyarrow")) \
        .union(top.map_batches(pad_top, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# Exact distributed COUNT(DISTINCT)
# ---------------------------------------------------------------------------

def q_count_distinct(sf_dir: str):
    """COUNT(DISTINCT l_partkey) per returnflag, exactly, at scale:
    map-side local distinct pairs → one bucketed exchange dedups pairs
    globally → per-block partial counts → a tiny second exchange sums
    them. Shuffle volume = distinct pairs, never fact rows."""
    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_partkey"])

    def local_distinct(t: pa.Table) -> pa.Table:
        return t.group_by(["l_returnflag", "l_partkey"]).aggregate([])

    pairs = hash_aggregate(
        ds.map_batches(local_distinct, batch_format="pyarrow"),
        ["l_returnflag", "l_partkey"], [("l_partkey", "count", "_c")],
        num_buckets=32)

    def count_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_returnflag"]).aggregate([("l_partkey", "count")])
        return g.rename_columns(["l_returnflag", "n_part"])

    return hash_aggregate(
        pairs.map_batches(count_partial, batch_format="pyarrow"),
        "l_returnflag", [("n_part", "sum", "n_distinct_parts")],
        num_buckets=1)


# ---------------------------------------------------------------------------
# Histogram quantiles (exact disc quantiles over a bounded domain)
# ---------------------------------------------------------------------------

def q_quantile_hist(sf_dir: str):
    """Exact per-group quantile_disc(0.5 / 0.9) of l_quantity via a
    value histogram: the exchange carries (flag, value, count) —
    bounded by the value DOMAIN, not row count — and the quantile is
    read off cumulative counts with pure integer arithmetic
    (quantile_disc(q) = smallest v with cum(v) ≥ ceil(q·n), DuckDB
    semantics verified). The scaled value is a monotone transform, so
    it commutes with the disc quantile."""
    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])

    def derive(t: pa.Table) -> pa.Table:
        return pa.table({"l_returnflag": t["l_returnflag"],
                         "qty_c": _cents(t["l_quantity"])})

    hist = hash_aggregate(ds.map_batches(derive, batch_format="pyarrow"),
                          ["l_returnflag", "qty_c"],
                          [("qty_c", "count", "n")], num_buckets=8)

    def add_b(t: pa.Table) -> pa.Table:
        return append_bucket(t, ["l_returnflag"], 4)

    def quantiles(g: pa.Table) -> pa.Table:
        g = g.sort_by([("l_returnflag", "ascending"), ("qty_c", "ascending")])
        flags = g["l_returnflag"].to_numpy(zero_copy_only=False)
        if len(flags) == 0:
            return pa.schema([("l_returnflag", pa.string()),
                              ("p50_qty_c", pa.int64()),
                              ("p90_qty_c", pa.int64())]).empty_table()
        vals = g["qty_c"].to_numpy(zero_copy_only=False)
        cnts = g["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        starts = np.r_[0, np.flatnonzero(flags[1:] != flags[:-1]) + 1]
        ends = np.r_[starts[1:], len(flags)]
        out_f, out_p50, out_p90 = [], [], []
        for s, e in zip(starts, ends):    # ≤ |flag domain| iterations
            cum = np.cumsum(cnts[s:e])
            n = cum[-1]
            out_f.append(flags[s])
            out_p50.append(vals[s:e][np.searchsorted(
                cum, (5 * n + 9) // 10)])
            out_p90.append(vals[s:e][np.searchsorted(
                cum, (9 * n + 9) // 10)])
        return pa.table({
            "l_returnflag": pa.array(out_f, pa.string()),
            "p50_qty_c": pa.array(out_p50, pa.int64()),
            "p90_qty_c": pa.array(out_p90, pa.int64()),
        })

    from .exchange import bucketed_map_groups

    # raw-task bucket exchange; quantiles is 0-row-guarded
    return bucketed_map_groups(
        hist.map_batches(add_b, batch_format="pyarrow"), 4, quantiles)


# ---------------------------------------------------------------------------
# Arg-max per group (deterministic tie-break)
# ---------------------------------------------------------------------------

def q_arg_max(sf_dir: str):
    """Per event_type: the max (scaled) value and the smallest event_id
    attaining it. Per-batch partial = first row of a (type, value desc,
    id asc) sort per type run — one row per type per batch — so the
    exchange carries |types|×|batches| rows."""
    ds = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def reduce_rows(t: pa.Table) -> pa.Table:
        t = t.sort_by([("event_type", "ascending"), ("vc", "descending"),
                       ("event_id", "ascending")])
        types = t["event_type"].to_numpy(zero_copy_only=False)
        if len(types) == 0:
            return t
        starts = np.r_[0, np.flatnonzero(types[1:] != types[:-1]) + 1]
        return t.take(pa.array(starts, pa.int64()))

    def partial(t: pa.Table) -> pa.Table:
        t = pa.table({"event_type": t["event_type"],
                      "vc": _cents(t["value"]),
                      "event_id": t["event_id"]})
        return reduce_rows(t)

    def final(g: pa.Table) -> pa.Table:
        g = reduce_rows(g)
        return pa.table({"event_type": g["event_type"],
                         "max_value_c": g["vc"],
                         "argmax_event_id": g["event_id"]})

    from .exchange import bucketed_map_groups

    mapped = _read(sf_dir, "events",
                   columns=["event_id", "event_type", "value"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .map_batches(lambda t: append_bucket(t, ["event_type"], 4),
                     batch_format="pyarrow")
    # raw-task bucket exchange; final/reduce_rows are 0-row-safe
    return bucketed_map_groups(mapped, 4, final)


# ---------------------------------------------------------------------------
# Moment statistics (mean/variance from exact integer moments)
# ---------------------------------------------------------------------------

def q_numeric_stats(sf_dir: str):
    """Per event_type: n, sum, mean, population variance — from exact
    int64 moment sums (Σv, Σv²) of the per-row scaled value, merged
    associatively; the only float ops are the two final divisions,
    written with the identical expression shape as the oracle SQL.

    int64 bound: Σv² ≤ (5·10⁴)²·n — safe to ~3.7·10⁹ rows per group;
    beyond that the partial would move to float128/two-level scaling
    (documented, not needed at any benchmark scale)."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        vc = _cents(t["value"]).to_numpy(zero_copy_only=False)
        tt = pa.table({"event_type": t["event_type"],
                       "vc": pa.array(vc, pa.int64()),
                       "vc2": pa.array(vc * vc, pa.int64())})
        g = tt.group_by(["event_type"]).aggregate(
            [("vc", "sum"), ("vc2", "sum"), ("vc", "count")])
        return g.rename_columns(["event_type", "s1", "s2", "n_part"])

    agg = hash_aggregate(ds.map_batches(partial, batch_format="pyarrow"),
                         "event_type", [("s1", "sum", "s1"),
                                        ("s2", "sum", "s2"),
                                        ("n_part", "sum", "n")],
                         num_buckets=1)

    def finalize(t: pa.Table) -> pa.Table:
        s1 = t["s1"].to_numpy(zero_copy_only=False).astype(np.float64)
        s2 = t["s2"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        mean_c = np.floor(s1 / n + 0.5).astype(np.int64)
        var_cc = np.floor((s2 - s1 * s1 / n) / n + 0.5).astype(np.int64)
        return pa.table({
            "event_type": t["event_type"],
            "n": pc.cast(t["n"], pa.int64()),
            "sum_c": t["s1"],
            "mean_c": pa.array(mean_c, pa.int64()),
            "var_cc": pa.array(var_cc, pa.int64()),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Deterministic hash sampling
# ---------------------------------------------------------------------------

SAMPLE_MULT = 2654435761          # Knuth multiplicative hash constant
SAMPLE_MOD = 4294967296           # 2^32


def q_sample_hash(sf_dir: str, rate_num: int = 1, rate_den: int = 10):
    """Deterministic ~10% row sample: keep rows whose multiplicative
    key hash falls in the first 1/10 of the hash space. Pure map-side
    (no shuffle, no RNG state), reproducible across engines — the SQL
    oracle applies the identical integer formula."""
    ds = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])
    cut = SAMPLE_MOD * rate_num // rate_den

    def fn(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids * np.uint64(SAMPLE_MULT)) % np.uint64(SAMPLE_MOD)
        keep = pa.array(h < np.uint64(cut))
        kept = t.filter(keep)
        return pa.table({"event_id": kept["event_id"],
                         "event_type": kept["event_type"],
                         "value_c": _cents(kept["value"])})

    return ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Dimension-table coverage (part / supplier)
# ---------------------------------------------------------------------------

def q_part_brand_stats(sf_dir: str):
    """Per-brand part stats (n, exact price sum/mean in cents, size
    min/max) — the hashagg combiner layout over the part table."""
    ds = _read(sf_dir, "part",
               columns=["p_brand", "p_size", "p_retailprice"])

    def derive(t: pa.Table) -> pa.Table:
        return pa.table({"p_brand": t["p_brand"],
                         "price_c": _cents(t["p_retailprice"]),
                         "p_size": pc.cast(t["p_size"], pa.int64())})

    agg = hash_aggregate(ds.map_batches(derive, batch_format="pyarrow"),
                         "p_brand", [("price_c", "sum", "sum_price_c"),
                                     ("price_c", "count", "n_parts"),
                                     ("p_size", "min", "min_size"),
                                     ("p_size", "max", "max_size")],
                         num_buckets=8)

    def finalize(t: pa.Table) -> pa.Table:
        s = t["sum_price_c"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = t["n_parts"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "p_brand": t["p_brand"],
            "n_parts": pc.cast(t["n_parts"], pa.int64()),
            "sum_price_c": t["sum_price_c"],
            "avg_price_c": pa.array(np.floor(s / n + 0.5).astype(np.int64)),
            "min_size": t["min_size"],
            "max_size": t["max_size"],
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


def q_supplier_nation(sf_dir: str):
    """Suppliers enriched with nation via the broadcast-dimension path
    (nation is 25 rows — ray.put once, dict lookup per batch), then a
    tiny per-nation aggregate."""
    import ray

    nat = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]) \
        .to_pandas()
    n2name = ray.put(dict(zip(nat["n_nationkey"].astype(int),
                              nat["n_name"])))

    ds = _read(sf_dir, "supplier", columns=["s_nationkey", "s_acctbal"])

    class Enrich:
        def __init__(self):
            self.lookup = ray.get(n2name)

        def __call__(self, t: pa.Table) -> pa.Table:
            keys = t["s_nationkey"].to_numpy(zero_copy_only=False)
            names = pa.array([self.lookup.get(int(k)) for k in keys],
                             pa.string())
            return pa.table({"n_name": names,
                             "bal_c": _cents(t["s_acctbal"])})

    enriched = ds.map_batches(Enrich, batch_format="pyarrow",
                              concurrency=(1, 2))
    return hash_aggregate(enriched, "n_name",
                          [("bal_c", "sum", "sum_bal_c"),
                           ("bal_c", "count", "n_suppliers")], num_buckets=4)


def q_dim_rollups(sf_dir: str):
    """Tagged union of the two dimension-table rollups (one driver
    query slot covers both operators; each keeps its own kernel):

      * ``dim='brand'``  — q_part_brand_stats (hashagg combiner layout
        over the part table: n / exact cent sum / size min-max).
      * ``dim='nation'`` — q_supplier_nation (broadcast 25-row nation
        dim + tiny per-nation aggregate; min_v/max_v are null).

    Columns are aligned to (dim, dim_key, n, sum_c, min_v, max_v) so
    the DuckDB oracle is a plain UNION ALL of the two group-bys."""
    def tag_brand(t: pa.Table) -> pa.Table:
        return pa.table({
            "dim": pa.array(["brand"] * t.num_rows, pa.string()),
            "dim_key": t["p_brand"],
            "n": pc.cast(t["n_parts"], pa.int64()),
            "sum_c": pc.cast(t["sum_price_c"], pa.int64()),
            "min_v": pc.cast(t["min_size"], pa.int64()),
            "max_v": pc.cast(t["max_size"], pa.int64()),
        })

    def tag_nation(t: pa.Table) -> pa.Table:
        return pa.table({
            "dim": pa.array(["nation"] * t.num_rows, pa.string()),
            "dim_key": t["n_name"],
            "n": pc.cast(t["n_suppliers"], pa.int64()),
            "sum_c": pc.cast(t["sum_bal_c"], pa.int64()),
            "min_v": pa.nulls(t.num_rows, pa.int64()),
            "max_v": pa.nulls(t.num_rows, pa.int64()),
        })

    brand = q_part_brand_stats(sf_dir).map_batches(tag_brand,
                                                   batch_format="pyarrow")
    nation = q_supplier_nation(sf_dir).map_batches(tag_nation,
                                                   batch_format="pyarrow")
    return brand.union(nation)


# ---------------------------------------------------------------------------
# Exact quantile selection over an UNBOUNDED value domain
# ---------------------------------------------------------------------------

def quantile_select(ds, key_col: str, qs=(("p50", 1, 2), ("p95", 19, 20)),
                    *, branch: int = 1024, num_buckets: int = 4):
    """EXACT per-key disc quantiles of an int64 ``vc`` column by
    iterative range refinement — the unbounded-domain complement of
    :func:`q_quantile_hist` (whose exchange is bounded by the value
    DOMAIN; this one never assumes a bounded domain).

    ``qs``: (label, num, den) rational quantiles; the answer is the
    k-th smallest value per key with k = ceil(num·n/den) — the same
    quantile_disc convention as q_quantile_hist, integer-exact.

    Algorithm (classic distributed k-th selection): keep one active
    range [lo, hi] per (key, quantile); per round, ONE pass over the
    data counts values into ≤ ``branch`` equal-width sub-ranges per
    item (map-side np.bincount partials, merged by a small hashagg —
    the exchange is ≤ items × branch rows regardless of data size),
    then each item narrows to the sub-range containing its remaining
    rank. Ranges shrink ×branch per round, so rounds =
    ceil(log_branch(value range)) — 2-3 passes for any int64 data.
    Driver state is items × O(1); items = |key domain| × |qs| (the
    key domain must be bounded — salt/partition the call for
    unbounded key spaces).

    Returns an arrow table (key, q, value_c) sorted by (key, q).
    """
    ds = ds.materialize()   # consumed once per round

    stats = hash_aggregate(
        ds, key_col,
        [("vc", "count", "n"), ("vc", "min", "lo"), ("vc", "max", "hi")],
        num_buckets=num_buckets).to_arrow_refs()
    import ray

    sdf = pa.concat_tables([t for t in ray.get(stats)]).to_pandas()

    items = []
    for _, row in sdf.iterrows():
        for label, num, den in qs:
            k = (num * int(row["n"]) + den - 1) // den
            items.append({"key": row[key_col], "q": label,
                          "rank": max(1, k),
                          "lo": int(row["lo"]), "hi": int(row["hi"])})

    while any(it["hi"] > it["lo"] for it in items):
        snap = [dict(it) for it in items]

        def count_fn(t: pa.Table, snap=snap) -> pa.Table:
            keys = t[key_col].to_numpy(zero_copy_only=False)
            vc = t["vc"].to_numpy(zero_copy_only=False)
            out_i, out_b, out_n = [], [], []
            for i, it in enumerate(snap):
                if it["hi"] <= it["lo"]:
                    continue
                m = (keys == it["key"]) & (vc >= it["lo"]) & \
                    (vc <= it["hi"])
                if not m.any():
                    continue
                width = it["hi"] - it["lo"] + 1
                bw = -(-width // branch)
                cnt = np.bincount((vc[m] - it["lo"]) // bw)
                nz = np.flatnonzero(cnt)
                out_i.append(np.full(len(nz), i, np.int64))
                out_b.append(nz.astype(np.int64))
                out_n.append(cnt[nz].astype(np.int64))
            if not out_i:
                # "sub", not "bucket" — hash_aggregate's exchange
                # appends its own internal "bucket" column
                return pa.table({"item": pa.array([], pa.int64()),
                                 "sub": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64())})
            return pa.table({"item": pa.array(np.concatenate(out_i)),
                             "sub": pa.array(np.concatenate(out_b)),
                             "n": pa.array(np.concatenate(out_n))})

        counts = hash_aggregate(
            ds.map_batches(count_fn, batch_format="pyarrow"),
            ["item", "sub"], [("n", "sum", "n")],
            num_buckets=num_buckets).to_pandas() \
            .sort_values(["item", "sub"])

        for i, it in enumerate(items):
            if it["hi"] <= it["lo"]:
                continue
            sub = counts[counts["item"] == i]
            cum = sub["n"].to_numpy().cumsum()
            j = int(np.searchsorted(cum, it["rank"]))
            b = int(sub["sub"].to_numpy()[j])
            width = it["hi"] - it["lo"] + 1
            bw = -(-width // branch)
            it["rank"] -= int(cum[j - 1]) if j else 0
            new_lo = it["lo"] + b * bw
            it["hi"] = min(it["hi"], new_lo + bw - 1)
            it["lo"] = new_lo

    items.sort(key=lambda it: (str(it["key"]), it["q"]))
    return pa.table({
        key_col: pa.array([it["key"] for it in items]),
        "q": pa.array([it["q"] for it in items], pa.string()),
        "value_c": pa.array([it["lo"] for it in items], pa.int64()),
    })


def q_quantile_select(sf_dir: str):
    """Exact p50/p95 of the (scaled) event value per event_type via
    the unbounded-domain iterative selection — full SQL oracle
    (ROW_NUMBER selection at rn = ceil(q·n))."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def derive(t: pa.Table) -> pa.Table:
        return pa.table({"event_type": t["event_type"],
                         "vc": _cents(t["value"])})

    return quantile_select(ds.map_batches(derive, batch_format="pyarrow"),
                           "event_type")
