"""Rolling-window aggregates and sketch-based distinct counting.

``q_rolling_avg`` — per-key rolling mean over (current + 2 preceding)
rows, the SQL ``ROWS BETWEEN 2 PRECEDING AND CURRENT ROW`` frame,
computed as one vectorized prefix-sum pass per hash bucket (no
per-group Python dispatch; same layout as q_topk_per_group).
Integer-exact: values are scaled to int64 per row, window sums are
exact integers, and the single final division mirrors the oracle SQL
expression shape.

``hll_distinct`` — HyperLogLog distinct-count sketch as a Ray Data
aggregation: per-batch (group, register, max_rho) partials →
ops.hashagg max-merge → per-group estimate. The exchange carries at
most |groups|×|registers| rows per batch — constant in row count —
which is the whole point of a sketch at 10¹²-row scale. Deterministic
(fixed hash), tested against exact distinct counts (≤ ~3% typical
error at 2¹² registers); exposed as a rows-only query entry because
no SQL oracle can reproduce the sketch.
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


# ---------------------------------------------------------------------------
# Rolling window aggregate
# ---------------------------------------------------------------------------

def q_rolling_avg(sf_dir: str, window: int = 3):
    """Per-user rolling mean of the scaled value over the last
    ``window`` events (ordered by ts, event_id): one bucketed exchange,
    then a prefix-sum kernel over each bucket's (user, ts)-sorted rows
    — run boundaries cap the window at each user's start."""
    ds = _read(sf_dir, "events",
               columns=["user_id", "event_id", "ts", "value"])

    def derive(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        out = pa.table({
            "user_id": t["user_id"],
            "event_id": t["event_id"],
            "tus": pc.cast(t["ts"], pa.int64()),
            "v": pa.array(np.floor(v * 100 + 0.5).astype(np.int64)),
        })
        return append_bucket(out, ["user_id"], 32)

    def per_bucket(g: pa.Table) -> pa.Table:
        g = g.sort_by([("user_id", "ascending"), ("tus", "ascending"),
                       ("event_id", "ascending")])
        keys = g["user_id"].to_numpy(zero_copy_only=False)
        if len(keys) == 0:
            return pa.schema([("event_id", pa.int64()),
                              ("roll_avg_c", pa.int64())]).empty_table()
        v = g["v"].to_numpy(zero_copy_only=False)
        n = len(keys)
        idx = np.arange(n)
        starts = np.r_[0, np.flatnonzero(keys[1:] != keys[:-1]) + 1]
        run_start = np.repeat(starts, np.diff(np.r_[starts, n]))
        cs0 = np.r_[0, np.cumsum(v)]
        lo = np.maximum(idx - (window - 1), run_start)
        rs = cs0[idx + 1] - cs0[lo]
        cnt = idx + 1 - lo
        avg = np.floor(rs.astype(np.float64) / cnt + 0.5).astype(np.int64)
        return pa.table({
            "event_id": g["event_id"],
            "roll_avg_c": pa.array(avg, pa.int64()),
        })

    from .exchange import bucketed_map_groups

    # raw-task bucket exchange; per_bucket is 0-row-guarded
    return bucketed_map_groups(
        ds.map_batches(derive, batch_format="pyarrow"), 32, per_bucket)


def q_window_rank(sf_dir: str, ntiles: int = 4):
    """The classic SQL window-function family per user (ordered by
    ts, event_id): ROW_NUMBER, LAG of the scaled value, NTILE(4)
    (1-based, SQL bucket-size semantics: the first n%k tiles get the
    extra row), and PERCENT_RANK scaled to 1e4. One bucketed exchange
    on user_id, then pure vectorized segment kernels over each
    bucket's sorted rows — same layout as :func:`q_rolling_avg`."""
    ds = _read(sf_dir, "events",
               columns=["user_id", "event_id", "ts", "value"])

    def derive(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        out = pa.table({
            "user_id": t["user_id"],
            "event_id": t["event_id"],
            "tus": pc.cast(t["ts"], pa.int64()),
            "v": pa.array(np.floor(v * 100 + 0.5).astype(np.int64)),
        })
        return append_bucket(out, ["user_id"], 32)

    empty = pa.schema([
        ("user_id", pa.int64()), ("event_id", pa.int64()),
        ("rn", pa.int64()), ("lag_v_c", pa.int64()),
        ("tile", pa.int64()), ("pr_c", pa.int64())])

    def per_bucket(g: pa.Table) -> pa.Table:
        g = g.sort_by([("user_id", "ascending"), ("tus", "ascending"),
                       ("event_id", "ascending")])
        keys = g["user_id"].to_numpy(zero_copy_only=False)
        n = len(keys)
        if n == 0:
            return empty.empty_table()
        v = g["v"].to_numpy(zero_copy_only=False)
        idx = np.arange(n)
        starts = np.r_[0, np.flatnonzero(keys[1:] != keys[:-1]) + 1]
        rl = np.diff(np.r_[starts, n])
        run_start = np.repeat(starts, rl)
        n_run = np.repeat(rl, rl)
        rn = idx - run_start + 1

        lag_v = np.empty(n, np.int64)
        lag_v[1:] = v[:-1]
        lag_valid = idx != run_start           # null at each user's start

        r0 = rn - 1
        q, rem = np.divmod(n_run, ntiles)
        big = rem * (q + 1)                    # rows in the q+1-sized tiles
        tile = np.where(r0 < big, r0 // (q + 1),
                        rem + (r0 - big) // np.maximum(q, 1)) + 1

        pr_c = np.floor(r0.astype(np.float64)
                        / np.maximum(n_run - 1, 1) * 10000 + 0.5) \
            .astype(np.int64)
        return pa.table({
            "user_id": g["user_id"],
            "event_id": g["event_id"],
            "rn": pa.array(rn, pa.int64()),
            "lag_v_c": pa.array(lag_v, pa.int64(),
                                mask=~lag_valid),
            "tile": pa.array(tile, pa.int64()),
            "pr_c": pa.array(pr_c, pa.int64()),
        })

    from .exchange import bucketed_map_groups

    return bucketed_map_groups(
        ds.map_batches(derive, batch_format="pyarrow"), 32, per_bucket)


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch
# ---------------------------------------------------------------------------

HLL_P = 12                       # 2^12 registers
HLL_M = 1 << HLL_P
_HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)


def _hll_partial(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rho) per value — vectorized 64-bit mix hash."""
    h = keys.astype(np.uint64, copy=True)
    # splitmix64 finalizer: well-mixed 64 bits from integer keys
    h = (h + np.uint64(0x9E3779B97F4A7C15))
    h ^= h >> np.uint64(30)
    h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(27)
    h *= np.uint64(0x94D049BB133111EB)
    h ^= h >> np.uint64(31)
    reg = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    rest = (h << np.uint64(HLL_P)) | np.uint64((1 << HLL_P) - 1)
    # rho = 1 + count of leading zeros in the remaining 64-P bits
    lz = np.zeros(len(h), dtype=np.int64)
    cur = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = cur < (np.uint64(1) << np.uint64(64 - shift))
        lz[mask] += shift
        cur[mask] = cur[mask] << np.uint64(shift)
    return reg, lz + 1


def hll_distinct(ds, key: str, group: str, out_name: str = "n_approx"):
    """Approximate COUNT(DISTINCT key) per group via HyperLogLog.

    Map side: per-batch (group, register, max rho) — ≤ |groups|·4096
    rows per batch regardless of batch row count. Merge: hashagg max.
    Final: per-group harmonic estimate with the standard small-range
    correction, computed in a vectorized per-bucket kernel."""
    def partial(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
        reg, rho = _hll_partial(k)
        tt = pa.table({group: t[group],
                       "reg": pa.array(reg, pa.int64()),
                       "rho": pa.array(rho, pa.int64())})
        g = tt.group_by([group, "reg"]).aggregate([("rho", "max")])
        return g.rename_columns([group, "reg", "rho"])

    merged = hash_aggregate(ds.map_batches(partial, batch_format="pyarrow"),
                            [group, "reg"], [("rho", "max", "rho")],
                            num_buckets=16)

    def add_b(t: pa.Table) -> pa.Table:
        return append_bucket(t, [group], 8)

    def estimate(g: pa.Table) -> pa.Table:
        g = g.sort_by([(group, "ascending"), ("reg", "ascending")])
        keys = g[group].to_numpy(zero_copy_only=False)
        if len(keys) == 0:
            return pa.table({group: pa.array([], pa.string()),
                             out_name: pa.array([], pa.int64())})
        rho = g["rho"].to_numpy(zero_copy_only=False)
        starts = np.r_[0, np.flatnonzero(keys[1:] != keys[:-1]) + 1]
        ends = np.r_[starts[1:], len(keys)]
        out_g, out_n = [], []
        for s, e in zip(starts, ends):      # ≤ groups-per-bucket iters
            nz = e - s                       # registers with a value
            z = HLL_M - nz                   # empty registers
            denom = np.sum(np.power(2.0, -rho[s:e])) + z
            est = _HLL_ALPHA * HLL_M * HLL_M / denom
            if est <= 2.5 * HLL_M and z > 0:
                est = HLL_M * np.log(HLL_M / z)   # linear counting
            out_g.append(keys[s])
            out_n.append(int(round(est)))
        return pa.table({group: pa.array(out_g),
                         out_name: pa.array(out_n, pa.int64())})

    from .exchange import bucketed_map_groups

    # raw-task bucket exchange; estimate is 0-row-guarded
    return bucketed_map_groups(
        merged.map_batches(add_b, batch_format="pyarrow"), 8, estimate)


def q_hll_users(sf_dir: str):
    """Approximate distinct users per event_type (rows-only entry —
    the sketch has no SQL oracle; accuracy is asserted against exact
    counts in tests)."""
    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])
    return hll_distinct(ds, key="user_id", group="event_type")


def q_hll_error(sf_dir: str):
    """Driver-visible accuracy artifact for the HLL sketch: per
    event_type, the HLL estimate NEXT TO the exact COUNT(DISTINCT)
    (computed distributed via the local-pairs → bucketed-global-dedup
    → count layout of statsops.q_count_distinct) and the scaled
    relative error ``floor(|est-exact|/exact * 10000 + 0.5)``.

    The oracle is hybrid: exact_n comes from a real
    ``COUNT(DISTINCT)`` over the events table in SQL; est_n from the
    committed golden (the sketch is deterministic — fixed hash, merge-
    invariant registers); err_c is recomputed in SQL from both — so a
    wrong estimate OR a wrong exact path both fail the hash check.
    The ≤5% error + merge-invariance contracts stay in
    tests/test_analytics.py."""
    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])
    est = hll_distinct(ds, key="user_id", group="event_type",
                       out_name="est_n").to_pandas()

    def local_distinct(t: pa.Table) -> pa.Table:
        return t.group_by(["event_type", "user_id"]).aggregate([])

    pairs = hash_aggregate(
        ds.map_batches(local_distinct, batch_format="pyarrow"),
        ["event_type", "user_id"], [("user_id", "count", "_c")],
        num_buckets=16)

    def count_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["event_type"]).aggregate([("user_id", "count")])
        return g.rename_columns(["event_type", "n_part"])

    exact = hash_aggregate(
        pairs.map_batches(count_partial, batch_format="pyarrow"),
        "event_type", [("n_part", "sum", "exact_n")],
        num_buckets=1).to_pandas()

    # ≤ |event_type| rows on the driver — group-bounded, not row-bounded
    m = est.merge(exact, on="event_type").sort_values("event_type")
    err = np.floor(np.abs(m["est_n"] - m["exact_n"])
                   / np.maximum(m["exact_n"], 1) * 10000 + 0.5).astype(np.int64)
    return pa.table({
        "event_type": pa.array(m["event_type"], pa.string()),
        "exact_n": pa.array(m["exact_n"].astype("int64")),
        "est_n": pa.array(m["est_n"].astype("int64")),
        "err_c": pa.array(err),
    })


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005, public)
# ---------------------------------------------------------------------------

CMS_D = 4                        # hash rows
CMS_W = 2048                     # counters per row
_CMS_SALTS = (0x51ED, 0x2A9B, 0x7C15, 0x1B87)


def _mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (same mixer as the HLL hash) — well-mixed
    64 bits from a 64-bit input, vectorized."""
    h = h + np.uint64(0x9E3779B97F4A7C15)
    h ^= h >> np.uint64(30)
    h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(27)
    h *= np.uint64(0x94D049BB133111EB)
    h ^= h >> np.uint64(31)
    return h


def cms_columns(words, width: int = CMS_W) -> np.ndarray:
    """(CMS_D × n) counter-column indices for a word array — row j uses
    the salted splitmix64 of the stable 64-bit word hash. This IS the
    sketch spec: tools/make_goldens.py applies the same function to
    exact corpus counts (CMS cells are sums of per-word counts, so the
    sketch is a pure order-independent function of the count table)."""
    from ..functions.hashing import stable_hash64

    base = stable_hash64(words)
    return np.stack([
        (_mix64(base ^ np.uint64(s)) % np.uint64(width)).astype(np.int64)
        for s in _CMS_SALTS])


def cms_sketch(docs_ds, text_col: str = "text", width: int = CMS_W):
    """Distributed Count-Min sketch over the corpus token stream.

    Map side: tokenize the batch once (RE2), per-batch word counts,
    scatter-add into a local d×w int64 matrix, emit the NONZERO cells
    as (row, col, n_part) — shuffle volume ≤ d·w per batch no matter
    how many tokens the batch holds (the CMS analogue of the HLL
    register layout). Merge: one two-phase hashagg sum. Returns the
    d×w numpy matrix (bounded model state: 4×2048 int64)."""
    from .analytics import _tokens_flat
    from .hashagg import hash_aggregate

    def partial(t: pa.Table) -> pa.Table:
        flat, _ = _tokens_flat(t[text_col])
        if len(flat) == 0:
            return pa.table({"row": pa.array([], pa.int64()),
                             "col": pa.array([], pa.int64()),
                             "n_part": pa.array([], pa.int64())})
        g = pa.table({"w": flat}).group_by(["w"]).aggregate([("w", "count")])
        words = g["w"].to_pylist()
        cnt = g["w_count"].to_numpy(zero_copy_only=False).astype(np.int64)
        cols = cms_columns(words, width)
        m = np.zeros((CMS_D, width), np.int64)
        for j in range(CMS_D):
            np.add.at(m[j], cols[j], cnt)
        r, c = np.nonzero(m)
        return pa.table({"row": pa.array(r.astype(np.int64)),
                         "col": pa.array(c.astype(np.int64)),
                         "n_part": pa.array(m[r, c], pa.int64())})

    cells = hash_aggregate(
        docs_ds.map_batches(partial, batch_format="pyarrow"),
        ["row", "col"], [("n_part", "sum", "n")], num_buckets=8) \
        .take_all()                       # ≤ d·w rows: bounded model state
    m = np.zeros((CMS_D, width), np.int64)
    for cell in cells:
        m[int(cell["row"]), int(cell["col"])] = int(cell["n"])
    return m


def cms_estimate(m: np.ndarray, words) -> np.ndarray:
    """Point-query the sketch: est(w) = min over rows of the hashed
    cell — never underestimates (within one row collisions only add)."""
    cols = cms_columns(list(words), m.shape[1])
    return np.min(
        np.stack([m[j, cols[j]] for j in range(CMS_D)]), axis=0)
