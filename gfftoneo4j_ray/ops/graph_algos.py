"""Distributed graph algorithms over the constructed knowledge graph —
PageRank (iterative shuffle-join rounds) and connected components over
string node ids (hex-prefix int mapping onto ops.components).

Both stay Dataset-to-Dataset end-to-end: the edge list, the rank /
label table, and every intermediate live in the object store; the
driver only steers iterations. At KG scale (billions of nodes) each
round is one bucketed shuffle join + one hash aggregate — the classic
distributed PageRank layout.

Reference anchor: the reference builds the graph and stops
(Neo4JImporter.scala); rank / component analytics over the result are
part of the engine's §2.9 training-data surface (graph-aware corpus
weighting and dedup-group assembly).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .components import connected_components
from .hashagg import hash_aggregate
from .join import hash_join

_EDGE_SCHEMA = pa.schema([("src", pa.string()), ("dst", pa.string())])


def _distinct_pairs(edges_ds, a: str = "src", b: str = "dst"):
    """Distinct (src, dst) pairs — the simple-digraph view."""
    def local(t: pa.Table) -> pa.Table:
        return t.select([a, b]).group_by([a, b]).aggregate([])

    return hash_aggregate(edges_ds.map_batches(local, batch_format="pyarrow"),
                          [a, b], [(a, "count", "_c")], num_buckets=16) \
        .select_columns([a, b])


def hex_prefix_int64(col) -> pa.Array:
    """Order-preserving int64 from the first 16 hex chars of a 40-hex
    node id, fully vectorized (byte-view + per-nibble arithmetic; no
    Python per row). uint64 order == hex-string order; the signed
    shift by 2^63 preserves it in int64. Collision odds for distinct
    ids sharing a 64-bit prefix are ~n²/2⁶⁵ — negligible below ~10⁹
    nodes (use the full 160-bit id via two passes beyond that)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_large_string(col.type):
        col = col.cast(pa.string())
    n = len(col)
    if n == 0:
        return pa.array([], pa.int64())
    # all ids are fixed 40-char hex; validate cheaply on the offsets
    offsets = np.frombuffer(col.buffers()[1], dtype=np.int32,
                            count=n + 1, offset=col.offset * 4)
    if not ((offsets[1:] - offsets[:-1]) == 40).all():
        raise ValueError("node ids must be 40-char hex strings")
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    rows = data[offsets[0]:offsets[-1]].reshape(n, 40)[:, :16]
    nib = (rows - 48 - (rows >= 97) * np.uint8(39)).astype(np.uint64)
    # charset guard: uppercase / non-hex bytes would yield nibbles > 15
    # and silently corrupt the packed value's ORDER (the downstream
    # collision guard only catches duplicate prefixes, not misordering)
    if not (nib <= 15).all():
        raise ValueError("node ids must be LOWERCASE 40-char hex strings")
    v = np.zeros(n, dtype=np.uint64)
    for i in range(16):
        v = (v << np.uint64(4)) | nib[:, i]
    return pa.array((v - np.uint64(1 << 63)).view(np.int64), pa.int64())


def pagerank(edges_ds, *, iters: int = 3, damping: float = 0.85,
             num_buckets: int = 16, checkpoint_dir: str | None = None):
    """PageRank over distinct (src, dst) string edges, fixed
    ``iters`` rounds, uniform init 1/N, no dangling-mass
    redistribution (the standard simplified variant — documented so
    the oracle SQL mirrors it exactly).

    Per round: ONE shuffle join (ranks onto outgoing edges) + ONE hash
    aggregate (contributions per dst) + ONE left join onto the node
    universe. Returns a (node, pr) Dataset; pr is float64.

    Memory bound: the object store holds the distinct-edge +
    (src, outdeg)-joined edge tables for the whole run, plus — per
    round — one rank table O(nodes) and that round's join/aggregate
    intermediates O(edges); prior rounds' blocks are freed by Ray's
    reference counting as the Python names are reassigned, so peak ≈
    2×edges + 2×nodes regardless of ``iters``. With ``checkpoint_dir``
    set, each round's rank table is instead written to Parquet
    (tmp+rename, atomic) and re-read, which (a) caps the
    object-store-resident rank state at ONE round and (b) makes the
    run resumable: completed rounds are skipped and the iteration
    continues from the newest finished one."""
    edges = _distinct_pairs(edges_ds).materialize()

    def srcs(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["src"]})

    def dsts(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["dst"]})

    nodes = hash_aggregate(
        edges.map_batches(srcs, batch_format="pyarrow").union(
            edges.map_batches(dsts, batch_format="pyarrow")),
        "node", [("node", "count", "_c")], num_buckets=num_buckets) \
        .select_columns(["node"]).materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        import ray

        return ray.data.from_arrow(pa.schema(
            [("node", pa.string()), ("pr", pa.float64())]).empty_table())

    outdeg = hash_aggregate(edges, "src", [("dst", "count", "outdeg")],
                            num_buckets=num_buckets)
    ew = hash_join(
        edges, outdeg, on="src", num_buckets=num_buckets,
        left_schema=_EDGE_SCHEMA,
        right_schema=pa.schema([("src", pa.string()),
                                ("outdeg", pa.int64())])).materialize()

    base = (1.0 - damping) / n_nodes
    pr = nodes.map_batches(
        lambda t, v=1.0 / n_nodes: pa.table(
            {"node": t["node"],
             "pr": pa.array(np.full(t.num_rows, v), pa.float64())}),
        batch_format="pyarrow").materialize()

    pr_schema = pa.schema([("node", pa.string()), ("pr", pa.float64())])
    ew_schema = pa.schema([("src", pa.string()), ("dst", pa.string()),
                           ("outdeg", pa.int64())])
    nodes_schema = pa.schema([("node", pa.string())])

    start = 0
    if checkpoint_dir is not None:
        import os

        import ray

        os.makedirs(checkpoint_dir, exist_ok=True)
        # resume: continue from the newest finished round (a round dir
        # exists iff its write fully committed — rename is the commit)
        for i in range(iters, 0, -1):
            d = os.path.join(checkpoint_dir, f"pr_round_{i - 1:03d}")
            if os.path.isdir(d):
                pr = ray.data.read_parquet(d)
                start = i
                break

    for _round in range(start, iters):
        contrib_in = hash_join(ew, pr, on="src", right_on="node",
                               num_buckets=num_buckets,
                               left_schema=ew_schema,
                               right_schema=pr_schema)

        def to_contrib(t: pa.Table) -> pa.Table:
            w = t["pr"].to_numpy(zero_copy_only=False) \
                / t["outdeg"].to_numpy(zero_copy_only=False)
            return pa.table({"dst": t["dst"],
                             "w": pa.array(w, pa.float64())})

        sums = hash_aggregate(
            contrib_in.map_batches(to_contrib, batch_format="pyarrow"),
            "dst", [("w", "sum", "s")], num_buckets=num_buckets)
        merged = hash_join(
            nodes, sums, on="node", right_on="dst", how="left",
            num_buckets=num_buckets, left_schema=nodes_schema,
            right_schema=pa.schema([("dst", pa.string()),
                                    ("s", pa.float64())]))

        def finalize(t: pa.Table, b=base, d=damping) -> pa.Table:
            s = t["s"].to_numpy(zero_copy_only=False)
            s = np.where(np.isnan(s), 0.0, s)
            return pa.table({"node": t["node"],
                             "pr": pa.array(b + d * s, pa.float64())})

        pr = merged.map_batches(finalize, batch_format="pyarrow")
        if checkpoint_dir is None:
            pr = pr.materialize()
        else:
            import os
            import shutil

            import ray

            d = os.path.join(checkpoint_dir, f"pr_round_{_round:03d}")
            tmp = d + ".tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            pr.write_parquet(tmp)
            os.rename(tmp, d)
            pr = ray.data.read_parquet(d)
    return pr


def components_hex(edges_ds, *, num_buckets: int = 16):
    """Connected components over string (hex sha1) node ids: map ids to
    order-preserving int64 prefixes, run distributed min-label
    propagation (ops.components), then join the hex ids back on — so
    the component representative is exactly the MIN hex id of the
    component, matching a recursive min-label SQL oracle."""
    edges = _distinct_pairs(edges_ds).materialize()

    def to_int_pairs(t: pa.Table) -> pa.Table:
        return pa.table({"a": hex_prefix_int64(t["src"]),
                         "b": hex_prefix_int64(t["dst"])})

    labels = connected_components(
        edges.map_batches(to_int_pairs, batch_format="pyarrow"),
        a="a", b="b", num_buckets=num_buckets)

    # (node_int ↔ node_hex) mapping from the edge endpoints themselves
    def endpoints(t: pa.Table) -> pa.Table:
        ids = pa.concat_arrays([
            t["src"].combine_chunks() if isinstance(t["src"],
                                                    pa.ChunkedArray)
            else t["src"],
            t["dst"].combine_chunks() if isinstance(t["dst"],
                                                    pa.ChunkedArray)
            else t["dst"]])
        out = pa.table({"node_hex": ids})
        return out.group_by(["node_hex"]).aggregate([])

    mapping = hash_aggregate(
        edges.map_batches(endpoints, batch_format="pyarrow"),
        "node_hex", [("node_hex", "count", "_c")],
        num_buckets=num_buckets).map_batches(
        lambda t: pa.table({"node_int": hex_prefix_int64(t["node_hex"]),
                            "node_hex": t["node_hex"]}),
        batch_format="pyarrow").materialize()

    # the prefix map is only injective for hash-distributed ids (sha1
    # here); detect rather than silently merge unrelated nodes if the
    # caller feeds structured ids sharing a 64-bit prefix
    worst = hash_aggregate(mapping, "node_int",
                           [("node_int", "count", "n")],
                           num_buckets=num_buckets).max("n")
    if worst and worst > 1:
        raise ValueError(
            "node-id 64-bit prefixes collide: ids are not "
            "hash-distributed; components_hex requires sha1-style ids")

    map_schema = pa.schema([("node_int", pa.int64()),
                            ("node_hex", pa.string())])
    with_node = hash_join(
        labels, mapping, on="node", right_on="node_int",
        num_buckets=num_buckets,
        left_schema=pa.schema([("node", pa.int64()),
                               ("label", pa.int64())]),
        right_schema=map_schema).map_batches(
        lambda t: pa.table({"node_id": t["node_hex"], "label": t["label"]}),
        batch_format="pyarrow")
    rep_map = mapping.map_batches(
        lambda t: pa.table({"rep_int": t["node_int"],
                            "component": t["node_hex"]}),
        batch_format="pyarrow")
    return hash_join(
        with_node, rep_map, on="label", right_on="rep_int",
        num_buckets=num_buckets,
        left_schema=pa.schema([("node_id", pa.string()),
                               ("label", pa.int64())]),
        right_schema=pa.schema([("rep_int", pa.int64()),
                                ("component", pa.string())])).map_batches(
        lambda t: pa.table({"node_id": t["node_id"],
                            "component": t["component"]}),
        batch_format="pyarrow")


def graph_stats(edges_ds, *, num_buckets: int = 16):
    """Per-node structure statistics over the UNDIRECTED distinct-edge
    view of a (src, dst) string edge list: distinct-neighbor degree,
    triangle participation count, and the local clustering coefficient
    as a half-up-rounded scaled integer ``lcc_c = round(2T/(d(d-1)) *
    1e6)`` (0 where d < 2). Self-loops are dropped; multi-edges count
    once. Returns a (node, degree, triangles, lcc_c) Dataset.

    Triangle layout is the standard distributed degree-orientation
    scheme (Cohen 2009; Suri & Vassilvitskii 2011): orient every
    undirected edge from its lower-(degree, id) endpoint to the higher
    one, self-join the oriented adjacency on the tail to enumerate
    wedges, and close wedges with a semi join against the oriented
    edge set. Orientation bounds each tail's oriented out-degree by
    O(sqrt(m)), so the wedge exchange — the one super-linear step —
    is O(m^1.5) worst case and skew-robust under power-law hubs
    (a hub's edges point INTO it and generate no wedges at the hub).
    Everything runs as bucketed hash joins / aggregates; nothing
    node- or edge-scale ever lands on the driver.

    Reference anchor: the reference builds the graph and stops
    (Neo4JImporter.scala); per-node structure stats are §2.9
    training-data surface (graph-aware corpus weighting).
    """
    # undirected distinct view: (a, b) = (min, max), self-loops out
    def undirect(t: pa.Table) -> pa.Table:
        keep = pc.not_equal(t["src"], t["dst"])
        t = t.filter(keep)
        lo = pc.min_element_wise(t["src"], t["dst"])
        hi = pc.max_element_wise(t["src"], t["dst"])
        return pa.table({"a": lo, "b": hi}).group_by(["a", "b"]) \
            .aggregate([])

    und = hash_aggregate(
        edges_ds.map_batches(undirect, batch_format="pyarrow"),
        ["a", "b"], [("a", "count", "_c")], num_buckets=num_buckets) \
        .select_columns(["a", "b"]).materialize()
    und_schema = pa.schema([("a", pa.string()), ("b", pa.string())])

    def endpoints(t: pa.Table) -> pa.Table:
        a = t["a"].combine_chunks() if isinstance(t["a"], pa.ChunkedArray) \
            else t["a"]
        b = t["b"].combine_chunks() if isinstance(t["b"], pa.ChunkedArray) \
            else t["b"]
        return pa.table({"node": pa.concat_arrays([a, b])})

    deg = hash_aggregate(
        und.map_batches(endpoints, batch_format="pyarrow"),
        "node", [("node", "count", "degree")],
        num_buckets=num_buckets).materialize()
    deg_schema = pa.schema([("node", pa.string()), ("degree", pa.int64())])

    # orient by (degree, id): tail u = lower key, head v = higher key.
    # Two joins pull the endpoint degrees onto each undirected edge.
    with_da = hash_join(und, deg, on="a", right_on="node",
                        num_buckets=num_buckets, left_schema=und_schema,
                        right_schema=deg_schema) \
        .map_batches(lambda t: t.rename_columns(["a", "b", "da"]),
                     batch_format="pyarrow")
    with_db = hash_join(
        with_da, deg, on="b", right_on="node", num_buckets=num_buckets,
        left_schema=pa.schema([("a", pa.string()), ("b", pa.string()),
                               ("da", pa.int64())]),
        right_schema=deg_schema)

    def orient(t: pa.Table) -> pa.Table:
        # emitted column "dv" is the HEAD's degree — the wedge filter
        # below compares head keys without another join
        da = t["da"].to_numpy(zero_copy_only=False)
        db = t.column(3).to_numpy(zero_copy_only=False)
        a = t["a"].to_pandas().to_numpy()
        b = t["b"].to_pandas().to_numpy()
        a_first = (da < db) | ((da == db) & (a < b))
        return pa.table({
            "u": pa.array(np.where(a_first, a, b), pa.string()),
            "v": pa.array(np.where(a_first, b, a), pa.string()),
            "dv": pa.array(np.where(a_first, db, da), pa.int64()),
        })

    eor = with_db.map_batches(orient, batch_format="pyarrow") \
        .materialize()
    eor_schema = pa.schema([("u", pa.string()), ("v", pa.string()),
                            ("dv", pa.int64())])
    eor2 = eor.map_batches(
        lambda t: t.rename_columns(["u", "w", "dw"]),
        batch_format="pyarrow")

    # wedges at tail u: ordered pairs (v, w) with key(v) < key(w)
    wedges = hash_join(
        eor, eor2, on="u", num_buckets=num_buckets,
        left_schema=eor_schema,
        right_schema=pa.schema([("u", pa.string()), ("w", pa.string()),
                                ("dw", pa.int64())]))

    def wedge_filter(t: pa.Table) -> pa.Table:
        dv = t["dv"].to_numpy(zero_copy_only=False)
        dw = t["dw"].to_numpy(zero_copy_only=False)
        v = t["v"].to_pandas().to_numpy()
        w = t["w"].to_pandas().to_numpy()
        keep = (dv < dw) | ((dv == dw) & (v < w))
        t = t.filter(pa.array(keep))
        return t.select(["u", "v", "w"])

    tri = hash_join(
        wedges.map_batches(wedge_filter, batch_format="pyarrow"),
        eor.map_batches(lambda t: t.select(["u", "v"]).rename_columns(
            ["v", "w"]), batch_format="pyarrow"),
        on=["v", "w"], how="semi", num_buckets=num_buckets,
        left_schema=pa.schema([("u", pa.string()), ("v", pa.string()),
                               ("w", pa.string())]),
        right_schema=pa.schema([("v", pa.string()), ("w", pa.string())]))

    def corners(t: pa.Table) -> pa.Table:
        cols = [t[c].combine_chunks() if isinstance(t[c], pa.ChunkedArray)
                else t[c] for c in ("u", "v", "w")]
        return pa.table({"node": pa.concat_arrays(cols)})

    tcnt = hash_aggregate(
        tri.map_batches(corners, batch_format="pyarrow"),
        "node", [("node", "count", "triangles")], num_buckets=num_buckets)

    merged = hash_join(
        deg, tcnt, on="node", how="left", num_buckets=num_buckets,
        left_schema=deg_schema,
        right_schema=pa.schema([("node", pa.string()),
                                ("triangles", pa.int64())]))

    def finalize(t: pa.Table) -> pa.Table:
        d = t["degree"].to_numpy(zero_copy_only=False)
        tr = t["triangles"].to_numpy(zero_copy_only=False)
        tr = np.where(np.isnan(tr), 0, tr).astype(np.int64)
        dd = d * (d - 1)                       # always even
        lcc = np.zeros(len(d), dtype=np.int64)
        m = dd > 0
        # integer half-up rounding of 2T/(d(d-1)) * 1e6 — bit-exact
        # against the SQL oracle's integer expression
        lcc[m] = (2 * tr[m] * 1_000_000 + dd[m] // 2) // dd[m]
        return pa.table({
            "node": t["node"],
            "degree": pa.array(d.astype(np.int64), pa.int64()),
            "triangles": pa.array(tr, pa.int64()),
            "lcc_c": pa.array(lcc, pa.int64()),
        })

    return merged.map_batches(finalize, batch_format="pyarrow")


def core_numbers(edges_ds, *, num_buckets: int = 16,
                 max_iters: int | None = None):
    """k-core decomposition: the core number of every node of the
    UNDIRECTED distinct-edge view of a (src, dst) string edge list
    (self-loops dropped, multi-edges once). Returns a (node,
    core int64) Dataset.

    Layout — the h-index fixpoint (Lü, Zhou, Zhang & Stanley 2016,
    "The H-index of a network node and its relation to degree and
    coreness", Nat. Commun. 7:10168, public): initialize c(v) =
    degree(v), then repeatedly set c(v) ← H({c(u) : u ~ v}), the
    largest h with ≥ h neighbors holding value ≥ h. Values are
    integers, monotone non-increasing, and converge exactly to the
    coreness — so Σc is a strictly-decreasing convergence witness and
    one O(1) aggregate per round is the stopping test (no per-node
    change join). Each round is one bucketed shuffle join (adjacency
    ⋈ values, volume O(m)) + one bucketed per-node H-index aggregate —
    the same per-round shape as :func:`pagerank`, driver holds O(1).
    Unlike sequential peeling (Batagelj-Zaversnik — inherently a
    priority queue), rounds are embarrassingly parallel; round count
    is bounded by the longest degeneracy-decreasing chain (small in
    practice, ≤ a few dozen on web graphs).
    """
    from .exchange import bucketed_map_groups
    from .hashagg import append_bucket

    # undirected distinct adjacency, both directions
    def undirect(t: pa.Table) -> pa.Table:
        keep = pc.not_equal(t["src"], t["dst"])
        t = t.filter(keep)
        lo = pc.min_element_wise(t["src"], t["dst"])
        hi = pc.max_element_wise(t["src"], t["dst"])
        return pa.table({"a": lo, "b": hi}).group_by(["a", "b"]) \
            .aggregate([])

    und = hash_aggregate(
        edges_ds.map_batches(undirect, batch_format="pyarrow"),
        ["a", "b"], [("a", "count", "_c")], num_buckets=num_buckets) \
        .select_columns(["a", "b"])

    def both_dirs(t: pa.Table) -> pa.Table:
        a = t["a"].combine_chunks() if isinstance(t["a"], pa.ChunkedArray) \
            else t["a"]
        b = t["b"].combine_chunks() if isinstance(t["b"], pa.ChunkedArray) \
            else t["b"]
        return pa.table({"node": pa.concat_arrays([a, b]),
                         "nbr": pa.concat_arrays([b, a])})

    adj = und.map_batches(both_dirs, batch_format="pyarrow").materialize()
    adj_schema = pa.schema([("node", pa.string()), ("nbr", pa.string())])

    cur = hash_aggregate(adj, "node", [("node", "count", "core")],
                         num_buckets=num_buckets).materialize()
    cur_schema = pa.schema([("node", pa.string()), ("core", pa.int64())])

    def total(ds) -> int:
        import pyarrow.compute as pc2

        s = 0
        for batch in ds.iter_batches(batch_format="pyarrow"):
            s += pc2.sum(batch["core"]).as_py() or 0
        return s

    prev_sum = total(cur)
    it = 0
    while max_iters is None or it < max_iters:
        it += 1
        # (node, c_nbr): pull each neighbor's current value over the edge
        vals = hash_join(adj, cur, on="nbr", right_on="node",
                         num_buckets=num_buckets, left_schema=adj_schema,
                         right_schema=cur_schema) \
            .map_batches(lambda t: pa.table({"node": t["node"],
                                             "v": t.column(2)}),
                         batch_format="pyarrow")

        def hindex(g: pa.Table) -> pa.Table:
            if g.num_rows == 0:
                return pa.table({"node": pa.array([], pa.string()),
                                 "core": pa.array([], pa.int64())})
            g = g.sort_by([("node", "ascending"), ("v", "descending")])
            node = g["node"].to_pandas().to_numpy()
            v = g["v"].to_numpy(zero_copy_only=False).astype(np.int64)
            starts = np.flatnonzero(
                np.concatenate([[True], node[1:] != node[:-1]]))
            rank = np.arange(len(v), dtype=np.int64) - \
                np.repeat(starts, np.diff(np.concatenate(
                    [starts, [len(v)]]))) + 1
            h = np.maximum.reduceat(np.minimum(rank, v), starts)
            return pa.table({"node": pa.array(node[starts]),
                             "core": pa.array(h, pa.int64())})

        cur = bucketed_map_groups(
            vals.map_batches(
                lambda t: append_bucket(t, ["node"], num_buckets),
                batch_format="pyarrow"),
            num_buckets, hindex).materialize()
        new_sum = total(cur)
        if new_sum == prev_sum:  # fixpoint: no value changed
            break
        prev_sum = new_sum
    return cur
