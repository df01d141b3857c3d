"""Stage 5: graph materialization — sorted, exact-deduped node/edge Parquet.

The Neo4j-load analogue (reference:
src/main/scala/corwur/neo4j/GenesToNeo4j.scala:8-83 and
Neo4JUtils.scala:30-51), with the reference's semantics kept and its
pathologies dropped:

  * node ids: content hashes, not insertion counters
    (Neo4JUtils.scala:35-39 is explicitly NOT reproduced — §1.3).
  * edge `CREATE UNIQUE` (Neo4JUtils.scala:43) → exact dedup via
    groupby on (src, dst, type, pred) with a `weight` multiplicity
    count (SURVEY.md §2.6 D1).
  * sort-then-emit `order` chain edges (GenesToNeo4j.scala:22-24 sort
    genes by start; Neo4JUtils.scala:50-51 adjacent-pair zip) →
    per-host sort of pages by (warc_ts, url) + shift-by-one pairing
    inside `map_groups`. The reference's reliance on file order
    (GenesToNeo4j.scala:53-70, SURVEY §2.5 O3) is made explicit: we
    ALWAYS sort on a declared key before pairing.
  * output: `nodes` sorted by node_id, `edges` sorted by
    (src, type, dst) — the deterministic Parquet contract
    (FIXTURES.md §3).

Node labels: entity | page | alias.  Edge types: asserts (with pred),
mentions (page→entity), alias_of (alias→entity), order (page→page).
``pred`` uses '' (empty string) for non-asserts edges so the dedup
groupby key is non-null everywhere.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import (alias_node_id, alias_node_id_bin,
                                 content_id_bin, hex_decode_ids,
                                 hex_encode_ids, page_node_id,
                                 page_node_id_bin)

NODES_SCHEMA = pa.schema([
    ("node_id", pa.string()),
    ("label", pa.string()),
    ("key", pa.string()),             # canonical surface / url / alias surface
    ("entity_type", pa.string()),     # nullable
    ("surface_forms", pa.list_(pa.string())),  # nullable, sorted
    ("n_mentions", pa.int64()),       # nullable
])

NODES_BIN_SCHEMA = pa.schema(
    [("node_id", pa.binary(20))] + list(NODES_SCHEMA)[1:])

EDGES_SCHEMA = pa.schema([
    ("src", pa.string()),
    ("dst", pa.string()),
    ("type", pa.string()),
    ("pred", pa.string()),            # '' when the type carries no predicate
    ("weight", pa.int64()),
])

# internal exchange layout: ids as fixed_size_binary(20) — half the
# shuffle/sort bytes of 40-char hex; hex encoding is order-preserving,
# so a binary sort + final hex encode equals a hex sort (VERDICT r1
# item 4). Public parquet keeps the hex EDGES_SCHEMA contract.
EDGES_BIN_SCHEMA = pa.schema([
    ("src", pa.binary(20)),
    ("dst", pa.binary(20)),
    ("type", pa.string()),
    ("pred", pa.string()),
    ("weight", pa.int64()),
])

_HOST = re.compile(r"https?://([^/]+)")


def host_of(url: str) -> str:
    m = _HOST.match(url)
    return m.group(1) if m else ""


# ---------------------------------------------------------------------------
# Edge emission (map side, combiner-style: weights partial-summed per batch)
# ---------------------------------------------------------------------------

def emit_asserts_mentions_alias(batch: pa.Table) -> pa.Table:
    """canonical triples → partial-aggregated edge rows.

    Per-batch combiner (the pre-aggregation rule, SURVEY.md §4.2): the
    groupby that finalizes weights shuffles per-batch partials, not one
    row per triple."""
    import pandas as pd

    n = batch.num_rows
    urls = batch.column("url").to_pandas()
    # canonical entity ids arrive as hex (canonicalize contract) —
    # decode once per batch to the binary exchange representation
    s_nid = pd.Series(hex_decode_ids(batch.column("subj_node_id")).to_pylist())
    o_nid = pd.Series(hex_decode_ids(batch.column("obj_node_id")).to_pylist())
    preds = batch.column("pred").to_pandas()
    s_surf = batch.column("subj").to_pandas()
    o_surf = batch.column("obj").to_pandas()
    # sha1 per DISTINCT url / surface, then C-level pandas maps
    pid = urls.map({u: page_node_id_bin(u) for u in pd.unique(urls)})
    s_aid = s_surf.map({a: alias_node_id_bin(a) for a in pd.unique(s_surf)})
    o_aid = o_surf.map({a: alias_node_id_bin(a) for a in pd.unique(o_surf)})
    empty = pd.Series([""] * n)
    frames = [
        pd.DataFrame({"src": s_nid, "dst": o_nid,
                      "type": "asserts", "pred": preds}),
        pd.DataFrame({"src": pid, "dst": s_nid,
                      "type": "mentions", "pred": empty}),
        pd.DataFrame({"src": pid, "dst": o_nid,
                      "type": "mentions", "pred": empty}),
        pd.DataFrame({"src": s_aid, "dst": s_nid,
                      "type": "alias_of", "pred": empty}),
        pd.DataFrame({"src": o_aid, "dst": o_nid,
                      "type": "alias_of", "pred": empty}),
    ]
    t = pa.Table.from_pandas(pd.concat(frames, ignore_index=True),
                             preserve_index=False)
    t = t.set_column(0, "src", t["src"].cast(pa.binary(20))) \
         .set_column(1, "dst", t["dst"].cast(pa.binary(20)))
    g = t.group_by(["src", "dst", "type", "pred"]).aggregate([("src", "count")])
    g = g.rename_columns(["src", "dst", "type", "pred", "w"])
    return g.set_column(g.schema.get_field_index("w"), "w",
                        g["w"].cast(pa.int64()))


class EmitEdgesPartial:
    """Actor-pool worker for the STREAMING edge path: linked triples →
    partial-aggregated edge rows, with the canonical-id lookup fused in
    (mapping hit → its node id; miss → NIL sha1('entity', surface) —
    byte-identical to ApplyCanonical + emit_asserts_mentions_alias, but
    no full-width canonical table ever exists: the exchange consumes
    4 string columns, not the 16-column canon layout)."""

    def __init__(self, map_ref=None, mapping: dict | None = None) -> None:
        import ray

        self.mapping = mapping if mapping is not None else ray.get(map_ref)

    def _nid(self, surface: str) -> bytes:
        hit = self.mapping.get(surface)
        if hit is not None:
            return bytes.fromhex(hit[1])
        return content_id_bin("entity", surface)

    @staticmethod
    def _mapped(col, fn) -> pa.Array:
        """fn over each DISTINCT value (Python sha1, no Arrow kernel),
        scattered back with a C-level take on the dictionary indices."""
        enc = pc.dictionary_encode(col.combine_chunks() if isinstance(
            col, pa.ChunkedArray) else col)
        vals = pa.array([fn(v) for v in enc.dictionary.to_pylist()],
                        pa.binary(20))
        return vals.take(enc.indices)

    def __call__(self, batch: pa.Table) -> pa.Table:
        s_surf = batch.column("subj")
        o_surf = batch.column("obj")
        s_nid = self._mapped(s_surf, self._nid)
        o_nid = self._mapped(o_surf, self._nid)
        pid = self._mapped(batch.column("url"), page_node_id_bin)
        s_aid = self._mapped(s_surf, alias_node_id_bin)
        o_aid = self._mapped(o_surf, alias_node_id_bin)
        n = batch.num_rows
        preds = batch.column("pred").combine_chunks() if isinstance(
            batch.column("pred"), pa.ChunkedArray) else batch.column("pred")
        empty = pa.nulls(n, pa.string()).fill_null("")

        def rep(s: str) -> pa.Array:
            return pa.nulls(n, pa.string()).fill_null(s)

        src = pa.concat_arrays([s_nid, pid, pid, s_aid, o_aid])
        dst = pa.concat_arrays([o_nid, s_nid, o_nid, s_nid, o_nid])
        typ = pa.concat_arrays([rep("asserts"), rep("mentions"),
                                rep("mentions"), rep("alias_of"),
                                rep("alias_of")])
        prd = pa.concat_arrays([preds, empty, empty, empty, empty])
        t = pa.table({"src": src.cast(pa.binary(20)),
                      "dst": dst.cast(pa.binary(20)),
                      "type": typ, "pred": prd})
        g = t.group_by(["src", "dst", "type", "pred"]) \
            .aggregate([("src", "count")])
        g = g.rename_columns(["src", "dst", "type", "pred", "w"])
        return g.set_column(g.schema.get_field_index("w"), "w",
                            g["w"].cast(pa.int64()))


# Tagged union layout for the MERGED streaming graph-sink pass: edge
# partials and node partials ride ONE exchange, with node rows mapped
# onto the edge columns (src←node_id, type←entity_type, pred←key) so
# the dominant edge rows carry ZERO dead columns. tag: 0 = edge,
# 1 = NIL entity node, 2 = page node (label derived from tag at the
# reduce). surface_forms / n_mentions are always null in partials and
# are re-added at the node reduce.
GRAPH_PARTIAL_SCHEMA = pa.schema([
    ("tag", pa.int8()),
    ("src", pa.binary(20)),
    ("dst", pa.binary(20)),           # null for node rows
    ("type", pa.string()),            # edge type | entity_type (nullable)
    ("pred", pa.string()),            # edge pred | node key
    ("w", pa.int64()),                # partial weight | null
])


def _tag_edges(t: pa.Table, tag: int = 0) -> pa.Table:
    return pa.table({
        "tag": pa.nulls(t.num_rows, pa.int8()).fill_null(tag),
        "src": t["src"], "dst": t["dst"], "type": t["type"],
        "pred": t["pred"], "w": t["w"],
    }).cast(GRAPH_PARTIAL_SCHEMA)


def _tag_nodes(node_id, key, entity_type, tag: int) -> pa.Table:
    n = len(node_id)
    return pa.table({
        "tag": pa.nulls(n, pa.int8()).fill_null(tag),
        "src": node_id,
        "dst": pa.nulls(n, pa.binary(20)),
        "type": entity_type,
        "pred": key,
        "w": pa.nulls(n, pa.int64()),
    }).cast(GRAPH_PARTIAL_SCHEMA)


class EmitGraphPartials:
    """Actor-pool worker for the MERGED streaming graph-sink pass: ONE
    scan of the linked triples emits BOTH the partial-aggregated edge
    rows (exactly ``EmitEdgesPartial``) and the per-batch-distinct NIL
    entity node rows (exactly ``NilNodePartials``) in the tagged union
    layout — halving the linked-table scans and letting the full actor
    pool work one pipeline instead of two split pools in two threads."""

    def __init__(self, map_ref=None, mapping: dict | None = None) -> None:
        self._edges = EmitEdgesPartial(map_ref=map_ref, mapping=mapping)
        self._nodes = NilNodePartials(mapping=self._edges.mapping)

    def __call__(self, batch: pa.Table) -> pa.Table:
        e = self._edges(batch)
        nil = self._nodes(batch)
        return pa.concat_tables([
            _tag_edges(e),
            _tag_nodes(nil["node_id"], nil["key"], nil["entity_type"],
                       tag=1),
        ])


def page_node_partials(pages_ds):
    """page rows → page-node rows in the tagged union layout (tag=2)."""
    def to_rows(t: pa.Table) -> pa.Table:
        urls = t.column("url").to_pylist()
        ids = pa.array([page_node_id_bin(u) for u in urls], pa.binary(20))
        return _tag_nodes(ids, pa.array(urls, pa.string()),
                          pa.nulls(len(urls), pa.string()), tag=2)

    return pages_ds.map_batches(to_rows, batch_format="pyarrow")


class NilNodePartials:
    """Actor-pool worker for the STREAMING nodes path: linked triples →
    per-batch-distinct NIL entity node rows straight from the mapping
    misses (equivalent to nil_entity_node_partials over tagged canon
    rows: a mapping hit's node id is in known_ids by construction, so
    'not resolved by the mapping' == 'not in known_ids')."""

    def __init__(self, map_ref=None, mapping: dict | None = None) -> None:
        import ray

        self.mapping = mapping if mapping is not None else ray.get(map_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        # C-level dedup to DISTINCT surfaces first; Python touches only
        # the per-batch distinct set (bounded by vocabulary, not rows)
        df = pd.concat(
            [pd.DataFrame({"s": batch.column(side).to_pandas(),
                           "t": batch.column(f"{side}_type").to_pandas()})
             for side in ("subj", "obj")],
            ignore_index=True).drop_duplicates("s")
        items = sorted((s, t if pd.notna(t) else None)
                       for s, t in zip(df["s"], df["t"])
                       if s not in self.mapping)
        n = len(items)
        return pa.table({
            "node_id": pa.array([content_id_bin("entity", s)
                                 for s, _ in items], pa.binary(20)),
            "label": pa.array(["entity"] * n, pa.string()),
            "key": pa.array([s for s, _ in items], pa.string()),
            "entity_type": pa.array([t for _, t in items], pa.string()),
            "surface_forms": pa.array([None] * n, pa.list_(pa.string())),
            "n_mentions": pa.array([None] * n, pa.int64()),
        })


def _order_edges_bucket(bucket: pa.Table) -> pa.Table:
    """One hash bucket of hosts: sort by (host, warc_ts, url), emit
    adjacent pairs within each host run (vectorized boundary mask —
    the only per-row Python is the sha1 id, which has no Arrow
    kernel)."""
    import numpy as np

    g = bucket.sort_by([("host", "ascending"), ("warc_ts", "ascending"),
                        ("url", "ascending")])
    if g.num_rows < 2:
        return EDGES_BIN_SCHEMA.empty_table()
    hosts = g.column("host").to_numpy(zero_copy_only=False)
    ids = pa.array([page_node_id_bin(u)
                    for u in g.column("url").to_pylist()], pa.binary(20))
    same = pa.array(hosts[:-1] == hosts[1:])
    src = ids.slice(0, len(ids) - 1).filter(same)
    dst = ids.slice(1).filter(same)
    n = len(src)
    return pa.table({
        "src": src,
        "dst": dst,
        "type": pa.array(["order"] * n, pa.string()),
        "pred": pa.array([""] * n, pa.string()),
        "weight": pa.array(np.ones(n, dtype=np.int64), pa.int64()),
    })


def order_edges(pages_ds, num_buckets: int | None = None):
    """page rows (url, warc_ts) → `order` chain edges, one chain per host.

    Shuffle key: hash(host) % B (SURVEY.md §7.4's seqname analogue) —
    bucketed so the exchange groups B ints, not one group per host;
    all pages of a host land in one bucket, so per-host chains are
    complete by construction. ``num_buckets=None`` sizes the exchange
    to the cluster (see sink_geometry)."""
    import ray

    from ..ops.hashagg import append_bucket

    from ..ops.exchange import bucket_exchange_ds

    if num_buckets is None:
        cpus = int(ray.cluster_resources().get("CPU", 32)) or 32
        num_buckets = max(8, min(64, 2 * cpus))

    def add_host(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # vectorized RE2 extract == host_of per row ('' on no match)
        ex = pc.extract_regex(t["url"], r"^https?://(?P<h>[^/]+)")
        hosts = pc.fill_null(pc.struct_field(ex, "h"), "")
        out = t.select(["url", "warc_ts"]).append_column(
            "host", hosts.combine_chunks() if isinstance(
                hosts, pa.ChunkedArray) else hosts)
        return append_bucket(out, ["host"], num_buckets, name="_rb")

    def reduce_bucket(b: int, g: pa.Table | None) -> pa.Table:
        if g is None or g.num_rows == 0:
            return EDGES_BIN_SCHEMA.empty_table()
        return _order_edges_bucket(g)

    with_host = pages_ds.map_batches(add_host, batch_format="pyarrow")
    return bucket_exchange_ds(with_host, num_buckets, reduce_bucket,
                              empty_schema=EDGES_BIN_SCHEMA)


def finalize_edges(edge_partials_ds, num_buckets: int = 64):
    """partial edge rows (w) → exact-deduped weighted edges (D1 analogue).

    Bucketed two-phase hash aggregate (ops.hashagg): the dedup shuffle
    key is (src, dst, type, pred) hashed to a small int bucket."""
    from ..ops.hashagg import hash_aggregate

    return hash_aggregate(edge_partials_ds, ["src", "dst", "type", "pred"],
                          [("w", "sum", "weight")], num_buckets=num_buckets)


def mention_counts_from_edges(edges_ds, known_ids: set) -> dict:
    """entity node_id → mention count for the (dictionary-bounded)
    canonical entity set, read off the deduped `mentions` edges
    (weight = multiplicity).

    Distributed: vectorized filter (type == mentions ∧ dst ∈ known) +
    bucketed hash aggregate; only ≤ |entities| rows reach the driver.
    NIL entities (unbounded) are deliberately excluded — their node
    rows carry null n_mentions (nil_entity_nodes)."""
    import pyarrow.compute as pc

    from ..ops.hashagg import hash_aggregate

    known = hex_decode_ids(pa.array(sorted(known_ids), pa.string()))

    def grab(t: pa.Table) -> pa.Table:
        mask = pc.and_(pc.equal(t["type"], "mentions"),
                       pc.is_in(t["dst"], value_set=known))
        return t.filter(mask).select(["dst", "weight"])

    agg = hash_aggregate(edges_ds.map_batches(grab, batch_format="pyarrow"),
                         "dst", [("weight", "sum", "n")], num_buckets=8)
    counts: dict[str, int] = {}
    for b in agg.iter_batches(batch_format="pyarrow", batch_size=65536):
        for d, n in zip(b["dst"].to_pylist(), b["n"].to_pylist()):
            counts[d.hex()] = int(n)
    return counts


# ---------------------------------------------------------------------------
# Node emission
# ---------------------------------------------------------------------------

def entity_nodes_from_mapping(mapping: dict, mention_counts: dict,
                              type_of: dict) -> pa.Table:
    """Driver-side entity+alias node table from the canonical mapping.

    mapping: surface → (canonical_key, node_id); mention_counts:
    node_id → n; type_of: canonical_key → entity_type|None. Bounded by
    the alias universe (see canonicalize.py scale note)."""
    by_node: dict[str, tuple[str, set]] = {}
    for surface, (canon, nid) in mapping.items():
        ent = by_node.setdefault(nid, (canon, set()))
        ent[1].add(surface)
    rows = []
    for nid, (canon, surfaces) in sorted(by_node.items()):
        rows.append({
            "node_id": bytes.fromhex(nid), "label": "entity", "key": canon,
            "entity_type": type_of.get(canon),
            "surface_forms": sorted(surfaces),
            "n_mentions": int(mention_counts.get(nid, 0)),
        })
        for s in sorted(surfaces):
            rows.append({
                "node_id": alias_node_id_bin(s), "label": "alias", "key": s,
                "entity_type": None, "surface_forms": None, "n_mentions": None,
            })
    return pa.Table.from_pylist(rows, schema=NODES_BIN_SCHEMA)


def page_nodes(pages_ds):
    """page rows → page nodes (vectorized batch transform)."""
    def to_nodes(t: pa.Table) -> pa.Table:
        urls = t.column("url").to_pylist()
        ids = [page_node_id_bin(u) for u in urls]
        n = len(urls)
        return pa.table({
            "node_id": pa.array(ids, pa.binary(20)),
            "label": pa.array(["page"] * n, pa.string()),
            "key": pa.array(urls, pa.string()),
            "entity_type": pa.array([None] * n, pa.string()),
            "surface_forms": pa.array([None] * n, pa.list_(pa.string())),
            "n_mentions": pa.array([None] * n, pa.int64()),
        })

    return pages_ds.map_batches(to_nodes, batch_format="pyarrow")


def nil_entity_node_partials(canon_ds, known_node_ids: set):
    """Per-batch-distinct NIL entity node rows (duplicates across
    batches allowed and bit-identical: node_id = sha1('entity',
    surface) determines key == surface, and entity_type is the
    deterministic per-surface linker output). Feed into
    ``range_sorted_write(dedup_key=True)`` so the sink exchange doubles
    as the global distinct; NIL surfaces are unbounded at scale so they
    never pass through the driver mapping."""
    known_set = {bytes.fromhex(k) for k in sorted(known_node_ids)}

    def partial(t: pa.Table) -> pa.Table:
        parts = []
        for s in ("subj", "obj"):
            p_ = t.select([f"{s}_node_id", f"{s}_canon", f"{s}_type"]) \
                .rename_columns(["node_id", "key", "entity_type"])
            p_ = p_.set_column(0, "node_id", hex_decode_ids(p_["node_id"]))
            parts.append(p_)
        both = pa.concat_tables(parts)
        d = both.group_by("node_id").aggregate(
            [("key", "min"), ("entity_type", "min")]) \
            .rename_columns(["node_id", "key", "entity_type"])
        mask = [nid not in known_set
                for nid in d.column("node_id").to_pylist()]
        d = d.filter(pa.array(mask, pa.bool_()))
        n = d.num_rows
        return pa.table({
            "node_id": d.column("node_id"),
            "label": pa.array(["entity"] * n, pa.string()),
            "key": d.column("key"),
            "entity_type": d.column("entity_type"),
            "surface_forms": pa.array([None] * n, pa.list_(pa.string())),
            "n_mentions": pa.array([None] * n, pa.int64()),
        })

    return canon_ds.map_batches(partial, batch_format="pyarrow")


def nil_entity_nodes(canon_ds, known_node_ids: set):
    """Entity nodes for NIL (out-of-dictionary) canonical entities.

    Streamed two-phase: per-batch distinct → groupby dedup; NIL
    surfaces are unbounded at scale so they never pass through the
    driver mapping."""
    known = sorted(known_node_ids)

    def partial(t: pa.Table) -> pa.Table:
        # vectorized per-batch distinct over both mention sides; hex →
        # binary(20) here so the distinct shuffle moves half the bytes
        parts = []
        for s in ("subj", "obj"):
            p_ = t.select([f"{s}_node_id", f"{s}_canon", f"{s}_type"]) \
                .rename_columns(["node_id", "key", "entity_type"])
            p_ = p_.set_column(0, "node_id", hex_decode_ids(p_["node_id"]))
            parts.append(p_)
        both = pa.concat_tables(parts)
        return both.group_by("node_id").aggregate(
            [("key", "min"), ("entity_type", "min")]) \
            .rename_columns(["node_id", "key", "entity_type"])

    # global distinct via the bucketed hash aggregate — NOT
    # groupby().map_groups(head) which pays a per-group Python call
    # (66k canonical ids → 66k calls); values per node_id are identical
    # so min() is a faithful representative pick
    from ..ops.hashagg import hash_aggregate

    distinct = hash_aggregate(
        canon_ds.map_batches(partial, batch_format="pyarrow"),
        "node_id",
        [("key", "min", "key"), ("entity_type", "min", "entity_type")],
        num_buckets=32)

    known_set = {bytes.fromhex(k) for k in known}

    def to_nodes(t: pa.Table) -> pa.Table:
        mask = [nid not in known_set for nid in t.column("node_id").to_pylist()]
        t = t.filter(pa.array(mask, pa.bool_()))
        n = t.num_rows
        return pa.table({
            "node_id": t.column("node_id"),
            "label": pa.array(["entity"] * n, pa.string()),
            "key": t.column("key"),
            "entity_type": t.column("entity_type"),
            "surface_forms": pa.array([None] * n, pa.list_(pa.string())),
            "n_mentions": pa.array([None] * n, pa.int64()),
        })

    return distinct.map_batches(to_nodes, batch_format="pyarrow")


def encode_nodes_hex(t: pa.Table) -> pa.Table:
    """binary(20) node ids → the public 40-hex contract (final map)."""
    return t.set_column(0, "node_id", hex_encode_ids(t["node_id"]))


def encode_edges_hex(t: pa.Table) -> pa.Table:
    return t.set_column(0, "src", hex_encode_ids(t["src"])) \
            .set_column(1, "dst", hex_encode_ids(t["dst"]))


# ---------------------------------------------------------------------------
# Range-bucketed sorted sink — ONE exchange replaces sort (sample +
# 2-phase) + write, and the input is consumed exactly once (so no
# pre-sort materialize is needed). sha1-derived ids are uniform over
# the keyspace, so the first byte of the binary(20) key is a perfect
# range partitioner: bucket order == key order, and per-bucket sort +
# filename order == global sort. Output is partitioned parquet
# (part-000..part-NNN), the resumable-output layout: a rerun can skip
# completed buckets, and readers get global order from filename order.
# ---------------------------------------------------------------------------

def _first_byte(arr) -> "np.ndarray":
    """First byte of each value of a (chunked) fixed_size_binary(20)
    column, zero-copy off the Arrow data buffer."""
    import numpy as np

    chunks = arr.chunks if isinstance(arr, pa.ChunkedArray) else [arr]
    outs = []
    for c in chunks:
        if len(c) == 0:
            continue
        w = c.type.byte_width
        buf = np.frombuffer(c.buffers()[1], dtype=np.uint8)
        o = c.offset * w
        outs.append(buf[o:o + len(c) * w].reshape(-1, w)[:, 0].copy())
    if not outs:
        return np.empty(0, dtype=np.uint8)
    return np.concatenate(outs)


def _first_bytes_u16(arr) -> "np.ndarray":
    """First TWO bytes of each value of a (chunked) fixed_size_binary
    column as big-endian uint16, zero-copy off the Arrow data buffer —
    the 2-byte range-partition prefix (supports up to 65536 buckets)."""
    import numpy as np

    chunks = arr.chunks if isinstance(arr, pa.ChunkedArray) else [arr]
    outs = []
    for c in chunks:
        if len(c) == 0:
            continue
        w = c.type.byte_width
        buf = np.frombuffer(c.buffers()[1], dtype=np.uint8)
        o = c.offset * w
        two = buf[o:o + len(c) * w].reshape(-1, w)[:, :2].astype(np.uint16)
        outs.append((two[:, 0] << 8) | two[:, 1])
    if not outs:
        return np.empty(0, dtype=np.uint16)
    return np.concatenate(outs)


def _append_range_bucket(t: pa.Table, key: str, num_buckets: int) -> pa.Table:
    """Dense range-bucket ids off the first 2 bytes of the sha1 key
    (uniform over the keyspace): rb = u16_prefix >> (16 - log2 B).
    For B ≤ 256 this equals the 1-byte form bit-for-bit; up to 65536
    buckets are supported for cluster-scale sinks."""
    import numpy as np

    assert num_buckets & (num_buckets - 1) == 0 and \
        1 <= num_buckets <= 65536, num_buckets
    shift = 16 - (num_buckets.bit_length() - 1)
    rb = (_first_bytes_u16(t[key]) >> shift).astype(np.int32)
    return t.replace_schema_metadata(None).append_column(
        "_rb", pa.array(rb, pa.int32()))


def _write_part(t: pa.Table, out_dir: str, rb: int) -> None:
    """Atomic per-bucket part write (tmp + rename; deterministic
    content makes task retries idempotent). 5-digit part numbers keep
    filename order == bucket order past 1000 buckets."""
    import os

    import pyarrow.parquet as pq

    path = os.path.join(out_dir, f"part-{rb:05d}.parquet")
    tmp = path + ".tmp"
    pq.write_table(t, tmp, compression="zstd")
    os.replace(tmp, path)


def _count_part_rows(out_dir: str) -> int:
    import os

    import pyarrow.parquet as pq

    return sum(pq.read_metadata(os.path.join(out_dir, f)).num_rows
               for f in os.listdir(out_dir)
               if f.endswith(".parquet") and not f.startswith("_"))


def sink_geometry(num_buckets: int | None = None,
                  coalesce_blocks: int | None = None) -> tuple[int, int]:
    """(num_buckets, coalesce_blocks) for the range-sorted sinks, sized
    to the cluster: the exchange materializes O(blocks × buckets)
    intermediate objects, and per-object scheduling/IPC overhead — not
    row volume — dominates the sink when that product explodes
    (measured on 3.3M edge partials: 192 blocks × 128 buckets = 165 s;
    32 blocks × 64 buckets = 4–11 s, identical output). Defaults:
    buckets = next pow2 of 2×CPU (clamped [16, 1024] here; the 2-byte
    range prefix in _append_range_bucket supports up to 65536 — pass
    cfg.sink_buckets explicitly on a cluster that size), coalesce =
    2×CPU (at real-cluster scale raise both with node count so blocks
    stay near the object-store target block size)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 32)) or 32
    if num_buckets is None:
        v = max(16, min(2 * cpus, 1024))
        num_buckets = 1 << (v - 1).bit_length()   # round up to pow2
    if coalesce_blocks is None:
        coalesce_blocks = max(2 * cpus, 16)
    return num_buckets, coalesce_blocks


def _sort_dedup(t: pa.Table, order: list, dedup_key: str | None) -> pa.Table:
    """In-bucket sort (+ optional first-row-per-key dedup — valid only
    under the bit-identical-duplicates contract, see
    range_sorted_write)."""
    import numpy as np

    t = t.sort_by(order)
    if dedup_key and t.num_rows > 1:
        ids = np.array(t[dedup_key].to_pylist(), dtype=object)
        keep = np.r_[True, ids[1:] != ids[:-1]]
        if not keep.all():
            t = t.filter(pa.array(keep, pa.bool_()))
    return t


def range_sorted_write(ds, key: str, sort_keys: list, out_dir: str,
                       schema: pa.Schema, encode_fn, num_buckets: int = 64,
                       dedup_key: bool = False,
                       coalesce_blocks: int | None = None) -> int:
    """Sink ``ds`` as globally-sorted partitioned parquet; returns rows
    written. ``key`` (binary(20)) is the range-partition column and
    must be ``sort_keys[0]``; ``encode_fn`` maps the internal binary
    layout to the public hex schema after the in-bucket sort
    (order-preserving). At larger scale raise ``num_buckets`` (≤256
    here via 1 prefix byte; extend to 2 bytes for >256).

    ``dedup_key=True`` keeps the first row per ``key`` after the sort —
    valid ONLY when duplicate-key rows are bit-identical (the NIL
    node-partial contract: per-batch distinct partials of the same
    node_id carry identical content), which makes the sink exchange
    double as the global distinct — no separate dedup exchange."""
    import os

    import numpy as np

    os.makedirs(out_dir, exist_ok=True)
    if coalesce_blocks:
        # bound the exchange's O(blocks × buckets) object count — see
        # sink_geometry; the repartition is a cheap split/merge of the
        # slim partial rows, and the groupby is a barrier anyway
        ds = ds.repartition(coalesce_blocks)

    order = [(k, "ascending") for k in sort_keys]

    def write_group(rb: int, t: pa.Table | None) -> int:
        if t is None or t.num_rows == 0:
            return 0
        t = _sort_dedup(t, order, key if dedup_key else None)
        _write_part(encode_fn(t), out_dir, rb)
        return t.num_rows

    from ..ops.exchange import bucket_exchange

    bucketed = ds.map_batches(
        lambda t: _append_range_bucket(t, key, num_buckets),
        batch_format="pyarrow")
    bucket_exchange(bucketed, num_buckets, write_group)
    n = _count_part_rows(out_dir)
    if n == 0 and not any(f.endswith(".parquet") for f in os.listdir(out_dir)):
        write_empty_parts(out_dir, schema)
    return n


# ---------------------------------------------------------------------------
# Overlapped node sink (streaming mode) — composed task waves, no
# driver barrier anywhere between the edge and node sinks:
#   S/N1 — the merged launch_graph_sink exchange splits the tagged
#        partials and produces, per node bucket, the sorted+deduped
#        partial table (while its edge buckets sort and write parts)
#   N2 — merge each bucket's entity/alias slice (computed by ONE task
#        downstream of the edge counts) into the sorted partials and
#        write the final part (launch_merge_write_nodes). Ray releases
#        bucket b's N2 the moment its N1 table and entity slice are
#        both ready.
# ---------------------------------------------------------------------------

def launch_entity_node_slices(map_ref, type_of: dict, count_refs: list,
                              num_buckets: int) -> list:
    """ONE task, downstream of the edge sink's mention-count partials:
    build the (dictionary-bounded) entity+alias node table and cut it
    into per-range-bucket slices (num_returns=num_buckets). The node
    sink's merge wave consumes the slice refs — entity rows flow into
    their buckets without the counts ever crossing the driver."""
    import ray

    from ..ops.exchange import _split_one

    nret = max(num_buckets, 2)

    @ray.remote(num_returns=nret)
    def build(mapping, type_of_, *count_tables):
        counts = _merge_count_partials(count_tables)
        t = entity_nodes_from_mapping(mapping, counts, type_of_)
        t = _append_range_bucket(t, "node_id", num_buckets)
        parts = _split_one(t, "_rb", num_buckets)
        return parts + (None,) * (nret - num_buckets)

    refs = build.remote(map_ref, type_of, *count_refs)
    return list(refs[:num_buckets])


def launch_merge_write_nodes(n1_refs: list, ent_refs: list, out_dir: str,
                             num_buckets: int) -> list:
    """Wave N2: per bucket, merge the sorted partials with the entity
    slice (key spaces are disjoint by construction — entity/alias ids
    never collide with page/NIL ids), final sort + dedup + hex encode +
    atomic part write. Returns per-bucket write refs (rows written)."""
    import os

    import ray

    os.makedirs(out_dir, exist_ok=True)

    @ray.remote
    def merge_write(rb: int, t1, te) -> int:
        tabs = [x for x in (t1, te)
                if x is not None and x.num_rows > 0]
        if not tabs:
            return 0
        t = pa.concat_tables(tabs, promote_options="default")
        t = _sort_dedup(t, [("node_id", "ascending")], "node_id")
        _write_part(encode_nodes_hex(t), out_dir, rb)
        return t.num_rows

    n1 = n1_refs if n1_refs else [None] * num_buckets
    return [merge_write.remote(b, n1[b], ent_refs[b])
            for b in range(num_buckets)]


_COUNTS_SIDE_FILE = "_mention_counts.parquet"  # '_' prefix: ignored by
# parquet dataset discovery (pyarrow ignore_prefixes default), so edge
# readers never see it


_EDGE_COUNTS_SCHEMA = pa.schema([("dst", pa.binary(20)), ("n", pa.int64())])


def launch_finalize_edges(edge_partials_ds, out_dir: str,
                          known_ids_hex: set, num_buckets: int = 64,
                          coalesce_blocks: int | None = None) -> list:
    """Fused edge sink, NON-BLOCKING: partial edge rows →
    per-range-bucket exact dedup (D1) + sort + sorted-part write +
    mention-count partials, in ONE exchange and one pass. Returns the
    UN-GOTTEN per-bucket reduce refs (each resolves to its bucket's
    mention-count partial table) so downstream work — the node sink's
    entity-slice task, the counts side file — composes on the refs
    and overlaps the writes; the calling thread still blocks while the
    upstream Dataset streams (run in a worker thread to overlap two
    sinks' upstreams)."""
    import os

    import pyarrow.compute as pc

    os.makedirs(out_dir, exist_ok=True)
    if coalesce_blocks:
        # bound the exchange's O(blocks × buckets) object count — see
        # sink_geometry
        edge_partials_ds = edge_partials_ds.repartition(coalesce_blocks)
    # dictionary-bounded value set (ray.put-broadcast it if the
    # dictionary universe ever stops being driver-small)
    known_arr = pa.array(sorted(bytes.fromhex(k) for k in known_ids_hex),
                         pa.binary(20))
    order = [(k, "ascending") for k in ("src", "type", "dst", "pred")]

    def write_group(rb: int, t: pa.Table | None) -> pa.Table:
        if t is None or t.num_rows == 0:
            return _EDGE_COUNTS_SCHEMA.empty_table()
        t = t.group_by(["src", "dst", "type", "pred"]).aggregate([("w", "sum")])
        expected = ["src", "dst", "type", "pred", "w_sum"]
        if t.column_names != expected:   # see ops/hashagg._checked_rename
            raise AssertionError(f"group_by output order changed: "
                                 f"{t.column_names}")
        t = t.rename_columns(["src", "dst", "type", "pred", "weight"])
        t = t.set_column(4, "weight", t["weight"].cast(pa.int64()))
        t = t.sort_by(order)
        _write_part(encode_edges_hex(t), out_dir, rb)
        m = pc.and_(pc.equal(t["type"], "mentions"),
                    pc.is_in(t["dst"], value_set=known_arr))
        cm = t.filter(m).group_by("dst").aggregate([("weight", "sum")])
        if cm.num_rows == 0:
            return _EDGE_COUNTS_SCHEMA.empty_table()
        return cm.rename_columns(["dst", "n"]).cast(_EDGE_COUNTS_SCHEMA)

    from ..ops.exchange import reduce_refs, split_refs

    bucketed = edge_partials_ds.map_batches(
        lambda t: _append_range_bucket(t, "src", num_buckets),
        batch_format="pyarrow")
    return reduce_refs(split_refs(bucketed, num_buckets), num_buckets,
                       write_group)


def _tag_bucket_table(t: pa.Table, num_buckets: int) -> pa.Table:
    """Range-bucket a tagged-union partials table: edge rows (tag=0) to
    buckets [0, B), node rows to [B, 2B)."""
    import numpy as np

    B = num_buckets
    t = _append_range_bucket(t, "src", B)
    tags = t["tag"].to_numpy(zero_copy_only=False)
    rb = t["_rb"].to_numpy(zero_copy_only=False)
    rb = np.where(tags == 0, rb, rb + B).astype(np.int32)
    return t.set_column(t.schema.get_field_index("_rb"), "_rb",
                        pa.array(rb, pa.int32()))


def _make_graph_reduce(edges_dir: str, known_ids_hex: set, num_buckets: int):
    """The merged graph-sink reduce kernel over 2×num_buckets buckets:
    [0, B) = edge buckets (fused dedup + sort + sorted-part write +
    mention-count partial), [B, 2B) = node buckets (sort +
    first-per-key dedup of the node partials, label from the tag)."""
    import pyarrow.compute as pc

    known_arr = pa.array(sorted(bytes.fromhex(k) for k in known_ids_hex),
                         pa.binary(20))
    order = [(k, "ascending") for k in ("src", "type", "dst", "pred")]
    B = num_buckets

    def reduce_group(rb: int, t: pa.Table | None):
        if rb < B:
            # edge bucket — launch_finalize_edges's write_group kernel
            if t is None or t.num_rows == 0:
                return _EDGE_COUNTS_SCHEMA.empty_table()
            t = t.select(["src", "dst", "type", "pred", "w"])
            t = t.group_by(["src", "dst", "type", "pred"]) \
                .aggregate([("w", "sum")])
            expected = ["src", "dst", "type", "pred", "w_sum"]
            if t.column_names != expected:
                raise AssertionError(f"group_by output order changed: "
                                     f"{t.column_names}")
            t = t.rename_columns(["src", "dst", "type", "pred", "weight"])
            t = t.set_column(4, "weight", t["weight"].cast(pa.int64()))
            t = t.sort_by(order)
            _write_part(encode_edges_hex(t), edges_dir, rb)
            m = pc.and_(pc.equal(t["type"], "mentions"),
                        pc.is_in(t["dst"], value_set=known_arr))
            cm = t.filter(m).group_by("dst").aggregate([("weight", "sum")])
            if cm.num_rows == 0:
                return _EDGE_COUNTS_SCHEMA.empty_table()
            return cm.rename_columns(["dst", "n"]).cast(_EDGE_COUNTS_SCHEMA)
        # node bucket — reconstruct the internal node layout, then the
        # launch_sorted_node_tables kernel (sort + first-per-key dedup;
        # valid: duplicate node_id partial rows are bit-identical)
        if t is None or t.num_rows == 0:
            return None
        t = _sort_dedup(t, [("src", "ascending")], "src")
        n = t.num_rows
        label = pc.if_else(pc.equal(t["tag"], 1),
                           pa.scalar("entity", pa.string()),
                           pa.scalar("page", pa.string()))
        return pa.table({
            "node_id": t["src"], "label": label, "key": t["pred"],
            "entity_type": t["type"],
            "surface_forms": pa.nulls(n, pa.list_(pa.string())),
            "n_mentions": pa.nulls(n, pa.int64()),
        })

    return reduce_group


def launch_graph_sink(partials_ds, edges_dir: str, known_ids_hex: set,
                      num_buckets: int = 64,
                      coalesce_blocks: int | None = None
                      ) -> tuple[list, list]:
    """MERGED streaming graph sink, NON-BLOCKING: one tagged-union
    partials stream (``GRAPH_PARTIAL_SCHEMA``) → ONE exchange with
    2×num_buckets reduce tasks (``_make_graph_reduce``). Returns
    (edge_count_refs, n1_refs), both un-gotten, in bucket order —
    compose the entity-slice / merge / counts-side-file waves on them.
    The calling thread blocks while the upstream Dataset streams."""
    import os

    os.makedirs(edges_dir, exist_ok=True)
    if coalesce_blocks:
        partials_ds = partials_ds.repartition(coalesce_blocks)
    B = num_buckets

    from ..ops.exchange import split_refs

    bucketed = partials_ds.map_batches(
        lambda t: _tag_bucket_table(t, B), batch_format="pyarrow")
    splits = split_refs(bucketed, 2 * B)
    return launch_graph_sink_from_splits(splits, edges_dir, known_ids_hex,
                                         num_buckets)


def launch_graph_sink_from_splits(splits: list, edges_dir: str,
                                  known_ids_hex: set, num_buckets: int
                                  ) -> tuple[list, list]:
    """Reduce wave of the merged graph sink over an already-launched
    split wave (any mix of ``split_refs`` outputs and
    ``launch_emit_splits`` groups — each entry is 2×num_buckets bucket
    slice refs). Non-blocking; returns (edge_count_refs, n1_refs)."""
    import os

    os.makedirs(edges_dir, exist_ok=True)
    B = num_buckets
    from ..ops.exchange import reduce_refs

    refs = reduce_refs(splits, 2 * B,
                       _make_graph_reduce(edges_dir, known_ids_hex, B))
    return refs[:B], refs[B:]


def _row_balanced_groups(refs: list, rows: list, k: int) -> list:
    """Partition pinned block refs into ≤k contiguous groups of roughly
    equal row counts (greedy; unknown row counts weigh 1)."""
    k = max(1, min(k, len(refs)))
    weights = [max(1, r or 1) for r in rows]
    total = sum(weights)
    target = total / k
    groups, cur, acc = [], [], 0.0
    for ref, w in zip(refs, weights):
        cur.append(ref)
        acc += w
        if acc >= target and len(groups) < k - 1:
            groups.append(cur)
            cur, acc = [], 0.0
    if cur:
        groups.append(cur)
    return groups


def launch_emit_splits(map_ref, block_refs: list, block_rows: list,
                       num_buckets: int, target_groups: int
                       ) -> tuple[list, list]:
    """Fused EmitGraphPartials + tag + bucket-split wave launched
    directly over PINNED linked block refs: one raw task per
    row-balanced group (≈``target_groups`` — the coalesce geometry,
    see ``sink_geometry``), each returning 2×num_buckets zero-copy
    bucket slices for ``launch_graph_sink_from_splits`` PLUS one
    mention-count partial. Returns (split_groups, count_refs).

    The count partials are computed here, MAP-SIDE, rather than in the
    edge reduce: partial per-dst weight sums add up to the aggregated
    totals, and the known-entity id set derives from the mapping the
    task already holds — so the entity-node build (and therefore the
    whole node sink) depends only on this wave, fully overlapping the
    edge buckets' sort+write IO instead of waiting behind it (the
    measured reduce-tail idle window, BASELINE.md round-3 profile).

    Compared to the Dataset path this removes the full-width linked
    repartition, the partials repartition, and the actor-pool startup
    between the link stream and the sink exchange; the mapping is
    resolved from plasma once per task (Ray auto-derefs ``map_ref``)."""
    import ray

    from ..ops.exchange import _split_one

    B = num_buckets
    nret = max(2 * B, 2) + 1  # + the map-side mention-count partial

    @ray.remote(num_returns=nret)
    def emit_split(mapping, *blocks):
        import pyarrow.compute as pc

        emit = EmitGraphPartials(mapping=mapping)
        parts = [emit(t.select(["url", "subj", "subj_type",
                                "obj", "obj_type", "pred"]))
                 for t in blocks if t.num_rows > 0]
        u = pa.concat_tables(parts, promote_options="default") if parts \
            else GRAPH_PARTIAL_SCHEMA.empty_table()
        known = pa.array(
            sorted(bytes.fromhex(nid)
                   for nid in {n for _, n in mapping.values()}),
            pa.binary(20))
        m = pc.and_(pc.equal(u["type"], "mentions"),
                    pc.is_in(u["dst"], value_set=known))
        cm = u.filter(m).group_by("dst").aggregate([("w", "sum")])
        counts = cm.rename_columns(["dst", "n"]).cast(_EDGE_COUNTS_SCHEMA)
        u = _tag_bucket_table(u, B)
        sl = _split_one(u, "_rb", 2 * B)
        return sl + (None,) * (nret - 1 - 2 * B) + (counts,)

    if not block_refs:
        return [], []
    groups = _row_balanced_groups(block_refs, block_rows, target_groups)
    refs = [emit_split.remote(map_ref, *g) for g in groups]
    return [r[:nret - 1] for r in refs], [r[nret - 1] for r in refs]


def _merge_count_partials(partials) -> dict:
    counts: dict[str, int] = {}
    for ct in partials:
        if ct is None:
            continue
        for d, nn in zip(ct["dst"].to_pylist(), ct["n"].to_pylist()):
            counts[d.hex()] = counts.get(d.hex(), 0) + int(nn)
    return counts


def _counts_side_table(counts: dict) -> pa.Table:
    return pa.table({"node_id": pa.array(sorted(counts), pa.string()),
                     "n": pa.array([counts[k] for k in sorted(counts)],
                                   pa.int64())})


def launch_counts_side_file(out_dir: str, count_refs: list):
    """One small task that merges the per-bucket mention-count partials
    and writes ``_mention_counts.parquet`` beside the parts (atomic) —
    scheduled by Ray as soon as the last edge bucket lands, with no
    driver barrier. Returns a ref resolving to the counts dict."""
    import ray

    @ray.remote
    def write_side(*partials) -> dict:
        import os as _os

        import pyarrow.parquet as _pq

        counts = _merge_count_partials(partials)
        path = _os.path.join(out_dir, _COUNTS_SIDE_FILE)
        _pq.write_table(_counts_side_table(counts), path + ".tmp")
        _os.replace(path + ".tmp", path)
        return counts

    return write_side.remote(*count_refs)


def finalize_sort_write_edges(edge_partials_ds, out_dir: str,
                              known_ids_hex: set,
                              num_buckets: int = 64,
                              coalesce_blocks: int | None = None
                              ) -> tuple[int, dict]:
    """Blocking form of ``launch_finalize_edges`` (the checkpointed
    path's stage boundary): runs the fused exchange, merges the count
    partials on the driver, writes the counts side file and the
    empty-part fallback. Returns (n_edges, {node_id hex: count})."""
    import os

    import pyarrow.parquet as pq
    import ray

    refs = launch_finalize_edges(edge_partials_ds, out_dir, known_ids_hex,
                                 num_buckets=num_buckets,
                                 coalesce_blocks=coalesce_blocks)
    counts = _merge_count_partials(ray.get(refs) if refs else [])

    n = _count_part_rows(out_dir)
    if n == 0 and not any(f.endswith(".parquet") and not f.startswith("_")
                          for f in os.listdir(out_dir)):
        write_empty_parts(out_dir, EDGES_SCHEMA)
    pq.write_table(_counts_side_table(counts),
                   os.path.join(out_dir, _COUNTS_SIDE_FILE))
    return n, counts


def load_mention_counts(edges_dir: str) -> dict:
    """Reload the fused counts side-file written by
    finalize_sort_write_edges (checkpoint-resume path)."""
    import os

    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(edges_dir, _COUNTS_SIDE_FILE))
    return dict(zip(t["node_id"].to_pylist(),
                    (int(x) for x in t["n"].to_pylist())))


def sort_and_write(nodes_ds, edges_ds, out_dir: str):
    """Final contract: nodes by node_id, edges by (src, type, dst) —
    sorted in the binary(20) representation (identical order to hex),
    hex-encoded in the last map before the write."""
    nodes = nodes_ds.sort("node_id").map_batches(encode_nodes_hex,
                                                 batch_format="pyarrow")
    edges = edges_ds.sort(["src", "type", "dst", "pred"]) \
        .map_batches(encode_edges_hex, batch_format="pyarrow")
    nodes.write_parquet(f"{out_dir}/nodes")
    edges.write_parquet(f"{out_dir}/edges")
    return f"{out_dir}/nodes", f"{out_dir}/edges"


def empty_edges_table() -> pa.Table:
    return EDGES_SCHEMA.empty_table()


def write_empty_parts(out_dir: str, schema: pa.Schema) -> None:
    """Write a schema-correct zero-row parquet part (Ray writes no files
    for empty datasets, which breaks downstream readers)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(schema.empty_table(),
                   os.path.join(out_dir, "part-00000.parquet"))
