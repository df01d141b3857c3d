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

from ..functions.hashing import alias_node_id, page_node_id

NODES_SCHEMA = pa.schema([
    ("node_id", pa.string()),
    ("label", pa.string()),
    ("key", pa.string()),             # canonical surface / url / alias surface
    ("entity_type", pa.string()),     # nullable
    ("surface_forms", pa.list_(pa.string())),  # nullable, sorted
    ("n_mentions", pa.int64()),       # nullable
])

EDGES_SCHEMA = pa.schema([
    ("src", pa.string()),
    ("dst", pa.string()),
    ("type", pa.string()),
    ("pred", pa.string()),            # '' when the type carries no predicate
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
    counts: dict[tuple[str, str, str, str], int] = {}
    urls = batch.column("url").to_pylist()
    s_nid = batch.column("subj_node_id").to_pylist()
    o_nid = batch.column("obj_node_id").to_pylist()
    preds = batch.column("pred").to_pylist()
    s_surf = batch.column("subj").to_pylist()
    o_surf = batch.column("obj").to_pylist()
    for i in range(len(urls)):
        pid = page_node_id(urls[i])
        k = (s_nid[i], o_nid[i], "asserts", preds[i])
        counts[k] = counts.get(k, 0) + 1
        for nid, surf in ((s_nid[i], s_surf[i]), (o_nid[i], o_surf[i])):
            km = (pid, nid, "mentions", "")
            counts[km] = counts.get(km, 0) + 1
            ka = (alias_node_id(surf), nid, "alias_of", "")
            counts[ka] = counts.get(ka, 0) + 1
    items = sorted(counts.items())
    return pa.table({
        "src": pa.array([k[0] for k, _ in items], pa.string()),
        "dst": pa.array([k[1] for k, _ in items], pa.string()),
        "type": pa.array([k[2] for k, _ in items], pa.string()),
        "pred": pa.array([k[3] for k, _ in items], pa.string()),
        "w": pa.array([v for _, v in items], pa.int64()),
    })


def _order_edges_group(group: pa.Table) -> pa.Table:
    """Within one host: sort pages by (warc_ts, url), link adjacent pairs."""
    g = group.sort_by([("warc_ts", "ascending"), ("url", "ascending")])
    urls = g.column("url").to_pylist()
    if len(urls) < 2:
        return EDGES_SCHEMA.empty_table()
    src = [page_node_id(u) for u in urls[:-1]]
    dst = [page_node_id(u) for u in urls[1:]]
    n = len(src)
    return pa.table({
        "src": pa.array(src, pa.string()),
        "dst": pa.array(dst, pa.string()),
        "type": pa.array(["order"] * n, pa.string()),
        "pred": pa.array([""] * n, pa.string()),
        "weight": pa.array([1] * n, pa.int64()),
    })


def order_edges(pages_ds):
    """page rows (url, warc_ts) → `order` chain edges, one chain per host.

    Shuffle key: host (SURVEY.md §7.4's seqname analogue)."""
    def add_host(t: pa.Table) -> pa.Table:
        hosts = [host_of(u) for u in t.column("url").to_pylist()]
        return t.select(["url", "warc_ts"]).append_column(
            "host", pa.array(hosts, pa.string()))

    with_host = pages_ds.map_batches(add_host, batch_format="pyarrow")
    return with_host.groupby("host").map_groups(
        lambda g: _order_edges_group(g.drop_columns(["host"])),
        batch_format="pyarrow")


def finalize_edges(edge_partials_ds):
    """partial edge rows (w) → exact-deduped weighted edges (D1 analogue)."""
    from ray.data.aggregate import Sum

    return (edge_partials_ds
            .groupby(["src", "dst", "type", "pred"])
            .aggregate(Sum("w", alias_name="weight")))


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
            "node_id": nid, "label": "entity", "key": canon,
            "entity_type": type_of.get(canon),
            "surface_forms": sorted(surfaces),
            "n_mentions": int(mention_counts.get(nid, 0)),
        })
        for s in sorted(surfaces):
            rows.append({
                "node_id": alias_node_id(s), "label": "alias", "key": s,
                "entity_type": None, "surface_forms": None, "n_mentions": None,
            })
    return pa.Table.from_pylist(rows, schema=NODES_SCHEMA)


def page_nodes(pages_ds):
    """page rows → page nodes (vectorized batch transform)."""
    def to_nodes(t: pa.Table) -> pa.Table:
        urls = t.column("url").to_pylist()
        ids = [page_node_id(u) for u in urls]
        n = len(urls)
        return pa.table({
            "node_id": pa.array(ids, pa.string()),
            "label": pa.array(["page"] * n, pa.string()),
            "key": pa.array(urls, pa.string()),
            "entity_type": pa.array([None] * n, pa.string()),
            "surface_forms": pa.array([None] * n, pa.list_(pa.string())),
            "n_mentions": pa.array([None] * n, pa.int64()),
        })

    return pages_ds.map_batches(to_nodes, batch_format="pyarrow")


def nil_entity_nodes(canon_ds, known_node_ids: set):
    """Entity nodes for NIL (out-of-dictionary) canonical entities.

    Streamed two-phase: per-batch distinct → groupby dedup; NIL
    surfaces are unbounded at scale so they never pass through the
    driver mapping."""
    known = sorted(known_node_ids)

    def partial(t: pa.Table) -> pa.Table:
        seen: dict[str, tuple[str, str | None]] = {}
        for side in ("subj", "obj"):
            nids = t.column(f"{side}_node_id").to_pylist()
            canons = t.column(f"{side}_canon").to_pylist()
            types = t.column(f"{side}_type").to_pylist()
            for nid, c, ty in zip(nids, canons, types):
                if nid not in seen:
                    seen[nid] = (c, ty)
        items = sorted(seen.items())
        return pa.table({
            "node_id": pa.array([k for k, _ in items], pa.string()),
            "key": pa.array([v[0] for _, v in items], pa.string()),
            "entity_type": pa.array([v[1] for _, v in items], pa.string()),
        })

    distinct = canon_ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("node_id").map_groups(lambda g: g.slice(0, 1),
                                       batch_format="pyarrow")

    known_set = set(known)

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


def sort_and_write(nodes_ds, edges_ds, out_dir: str):
    """Final contract: nodes by node_id, edges by (src, type, dst)."""
    nodes = nodes_ds.sort("node_id")
    edges = edges_ds.sort(["src", "type", "dst"])
    nodes.write_parquet(f"{out_dir}/nodes")
    edges.write_parquet(f"{out_dir}/edges")
    return f"{out_dir}/nodes", f"{out_dir}/edges"


def empty_edges_table() -> pa.Table:
    return EDGES_SCHEMA.empty_table()
