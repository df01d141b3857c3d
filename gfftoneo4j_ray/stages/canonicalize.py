"""Stage 4: entity canonicalization — two-phase shuffle + union-find merge.

The central wide operation of the engine, mirroring the reference's
two chained groupBy-parents rollups
(reference: src/main/scala/corwur/genereader/GeneReader.scala:75-135)
and its transitive parent chase (:165-178), re-expressed for scale:

phase 1 (map side, "salted" by physical batch): every batch emits its
    DISTINCT (surface → entity_key) alias pairs — a per-batch combiner,
    so shuffle volume is bounded by (distinct pairs × batches), not by
    mention count. Sound because union-find merge is associative and
    commutative (the reference's own monoid shape,
    GeneReader.scala:44-45).
phase 2 (shuffle): global exact dedup of pairs via groupby on the pair
    key, then per-partition union-find producing compressed
    (member → local_root) edges — `map_groups` over hash partitions.
phase 3 (driver, small): union the per-partition representative edges
    — the cross-partition resolution pass required because a partition
    only sees its own pairs (the reference's per-seqname index
    blindness, GeneReader.scala:232, fixed per SURVEY.md §4.3). The
    edge count here is ≤ distinct pairs (dictionary-bounded at web
    scale: aliases, not mentions), so driver materialization is safe
    by construction; NIL surfaces never produce pairs and stay out of
    this pass entirely.
phase 4 (map side): broadcast the surface→canonical mapping
    (``ray.put``) and tag every linked triple with canonical entity
    ids — deterministic ``sha1('entity', canonical_key)`` per §1.3.

Representative = lexicographic-min resolved entity_key in the
component (falling back to min surface for all-NIL components) —
order-independent, hence identical output across num_cpus / partition
counts (tested in test_determinism.py).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import entity_node_id
from ..state.unionfind import UnionFind

# node-key prefixes inside the union-find: "s:" = surface form, "e:" = entity key
_S, _E = "s:", "e:"


def emit_pairs_batch(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: distinct (surface, entity_key) edges of this
    batch — fully vectorized (arrow filter + group_by distinct).

    Total over empty inputs: a 0-row block may be a zero-column Ray
    sentinel (an all-filtered stream), which must yield the empty
    pairs table, not a KeyError."""
    if batch.num_rows == 0 or "subj" not in batch.column_names:
        return pa.schema([("surface", pa.string()),
                          ("entity_key", pa.string())]).empty_table()
    parts = []
    for side in ("subj", "obj"):
        t = batch.select([side, f"{side}_key", f"{side}_resolved"]) \
            .rename_columns(["surface", "entity_key", "resolved"])
        parts.append(t.filter(t["resolved"]).drop_columns(["resolved"]))
    both = pa.concat_tables(parts)
    return both.group_by(["surface", "entity_key"]).aggregate([])


def _local_unionfind(group: pa.Table) -> pa.Table:
    """Per-partition union-find → compressed (member, root) edges."""
    uf = UnionFind()
    for s, k in zip(group.column("surface").to_pylist(),
                    group.column("entity_key").to_pylist()):
        uf.union(_S + s, _E + k)
    m = uf.mapping()
    members = sorted(m)
    return pa.table({"member": pa.array(members, pa.string()),
                     "root": pa.array([m[x] for x in members], pa.string())})


def build_canonical_mapping(linked_ds, num_partitions: int = 64) -> dict:
    """linked Dataset → {surface: (canonical_key, entity_type?, node_id)}.

    Phases 1-3 above. Returns the driver-side mapping (bounded by the
    alias-pair universe, NOT by corpus size — see module docstring).
    """
    pairs = linked_ds.map_batches(emit_pairs_batch, batch_format="pyarrow")
    return mapping_from_pairs_ds(pairs, num_partitions)


_PAIRS_TASK = None


def launch_pair_partials(block_refs: list):
    """Phase 1 as ONE raw task over a group of pinned linked block refs:
    per-block distinct (surface, entity_key) pairs, re-deduped across
    the group. Launched by the streaming pipeline AS LINK BLOCKS LAND,
    so the mapping's map side fully overlaps the link stream; only the
    alias-bounded pair exchange + driver merge remain after the stream
    drains (``mapping_from_pair_refs``)."""
    global _PAIRS_TASK
    import ray

    if _PAIRS_TASK is None:
        @ray.remote
        def pair_partials(*blocks):
            tabs = [emit_pairs_batch(b) for b in blocks]
            t = pa.concat_tables(tabs, promote_options="default")
            return t.group_by(["surface", "entity_key"]).aggregate([])

        _PAIRS_TASK = pair_partials
    return _PAIRS_TASK.remote(*block_refs)


def mapping_from_pair_refs(pair_refs: list, num_partitions: int = 64) -> dict:
    """Phases 2-3 over the pair-partial refs produced by
    ``launch_pair_partials`` during the stream."""
    import ray

    if not pair_refs:
        return {}
    return mapping_from_pairs_ds(ray.data.from_arrow_refs(pair_refs),
                                 num_partitions)


_COMPRESS_TASK = None


def launch_pair_compress(pair_refs: list):
    """Second-level map-side reduction, launched DURING the link
    stream over groups of already-emitted pair-partial refs: dedup +
    local union-find → compressed (member, root) edges, each table
    bounded by the alias universe. After the stream only
    :func:`mapping_from_compressed`'s driver merge of these tiny edge
    tables remains — the pair exchange's Dataset + bucket machinery
    (O(blocks × buckets) slice objects) never sits on the post-stream
    critical path."""
    global _COMPRESS_TASK
    import ray

    if _COMPRESS_TASK is None:
        @ray.remote
        def pair_compress(*tabs):
            t = pa.concat_tables(tabs, promote_options="default")
            return _local_unionfind(_distinct_pairs(t))

        _COMPRESS_TASK = pair_compress
    return _COMPRESS_TASK.remote(*pair_refs)


def mapping_from_compressed(comp_refs: list) -> dict:
    """Phase 3 over compressed (member, root) edge tables
    (:func:`launch_pair_compress`): driver union-find merge — the
    same mapping as the bucketed exchange path, since union-find
    group membership is merge-order-independent."""
    import ray

    uf = UnionFind()
    for b in ray.get(comp_refs):
        for m, r in zip(b.column("member").to_pylist(),
                        b.column("root").to_pylist()):
            uf.union(m, r)
    return _mapping_from_uf(uf)


def mapping_from_pairs_ds(pairs, num_partitions: int = 64) -> dict:
    """Phases 2-3: bucketed pair exchange + per-bucket union-find +
    driver merge, over an already-emitted (surface, entity_key) pair
    Dataset."""
    import ray

    # phase 2: hash-partition the pair space on surface (bucketed — the
    # exchange key is a small int, ops.hashagg layout) so each
    # surface's edges land in one partition, then per-partition
    # dedup + union-find compress to (member, root) edges. The pair
    # volume is alias-universe-bounded, so the exchange cost is all
    # machinery — run it as the raw-task bucket exchange
    # (ops.exchange; measured rationale in stages.graph.sink_geometry).
    from ..ops.exchange import bucket_exchange
    from ..ops.hashagg import append_bucket

    # the pair volume is alias-universe-bounded (it does NOT grow with
    # corpus size), so a small fixed reduce fan-out is right at every
    # scale — more buckets only multiply the exchange's O(blocks ×
    # buckets) slice objects (128 upstream blocks × 64 buckets = 8k
    # objects for a few thousand pair rows, measured ~2.4 s of the 20k-
    # page headline; 16 buckets quarters it)
    cpus = int(ray.cluster_resources().get("CPU", 32)) or 32
    num_partitions = max(8, min(num_partitions, 2 * cpus, 16))

    def add_bucket(t: pa.Table) -> pa.Table:
        return append_bucket(t, ["surface"], num_partitions, name="_rb")

    def bucket_uf(b: int, g: pa.Table | None) -> pa.Table:
        if g is None or g.num_rows == 0:
            return pa.schema([("member", pa.string()),
                              ("root", pa.string())]).empty_table()
        return _local_unionfind(_distinct_pairs(g))

    local = bucket_exchange(
        pairs.map_batches(add_bucket, batch_format="pyarrow"),
        num_partitions, bucket_uf)
    # phase 3: driver merge over compressed representative edges (small)
    uf = UnionFind()
    for b in local:
        for m, r in zip(b.column("member").to_pylist(),
                        b.column("root").to_pylist()):
            uf.union(m, r)
    return _mapping_from_uf(uf)


def _mapping_from_uf(uf) -> dict:
    """Merged union-find groups → {surface: (canonical_key, node_id)}
    with the deterministic canon pick (lexical-min entity key, else
    lexical-min surface)."""
    mapping: dict[str, tuple[str, str]] = {}
    for root, members in uf.groups().items():
        ekeys = sorted(x[2:] for x in members if x.startswith(_E))
        surfaces = [x[2:] for x in members if x.startswith(_S)]
        canon = ekeys[0] if ekeys else min(surfaces)
        nid = entity_node_id(canon)
        for s in surfaces:
            mapping[s] = (canon, nid)
        for k in ekeys:  # entity keys are themselves valid surfaces
            mapping.setdefault(k, (canon, nid))
    return mapping


def _distinct_pairs(group: pa.Table) -> pa.Table:
    """Exact dedup of (surface, entity_key) rows within a hash partition."""
    return group.group_by(["surface", "entity_key"]).aggregate([]).sort_by(
        [("surface", "ascending"), ("entity_key", "ascending")])


class ApplyCanonical:
    """Actor-pool worker: tag linked triples with canonical ids.

    NIL mentions (never in the mapping) canonicalize to themselves:
    canon = surface, node_id = sha1('entity', surface)."""

    def __init__(self, map_ref=None, mapping: dict | None = None) -> None:
        import ray

        self.mapping = mapping if mapping is not None else ray.get(map_ref)

    def _canon(self, surface: str) -> tuple[str, str]:
        hit = self.mapping.get(surface)
        if hit is not None:
            return hit
        return surface, entity_node_id(surface)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        out = batch
        # vectorized: resolve each DISTINCT surface once, then a C-level
        # pandas map; NIL hashes are computed per distinct surface only
        for side in ("subj", "obj"):
            s = batch.column(side).to_pandas()
            uniq = pd.unique(s)
            res = {u: self._canon(u) for u in uniq}
            canon = s.map({u: r[0] for u, r in res.items()})
            nid = s.map({u: r[1] for u, r in res.items()})
            out = (out.append_column(f"{side}_canon",
                                     pa.array(canon, pa.string()))
                      .append_column(f"{side}_node_id",
                                     pa.array(nid, pa.string())))
        return out


def apply(linked_ds, mapping: dict, concurrency: int | tuple = (1, 4),
          batch_size: int = 4096):
    """linked Dataset + mapping → canonical Dataset (broadcast mapping)."""
    import ray

    map_ref = ray.put(mapping)
    return linked_ds.map_batches(
        ApplyCanonical, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, fn_constructor_kwargs={"map_ref": map_ref})


# ---------------------------------------------------------------------------
# Salted two-phase counting (hot-key skew handling, SURVEY.md §4.2)
# ---------------------------------------------------------------------------

def aggregate_counts(ds, key: str, salt_buckets: int | None = None,
                     count_alias: str = "n"):
    """Count rows per ``key`` with optional salted two-phase aggregation.

    ``salt_buckets=None`` → plain groupby-count (one shuffle of all rows).
    ``salt_buckets=S`` → per-batch partial counts on (key, salt) where
    salt = row_position_in_batch % S (spreads a hot key's rows across S
    partial rows regardless of its hash), then a final groupby(key) over
    the tiny partials — the hot-key (Zipfian entity) path. Counting is
    associative, so salted == unsalted exactly (tested)."""
    if salt_buckets is None:
        out = ds.groupby(key).count()
        return out.rename_columns({"count()": count_alias}) \
            if "count()" in out.schema().names else out

    import numpy as np

    def partial(batch: pa.Table, _k=key, _s=salt_buckets) -> pa.Table:
        keys = batch.column(_k)
        salt = np.arange(len(keys), dtype=np.int64) % _s
        t = pa.table({_k: keys, "_salt": pa.array(salt, pa.int64())})
        g = t.group_by([_k, "_salt"]).aggregate([(_k, "count")])
        return g.rename_columns([_k, "_salt", "_partial"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    from ..ops.hashagg import hash_aggregate

    final = hash_aggregate(partials, key,
                           [("_partial", "sum", count_alias)], num_buckets=32)
    return final
