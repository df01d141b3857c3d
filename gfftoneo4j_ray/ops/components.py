"""Distributed connected components via min-label propagation.

Replaces driver-side union-find for unbounded pair sets (the MinHash
near-dup group assembly — VERDICT r1 items 2/3): the edge list and the
label table stay distributed end-to-end; the driver only sees
per-round change counts and (optionally) the final, dup-bounded group
map.

Algorithm: iterative min-label propagation on the bucketed shuffle
primitives (ops.hashagg layout + ops.join):

  init : L(x) = min(x, min neighbor of x)      — one bucketed exchange
  round: L'(x) = min(L(x), min_{(x,y)∈E} L(y)) — ONE shuffle join of L
         onto the symmetric edge list + ONE combined exchange that
         computes both the new min label and the per-node changed flag
         (old label rides along as a null-padded column; max() over a
         single non-null recovers it), so a round costs exactly two
         all-to-alls over |E| + |V| rows.
  stop : zero changed nodes (labels only decrease → fixpoint).

Rounds needed = max component diameter. Web near-dup clusters are
shallow (boilerplate stars, template families) so a handful of rounds
suffices; ``max_iters`` bounds pathological chains. No driver
materialization of edges or labels at any point.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .hashagg import append_bucket, hash_aggregate
from .join import hash_join

LABELS_SCHEMA = pa.schema([("node", pa.int64()), ("label", pa.int64())])


def connected_components(pairs_ds, a: str = "doc_a", b: str = "doc_b",
                         num_buckets: int = 16, max_iters: int = 25):
    """(a, b) int64 pair Dataset → (node, label) Dataset, label = min
    node id in the node's component. Nodes appearing in no pair are
    absent (callers union singletons if needed)."""

    def sym(t: pa.Table) -> pa.Table:
        x = pa.concat_arrays([t[a].cast(pa.int64()).combine_chunks(),
                              t[b].cast(pa.int64()).combine_chunks()])
        y = pa.concat_arrays([t[b].cast(pa.int64()).combine_chunks(),
                              t[a].cast(pa.int64()).combine_chunks()])
        return pa.table({"x": x, "y": y})

    edges = pairs_ds.map_batches(sym, batch_format="pyarrow").materialize()
    if edges.count() == 0:
        import ray

        return ray.data.from_arrow(LABELS_SCHEMA.empty_table())

    def add_b(t: pa.Table) -> pa.Table:
        return append_bucket(t, ["node"], num_buckets)

    # per node, new = min(candidates ∪ old) and changed = new < old in
    # the SAME exchange (old_label is non-null only on old rows, all
    # carrying the same value per node, so max() recovers it)
    def agg(g: pa.Table) -> pa.Table:
        out = g.group_by(["node"]).aggregate(
            [("label", "min"), ("old_label", "max")])
        out = out.rename_columns(["node", "label", "old_label"])
        changed = pc.cast(pc.less(out["label"], out["old_label"]),
                          pa.int64())
        return pa.table({"node": out["node"], "label": out["label"],
                         "changed": changed})

    def one_exchange(both):
        # the exchange emits one block per INPUT block and the next
        # round unions labels back in — without a block-count bound the
        # per-round block count doubles (exponential rounds, measured);
        # repartition is a cheap split/merge, not a shuffle
        # raw-task bucket exchange: emits exactly num_buckets blocks,
        # so the per-round block count is bounded by construction (no
        # repartition needed)
        from .exchange import bucketed_map_groups

        return bucketed_map_groups(
            both.map_batches(add_b, batch_format="pyarrow"),
            num_buckets, agg).materialize()

    labels = None
    for _ in range(max_iters):
        if labels is None:
            # round 0 folds init in: L(y) = y, so edge rows ARE the
            # candidates and self rows carry old = x — one exchange
            def as_cand0(t: pa.Table) -> pa.Table:
                n = t.num_rows
                return pa.table({"node": t["x"], "label": t["y"],
                                 "old_label": pa.nulls(n, pa.int64())})

            def as_self0(t: pa.Table) -> pa.Table:
                return pa.table({"node": t["x"], "label": t["x"],
                                 "old_label": t["x"]})

            both = edges.map_batches(as_cand0, batch_format="pyarrow") \
                .union(edges.map_batches(as_self0, batch_format="pyarrow"))
        else:
            # exchange 1: for edge (x, y), propose L(y) to x.
            # Explicit schema hints: labels is a lazy select_columns
            # over the exchange-backed round output, whose
            # fetch_if_missing=False schema Ray reports UNPRUNED
            # (includes the dropped `changed` column) — the hint keeps
            # the join honest and skips the probe entirely.
            prop = hash_join(
                edges, labels, on="y", right_on="node", how="inner",
                num_buckets=num_buckets,
                left_schema=pa.schema([("x", pa.int64()),
                                       ("y", pa.int64())]),
                right_schema=pa.schema([("node", pa.int64()),
                                        ("label", pa.int64())]))

            def as_cand(t: pa.Table) -> pa.Table:
                n = t.num_rows
                return pa.table({"node": t["x"], "label": t["label"],
                                 "old_label": pa.nulls(n, pa.int64())})

            def as_old(t: pa.Table) -> pa.Table:
                return pa.table({"node": t["node"], "label": t["label"],
                                 "old_label": t["label"]})

            both = prop.map_batches(as_cand, batch_format="pyarrow") \
                .union(labels.map_batches(as_old, batch_format="pyarrow"))

        new_labels = one_exchange(both)
        n_changed = new_labels.sum("changed")
        labels = new_labels.select_columns(["node", "label"])
        if not n_changed:
            break
    return labels


def dup_group_map(pairs_ds, num_buckets: int = 16) -> dict:
    """Convenience: pair Dataset → driver dict {node: component_min}
    for nodes appearing in ≥ 1 pair. The dict is bounded by the number
    of dup-involved docs (LSH-bounded), NOT corpus size — the only
    driver-side materialization in the dedup flow."""
    labels = connected_components(pairs_ds, num_buckets=num_buckets)
    out: dict[int, int] = {}
    for t in labels.iter_batches(batch_format="pyarrow", batch_size=65536):
        for n, l in zip(t["node"].to_pylist(), t["label"].to_pylist()):
            out[int(n)] = int(l)
    return out
