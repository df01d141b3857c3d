"""GFF → property-graph compatibility pipeline.

The reference's OWN use case (a GFF genome-annotation file → typed
gene/splicing/cds/intron nodes + ordered edges) re-expressed on this
engine's primitives, so a user of corwur/gfftoneo4j can run their
existing pipelines here. Built from the public GFF3 format description
and the reference's *semantics* as documented in SURVEY.md — not a
code translation.

Semantics reproduced (reference file:line cites):
  * 9-column tab/whitespace line parse with `.`-as-null score/strand/
    frame and a kv-or-opaque attributes column
    (gffparser/GffParser.scala:102-143); headers (#) dropped
    (Application.scala:49); malformed lines quarantined with the field
    error instead of the reference's fail-fast throw.
  * two reader strategies (GeneReader.scala:229-252):
      - "gcf":   exons are `exon` rows; parent chains followed
                 transitively via the Parent attribute until a
                 mRNA/tRNA/rRNA row (→ splicing) or gene row (→ gene)
                 (GeneReader.scala:149-178);
      - "fpoae": exons are `CDS` rows; splicing via `transcript_id`,
                 gene via the children's `gene_id` with an
                 exactly-one-distinct constraint
                 (GeneReader.scala:181-227).
  * groupBy(seqname) co-partitioning (Application.scala:35): parents
    are resolved within a sequence's rows — here a bucketed groupby
    shuffle, with the per-sequence assembly in `map_groups` (one
    sequence's annotation rows always fit a worker: the reference's
    own in-memory assumption, made explicit).
  * output: the engine's node/edge Parquet contract. Nodes carry
    labels gene|splicing|cds|intron with content-hash ids
    (never Neo4j insertion counters — Neo4JUtils.scala:35-39);
    edges: transcribes (gene→splicing), mRNA (splicing→cds chain head),
    links (adjacent cds/intron chain), codes (gene→cds), in
    (intron→splicing), order (adjacent genes by start within a
    sequence — GenesToNeo4j.scala:20-25). Exact dedup + sorted output
    via stages.graph.finalize_edges.
  * introns are derived as the gaps between consecutive exons of a
    splicing (the reference's model.scala:12,18-20 Intron elements).
"""

from __future__ import annotations

import re

import pyarrow as pa

from ..functions.hashing import content_id
from ..stages.graph import EDGES_SCHEMA, finalize_edges

_WS = re.compile(r"[ \t]+")
_ATTR_KV = re.compile(r'\s*([^";\s=]+)\s*(?:=)?\s*("(?:[^"]*)"|[^";]+)?\s*')

RECORD_SCHEMA = pa.schema([
    ("seqname", pa.string()),
    ("source", pa.string()),
    ("feature", pa.string()),
    ("start", pa.int64()),
    ("stop", pa.int64()),
    ("score", pa.float64()),       # nullable ('.')
    ("strand", pa.string()),       # '+'|'-'|null
    ("frame", pa.int64()),         # 0|1|2|null
    ("attr_raw", pa.string()),     # opaque attributes (the Left case)
    ("attr_json", pa.string()),    # kv attributes as JSON (the Right case)
    ("_malformed", pa.string()),   # parse error, null when clean
])

GENE_NODES_SCHEMA = pa.schema([
    ("node_id", pa.string()),
    ("label", pa.string()),        # gene|splicing|cds|intron
    ("seqname", pa.string()),
    ("key", pa.string()),          # gene/splicing id or cds/intron span key
    ("start", pa.int64()),
    ("stop", pa.int64()),
])


def parse_attributes(s: str):
    """kv map (last-wins, quotes stripped, '=' optional) or opaque string.

    Mirrors GffParser.scala:75-100: try `rep1sep(kv, ';')`, fall back
    to the whole remainder as one opaque string."""
    s = s.strip()
    if not s:
        return None, {}
    # split on ';' outside quotes (quoted values may contain ';' —
    # GffParserSpec.scala:29-41 dialect)
    parts, cur, inq = [], [], False
    for ch in s:
        if ch == '"':
            inq = not inq
            cur.append(ch)
        elif ch == ";" and not inq:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    parts = [p for p in parts if p.strip()]
    kv: dict[str, str] = {}
    for part in parts:
        m = _ATTR_KV.fullmatch(part)
        if not m or m.group(2) is None:
            if len(parts) == 1 and "=" not in s:
                return s, {}          # opaque single token (Left case)
            if m and m.group(2) is None:
                kv[m.group(1)] = ""
                continue
            return s, {}
        v = m.group(2).strip()
        if v.startswith('"') and v.endswith('"'):
            v = v[1:-1]
        kv[m.group(1)] = v
    return None, kv


def parse_gff_line(line: str):
    """One GFF line → record dict or (None, error). Headers → None, None."""
    if not line or line.startswith("#"):
        return None, None
    cols = line.split("\t")
    if len(cols) < 9:
        cols = _WS.split(line, maxsplit=8)
    if len(cols) < 8:
        return None, f"expected ≥8 columns, got {len(cols)}"
    try:
        score = None if cols[5] == "." else float(cols[5])
    except ValueError:
        return None, f"bad score {cols[5]!r}"
    strand = None if cols[6] == "." else cols[6]
    if strand not in (None, "+", "-"):
        return None, f"bad strand {cols[6]!r}"
    if cols[7] == ".":
        frame = None
    elif cols[7] in ("0", "1", "2"):
        frame = int(cols[7])
    else:
        return None, f"bad frame {cols[7]!r}"
    try:
        start, stop = int(cols[3]), int(cols[4])
    except ValueError:
        return None, f"bad coordinates {cols[3]!r}..{cols[4]!r}"
    attr_raw, kv = (None, {})
    if len(cols) > 8:
        attr_raw, kv = parse_attributes(cols[8])
    import json

    return {
        "seqname": cols[0], "source": cols[1], "feature": cols[2],
        "start": start, "stop": stop, "score": score, "strand": strand,
        "frame": frame, "attr_raw": attr_raw,
        "attr_json": json.dumps(kv, sort_keys=True) if kv else None,
        "_malformed": None,
    }, None


def parse_lines_batch(t: pa.Table) -> pa.Table:
    rows = []
    for line in t.column("text").to_pylist():
        rec, err = parse_gff_line(line)
        if rec is not None:
            rows.append(rec)
        elif err is not None:
            rows.append({
                "seqname": None, "source": None, "feature": None,
                "start": None, "stop": None, "score": None, "strand": None,
                "frame": None, "attr_raw": None, "attr_json": None,
                "_malformed": f"{err}: {line[:60]!r}",
            })
    return pa.Table.from_pylist(rows, schema=RECORD_SCHEMA)


# ---------------------------------------------------------------------------
# reader strategies (X1/X2 analogue)
# ---------------------------------------------------------------------------

class GffReader:
    """Strategy interface: 4 members = one new format (GeneReader trait)."""

    exon_features: tuple = ("exon",)
    splicing_features = ("mRNA", "tRNA", "rRNA")

    def get_id(self, rec: dict, attrs: dict):
        # singleAttribute orElse attributeWithKey("ID")
        if rec["attr_raw"]:
            return rec["attr_raw"]
        return attrs.get("ID")

    def resolve(self, exons, by_id):  # pragma: no cover - abstract
        raise NotImplementedError


class GcfReader(GffReader):
    """Transitive Parent-chase resolution (GeneReader.scala:149-178)."""

    exon_features = ("exon",)

    def _chase(self, rec, attrs, by_id, want_features, max_depth=64):
        cur, cattrs = rec, attrs
        for _ in range(max_depth):
            parent_id = cattrs.get("Parent")
            if not parent_id:
                return None
            hit = by_id.get(parent_id)
            if hit is None:
                return None
            cur, cattrs = hit
            if cur["feature"] in want_features:
                return parent_id, cur
        return None

    def resolve(self, exons, by_id):
        out = []
        for rec, attrs in exons:
            sp = self._chase(rec, attrs, by_id, self.splicing_features)
            if sp is None:
                out.append((rec, None, None))
                continue
            sp_id, sp_rec = sp
            g = self._chase(sp_rec, _attrs_of(sp_rec), by_id, ("gene",))
            out.append((rec, (sp_id, sp_rec), g))
        return out


class FPoaeReader(GffReader):
    """Flat transcript_id/gene_id resolution (GeneReader.scala:181-227)."""

    exon_features = ("CDS",)

    def resolve(self, exons, by_id):
        out = []
        # group exons by transcript_id first (splicing), then derive the
        # gene id from the children's gene_id with the exactly-one-
        # distinct constraint
        by_tx: dict[str, list] = {}
        for rec, attrs in exons:
            tx = attrs.get("transcript_id")
            if tx:
                by_tx.setdefault(tx, []).append((rec, attrs))
            else:
                out.append((rec, None, None))
        # gene span = min/max over ALL its transcripts' members, so the
        # gene node is identical from every splicing (identity on the
        # gene id alone — the G5 equality rule, GeneReader.scala:19-30)
        gene_spans: dict[str, tuple[int, int]] = {}
        for members in by_tx.values():
            ids = {a.get("gene_id") for _, a in members if a.get("gene_id")}
            if len(ids) != 1:
                continue
            gid = next(iter(ids))
            lo = min(r["start"] for r, _ in members)
            hi = max(r["stop"] for r, _ in members)
            old = gene_spans.get(gid)
            gene_spans[gid] = ((min(old[0], lo), max(old[1], hi))
                               if old else (lo, hi))
        for tx, members in sorted(by_tx.items()):
            gene_ids = sorted({a.get("gene_id") for _, a in members
                               if a.get("gene_id")})
            span = (min(r["start"] for r, _ in members),
                    max(r["stop"] for r, _ in members))
            sp_rec = {"seqname": members[0][0]["seqname"], "feature": "mRNA",
                      "start": span[0], "stop": span[1]}
            gene = None
            if len(gene_ids) == 1:  # else: dropped group (quarantine)
                gid = gene_ids[0]
                g_rec = {"seqname": sp_rec["seqname"], "feature": "gene",
                         "start": gene_spans[gid][0],
                         "stop": gene_spans[gid][1]}
                gene = (gid, g_rec)
            for rec, _ in members:
                out.append((rec, (tx, sp_rec), gene))
        return out


READERS: dict[str, GffReader] = {"gcf": GcfReader(), "fpoae": FPoaeReader()}


def _attrs_of(rec: dict) -> dict:
    import json

    return json.loads(rec["attr_json"]) if rec.get("attr_json") else {}


# ---------------------------------------------------------------------------
# per-sequence assembly (the groupBy(seqname) stage)
# ---------------------------------------------------------------------------

def assemble_sequence(group: pa.Table, reader: GffReader):
    """One seqname's records → (node rows, edge partial rows, drop logs)."""
    recs = group.to_pylist()
    seq = recs[0]["seqname"]
    by_id: dict[str, tuple] = {}
    exons = []
    for r in recs:
        attrs = _attrs_of(r)
        rid = reader.get_id(r, attrs)
        if rid is not None:
            by_id[rid] = (r, attrs)
        if r["feature"] in reader.exon_features:
            exons.append((r, attrs))

    resolved = reader.resolve(exons, by_id)
    nodes: dict[str, dict] = {}
    edges: dict[tuple, int] = {}
    logs = []

    def node(label, key, start, stop):
        nid = content_id("gff", seq, label, str(key), str(start), str(stop))
        nodes.setdefault(nid, {"node_id": nid, "label": label,
                               "seqname": seq, "key": str(key),
                               "start": start, "stop": stop})
        return nid

    def edge(src, dst, etype):
        edges[(src, dst, etype, "")] = edges.get((src, dst, etype, ""), 0) + 1

    # splicing_id -> (splicing span, gene info, [exon records]); nodes
    # are only materialized for fully-resolved groups — the reference
    # DROPS not-found groups with a log (GeneReader.scala:85-104)
    by_splicing: dict[str, dict] = {}
    for rec, sp, gene in resolved:
        if sp is None:
            logs.append(f"Ignoring exon {rec['start']}..{rec['stop']}: "
                        f"no parent splicing")
            continue
        sp_id, sp_rec = sp
        ent = by_splicing.setdefault(sp_id, {
            "span": (sp_rec["start"], sp_rec["stop"]),
            "gene": None, "exons": []})
        ent["exons"].append(rec)
        if gene is not None and ent["gene"] is None:
            ent["gene"] = gene

    for sp_id, ent in sorted(by_splicing.items()):
        if ent["gene"] is None:
            logs.append(f"Ignoring splicing {sp_id}: no parent gene")
            continue
        sp_nid = node("splicing", sp_id, ent["span"][0], ent["span"][1])
        g_id, g_rec = ent["gene"]
        g_nid = node("gene", g_id, g_rec["start"], g_rec["stop"])
        edge(g_nid, sp_nid, "transcribes")
        exs = sorted(ent["exons"], key=lambda r: (r["start"], r["stop"]))
        chain = []
        for i, ex in enumerate(exs):
            c_nid = node("cds", f"{sp_id}:{i}", ex["start"], ex["stop"])
            edge(g_nid, c_nid, "codes")
            chain.append(c_nid)
            if i + 1 < len(exs) and exs[i + 1]["start"] > ex["stop"] + 1:
                in_nid = node("intron", f"{sp_id}:i{i}",
                              ex["stop"] + 1, exs[i + 1]["start"] - 1)
                edge(in_nid, sp_nid, "in")
                chain.append(in_nid)
        if chain:
            edge(sp_nid, chain[0], "mRNA")
        for a, b in zip(chain, chain[1:]):
            edge(a, b, "links")
    # order edges: genes sorted by start within the sequence (O1/O2)
    seen_genes = {nid: n["start"] for nid, n in nodes.items()
                  if n["label"] == "gene"}
    ordered = [nid for nid, _ in sorted(seen_genes.items(),
                                        key=lambda kv: (kv[1], kv[0]))]
    for a, b in zip(ordered, ordered[1:]):
        edge(a, b, "order")

    node_rows = sorted(nodes.values(), key=lambda n: n["node_id"])
    edge_rows = [{"src": k[0], "dst": k[1], "type": k[2], "pred": k[3],
                  "w": v} for k, v in sorted(edges.items())]
    return node_rows, edge_rows, logs


def _assemble_batchfn(reader_name: str):
    reader = READERS[reader_name]

    def fn(group: pa.Table) -> pa.Table:
        node_rows, edge_rows, logs = assemble_sequence(group, reader)
        return pa.table({
            "payload": pa.array(
                [__import__("json").dumps(
                    {"nodes": node_rows, "edges": edge_rows, "logs": logs})],
                pa.string()),
        })

    return fn


def run_gff(gff_path: str, out_dir: str, fmt: str = "gcf") -> dict:
    """GFF file → sorted node/edge Parquet (the importGffFile analogue).

    Layout: read_text → parse map_batches (quarantine) → groupby
    seqname (shuffle) → per-sequence assembly in map_groups → edge
    dedup (hashagg) → sorted Parquet. Returns paths + counters."""
    import json
    import os

    import pyarrow.compute as pc
    import ray

    if fmt not in READERS:
        raise ValueError(f"unknown format {fmt!r}; known: {sorted(READERS)}")

    lines = ray.data.read_text(gff_path)
    # materialize the parsed records once: clean + quarantine views
    # would otherwise each re-read and re-parse the whole file
    records = lines.map_batches(parse_lines_batch,
                                batch_format="pyarrow").materialize()
    clean = records.map_batches(
        lambda t: t.filter(pc.is_null(t["_malformed"])).drop_columns(
            ["_malformed"]),
        batch_format="pyarrow")
    quarantine = records.map_batches(
        lambda t: t.filter(pc.is_valid(t["_malformed"])).select(
            ["_malformed"]),
        batch_format="pyarrow").take_all()

    assembled = clean.groupby("seqname").map_groups(
        _assemble_batchfn(fmt), batch_format="pyarrow").take_all()

    node_rows, edge_rows, logs = [], [], []
    for row in assembled:
        payload = json.loads(row["payload"])
        node_rows.extend(payload["nodes"])
        edge_rows.extend(payload["edges"])
        logs.extend(payload["logs"])

    os.makedirs(out_dir, exist_ok=True)
    nodes_t = pa.Table.from_pylist(node_rows, schema=GENE_NODES_SCHEMA) \
        .sort_by("node_id")
    nodes_dir = os.path.join(out_dir, "nodes")
    edges_dir = os.path.join(out_dir, "edges")
    # clear stale parts: write_parquet appends uniquely-named files, so
    # a rerun into the same out_dir would accumulate old edge rows
    import shutil as _shutil

    _shutil.rmtree(nodes_dir, ignore_errors=True)
    _shutil.rmtree(edges_dir, ignore_errors=True)
    if edge_rows:
        edges_ds = finalize_edges(
            ray.data.from_arrow(pa.Table.from_pylist(edge_rows)))
        edges_ds.sort(["src", "type", "dst", "pred"]).write_parquet(edges_dir)
    else:
        from ..stages.graph import write_empty_parts

        write_empty_parts(edges_dir, EDGES_SCHEMA)
    # nodes are assembled driver-side (bounded per-sequence output);
    # direct write also guarantees a file exists when 0 rows
    import pyarrow.parquet as _pq

    os.makedirs(nodes_dir, exist_ok=True)
    _pq.write_table(nodes_t, os.path.join(nodes_dir, "part-00000.parquet"))
    with open(os.path.join(out_dir, "lineage.json"), "w") as f:
        json.dump({"quarantined": quarantine, "dropped": logs}, f, indent=1)
    return {"nodes_dir": nodes_dir, "edges_dir": edges_dir,
            "n_nodes": nodes_t.num_rows, "n_edges": len(edge_rows),
            "n_quarantined": len(quarantine), "n_dropped": len(logs)}
