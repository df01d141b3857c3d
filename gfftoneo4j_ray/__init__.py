"""gfftoneo4j_ray — a Ray-Data-native knowledge-graph construction engine.

A from-scratch rebuild of the *capabilities* of corwur/gfftoneo4j (a
single-threaded Scala GFF→Neo4j ETL, see /root/reference) for web-scale
input: a ``ray.data.Dataset`` pipeline over Parquet tables of
Common-Crawl-style pages ``(url, warc_ts, html, text, lang)`` that

  1. extracts byte-identical per-url text (``stages.extract_text``),
  2. runs batched rule-based OpenIE-style triple extraction on an actor
     pool (``stages.triples``),
  3. links mentions against an alias dictionary with a deterministic
     embedding rerank (``stages.linker``),
  4. canonicalizes entities with a two-phase (salted) groupby shuffle +
     union-find merge (``stages.canonicalize``) — the analogue of the
     reference's ID/Parent-attribute resolution
     (reference: src/main/scala/corwur/genereader/GeneReader.scala:75-135),
  5. materializes sorted, exact-deduped node/edge Parquet tables with
     per-partition lineage manifests and checkpoint/resume
     (``stages.graph``, ``state.checkpoint``) — the Neo4j-load analogue
     (reference: src/main/scala/corwur/neo4j/GenesToNeo4j.scala:8-83).

Every stage is a ``Dataset -> Dataset`` function over zero-copy Arrow
batches; stateful stages are actor pools; wide steps are explicit
groupby/sort shuffles with documented keys (SURVEY.md §7.4).
"""

__version__ = "0.1.0"
