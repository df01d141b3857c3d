"""Corpus → training shards: the end-to-end LLM-data export pipeline.

Composes the engine's corpus-prep operators into the standard
clean-room path a training run consumes:

  1. quality gate   — integer-exact Gopher/C4-style thresholds
                      (ops/analytics.quality_gate_stats), pure map-side;
  2. exact dedup    — sha1 content hash, min-id survivor per text
                      (stages/dedup.exact_dedup: only (hash, id) rows
                      shuffle), realized on the text via one bucketed
                      SEMI join;
  3. tokenizer      — distributed BPE training over the deduped corpus
                      (stages/bpe.train_bpe), then corpus encoding to
                      per-doc REAL token counts (encode_corpus);
  4. packing        — token-budget first-fit-decreasing sequences over
                      the BPE counts (ops/analytics.pack_sequences
                      with ``counts_col``);
  5. export         — seeded global shuffle of PACKS (all members of a
                      pack shuffle as a unit and stay adjacent) into
                      fixed-name resumable shards
                      (ops/export.shuffle_export, id_col=pack_id).

Scale notes: stages 1 and 3-encode are map-side; the document text
crosses an exchange exactly three times (dedup semi join, pack→text
join, export shuffle — the last is the unavoidable global shuffle);
everything else moves slim (id, count/hash) rows. The deduped corpus
is pinned in the object store by the semi join and re-scanned (never
recomputed) by the trainer, the encoder, and the final join. Output
shards are per-shard resumable (shuffle_export contract).

Reference anchor: the reference ends at a graph sink
(GenesToNeo4j.scala); the training-export surface is this engine's
§2.9 extension — this module is the composition the individual
operators exist for.
"""

from __future__ import annotations


def run_corpus_export(docs_ds, out_dir: str, *, n_merges: int = 40,
                      budget_tokens: int = 2048, seed: int = 0,
                      num_shards: int = 16, id_col: str = "doc_id",
                      text_col: str = "text", pack_buckets: int = 32,
                      join_buckets: int = 32,
                      merges_path: str | None = None) -> dict:
    """Run the five-stage corpus export over ``docs_ds`` (columns
    ``id_col``, ``text_col``); writes ``shard-{i:05d}.parquet`` files
    of (pack_id, doc_id, n_tokens, text) under ``out_dir`` in seeded
    pack-shuffle order and returns a summary dict.

    ``merges_path``: path to a MERGES_SCHEMA parquet. If it exists the
    tokenizer is LOADED from it and training is skipped (the rolling-
    crawl shape: train once on a reference dump, encode every later
    dump under the same vocabulary so token budgets stay comparable);
    otherwise the freshly trained table is saved there."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..ops.analytics import pack_sequences, quality_gate_stats
    from ..ops.export import shuffle_export
    from ..ops.join import hash_join
    from ..stages.bpe import encode_corpus, train_bpe
    from ..stages.dedup import exact_dedup

    def gate(t: pa.Table) -> pa.Table:
        keep, _, _, _ = quality_gate_stats(t[text_col])
        m = pa.array(keep)
        return pa.table({id_col: t[id_col].filter(m),
                         text_col: t[text_col].filter(m)})

    gated = docs_ds.map_batches(gate, batch_format="pyarrow")
    gated_schema = pa.schema([(id_col, pa.int64()),
                              (text_col, pa.string())])

    survivors = exact_dedup(gated, text_col=text_col, id_col=id_col) \
        .select_columns([id_col])
    kept = hash_join(gated, survivors, on=id_col, how="semi",
                     num_buckets=join_buckets,
                     left_schema=gated_schema,
                     right_schema=pa.schema([(id_col, pa.int64())]))

    if merges_path is not None and os.path.exists(merges_path):
        merges = pq.read_table(merges_path)
        trained = False
    else:
        merges = train_bpe(kept, text_col=text_col, n_merges=n_merges)
        trained = True
        if merges_path is not None:
            tmp = merges_path + f".tmp-{os.getpid()}"
            pq.write_table(merges, tmp)
            os.replace(tmp, merges_path)
    counts = encode_corpus(kept, merges, text_col=text_col,
                           id_col=id_col)
    packs = pack_sequences(counts, budget_tokens=budget_tokens,
                           id_col=id_col, num_buckets=pack_buckets,
                           counts_col="n_bpe_tokens")

    packed = hash_join(
        packs, kept, on=id_col, how="inner",
        num_buckets=join_buckets,
        left_schema=pa.schema([("pack_id", pa.int64()),
                               (id_col, pa.int64()),
                               ("n_tokens", pa.int64())]),
        right_schema=gated_schema)

    n_rows = shuffle_export(packed, out_dir, seed=seed,
                            num_shards=num_shards, id_col="pack_id",
                            order_cols=(id_col,))
    return {
        "out_dir": out_dir,
        "num_shards": num_shards,
        "n_exported": n_rows,
        "n_merges": merges.num_rows,
        "tokenizer_trained": trained,
        "seed": seed,
        "budget_tokens": budget_tokens,
    }
