"""CLI entry point — the `ray job submit` driver.

The analogue of the reference's scopt parser
(reference: src/main/scala/corwur/CommandLineParser.scala:8-36):
`-f` file → ``--input``, `-t` format → ``--profile``, `-u` neo4j url →
``--output`` (the sink is Parquet, not a database). Cluster use:

    ray job submit --working-dir . -- \
        python -m gfftoneo4j_ray.pipelines.cli \
        --input s3://bucket/pages --dictionary dict.parquet \
        --output s3://bucket/kg --profile webtext

This module is the ONLY library-adjacent place allowed to call
``ray.init`` (guarded), because it owns the process.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="gfftoneo4j-ray",
        description="Ray-Data-native knowledge-graph construction")
    p.add_argument("--input", "-i", required=True,
                   help="pages Parquet path/dir (url, warc_ts, html, text, lang)")
    p.add_argument("--dictionary", "-d", default=None,
                   help="alias dictionary parquet (default: the "
                        "profile's dictionary_builder)")
    p.add_argument("--output", "-o", required=True, help="output root dir")
    p.add_argument("--profile", "-t", default="webtext",
                   help="pipeline profile name (see pipelines/profiles.py)")
    p.add_argument("--resume", action=argparse.BooleanOptionalAction,
                   default=True, help="resume from completed stages")
    p.add_argument("--streaming", action="store_true",
                   help="no per-stage checkpoints; only final tables written")
    p.add_argument("--incremental-from", default=None, metavar="PREV_ROOT",
                   help="update the checkpointed run at PREV_ROOT to the "
                        "new --input snapshot: model stages re-run only "
                        "for changed pages (pipelines/incremental.py); "
                        "implies checkpointed mode")
    p.add_argument("--num-cpus", type=int, default=None,
                   help="ray.init num_cpus for standalone runs")
    p.add_argument("--concurrency", type=int, default=4,
                   help="max actors per stateful stage")
    ce = p.add_argument_group("corpus export (training shards)")
    ce.add_argument("--corpus-export", action="store_true",
                    help="run the documents→training-shards pipeline "
                         "instead of KG construction: --input is a "
                         "documents parquet (doc_id, text), --output "
                         "receives shard-{i:05d}.parquet files "
                         "(pipelines/corpus_export.py)")
    ce.add_argument("--shards", type=int, default=64,
                    help="number of output shards")
    ce.add_argument("--seed", type=int, default=0,
                    help="shuffle seed for the export order")
    ce.add_argument("--budget-tokens", type=int, default=2048,
                    help="token budget per packed sequence")
    ce.add_argument("--n-merges", type=int, default=40,
                    help="BPE merges to train for token counting")
    ce.add_argument("--merges", default=None, metavar="PARQUET",
                    help="tokenizer merge-table parquet: loaded if it "
                         "exists (skips training — the rolling-crawl "
                         "shape), written after training otherwise")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from .profiles import get_profile

    profile = get_profile(args.profile)  # fail fast on unknown name

    import os

    import ray

    if not ray.is_initialized():
        # honor an existing cluster (ray job submit sets RAY_ADDRESS);
        # only fall back to a private local instance when none is set
        address = os.environ.get("RAY_ADDRESS", "local")
        kwargs = {"address": address, "ignore_reinit_error": True,
                  "logging_level": "ERROR"}
        if address == "local":
            kwargs.update(num_cpus=args.num_cpus, include_dashboard=False)
        ray.init(**kwargs)

    if args.corpus_export:
        from .corpus_export import run_corpus_export

        ds = ray.data.read_parquet(args.input,
                                   columns=["doc_id", "text"])
        res = run_corpus_export(
            ds, args.output, n_merges=args.n_merges,
            budget_tokens=args.budget_tokens, seed=args.seed,
            num_shards=args.shards, merges_path=args.merges)
        res["ray_address"] = ray.get_runtime_context().gcs_address
        print(json.dumps(res))
        ray.shutdown()
        return 0

    from . import kg

    dict_path = args.dictionary
    if dict_path is None:
        if profile.dictionary_builder is None:
            raise SystemExit(
                f"--dictionary required: profile {profile.name!r} has no "
                "dictionary_builder")
        import os as _os

        import pyarrow.parquet as _pq

        _os.makedirs(args.output, exist_ok=True)
        dict_path = _os.path.join(args.output, "profile_dictionary.parquet")
        _pq.write_table(profile.dictionary_builder(), dict_path)

    pool = (1, max(1, args.concurrency))
    cfg = kg.KgConfig(lang=profile.lang, triples_concurrency=pool,
                      link_concurrency=pool, canon_concurrency=pool,
                      extractor_cls=profile.triple_extractor_cls,
                      text_extractor=profile.text_extractor)
    if args.incremental_from:
        from .incremental import run_incremental

        res = run_incremental(args.incremental_from, args.input,
                              dict_path, args.output, cfg=cfg)
    else:
        res = kg.run(args.input, dict_path, args.output, cfg=cfg,
                     resume=args.resume, checkpointed=not args.streaming)
    # which cluster served the job (job logs need this to correlate
    # a submitted run with the cluster that executed it)
    res["ray_address"] = ray.get_runtime_context().gcs_address
    print(json.dumps(res))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
