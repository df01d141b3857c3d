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


def _pin_fsspec_http_stub() -> None:
    """Make concurrent driver-thread Dataset reads race-free.

    Ray's ``_is_http_filesystem()`` (ray/data/datasource/path_util.py)
    runs ``from fsspec.implementations.http import HTTPFileSystem``
    inside every ``read_parquet`` and catches only
    ``ModuleNotFoundError``. Without aiohttp in the image that import
    always fails — harmless single-threaded, but two reads launched
    from driver THREADS (the tagged-union slots overlap their legs
    that way) can race the partial import: the second thread sees the
    half-initialized module in ``sys.modules`` and gets a plain
    ``ImportError`` ("cannot import name 'HTTPFileSystem'"), which
    Ray does NOT catch. Pin a minimal stub module once, at package
    import on the main thread, so the name always resolves; the
    placeholder class is never instantiated, so Ray's
    ``isinstance(..., HTTPFileSystem)`` checks are False — the same
    outcome as the caught-ModuleNotFoundError path."""
    import sys

    try:
        import fsspec.implementations.http  # noqa: F401

        return
    except ImportError:
        pass
    try:
        import types

        import fsspec.implementations as _fi

        mod = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # placeholder only — never instantiated
            pass

        mod.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = mod
        _fi.http = mod
    except ImportError:
        pass  # no fsspec at all: Ray's own guard handles it


_pin_fsspec_http_stub()


def quiet_empty_schema_warnings() -> None:
    """Drop Ray Data's cosmetic empty-block schema-divergence warning.

    Ray's sort-based exchanges emit schema-less empty blocks for empty
    partitions (e.g. a groupby bucket with no rows), and the streaming
    executor then logs ``Operator produced a RefBundle with a different
    schema … new schema: .`` once per such block. Every UDF in this
    package returns schema-correct (typed) tables even when empty, so
    the divergence is always Ray-internal and harmless. Entry surfaces
    (bench.py, __ray_entry__, tests) opt in explicitly — library code
    never mutates logging."""
    import logging

    class _DropEmptySchemaWarn(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:  # noqa: A003
            return ("different schema than the previous"
                    not in record.getMessage())

    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_DropEmptySchemaWarn())


def read_parquet_clean(path: str, *, columns=None, **kwargs):
    """``ray.data.read_parquet`` with an explicit METADATA-FREE schema.

    Parquet files written through pandas carry a ``b'pandas'`` schema-
    metadata dict; blocks read from them keep it, and Ray's internal
    schema deduplication cannot hash a dict — every exchange-bearing
    pipeline then logs ``Failed to hash the schemas (for
    deduplication): unhashable type: 'dict'`` from inside the read
    tasks (where no downstream strip can reach). Passing the footer
    schema with metadata removed (one driver-side footer read) makes
    the blocks metadata-free at the source."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    try:
        f = pq.read_schema(path)
        names = list(columns) if columns is not None else f.names
        kwargs["schema"] = pa.schema(
            [f.field(n).remove_metadata() for n in names])
    except (OSError, KeyError):
        # directory datasets / missing columns: let Ray infer
        pass
    return ray.data.read_parquet(path, columns=columns, **kwargs)
