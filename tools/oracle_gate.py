"""Local simulation of the driver's correctness gate: run every
``__ray_entry__.queries()`` entry AND its ``oracle_sql()`` DuckDB
counterpart side-by-side at sf0.01, compare row count, column names
(sorted) and stringified values, and print one summary line per query.

    python tools/oracle_gate.py [sf_dir]

Exit code 1 if any oracle-checked query mismatches.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def canon(df):
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import duckdb
    import ray

    import gfftoneo4j_ray

    gfftoneo4j_ray.quiet_empty_schema_warnings()
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get(
            "RAY_GRAFT_CPUS", "16")), include_dashboard=False,
            logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, osql = E.queries(), E.oracle_sql()
    n_fail = n_pass = n_noracle = 0
    for name, fn in qs.items():
        try:
            r = fn(sf_dir)
            rdf = r.to_pandas() if hasattr(r, "to_pandas") else r
        except Exception as exc:  # noqa: BLE001
            print(f"{name:24s} ERROR (ray): {exc}")
            n_fail += 1
            continue
        if name not in osql:
            print(f"{name:24s} rows={len(rdf):8d}  (no oracle)")
            n_noracle += 1
            continue
        try:
            odf = con.execute(osql[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"{name:24s} ERROR (sql): {exc}")
            n_fail += 1
            continue
        a, o = canon(rdf), canon(odf)
        cols_ok = list(a.columns) == list(o.columns)
        rows_ok = len(a) == len(o)
        vals_ok = cols_ok and rows_ok and \
            a.astype(str).equals(o.astype(str))
        ok = cols_ok and rows_ok and vals_ok
        n_pass += ok
        n_fail += (not ok)
        print(f"{name:24s} rows={len(a):8d} oracle={len(o):8d}  "
              f"{'OK' if ok else 'MISMATCH'}"
              f"{'' if cols_ok else ' cols:' + str((list(a.columns), list(o.columns)))}")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
