"""Local replica of the driver's correctness gate: run every
``queries()`` entry against its ``oracle_sql()`` in DuckDB at a given
sf dir and compare row count + order-insensitive values (columns sorted
by name, floats canonicalized).

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")


def canon(v):
    if isinstance(v, bool):
        return "b:" + str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        # Full-precision repr = bit equality.  The driver hashes exact
        # bytes; a 9-sig-digit canon here let a last-bit double-sum
        # divergence through in round 1 (sessionize_events).
        return f"f:{v!r}"
    if isinstance(v, int):
        return f"i:{v}"
    if v is None:
        return "null"
    return "s:" + str(v)


def row_key(row):
    return tuple(canon(v) for v in row)


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from rdfa_streaming_parser_js_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("check-oracles", parallelism=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    # extra_queries = operators retired from the driver's 50-entry gate
    # window; they keep their oracles and are checked here identically.
    qs = {**entrymod.queries(),
          **getattr(entrymod, "extra_queries", dict)()}
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = sorted(df.columns)
            got = [row_key([r[c] for c in cols]) for r in df.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            status = "rows-only"
            ok = len(got) > 0
            print(f"{'ok  ' if ok else 'FAIL'} {name:32s} "
                  f"{len(got):>7} rows  [{status}] {time.time()-t0:.1f}s")
            if not ok:
                failures.append(name)
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = rel.columns
            order = [ocols.index(c) for c in sorted(ocols)]
            exp = [row_key([row[i] for i in order]) for row in rel.fetchall()]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures.append(name)
            continue
        ok = sorted(got) == sorted(exp)
        if sorted(df.columns) != sorted(ocols):
            ok = False
            print(f"     {name}: column mismatch "
                  f"spark={sorted(df.columns)} oracle={sorted(ocols)}")
        print(f"{'ok  ' if ok else 'FAIL'} {name:32s} "
              f"{len(got):>7} rows vs {len(exp):>7}  {time.time()-t0:.1f}s")
        if not ok:
            failures.append(name)
            gs, es = set(got), set(exp)
            for r in list(gs - es)[:3]:
                print("   spark-only:", r)
            for r in list(es - gs)[:3]:
                print("   oracle-only:", r)
    print("----")
    print("FAILURES:", failures if failures else "none")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
