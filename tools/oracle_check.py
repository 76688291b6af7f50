"""Local mirror of the driver's correctness gate: run every queries() entry
in Spark AND its oracle_sql() in DuckDB at a given sf, compare row count,
column names, and an order-insensitive value hash.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def value_hash(rows: list[tuple], cols: list[str]) -> str:
    """Order-insensitive: sort columns by name, format values canonically,
    sort rows, hash."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def fmt(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return f"{v:.6f}"
        return str(v)

    lines = sorted("|".join(fmt(r[i]) for i in order) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from logshipper_spark.session import get_spark

    spark = get_spark(app_name="oracle_check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd name must not produce a green '0 ok, 0 FAILED' run
        print(f"FAIL  unknown query name(s): {sorted(unknown)}")
        spark.stop()
        return 1
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
        if not problems:
            h1, h2 = value_hash(srows, scols), value_hash(orows, ocols)
            if h1 != h2:
                problems.append(f"value hash {h1} vs {h2}")
                # sample diff in the SAME canonical form the hash uses
                # (sorted column order + canonical float fmt) — raw str()
                # in native column order flagged every row as different
                def canon(rows, cols):
                    order = sorted(range(len(cols)), key=lambda i: cols[i])

                    def fmt(v):
                        if v is None:
                            return "NULL"
                        if isinstance(v, float):
                            return f"{v:.6f}"
                        return str(v)

                    return set("|".join(fmt(r[i]) for i in order) for r in rows)

                s_set = canon(srows, scols)
                o_set = canon(orows, ocols)
                for d in list(s_set - o_set)[:2]:
                    problems.append(f"  spark-only: {d}")
                for d in list(o_set - s_set)[:2]:
                    problems.append(f"  duck-only:  {d}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"OK    {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_rowsonly} rows-only, {n_fail} FAILED")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
