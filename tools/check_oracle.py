"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB at the given scale factor, comparing row count, column
names, and an order-insensitive value hash (columns sorted by name,
rows sorted, values canonicalized). Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time
from datetime import date, datetime

import duckdb

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(v: object) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if v != v:
            return "nan"
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, datetime):
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def value_hash(rows: list[tuple], cols: list[str]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from data_lake_with_spark_spark.session import get_spark

    spark = get_spark(app_name="oracle-check")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            spark_cols = df.columns
            spark_rows = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(
                f"ROWS  {name}: {len(spark_rows)} rows (no oracle) "
                f"[spark {t_spark:.1f}s]"
            )
            continue
        t0 = time.time()
        try:
            res = con.execute(oracles[name])
            oracle_cols = [d[0] for d in res.description]
            oracle_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        t_duck = time.time() - t0
        problems = []
        if sorted(spark_cols) != sorted(oracle_cols):
            problems.append(f"cols {sorted(spark_cols)} != {sorted(oracle_cols)}")
        if len(spark_rows) != len(oracle_rows):
            problems.append(f"rows {len(spark_rows)} != {len(oracle_rows)}")
        if not problems:
            hs = value_hash(spark_rows, list(spark_cols))
            ho = value_hash(oracle_rows, list(oracle_cols))
            if hs != ho:
                problems.append("value-hash mismatch")
                sset = {
                    "\x1f".join(
                        canon(r[i])
                        for i in sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
                    )
                    for r in spark_rows
                }
                oset = {
                    "\x1f".join(
                        canon(r[i])
                        for i in sorted(range(len(oracle_cols)), key=lambda i: oracle_cols[i])
                    )
                    for r in oracle_rows
                }
                for x in list(sset - oset)[:3]:
                    print(f"        spark-only: {x[:200]}")
                for x in list(oset - sset)[:3]:
                    print(f"        duck-only:  {x[:200]}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            failures.append(name)
        else:
            print(
                f"OK    {name}: {len(spark_rows)} rows "
                f"[spark {t_spark:.1f}s duck {t_duck:.1f}s]"
            )
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        return 1
    print("all green")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
