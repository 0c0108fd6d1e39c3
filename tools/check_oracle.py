"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB at the given scale factor, comparing row count, column
names, and an order-insensitive value hash (columns sorted by name,
rows sorted, values canonicalized). Usage:

    python tools/check_oracle.py [--json out.json] [sf_dir] [query ...]

``--json`` writes a CORRECTNESS_r{N}.json-shaped record per query —
committed as ``CORRECTNESS_local_r{N}.json`` each round so the
out-of-driver-window verifications are part of the round record
rather than something the judge must re-derive.
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
    import json

    argv = list(sys.argv[1:])
    json_out = None
    ansi = False
    if "--ansi" in argv:
        # the r10 verdict's #3: sweep the registry with ANSI mode ON —
        # non-ANSI Spark silently NULLs on overflow/invalid-cast (the
        # HITS DECIMAL(38,0) class), so a one-off ANSI pass either
        # proves no operator leans on silent-NULL arithmetic or names
        # the ones that do
        ansi = True
        argv.remove("--ansi")
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            print(
                "usage: check_oracle.py [--json out.json] [sf_dir] [query ...]",
                file=sys.stderr,
            )
            return 2
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    record: dict[str, dict] = {}

    import __spark_entry__ as entrymod
    from data_lake_with_spark_spark.session import get_spark

    spark = get_spark(app_name="oracle-check")
    spark.sparkContext.setLogLevel("ERROR")
    if ansi:
        spark.conf.set("spark.sql.ansi.enabled", "true")
        print("ANSI mode: spark.sql.ansi.enabled=true")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a misspelled name used to skip SILENTLY and report "all
        # green" over the remaining names — a verification hole (a
        # q70 typo shipped an unverified change once)
        print(f"unknown query names: {sorted(unknown)}", file=sys.stderr)
        return 2
    failures = []
    from data_lake_with_spark_spark.session import clear_persistent_rdds

    for name, fn in qs.items():
        if only and name not in only:
            continue
        clear_persistent_rdds(spark)  # checkpoint hygiene between queries
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            spark_cols = df.columns
            spark_rows = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            record[name] = {
                "rows_match": False,
                "schema_match": False,
                "hash_match": False,
                "spark_rows": None,
                "oracle_rows": None,
                "err": f"spark error: {e}"[:500],
            }
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(
                f"ROWS  {name}: {len(spark_rows)} rows (no oracle) "
                f"[spark {t_spark:.1f}s]"
            )
            record[name] = {
                "rows_match": None,
                "schema_match": None,
                "hash_match": None,
                "spark_rows": len(spark_rows),
                "oracle_rows": None,
                "err": None,
            }
            continue
        t0 = time.time()
        try:
            res = con.execute(oracles[name])
            oracle_cols = [d[0] for d in res.description]
            oracle_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            record[name] = {
                "rows_match": False,
                "schema_match": False,
                "hash_match": False,
                "spark_rows": len(spark_rows),
                "oracle_rows": None,
                "err": f"duckdb error: {e}"[:500],
            }
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
        record[name] = {
            "rows_match": len(spark_rows) == len(oracle_rows),
            "schema_match": sorted(spark_cols) == sorted(oracle_cols),
            "hash_match": not problems,
            "spark_rows": len(spark_rows),
            "oracle_rows": len(oracle_rows),
            "err": "; ".join(problems) if problems else None,
        }
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            failures.append(name)
        else:
            print(
                f"OK    {name}: {len(spark_rows)} rows "
                f"[spark {t_spark:.1f}s duck {t_duck:.1f}s]"
            )
    if json_out:
        with open(json_out, "w") as f:
            json.dump(record, f, indent=2)
        print(f"wrote {json_out} ({len(record)} entries)")
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        return 1
    print("all green")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
