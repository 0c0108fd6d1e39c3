"""Simulate the DRIVER's correctness gate end-to-end.

Differences from tools/check_oracle.py (the value-hash replica):

- a VANILLA SparkSession (no get_spark confs) created before the
  entry module is imported, from a NEUTRAL cwd — this is what caught
  the mapInPandas ModuleNotFoundError (workers couldn't import the
  package when the harness lives outside the repo) and the q97
  canonicalizer crash;
- pandas ``sort_values`` canonicalization over raw columns — the
  driver's crash mode on list/struct cells;
- the driver's split: value-hash vs DuckDB for the FIRST 50 entries,
  execute + canonicalize (rows-only) for the tail.

Usage: python tools/driver_sim.py [sf_dir]   (run from anywhere)
Exit 0 = a real driver run should be fully green.
"""

from __future__ import annotations

import hashlib
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon_hash(pdf) -> tuple[int, str]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols].sort_values(cols).reset_index(drop=True)
    h = hashlib.sha256()
    for row in pdf.itertuples(index=False):
        vals = []
        for v in row:
            if v is None or (isinstance(v, float) and v != v):
                vals.append("~")
            elif isinstance(v, float):
                vals.append(repr(v))
            elif hasattr(v, "isoformat"):
                vals.append(v.isoformat())
            elif isinstance(v, bool):
                vals.append(str(int(v)))
            else:
                vals.append(str(v))
        h.update("\x1f".join(vals).encode())
        h.update(b"\n")
    return len(pdf), h.hexdigest()


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    n = E.entry(spark).count()
    print(f"entry: {n} rows", flush=True)
    assert n > 0

    qs = E.queries()
    osql = E.oracle_sql()
    names = list(qs)
    bad: list[str] = []
    for i, name in enumerate(names):
        try:
            pdf = qs[name](spark, sf).toPandas()
            n_s, h_s = canon_hash(pdf)
            if i < 50 and name in osql:
                odf = con.execute(osql[name]).df()
                n_o, h_o = canon_hash(odf)
                ok = (
                    n_s == n_o
                    and h_s == h_o
                    and sorted(pdf.columns) == sorted(odf.columns)
                )
                print(
                    ("OK   " if ok else "FAIL ") + f"{name}: {n_s} vs {n_o}",
                    flush=True,
                )
                if not ok:
                    bad.append(name)
            else:
                print(f"ROWS {name}: {n_s}", flush=True)
        except Exception as ex:  # noqa: BLE001
            print(
                f"ERR  {name}: {type(ex).__name__}: {str(ex)[:160]}",
                flush=True,
            )
            bad.append(name)
    print("bad:", bad)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
