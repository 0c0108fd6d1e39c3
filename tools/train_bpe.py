"""Train the vendored mini-BPE merges table.

Deterministically trains functions/bpe.py's BPE on the text column of
the smallest documents fixture and writes the merges table to
``data_lake_with_spark_spark/resources/bpe_merges_mini.jsonl`` (the
artifact functions/bpe.load_vendored loads). Re-run after changing the
trainer or the fixture:

    python tools/train_bpe.py [--merges 512] [--fixture /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--merges", type=int, default=512)
    ap.add_argument("--fixture", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    import duckdb

    from data_lake_with_spark_spark.functions.bpe import dump_merges, train_bpe

    texts = [
        r[0]
        for r in duckdb.sql(
            f"SELECT text FROM '{args.fixture}/documents.parquet' ORDER BY doc_id"
        ).fetchall()
    ]
    merges = train_bpe(texts, args.merges)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data_lake_with_spark_spark",
        "resources",
        "bpe_merges_mini.jsonl",
    )
    with open(out, "w", encoding="utf-8") as f:
        f.write(dump_merges(merges) + "\n")
    print(f"wrote {len(merges)} merges to {out}")


if __name__ == "__main__":
    main()
