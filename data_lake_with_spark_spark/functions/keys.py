"""Surrogate keys (SURVEY.md §2 G7).

The reference mints songplay ids with ``monotonically_increasing_id()``
(``/root/reference/etl.py:271``), which is non-deterministic across
runs/partitionings — fine for a write-once ETL, fatal for a value-hash
correctness oracle. Two modes:

- :func:`surrogate_id` — parity mode, the reference's exact operator.
- :func:`deterministic_id` — md5-of-natural-key mode; stable across
  runs, partitionings and engines (DuckDB computes the identical md5),
  and shuffle-free (a pure projection, unlike ``row_number()`` over a
  global ordering which needs a single-partition sort at scale).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def surrogate_id() -> Column:
    """Parity-mode 64-bit id: (partition_id << 33) | row_in_partition."""
    return F.monotonically_increasing_id()


def deterministic_id(*natural_key: Column | str, sep: str = "\x1f") -> Column:
    """Deterministic surrogate: md5 over the concatenated natural key.

    Oracle-SQL equivalent: ``md5(concat_ws(chr(31), cols...))``.
    For a numeric key at scale, ``xxhash64`` is cheaper but has no
    portable DuckDB twin, so md5 is the checkable default.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in natural_key]
    return F.md5(F.concat_ws(sep, *[c.cast("string") for c in cols]))
