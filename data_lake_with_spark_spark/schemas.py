"""Explicit schemas.

Two families (FIXTURES.md):

A. The reference's Sparkify schemas, transcribed from its hand-written
   StructTypes (``/root/reference/etl.py:60-71`` for songs,
   ``etl.py:153-172`` for logs). Explicit schemas skip a full
   inference pass over the source (SURVEY.md §4) — at 100 TB this is
   the difference between one scan and two.

B. The driver-generated synthetic testdata schemas
   (``/root/testdata/sf*/{table}.parquet``) so readers can validate
   and so JSON/CSV variants of the same tables can be read without
   inference.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)


def _struct(*fields: tuple[str, object]) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])


# --- A. Sparkify (reference parity; etl.py:60-71) -------------------------

SONG_SCHEMA = _struct(
    ("artist_id", StringType()),
    ("artist_latitude", DoubleType()),
    ("artist_location", StringType()),
    ("artist_longitude", DoubleType()),
    ("artist_name", StringType()),
    ("duration", DoubleType()),
    ("num_songs", LongType()),
    ("song_id", StringType()),
    ("title", StringType()),
    ("year", LongType()),
)

# etl.py:153-172 — note userId is a STRING (empty string, not null, on
# logged-out rows) and ts is epoch milliseconds as long.
LOG_SCHEMA = _struct(
    ("artist", StringType()),
    ("auth", StringType()),
    ("firstName", StringType()),
    ("gender", StringType()),
    ("itemInSession", LongType()),
    ("lastName", StringType()),
    ("length", DoubleType()),
    ("level", StringType()),
    ("location", StringType()),
    ("method", StringType()),
    ("page", StringType()),
    ("registration", DoubleType()),
    ("sessionId", LongType()),
    ("song", StringType()),
    ("status", IntegerType()),
    ("ts", LongType()),
    ("userAgent", StringType()),
    ("userId", StringType()),
)

# --- B. testdata (FIXTURES.md §B) -----------------------------------------

TESTDATA_SCHEMAS: dict[str, StructType] = {
    "region": _struct(("r_regionkey", IntegerType()), ("r_name", StringType())),
    "nation": _struct(
        ("n_nationkey", IntegerType()),
        ("n_name", StringType()),
        ("n_regionkey", IntegerType()),
    ),
    "customer": _struct(
        ("c_custkey", LongType()),
        ("c_name", StringType()),
        ("c_nationkey", IntegerType()),
        ("c_acctbal", DoubleType()),
        ("c_mktsegment", StringType()),
    ),
    "supplier": _struct(
        ("s_suppkey", LongType()),
        ("s_name", StringType()),
        ("s_nationkey", IntegerType()),
        ("s_acctbal", DoubleType()),
    ),
    "part": _struct(
        ("p_partkey", LongType()),
        ("p_name", StringType()),
        ("p_brand", StringType()),
        ("p_type", StringType()),
        ("p_size", IntegerType()),
        ("p_retailprice", DoubleType()),
    ),
    "orders": _struct(
        ("o_orderkey", LongType()),
        ("o_custkey", LongType()),
        ("o_orderstatus", StringType()),
        ("o_totalprice", DoubleType()),
        ("o_orderdate", TimestampNTZType()),
        ("o_orderpriority", StringType()),
    ),
    "lineitem": _struct(
        ("l_orderkey", LongType()),
        ("l_partkey", LongType()),
        ("l_suppkey", LongType()),
        ("l_linenumber", IntegerType()),
        ("l_quantity", DoubleType()),
        ("l_extendedprice", DoubleType()),
        ("l_discount", DoubleType()),
        ("l_tax", DoubleType()),
        ("l_returnflag", StringType()),
        ("l_linestatus", StringType()),
        ("l_shipdate", TimestampNTZType()),
    ),
    "events": _struct(
        ("event_id", LongType()),
        ("ts", TimestampNTZType()),
        ("user_id", LongType()),
        ("event_type", StringType()),
        ("value", DoubleType()),
        ("props", StringType()),
    ),
    "documents": _struct(
        ("doc_id", LongType()),
        ("text", StringType()),
        ("lang", StringType()),
        ("source", StringType()),
        ("n_chars", LongType()),
    ),
    "embeddings": _struct(
        ("vec_id", LongType()),
        ("embedding", ArrayType(FloatType())),
        ("label", IntegerType()),
    ),
}

TESTDATA_TABLES = tuple(TESTDATA_SCHEMAS)
