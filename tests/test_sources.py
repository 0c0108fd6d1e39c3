from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from data_lake_with_spark_spark.schemas import SONG_SCHEMA, TESTDATA_SCHEMAS
from data_lake_with_spark_spark.sources.catalog import load_table, register_views
from data_lake_with_spark_spark.sources.readers import read_json_explicit, read_parquet


def test_all_testdata_tables_load(spark, sf_dir):
    for name in TESTDATA_SCHEMAS:
        df = load_table(spark, sf_dir, name)
        assert df.count() > 0, name


def test_events_ts_is_microsecond_ntz(spark, sf_dir):
    df = load_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    row = df.orderBy("event_id").first()
    # first event in the deterministic seed=42 data
    assert row["ts"].year == 2024


def test_json_explicit_schema_drops_extras_and_nulls_missing(spark, tmp_path):
    p = tmp_path / "songs.json"
    p.write_text(
        '{"song_id": "S1", "title": "T", "artist_id": "A1", "year": 0, '
        '"duration": 1.5, "artist_name": "N", "num_songs": 1, "extra_key": 99}\n'
        '{"song_id": "S2", "title": "U"}\n'
    )
    df = read_json_explicit(spark, str(p), SONG_SCHEMA)
    assert df.columns == [f.name for f in SONG_SCHEMA.fields]
    rows = {r["song_id"]: r for r in df.collect()}
    assert rows["S1"]["artist_latitude"] is None
    assert rows["S2"]["artist_id"] is None
    assert "extra_key" not in df.columns


def test_parquet_partition_discovery(spark, sf_dir, tmp_path):
    df = load_table(spark, sf_dir, "orders").withColumn(
        "year", F.year("o_orderdate")
    )
    out = str(tmp_path / "orders_part")
    df.write.mode("overwrite").partitionBy("year").parquet(out)
    back = read_parquet(spark, out)
    assert "year" in back.columns
    assert back.count() == df.count()
    # partition pruning: a single-year read touches one directory
    one = back.where(F.col("year") == 1995)
    assert one.count() == df.where(F.col("year") == 1995).count()


def test_register_views_sql_roundtrip(spark, sf_dir):
    register_views(spark, sf_dir, ("region", "nation"))
    n = spark.sql(
        "SELECT count(*) AS n FROM nation JOIN region ON n_regionkey = r_regionkey"
    ).first()["n"]
    assert n == 25
