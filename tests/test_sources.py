"""Sources & sinks: CSV/JSON round-trips, partitioned sink layout and
partition pruning (SURVEY.md §2.A)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from dist_keras_spark.sources.readers import from_rows, read_csv, read_json
from dist_keras_spark.sources.sinks import write_parquet, write_partitioned
from dist_keras_spark.sources.tables import load_table


def test_csv_roundtrip(spark, tmp_path):
    df = from_rows(spark, [(1, "a"), (2, "b")], "id int, s string")
    p = str(tmp_path / "csv")
    df.write.option("header", "true").csv(p)
    back = read_csv(spark, p, schema="id int, s string")
    assert sorted(tuple(r) for r in back.collect()) == [(1, "a"), (2, "b")]


def test_csv_infer_schema(spark, tmp_path):
    df = from_rows(spark, [(1, 1.5)], "id int, x double")
    p = str(tmp_path / "csv2")
    df.write.option("header", "true").csv(p)
    back = read_csv(spark, p)
    assert back.schema["x"].dataType.typeName() == "double"


def test_json_roundtrip(spark, tmp_path):
    df = from_rows(spark, [(1, {"k": 2})], "id int, m map<string,int>")
    p = str(tmp_path / "json")
    df.write.json(p)
    back = read_json(spark, p, schema="id int, m map<string,int>")
    assert back.collect()[0]["m"]["k"] == 2


def test_parquet_sink_roundtrip(spark, sf_dir, tmp_path):
    nat = load_table(spark, sf_dir, "nation")
    p = str(tmp_path / "pq")
    write_parquet(nat, p)
    assert spark.read.parquet(p).count() == nat.count()


def test_partitioned_sink_prunes(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem")
    p = str(tmp_path / "part")
    write_partitioned(li, p, ["l_returnflag"])
    assert os.path.isdir(f"{p}/l_returnflag=A")
    scan = spark.read.parquet(p).filter(F.col("l_returnflag") == "A")
    # partition filter must prune at planning time, not post-scan
    physical = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(l_returnflag" in physical
    total = spark.read.parquet(p).count()
    assert 0 < scan.count() < total
