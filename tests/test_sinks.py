from java_mapreduce_framework_spark.sources.sinks import write_kv_text_dir, write_table
from java_mapreduce_framework_spark.sources.tables import read_kv_text_dir


def test_kv_text_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("apple", "1"), ("banana", "2"), ("tabby", "a\tb")], ["key", "value"]
    )
    out = str(tmp_path / "kv")
    write_kv_text_dir(df, out)
    back = {r["key"]: r["value"] for r in read_kv_text_dir(spark, out).collect()}
    # raw text, no quoting: a value containing a tab splits at the FIRST
    # tab on re-read, exactly like the reference's split("\t") contract
    assert back == {"apple": "1", "banana": "2", "tabby": "a\tb"}


def test_kv_text_overwrite_semantics(spark, tmp_path):
    out = str(tmp_path / "kv")
    df1 = spark.createDataFrame([("old", "x")], ["key", "value"])
    df2 = spark.createDataFrame([("new", "y")], ["key", "value"])
    write_kv_text_dir(df1, out)
    write_kv_text_dir(df2, out)
    back = {r["key"] for r in read_kv_text_dir(spark, out).collect()}
    assert back == {"new"}  # reference wipes the output dir before each run


def test_write_table_partitioned(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)], ["id", "grp", "v"]
    )
    out = str(tmp_path / "pq")
    write_table(df, out, partition_by=["grp"])
    back = spark.read.parquet(out)
    assert back.count() == 3
    # hive-style layout: partition dirs exist => downstream scans prune
    import os

    assert any(d.startswith("grp=") for d in os.listdir(out))


def test_write_table_rejects_unknown_format(spark, tmp_path):
    import pytest

    df = spark.range(1)
    with pytest.raises(ValueError):
        write_table(df, str(tmp_path / "x"), fmt="avroish")


def test_csv_roundtrip_with_explicit_schema(spark, tmp_path):
    from java_mapreduce_framework_spark.sources.tables import read_csv

    df = spark.createDataFrame([(1, "a", 1.5), (2, "b", 2.5)], ["id", "name", "v"])
    out = str(tmp_path / "csv")
    write_table(df, out, fmt="csv")
    # csv sink writes headerless by default in Spark; read with schema
    back = read_csv(spark, out, schema="id long, name string, v double", header=False)
    assert {tuple(r) for r in back.collect()} == {(1, "a", 1.5), (2, "b", 2.5)}


def test_orc_roundtrip(spark, tmp_path):
    from java_mapreduce_framework_spark.sources.tables import read_orc

    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "s"])
    out = str(tmp_path / "orc")
    write_table(df, out, fmt="orc")
    back = read_orc(spark, out)
    assert {tuple(r) for r in back.collect()} == {(1, "a"), (2, "b")}


def test_json_roundtrip(spark, tmp_path):
    from java_mapreduce_framework_spark.sources.tables import read_json

    df = spark.createDataFrame([(1, "x"), (2, "y")], ["id", "s"])
    out = str(tmp_path / "json")
    write_table(df, out, fmt="json")
    back = read_json(spark, out, schema="id long, s string")
    assert {tuple(r) for r in back.collect()} == {(1, "x"), (2, "y")}


def test_partitioned_write_prunes_on_readback(spark, sf_small, tmp_path):
    """The point of partitionBy at scale: a filter on the partition
    column must become a PartitionFilter (directory pruning), never a
    data filter over all files."""
    from java_mapreduce_framework_spark.sources.tables import load_table

    path = str(tmp_path / "docs_by_lang")
    write_table(load_table(spark, sf_small, "documents"), path, partition_by=["lang"])
    back = spark.read.parquet(path).filter("lang = 'en'")
    plan = back._sc._jvm.PythonSQLUtils.explainString(
        back._jdf.queryExecution(), "formatted"
    )
    part_line = [ln for ln in plan.splitlines() if "PartitionFilters" in ln][0]
    assert "lang" in part_line
    n_en = load_table(spark, sf_small, "documents").filter("lang = 'en'").count()
    assert back.count() == n_en


def test_compaction_reduces_file_count_preserving_rows(spark, sf_small):
    import pathlib

    from java_mapreduce_framework_spark.sources.roundtrip import (
        _REPO_ROOT,
        compacted_events,
    )
    from java_mapreduce_framework_spark.sources.tables import load_table

    out = compacted_events(spark, sf_small)
    sf_name = pathlib.Path(sf_small).name
    stage = _REPO_ROOT / ".tmp" / "roundtrip" / f"{sf_name}_events_fragmented"
    n_frag = len(list((stage / "data").glob("part-*")))
    n_comp = len(list((stage / "compacted").glob("part-*")))
    assert n_frag >= 64
    assert n_comp < n_frag
    assert out.count() == load_table(spark, sf_small, "events").count()


def test_dynamic_overwrite_touches_only_last_day(spark, sf_small):
    """The rewrite replaces ONLY the last day's partition: untouched
    days keep their original values, the last day's doubled; rerun
    is idempotent."""
    from pyspark.sql import functions as F

    from java_mapreduce_framework_spark.sources.roundtrip import (
        dynamic_overwrite_events,
    )
    from java_mapreduce_framework_spark.sources.tables import load_table

    def per_day(df):
        return {
            r["event_date"]: r["s"]
            for r in df.groupBy("event_date")
            .agg(F.round(F.sum("value"), 2).alias("s"))
            .collect()
        }

    # materialize each round-trip BEFORE the next overwrite: the lazy
    # frame pins the file listing of ITS OWN write generation
    got = per_day(dynamic_overwrite_events(spark, sf_small))
    got2 = per_day(dynamic_overwrite_events(spark, sf_small))  # rerun
    orig = load_table(spark, sf_small, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    max_d = orig.agg(F.max("event_date")).collect()[0][0]
    base = per_day(orig)
    assert got == got2  # rerun changed nothing
    for d, s in base.items():
        if d == max_d:
            assert abs(got[d] - round(2 * s, 2)) < 0.05
        else:
            assert got[d] == s  # untouched partitions survive by content
