from pyspark.sql import functions as F

from java_mapreduce_framework_spark.sources.tables import load_table, read_kv_text_dir


def test_read_kv_text_dir(spark, tmp_path):
    (tmp_path / "part1.txt").write_text("apple\t1\nbanana\t2\n")
    (tmp_path / "part2.txt").write_text("cherry\twith\ttabs\n")
    df = read_kv_text_dir(spark, str(tmp_path))
    rows = {r["key"]: r["value"] for r in df.collect()}
    assert rows == {"apple": "1", "banana": "2", "cherry": "with\ttabs"}


def test_load_table_events_timestamp_us(spark, sf_small):
    events = load_table(spark, sf_small, "events")
    assert dict(events.dtypes)["ts"] == "timestamp"
    # microsecond floor of the nanos fixture: values must be non-null
    assert events.filter(F.col("ts").isNull()).count() == 0


def test_load_table_pushdown_projection(spark, sf_small):
    df = load_table(spark, sf_small, "lineitem").select("l_orderkey")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "l_orderkey" in plan


def test_csv_roundtrip_preserves_rows_exactly(spark, sf_small):
    from java_mapreduce_framework_spark.sources.roundtrip import (
        read_documents_csv,
        read_documents_jsonl,
    )
    from java_mapreduce_framework_spark.sources.tables import load_table

    orig = {
        (r["doc_id"], r["text"], r["lang"], r["source"], r["n_chars"])
        for r in load_table(spark, sf_small, "documents").collect()
    }
    via_csv = {
        (r["doc_id"], r["text"], r["lang"], r["source"], r["n_chars"])
        for r in read_documents_csv(spark, sf_small).collect()
    }
    via_jsonl = {
        (r["doc_id"], r["text"], r["lang"], r["source"], r["n_chars"])
        for r in read_documents_jsonl(spark, sf_small).collect()
    }
    assert via_csv == orig
    assert via_jsonl == orig
