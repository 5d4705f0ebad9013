from java_mapreduce_framework_spark.streaming.jobs import (
    stream_tumbling_window,
    stream_wordcount,
)


def test_stream_wordcount_equals_batch(spark, sf_small):
    from java_mapreduce_framework_spark.operators.text import wordcount
    from java_mapreduce_framework_spark.sources.tables import load_table

    batch = {r["word"]: r["cnt"] for r in wordcount(load_table(spark, sf_small, "documents")).collect()}
    streamed = {r["word"]: r["cnt"] for r in stream_wordcount(spark, sf_small).collect()}
    assert streamed == batch


def test_stream_tumbling_equals_batch(spark, sf_small):
    from java_mapreduce_framework_spark.operators.temporal import tumbling_window_agg
    from java_mapreduce_framework_spark.sources.tables import load_table

    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in tumbling_window_agg(load_table(spark, sf_small, "events")).collect()
    }
    streamed = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in stream_tumbling_window(spark, sf_small).collect()
    }
    assert streamed == batch
