"""Bucketed (pre-partitioned) join: the co-location strategy for a
join key that is reused across many queries. Writing both sides
bucketed on the key lets Spark join them with ZERO exchanges -- at
100 TB this turns the nightly fact-dim join from a full shuffle of
the fact table into a local merge per bucket.
"""

import pytest

from java_mapreduce_framework_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_small):
    # managed tables land in the default warehouse dir (cwd-relative
    # spark-warehouse/, a static conf); DROP TABLE removes the files
    orders = load_table(spark, sf_small, "orders")
    customer = load_table(spark, sf_small, "customer")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .saveAsTable("orders_b")
    )
    (
        customer.write.mode("overwrite")
        .bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .saveAsTable("customer_b")
    )
    yield "orders_b", "customer_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    ot, ct = bucketed_tables
    # disable broadcast so the join strategy decision is about
    # co-location, not table size
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table(ot).join(
            spark.table(ct), spark.table(ot).o_custkey == spark.table(ct).c_custkey
        )
        plan = j._sc._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "formatted"
        )
        assert "Exchange" not in plan, "bucketed join should not shuffle either side"
        # r12: preferSortMergeJoin=false lets the planner pick a
        # shuffled-hash join here (bucketing still co-locates, so it
        # stays exchange-free and additionally skips both sorts);
        # either strategy satisfies the bucketing contract
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_join_result_matches_shuffled(spark, sf_small, bucketed_tables):
    ot, ct = bucketed_tables
    orders = load_table(spark, sf_small, "orders")
    customer = load_table(spark, sf_small, "customer")
    plain = orders.join(customer, orders.o_custkey == customer.c_custkey).count()
    bucketed = (
        spark.table(ot)
        .join(spark.table(ct), spark.table(ot).o_custkey == spark.table(ct).c_custkey)
        .count()
    )
    assert bucketed == plain


def test_incremental_minhash_index_side_never_shuffles(spark, sf_small):
    """The growing-corpus contract: an incremental probe must not
    shuffle (or re-sketch) the persisted index. Neither bucketed index
    table's scan may sit under an Exchange keyed on its join key --
    only batch-derived rows move."""
    from pyspark.sql import functions as F

    from java_mapreduce_framework_spark.operators import dedup
    from java_mapreduce_framework_spark.sources.tables import source_fingerprint

    docs = load_table(spark, sf_small, "documents")
    dedup.build_minhash_index(
        spark,
        docs.filter(F.col("doc_id") % 10 != 0),
        "mh_idx_planshape",
        source_fp=source_fingerprint(sf_small, "documents"),
    )
    out = dedup.dedup_incremental_minhash(
        spark, docs.filter(F.col("doc_id") % 10 == 0), "mh_idx_planshape"
    )
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "mh_idx_planshape_bands" in plan and "mh_idx_planshape_sigs" in plan
    # no hash-repartition of the index join keys anywhere in the plan:
    # the posting-list join reads bucketed band_hash layout, the
    # signature join reads bucketed doc_id layout
    assert "Exchange hashpartitioning(band_hash" not in plan
    assert "Exchange hashpartitioning(doc_b" not in plan
    # and the corpus is never re-scanned from source parquet: exactly
    # one scan of the fixture file (the new batch); index reads come
    # from the warehouse tables
    assert plan.count("documents.parquet") == 1


def test_staged_table_adoption_skips_rebuild_and_keeps_buckets(
    spark, sf_small, tmp_path
):
    """Fresh-session semantics of the round-12 staging fix: when the
    catalog entry is missing but the on-disk staging is intact and
    fingerprint-current, ``ensure_staged_table`` must ADOPT the files
    (external registration -- build() never called) and re-attach the
    bucket spec so probes stay exchange-free. Simulated by copying a
    staged bucketed table's directory to a catalog-unknown name."""
    import shutil

    from pyspark.sql import functions as F

    from java_mapreduce_framework_spark.sources.staging import (
        ensure_staged_table,
        warehouse_dir,
    )

    docs = load_table(spark, sf_small, "documents").limit(100)
    base = docs.select("doc_id", F.md5("text").alias("h"))
    ensure_staged_table(
        spark, "adopt_src", lambda: base, "fp-1",
        bucket_cols=["doc_id"], buckets=4,
    )
    wh = warehouse_dir(spark)
    shutil.rmtree(wh / "adopt_dst", ignore_errors=True)
    spark.sql("DROP TABLE IF EXISTS adopt_dst")
    shutil.copytree(wh / "adopt_src", wh / "adopt_dst")

    def _boom():
        raise AssertionError("adoption path must not rebuild")

    adopted = ensure_staged_table(
        spark, "adopt_dst", _boom, "fp-1",
        bucket_cols=["doc_id"], buckets=4,
    )
    assert adopted.count() == base.count()
    # bucket metadata re-attached: a self-join on the bucket key of
    # two adopted reads plans without an Exchange on either side
    a, b = spark.table("adopt_dst"), spark.table("adopt_dst")
    j = a.hint("merge").join(b.withColumnRenamed("h", "h2"), "doc_id")
    plan = j._sc._jvm.PythonSQLUtils.explainString(
        j._jdf.queryExecution(), "formatted"
    )
    assert "Exchange hashpartitioning(doc_id" not in plan
    # stale fingerprint still forces a rebuild (marker contract kept)
    rebuilt = {"n": 0}

    def _rebuild():
        rebuilt["n"] += 1
        return base

    ensure_staged_table(
        spark, "adopt_dst", _rebuild, "fp-2",
        bucket_cols=["doc_id"], buckets=4,
    )
    assert rebuilt["n"] == 1
