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
        assert "SortMergeJoin" in plan
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
