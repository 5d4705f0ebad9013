"""Round-12 optimization guards: the Arrow-kernel partial-aggregation
rewrites must stay BIT-IDENTICAL to the SQL-expression forms they
replaced (the minhash_signatures precedent), and the input-skew spread
guard must be result-neutral and conditional.
"""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from java_mapreduce_framework_spark.operators import analytics, dedup
from java_mapreduce_framework_spark.sources.tables import load_table, spread_scan


def test_simhash_kernel_bit_equal_to_sql_sums(spark, sf_small):
    """The numpy bit-unpack kernel must reproduce the 64 SUM(CASE)
    aggregates exactly: same (doc, bit) sums, hence same chunks."""
    docs = load_table(spark, sf_small, "documents")
    kernel = dedup.simhash_signatures(docs).orderBy("doc_id").collect()

    # reference: the pre-r12 SQL expression form, inline
    from java_mapreduce_framework_spark.functions.text import tokens_col

    bands, width = 4, 16
    tf = (
        docs.select("doc_id", F.explode(tokens_col("text")).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("cnt"))
    )
    hs = tf.select(
        "doc_id",
        "cnt",
        *[
            F.conv(F.substring(F.md5("word"), j * 4 + 1, 4), 16, 10)
            .cast("int")
            .alias(f"h{j}")
            for j in range(bands)
        ],
    )
    bit_sums = [
        F.sum(
            F.when(
                F.shiftrightunsigned(f"h{j}", k).bitwiseAND(F.lit(1)) == 1,
                F.col("cnt"),
            ).otherwise(-F.col("cnt"))
        ).alias(f"b{j}_{k}")
        for j in range(bands)
        for k in range(width)
    ]
    per_doc = hs.groupBy("doc_id").agg(*bit_sums)
    from functools import reduce

    chunks = [
        reduce(
            lambda a, b: a + b,
            [
                F.when(F.col(f"b{j}_{k}") > 0, F.lit(1 << k).cast("int"))
                .otherwise(F.lit(0).cast("int"))
                for k in range(width)
            ],
        )
        for j in range(bands)
    ]
    ref = (
        per_doc.select("doc_id", F.array(*chunks).alias("cs"))
        .orderBy("doc_id")
        .collect()
    )
    assert [(r["doc_id"], r["cs"]) for r in kernel] == [
        (r["doc_id"], r["cs"]) for r in ref
    ]


def test_bootstrap_kernel_bit_equal_to_wide_agg(spark, sf_small):
    """The searchsorted Poisson-ladder kernel must reproduce the
    SUM(weight*x)/SUM(weight) wide aggregates exactly per (flag, b)."""
    li = load_table(spark, sf_small, "lineitem")
    out = analytics.stats_bootstrap_ci(li).orderBy("l_returnflag").collect()

    # reference: the pre-r12 wide-aggregate form, inline (24 reps)
    h8 = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit("bs"), "l_orderkey", "l_linenumber")),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    base = li.select(
        "l_returnflag",
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("x"),
        h8.alias("h8"),
    )

    def weight(b):
        s1 = (F.col("h8") * F.lit(1000003) + F.lit(b * 999999937)) % F.lit(1048576)
        s2 = (s1 * F.lit(48271) + F.lit(11)) % F.lit(1048576)
        return (
            F.when(s2 < 385750, 0)
            .when(s2 < 771499, 1)
            .when(s2 < 964374, 2)
            .when(s2 < 1028665, 3)
            .when(s2 < 1044738, 4)
            .when(s2 < 1047953, 5)
            .when(s2 < 1048489, 6)
            .when(s2 < 1048565, 7)
            .when(s2 < 1048575, 8)
            .otherwise(9)
        )

    aggs = []
    for b in range(24):
        wb = weight(b)
        aggs.append(F.sum(wb * F.col("x")).alias(f"swx_{b}"))
        aggs.append(F.sum(wb).alias(f"sw_{b}"))
    wide = base.groupBy("l_returnflag").agg(
        F.count("*").alias("n"), F.sum("x").alias("sx"), *aggs
    )
    stack_args = ", ".join(
        f"CAST({b} AS BIGINT), swx_{b}, sw_{b}" for b in range(24)
    )
    reps = (
        wide.select(
            "l_returnflag",
            F.round(F.col("sx").cast("double") / 100.0 / F.col("n"), 6).alias("c"),
            F.expr(f"stack(24, {stack_args}) AS (b, swx, sw)"),
        )
        .filter(F.col("sw") > 0)
        .withColumn("mean_b", F.col("swx").cast("double") / 100.0 / F.col("sw"))
    )
    dev = F.col("mean_b") - F.col("c")
    spread = reps.groupBy("l_returnflag", "c").agg(
        F.count("*").alias("nb"),
        F.sum(dev).alias("sd"),
        F.sum(dev * dev).alias("sdd"),
    )
    se = F.sqrt(
        (F.col("sdd") - F.col("sd") * F.col("sd") / F.col("nb"))
        / (F.col("nb") - 1)
    )
    ref = (
        spread.select(
            "l_returnflag",
            F.round("c", 4).alias("mean_price"),
            F.round(se, 4).alias("se_boot"),
            F.round(F.col("c") - 1.96 * se, 4).alias("ci_lo"),
            F.round(F.col("c") + 1.96 * se, 4).alias("ci_hi"),
        )
        .orderBy("l_returnflag")
        .collect()
    )
    assert [tuple(r) for r in out] == [tuple(r) for r in ref]


def test_spread_scan_fires_only_below_parallelism(spark, sf_small):
    """Conditional guard: a single-split fixture scan is repartitioned
    to default_parallelism; an input already at/above that partition
    count passes through UNCHANGED (the production no-op contract)."""
    from java_mapreduce_framework_spark.session import default_parallelism

    n = default_parallelism()
    docs = load_table(spark, sf_small, "documents").select("doc_id", "text")
    assert docs.rdd.getNumPartitions() < n
    spreaded = spread_scan(docs, "doc_id")
    assert spreaded.rdd.getNumPartitions() == n
    # already-wide input: returned as-is, no extra exchange
    wide = docs.repartition(n, "doc_id")
    again = spread_scan(wide, "doc_id")
    assert again is wide
    # result-neutral: same rows either way
    a = sorted(r["doc_id"] for r in spreaded.collect())
    b = sorted(r["doc_id"] for r in docs.collect())
    assert a == b
