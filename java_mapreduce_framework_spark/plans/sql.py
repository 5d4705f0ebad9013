"""SQL intake: run ANSI SQL directly against the fixture tables.

The reference has no query language -- its IR is a 5-field job bean
(``master/Job.java:26-44``) and every computation is a hand-written
``Job`` class. On Spark the declarative path is free: register the
tables as temp views and hand the string to Catalyst, which supplies
the entire optimization stack (pushdown, pruning, join reordering,
AQE) that SURVEY.md section 4.1 records as absent in the reference.

``run_sql`` is the engine's third intake next to the DataFrame
operators (``operators/``) and the Job API (``plans/jobs.py``); all
three lower to the same Catalyst plans, demonstrated by the
``sql_*`` entries in the declared registry whose results hash-match
the DataFrame-built equivalents' oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import TABLES, load_table


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register each fixture table as a temp view (idempotent;
    re-registering points the view at the new sf_dir)."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    """Register views, then evaluate the query -- the whole SQL layer.

    The DataFrame is lazy as usual; Catalyst sees the full view
    definitions inline, so filters written over a view still push to
    the parquet scan (verified in tests/test_plan_shape.py).
    """
    register_views(spark, sf_dir)
    return spark.sql(sql)


#: TPC-H-style Q1: pricing summary -- the canonical grouped-agg SQL.
PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
            AS DOUBLE) AS sum_disc_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""

#: TPC-H-style Q6 shape: pure filter + ungrouped aggregate. The whole
#: query is a parquet scan with every predicate pushed (row-group
#: min/max skipping on l_shipdate) feeding one partial->final agg --
#: at 100 TB it reads only the date-matching row groups of 3 columns.
REVENUE_FORECAST = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
              * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1998-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""

#: TPC-H-style Q5 shape: 5-way join narrowed by a region filter --
#: the join-ordering/broadcast showcase (region and nation broadcast,
#: AQE picks strategies for the fact-side joins).
REGIONAL_VOLUME = """
SELECT n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
            AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'AMERICA'
  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1999-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""

#: TPC-H-style Q14 shape: promo revenue share over a date slice of
#: lineitem x part. Exercises the part dimension (broadcast at this
#: size), date pushdown, and FILTER-clause conditional aggregation —
#: one partial->final pass, no second scan for the promo subtotal.
PROMO_SHARE = """
SELECT
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
       FILTER (WHERE p_type = 'PROMO') AS DOUBLE) AS promo_revenue,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
       AS DOUBLE) AS total_revenue,
  count(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
"""

#: TPC-H-style Q3 shape: top unshipped orders by revenue.
TOP_ORDERS = """
SELECT o_orderkey, o_orderdate, o_orderpriority,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
            AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""
