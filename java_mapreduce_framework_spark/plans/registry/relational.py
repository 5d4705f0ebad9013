"""relational section of the declared query registry -- bodies verbatim
from the monolithic plans/registry.py (round-8 maintainability split;
identical registry() output, zero plan changes)."""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from ...operators import (  # noqa: F401
    analytics,
    dedup,
    ml,
    multimodal,
    relational,
    similarity,
    temporal,
    text,
)
from ...sources.tables import load_table  # noqa: F401
from .core import (  # noqa: F401
    _EVTS,
    _WORDS_CTE,
    _register,
    _t,
)


# ------------------------------------------------- relational core (M1/M3)


@_register(
    "scan_project",
    "SELECT l_orderkey, l_partkey, l_quantity FROM lineitem",
)
def _scan_project(spark, sf):
    return relational.scan_project(_t(spark, sf, "lineitem"))


@_register(
    "filter_predicate",
    """
    SELECT l_orderkey, l_quantity, l_discount, l_returnflag
    FROM lineitem
    WHERE l_quantity > 30
      AND l_returnflag IN ('A', 'R')
      AND l_discount BETWEEN 0.02 AND 0.08
    """,
)
def _filter_predicate(spark, sf):
    return relational.filter_predicate(_t(spark, sf, "lineitem"))


@_register(
    "map_scalar",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                AS DOUBLE) AS net_price,
           upper(l_returnflag) AS flag_uc,
           CAST(year(l_shipdate) AS INTEGER) AS ship_year
    FROM lineitem
    """,
)
def _map_scalar(spark, sf):
    return relational.map_scalar(_t(spark, sf, "lineitem"))


@_register(
    "flatmap_explode",
    _WORDS_CTE + "SELECT doc_id, word FROM words",
)
def _flatmap_explode(spark, sf):
    from ...functions.text import words_exploded

    return words_exploded(_t(spark, sf, "documents"))


@_register(
    "groupby_agg",
    """
    SELECT l_returnflag, count(*) AS n_rows,
           round(sum(l_quantity), 2) AS sum_qty,
           round(avg(l_extendedprice), 2) AS avg_price,
           min(l_shipdate) AS min_shipdate,
           max(l_shipdate) AS max_shipdate
    FROM lineitem GROUP BY l_returnflag
    """,
)
def _groupby_agg(spark, sf):
    return relational.groupby_agg(_t(spark, sf, "lineitem"))


@_register(
    "groupby_multikey",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
           round(sum(l_quantity), 2) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                AS DOUBLE) AS revenue,
           round(avg(l_discount), 4) AS avg_disc
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def _groupby_multikey(spark, sf):
    return relational.groupby_multikey(_t(spark, sf, "lineitem"))


@_register(
    "groupby_salted",
    """
    SELECT l_returnflag, count(*) AS n_rows,
           round(sum(l_quantity), 2) AS sum_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*), 2) AS avg_price
    FROM lineitem GROUP BY l_returnflag
    """,
    note="two-phase salt aggregation == plain GROUP BY (algebraic composition exact)",
)
def _groupby_salted(spark, sf):
    return relational.groupby_salted(_t(spark, sf, "lineitem"))


@_register(
    "distinct_keys",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def _distinct_keys(spark, sf):
    return relational.distinct_keys(_t(spark, sf, "lineitem"))


@_register(
    "count_distinct",
    """
    SELECT c_nationkey, count(DISTINCT c_mktsegment) AS n_segments,
           count(*) AS n_customers
    FROM customer GROUP BY c_nationkey
    """,
)
def _count_distinct(spark, sf):
    return relational.count_distinct(_t(spark, sf, "customer"))


@_register(
    "approx_count_distinct",
    None,
    note="HLL sketch estimate; approximate by design -> rows-only check",
)
def _approx_count_distinct(spark, sf):
    return relational.approx_count_distinct(_t(spark, sf, "lineitem"))


@_register(
    "sort_global",
    "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey",
)
def _sort_global(spark, sf):
    return relational.sort_global(_t(spark, sf, "orders"))


@_register(
    "topk",
    """
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def _topk(spark, sf):
    return relational.topk(_t(spark, sf, "orders"))


@_register(
    "join_equi_inner",
    """
    SELECT o_orderkey, c_custkey, c_name, o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def _join_equi_inner(spark, sf):
    return relational.join_equi_inner(_t(spark, sf, "orders"), _t(spark, sf, "customer"))


@_register(
    "join_left_outer",
    """
    SELECT c_custkey, count(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def _join_left_outer(spark, sf):
    return relational.join_left_outer(_t(spark, sf, "customer"), _t(spark, sf, "orders"))


@_register(
    "join_semi_anti",
    """
    SELECT c_custkey, 'has_orders' AS tag FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders)
    UNION ALL
    SELECT c_custkey, 'no_orders' AS tag FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def _join_semi_anti(spark, sf):
    return relational.join_semi_anti(_t(spark, sf, "customer"), _t(spark, sf, "orders"))


@_register(
    "join_broadcast",
    """
    SELECT n_name, count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def _join_broadcast(spark, sf):
    return relational.join_broadcast(
        _t(spark, sf, "orders"), _t(spark, sf, "customer"), _t(spark, sf, "nation")
    )


@_register(
    "join_skew_salted",
    """
    SELECT o_orderpriority, count(*) AS n_items,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    note="salt-and-replicate skew join == plain equi-join (every probe row meets each build row once)",
)
def _join_skew_salted(spark, sf):
    return relational.join_skew_salted(_t(spark, sf, "lineitem"), _t(spark, sf, "orders"))


def _orders_split(spark, sf):
    from pyspark.sql import functions as F

    orders = _t(spark, sf, "orders")
    a = orders.filter(F.col("o_totalprice") > 400000).select("o_custkey")
    b = orders.filter(F.col("o_orderdate") >= "1999-06-01").select("o_custkey")
    return a, b


_SPLIT_A = "SELECT o_custkey FROM orders WHERE o_totalprice > 400000"
_SPLIT_B = "SELECT o_custkey FROM orders WHERE o_orderdate >= '1999-06-01'"


@_register("set_union", f"{_SPLIT_A} UNION {_SPLIT_B}")
def _set_union(spark, sf):
    return relational.set_union(*_orders_split(spark, sf))


@_register("set_intersect", f"{_SPLIT_A} INTERSECT {_SPLIT_B}")
def _set_intersect(spark, sf):
    return relational.set_intersect(*_orders_split(spark, sf))


@_register("set_except", f"{_SPLIT_A} EXCEPT {_SPLIT_B}")
def _set_except(spark, sf):
    return relational.set_except(*_orders_split(spark, sf))


@_register(
    "window_rank",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rnk AS INTEGER) AS rnk
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             rank() OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders)
    WHERE rnk <= 3
    """,
)
def _window_rank(spark, sf):
    return relational.window_rank(_t(spark, sf, "orders"))


@_register(
    "window_running_agg",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM orders
    """,
)
def _window_running_agg(spark, sf):
    return relational.window_running_agg(_t(spark, sf, "orders"))


@_register(
    "grouping_rollup",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def _grouping_rollup(spark, sf):
    return relational.grouping_rollup(_t(spark, sf, "lineitem"))


@_register(
    "unpivot_metrics",
    """
    SELECT l_orderkey, l_linenumber, metric, val FROM (
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
      FROM lineitem)
    UNPIVOT (val FOR metric IN (l_quantity, l_extendedprice, l_discount))
    """,
)
def _unpivot_metrics(spark, sf):
    return relational.unpivot_metrics(_t(spark, sf, "lineitem"))


@_register(
    "grouping_cube",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def _grouping_cube(spark, sf):
    return relational.grouping_cube(_t(spark, sf, "lineitem"))


@_register(
    "json_extract",
    """
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
    FROM events
    """,  # no ts column used -> raw events view is fine
)
def _json_extract(spark, sf):
    return relational.json_extract(_t(spark, sf, "events"))


@_register(
    "groupby_argmax",
    f"""
    SELECT user_id, event_type AS last_type, ts AS last_ts,
           round(value, 4) AS last_value
    FROM (SELECT user_id, event_type, ts, value,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM {_EVTS})
    WHERE rn = 1
    """,
    note="algebraic max_by in Spark; window row_number=1 phrasing as oracle",
)
def _groupby_argmax(spark, sf):
    return relational.groupby_argmax(_t(spark, sf, "events"))


@_register(
    "json_typed_agg",
    """
    WITH p AS (
      SELECT event_type,
             CASE WHEN json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
                  THEN TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) END AS k
      FROM events)
    SELECT event_type, count(*) AS n_events,
           CAST(sum(k) AS BIGINT) AS sum_k,
           round(avg(k), 4) AS avg_k
    FROM p GROUP BY event_type
    """,
    note="from_json once into a typed struct; json_type + TRY_CAST guard mirrors "
    "from_json's NULL on quoted/fractional/overflowing k",
)
def _json_typed_agg(spark, sf):
    return relational.json_typed_agg(_t(spark, sf, "events"))


