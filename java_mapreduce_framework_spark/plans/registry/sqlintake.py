"""sqlintake section of the declared query registry -- bodies verbatim
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
    QuerySpec,
    _REGISTRY,
    _register,
    queries,
)


# ------------------------------------------------------- SQL intake


@_register(
    "sql_pricing_summary",
    None,  # oracle assigned below: the SAME SQL string runs on DuckDB
    note="TPC-H-style Q1 through the spark.sql intake",
)
def _sql_pricing_summary(spark, sf):
    from ..sql import PRICING_SUMMARY, run_sql

    return run_sql(spark, sf, PRICING_SUMMARY)


@_register(
    "sql_top_orders",
    None,
    note="TPC-H-style Q3 shape through the spark.sql intake",
)
def _sql_top_orders(spark, sf):
    from ..sql import TOP_ORDERS, run_sql

    return run_sql(spark, sf, TOP_ORDERS)


@_register(
    "sql_revenue_forecast",
    None,
    note="TPC-H-style Q6 shape: all predicates pushed to the scan",
)
def _sql_revenue_forecast(spark, sf):
    from ..sql import REVENUE_FORECAST, run_sql

    return run_sql(spark, sf, REVENUE_FORECAST)


@_register(
    "sql_regional_volume",
    None,
    note="TPC-H-style Q5 shape: 5-way join, region/nation broadcast",
)
def _sql_regional_volume(spark, sf):
    from ..sql import REGIONAL_VOLUME, run_sql

    return run_sql(spark, sf, REGIONAL_VOLUME)


@_register(
    "sql_promo_share",
    None,
    note="TPC-H-style Q14 shape: part join + FILTER-clause conditional agg",
)
def _sql_promo_share(spark, sf):
    from ..sql import PROMO_SHARE, run_sql

    return run_sql(spark, sf, PROMO_SHARE)


@_register(
    "sql_order_priority_check",
    None,
    note="TPC-H-style Q4 shape: correlated EXISTS -> left-semi join",
)
def _sql_order_priority_check(spark, sf):
    from ..sql import ORDER_PRIORITY_CHECK, run_sql

    return run_sql(spark, sf, ORDER_PRIORITY_CHECK)


@_register(
    "sql_priority_shipments",
    None,
    note="TPC-H-style Q12 shape: CASE-conditional counts over the fact join",
)
def _sql_priority_shipments(spark, sf):
    from ..sql import PRIORITY_SHIPMENTS, run_sql

    return run_sql(spark, sf, PRIORITY_SHIPMENTS)


@_register(
    "sql_parts_supplier_spread",
    None,
    note="TPC-H-style Q16 shape: distinct-count + NOT IN blacklist",
)
def _sql_parts_supplier_spread(spark, sf):
    from ..sql import PARTS_SUPPLIER_SPREAD, run_sql

    return run_sql(spark, sf, PARTS_SUPPLIER_SPREAD)


@_register(
    "sql_big_orders",
    None,
    note="TPC-H-style Q18 shape: grouped-HAVING IN subquery",
)
def _sql_big_orders(spark, sf):
    from ..sql import BIG_ORDERS, run_sql

    return run_sql(spark, sf, BIG_ORDERS)


@_register(
    "sql_bracketed_revenue",
    None,
    note="TPC-H-style Q19 shape: OR-of-ANDs predicate bands",
)
def _sql_bracketed_revenue(spark, sf):
    from ..sql import BRACKETED_REVENUE, run_sql

    return run_sql(spark, sf, BRACKETED_REVENUE)


@_register(
    "sql_dormant_customers",
    None,
    note="TPC-H-style Q22 shape: scalar-avg subquery + NOT EXISTS anti-join",
)
def _sql_dormant_customers(spark, sf):
    from ..sql import DORMANT_CUSTOMERS, run_sql

    return run_sql(spark, sf, DORMANT_CUSTOMERS)


@_register(
    "sql_grouping_sets",
    None,
    note="explicit GROUPING SETS marginals + grouping() flags",
)
def _sql_grouping_sets(spark, sf):
    from ..sql import GROUPING_SETS_MARGINALS, run_sql

    return run_sql(spark, sf, GROUPING_SETS_MARGINALS)


@_register(
    "sql_returned_revenue",
    None,
    note="TPC-H-style Q10 shape: returned-item revenue top-k",
)
def _sql_returned_revenue(spark, sf):
    from ..sql import RETURNED_REVENUE, run_sql

    return run_sql(spark, sf, RETURNED_REVENUE)


@_register(
    "sql_small_qty_revenue",
    None,
    note="TPC-H-style Q17 shape: correlated scalar avg-quantity subquery",
)
def _sql_small_qty_revenue(spark, sf):
    from ..sql import SMALL_QTY_REVENUE, run_sql

    return run_sql(spark, sf, SMALL_QTY_REVENUE)


@_register(
    "sql_min_cost_supplier",
    None,
    note="TPC-H-style Q2 shape: correlated min-cost subquery",
)
def _sql_min_cost_supplier(spark, sf):
    from ..sql import MIN_COST_SUPPLIER, run_sql

    return run_sql(spark, sf, MIN_COST_SUPPLIER)


@_register(
    "sql_late_sole_supplier",
    None,
    note="TPC-H-style Q21 shape: EXISTS (semi) + NOT EXISTS (anti) "
    "correlated subqueries",
)
def _sql_late_sole_supplier(spark, sf):
    from ..sql import LATE_SOLE_SUPPLIER, run_sql

    return run_sql(spark, sf, LATE_SOLE_SUPPLIER)


@_register(
    "sql_dominant_part_suppliers",
    None,
    note="TPC-H-style Q20 shape: nested IN + correlated scalar agg in "
    "HAVING",
)
def _sql_dominant_part_suppliers(spark, sf):
    from ..sql import DOMINANT_PART_SUPPLIERS, run_sql

    return run_sql(spark, sf, DOMINANT_PART_SUPPLIERS)


@_register(
    "sql_customer_order_distribution",
    None,
    note="TPC-H-style Q13 shape: ON-clause filter in outer join + "
    "aggregation over an aggregation",
)
def _sql_customer_order_distribution(spark, sf):
    from ..sql import CUSTOMER_ORDER_DISTRIBUTION, run_sql

    return run_sql(spark, sf, CUSTOMER_ORDER_DISTRIBUTION)


@_register(
    "sql_top_revenue_supplier",
    None,
    note="TPC-H-style Q15 shape: CTE reused as join input and inside "
    "a MAX scalar subquery",
)
def _sql_top_revenue_supplier(spark, sf):
    from ..sql import TOP_REVENUE_SUPPLIER, run_sql

    return run_sql(spark, sf, TOP_REVENUE_SUPPLIER)


@_register(
    "sql_important_part_value",
    None,
    note="TPC-H-style Q11 shape: HAVING vs global scalar aggregate",
)
def _sql_important_part_value(spark, sf):
    from ..sql import IMPORTANT_PART_VALUE, run_sql

    return run_sql(spark, sf, IMPORTANT_PART_VALUE)


@_register(
    "sql_cross_nation_volume",
    None,
    note="TPC-H-style Q7 shape: one dimension joined in two roles with "
    "a symmetric pair predicate",
)
def _sql_cross_nation_volume(spark, sf):
    from ..sql import CROSS_NATION_VOLUME, run_sql

    return run_sql(spark, sf, CROSS_NATION_VOLUME)


@_register(
    "sql_nation_market_share",
    None,
    note="TPC-H-style Q8 shape: conditional/unconditional aggregate "
    "ratio (market share)",
)
def _sql_nation_market_share(spark, sf):
    from ..sql import NATION_MARKET_SHARE, run_sql

    return run_sql(spark, sf, NATION_MARKET_SHARE)


@_register(
    "sql_nation_product_profit",
    None,
    note="TPC-H-style Q9 shape: LIKE-filtered part dim in a 4-way "
    "fact chain, profit by nation x year",
)
def _sql_nation_product_profit(spark, sf):
    from ..sql import NATION_PRODUCT_PROFIT, run_sql

    return run_sql(spark, sf, NATION_PRODUCT_PROFIT)


@_register(
    "sql_qoq_growth",
    None,  # oracle attached below: the query text IS the oracle
    note="quarter-over-quarter revenue growth: calendar-bounded "
    "quarter aggregate + lag window; DECIMAL money sums",
)
def _sql_qoq_growth(spark, sf):
    from ..sql import QOQ_GROWTH, run_sql

    return run_sql(spark, sf, QOQ_GROWTH)


def _attach_sql_oracles() -> None:
    """The sql_* queries' oracle IS the query text: one ANSI string
    evaluated by both engines (dialect-shared subset)."""
    from .. import sql as _sql

    for name, stmt in (
        ("sql_pricing_summary", _sql.PRICING_SUMMARY),
        ("sql_top_orders", _sql.TOP_ORDERS),
        ("sql_revenue_forecast", _sql.REVENUE_FORECAST),
        ("sql_regional_volume", _sql.REGIONAL_VOLUME),
        ("sql_promo_share", _sql.PROMO_SHARE),
        ("sql_order_priority_check", _sql.ORDER_PRIORITY_CHECK),
        ("sql_priority_shipments", _sql.PRIORITY_SHIPMENTS),
        ("sql_parts_supplier_spread", _sql.PARTS_SUPPLIER_SPREAD),
        ("sql_big_orders", _sql.BIG_ORDERS),
        ("sql_bracketed_revenue", _sql.BRACKETED_REVENUE),
        ("sql_dormant_customers", _sql.DORMANT_CUSTOMERS),
        ("sql_returned_revenue", _sql.RETURNED_REVENUE),
        ("sql_grouping_sets", _sql.GROUPING_SETS_MARGINALS),
        ("sql_small_qty_revenue", _sql.SMALL_QTY_REVENUE),
        ("sql_min_cost_supplier", _sql.MIN_COST_SUPPLIER),
        ("sql_late_sole_supplier", _sql.LATE_SOLE_SUPPLIER),
        ("sql_dominant_part_suppliers", _sql.DOMINANT_PART_SUPPLIERS),
        ("sql_customer_order_distribution", _sql.CUSTOMER_ORDER_DISTRIBUTION),
        ("sql_top_revenue_supplier", _sql.TOP_REVENUE_SUPPLIER),
        ("sql_important_part_value", _sql.IMPORTANT_PART_VALUE),
        ("sql_cross_nation_volume", _sql.CROSS_NATION_VOLUME),
        ("sql_nation_market_share", _sql.NATION_MARKET_SHARE),
        ("sql_nation_product_profit", _sql.NATION_PRODUCT_PROFIT),
        ("sql_qoq_growth", _sql.QOQ_GROWTH),
    ):
        spec = _REGISTRY[name]
        _REGISTRY[name] = QuerySpec(spec.name, spec.fn, stmt, spec.note)


_attach_sql_oracles()


