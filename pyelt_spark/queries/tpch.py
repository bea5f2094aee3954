"""Relational-coverage driver queries (TPC-H-shaped; decimal-exact
aggregates, explicit broadcasts on the dimension sides)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyelt_spark.queries.common import _dec, _t


def q_pricing_summary(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1999-12-01").cast("timestamp")
    )
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            # sums run in DECIMAL (exact, order-independent) and only the
            # final projection casts to double — the driver value-hashes raw
            # cell renderings and DECIMAL stringifies differently across
            # engines, while identical IEEE doubles render identically
            F.round(F.sum(_dec("l_quantity")).cast("double"), 6).alias("sum_qty"),
            F.round(F.sum(_dec("l_extendedprice")).cast("double"), 6).alias("sum_base_price"),
            F.round(
                F.sum(
                    _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))
                ).cast("double"),
                6,
            ).alias("sum_disc_price"),
            F.count("*").alias("count_order"),
            F.round(
                F.sum(_dec("l_quantity")).cast("double") / F.count("*"), 6
            ).alias("avg_qty"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 6) AS sum_qty,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 6) AS sum_base_price,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 6) AS sum_disc_price,
  count(*) AS count_order,
  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*), 6) AS avg_qty
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1999-12-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_shipping_priority(spark, sf_dir):
    # the filtered customer side is broadcast-sized at any SF (one market
    # segment of a dim table); hint it explicitly rather than relying on
    # AQE's runtime re-plan, matching q5/q14
    c = F.broadcast(
        _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    )
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            # order/limit on the EXACT decimal sum (ties at the cutoff must
            # resolve identically in both engines), project rounded double
            F.sum(
                _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))
            ).alias("_revenue_exact")
        )
        .orderBy(F.desc("_revenue_exact"), "l_orderkey")
        .limit(10)
        .select(
            "l_orderkey",
            "o_orderdate",
            "o_orderpriority",
            F.round(F.col("_revenue_exact").cast("double"), 6).alias("revenue"),
        )
    )


SQL_SHIPPING_PRIORITY = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
  round(CAST(revenue_exact AS DOUBLE), 6) AS revenue
FROM (
  SELECT l_orderkey, o_orderdate, o_orderpriority,
    sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS revenue_exact
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment = 'BUILDING'
  GROUP BY l_orderkey, o_orderdate, o_orderpriority
  ORDER BY revenue_exact DESC, l_orderkey
  LIMIT 10
)
"""


def q_nation_revenue(spark, sf_dir):
    """Broadcast-join chain over the dimension tables (small dims are
    broadcast — no shuffle of lineitem beyond the final agg)."""
    r = F.broadcast(_t(spark, sf_dir, "region"))
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(
                    _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))
                ).cast("double"),
                6,
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("r_name", "n_name")
    )


SQL_NATION_REVENUE = """
SELECT r_name, n_name,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 6) AS revenue,
  count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
"""


def q_top_orders_per_customer(spark, sf_dir):
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rank_in_cust", F.row_number().over(w))
        .filter(F.col("rank_in_cust") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank_in_cust")
    )


SQL_TOP_ORDERS_PER_CUSTOMER = """
SELECT o_custkey, o_orderkey, o_totalprice, rank_in_cust FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank_in_cust
  FROM orders
) WHERE rank_in_cust <= 3
"""


def q_orders_with_returns(spark, sf_dir):
    """Semi join (EXISTS): order priorities of orders having at least one
    returned lineitem (q4 shape)."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


SQL_ORDERS_WITH_RETURNS = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q_customers_without_orders(spark, sf_dir):
    """Anti join (NOT EXISTS): customers with no orders, per segment."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("c_mktsegment")
    )


SQL_CUSTOMERS_WITHOUT_ORDERS = """
SELECT c_mktsegment, count(*) AS n_customers
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def q_supplier_diversity(spark, sf_dir):
    """COUNT(DISTINCT) per group (q16 shape): distinct suppliers and parts
    shipped per return flag."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.count("*").alias("n_items"),
        )
        .orderBy("l_returnflag")
    )


SQL_SUPPLIER_DIVERSITY = """
SELECT l_returnflag,
  count(DISTINCT l_suppkey) AS n_suppliers,
  count(DISTINCT l_partkey) AS n_parts,
  count(*) AS n_items
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def q_promo_revenue_share(spark, sf_dir):
    """Conditional aggregation over a join (q14 shape): revenue share of
    parts whose type starts with a given prefix, by line status."""
    l = _t(spark, sf_dir, "lineitem")
    p = F.broadcast(_t(spark, sf_dir, "part"))
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))
    joined = l.join(p, l.l_partkey == p.p_partkey)
    is_promo = F.col("p_type").startswith("STANDARD")
    return (
        joined.groupBy("l_linestatus")
        .agg(
            F.round(
                F.sum(F.when(is_promo, rev).otherwise(F.lit(0).cast("decimal(18,4)"))).cast(
                    "double"
                ),
                6,
            ).alias("promo_revenue"),
            F.round(F.sum(rev).cast("double"), 6).alias("total_revenue"),
        )
        .orderBy("l_linestatus")
    )


SQL_PROMO_REVENUE_SHARE = """
SELECT l_linestatus,
  round(CAST(sum(CASE WHEN p_type LIKE 'STANDARD%'
    THEN CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE), 6) AS promo_revenue,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 6) AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY l_linestatus ORDER BY l_linestatus
"""


QUERIES = {
    "q1_pricing_summary": q_pricing_summary,
    "q3_shipping_priority": q_shipping_priority,
    "q5_nation_revenue": q_nation_revenue,
    "top_orders_per_customer": q_top_orders_per_customer,
    "q4_orders_with_returns": q_orders_with_returns,
    "customers_without_orders": q_customers_without_orders,
    "q16_supplier_diversity": q_supplier_diversity,
    "q14_promo_revenue_share": q_promo_revenue_share,
}

ORACLES = {
    "q1_pricing_summary": SQL_PRICING_SUMMARY,
    "q3_shipping_priority": SQL_SHIPPING_PRIORITY,
    "q5_nation_revenue": SQL_NATION_REVENUE,
    "top_orders_per_customer": SQL_TOP_ORDERS_PER_CUSTOMER,
    "q4_orders_with_returns": SQL_ORDERS_WITH_RETURNS,
    "customers_without_orders": SQL_CUSTOMERS_WITHOUT_ORDERS,
    "q16_supplier_diversity": SQL_SUPPLIER_DIVERSITY,
    "q14_promo_revenue_share": SQL_PROMO_REVENUE_SHARE,
}
