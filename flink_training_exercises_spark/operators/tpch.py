"""TPC-H-style analytical queries over the testdata star schema.

Not reference-derived -- these anchor the engine's relational breadth (multi-
way joins, selective scans, wide aggregation) on the LARGEST testdata tables,
which is where 100 TB behavior is previewed: dimension tables broadcast,
fact-table filters push to the parquet scan, aggregates partial-combine
before the shuffle.

Exactness: money columns are 2-decimal doubles; all arithmetic runs in
integer cents (and 1e-4 / 1e-6 units for discount/tax products), converted
to doubles only at the end -- bit-identical across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cents(col) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("bigint")


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02 00:00:00") -> DataFrame:
    """TPC-H Q1 shape: per (returnflag, linestatus) pricing summary over
    lineitem rows shipped on or before the cutoff."""
    li = lineitem.where(F.col("l_shipdate") <= F.expr(f"TIMESTAMP_NTZ '{cutoff}'")).select(
        "l_returnflag",
        "l_linestatus",
        _cents("l_quantity").alias("qty_c"),
        _cents("l_extendedprice").alias("price_c"),
        _cents("l_discount").alias("disc_c"),
        _cents("l_tax").alias("tax_c"),
    )
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("qty_c").alias("sum_qty_c"),
        F.sum("price_c").alias("sum_price_c"),
        F.sum(F.col("price_c") * (100 - F.col("disc_c"))).alias("sum_disc_price_e4"),
        F.sum(F.col("price_c") * (100 - F.col("disc_c")) * (100 + F.col("tax_c"))).alias(
            "sum_charge_e6"
        ),
        F.count(F.lit(1)).alias("count_order"),
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        (F.col("sum_qty_c").cast("double") / 100).alias("sum_qty"),
        (F.col("sum_price_c").cast("double") / 100).alias("sum_base_price"),
        (F.col("sum_disc_price_e4").cast("double") / 10000).alias("sum_disc_price"),
        (F.col("sum_charge_e6").cast("double") / 1000000).alias("sum_charge"),
        (F.col("sum_qty_c").cast("double") / 100 / F.col("count_order")).alias("avg_qty"),
        (F.col("sum_price_c").cast("double") / 100 / F.col("count_order")).alias("avg_price"),
        "count_order",
    )


PRICING_SUMMARY_SQL = """
WITH li AS (
  SELECT l_returnflag, l_linestatus,
         CAST(round(l_quantity * 100) AS BIGINT) AS qty_c,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
         CAST(round(l_discount * 100) AS BIGINT) AS disc_c,
         CAST(round(l_tax * 100) AS BIGINT) AS tax_c
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '{cutoff}'
),
agg AS (
  SELECT l_returnflag, l_linestatus,
         sum(qty_c) AS sum_qty_c, sum(price_c) AS sum_price_c,
         sum(price_c * (100 - disc_c)) AS sum_disc_price_e4,
         sum(price_c * (100 - disc_c) * (100 + tax_c)) AS sum_charge_e6,
         count(*) AS count_order
  FROM li GROUP BY 1, 2
)
SELECT l_returnflag, l_linestatus,
       CAST(sum_qty_c AS DOUBLE) / 100 AS sum_qty,
       CAST(sum_price_c AS DOUBLE) / 100 AS sum_base_price,
       CAST(sum_disc_price_e4 AS DOUBLE) / 10000 AS sum_disc_price,
       CAST(sum_charge_e6 AS DOUBLE) / 1000000 AS sum_charge,
       CAST(sum_qty_c AS DOUBLE) / 100 / count_order AS avg_qty,
       CAST(sum_price_c AS DOUBLE) / 100 / count_order AS avg_price,
       count_order
FROM agg
"""


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    date: str = "1998-01-01 00:00:00",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3 shape: top-k open orders by revenue for one market segment.
    Dimension side (filtered customers) broadcasts; ranking is computed on
    the exact integer revenue so the top-k cut is deterministic."""
    from pyspark.sql import Window

    cut = F.expr(f"TIMESTAMP_NTZ '{date}'")
    c = customer.where(F.col("c_mktsegment") == segment).select("c_custkey")
    o = orders.where(F.col("o_orderdate") < cut).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    li = lineitem.where(F.col("l_shipdate") > cut).select(
        "l_orderkey",
        (_cents("l_extendedprice") * (100 - _cents("l_discount"))).alias("rev_e4"),
    )
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum("rev_e4").alias("rev_e4"))
    )
    w = Window.orderBy(F.desc("rev_e4"), F.asc("l_orderkey"))
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(
            "l_orderkey",
            (F.col("rev_e4").cast("double") / 10000).alias("revenue"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
    )


SHIPPING_PRIORITY_SQL = """
WITH j AS (
  SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
         sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS rev_e4
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment = '{segment}'
    AND o.o_orderdate < TIMESTAMP '{date}'
    AND l.l_shipdate > TIMESTAMP '{date}'
  GROUP BY 1, 2, 3
)
SELECT l_orderkey, CAST(rev_e4 AS DOUBLE) / 10000 AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority
FROM (SELECT *, row_number() OVER (ORDER BY rev_e4 DESC, l_orderkey) AS rn FROM j)
WHERE rn <= {k}
"""


def local_supplier_volume(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    region_name: str = "ASIA",
    date_from: str = "1996-01-01 00:00:00",
    date_to: str = "1998-01-01 00:00:00",
) -> DataFrame:
    """TPC-H Q5 shape: revenue per nation where customer and supplier share
    the nation, one region, one date range. All dimensions broadcast; the
    only big shuffle is lineitem x orders."""
    r = region.where(F.col("r_name") == region_name).select("r_regionkey")
    n = nation.join(F.broadcast(r), nation["n_regionkey"] == r["r_regionkey"]).select(
        "n_nationkey", "n_name"
    )
    c = customer.join(
        F.broadcast(n), customer["c_nationkey"] == n["n_nationkey"]
    ).select("c_custkey", F.col("n_nationkey").alias("c_nat"), "n_name")
    s = supplier.select("s_suppkey", F.col("s_nationkey").alias("s_nat"))
    o = orders.where(
        (F.col("o_orderdate") >= F.expr(f"TIMESTAMP_NTZ '{date_from}'"))
        & (F.col("o_orderdate") < F.expr(f"TIMESTAMP_NTZ '{date_to}'"))
    ).select("o_orderkey", "o_custkey")
    li = lineitem.select(
        "l_orderkey",
        "l_suppkey",
        (_cents("l_extendedprice") * (100 - _cents("l_discount"))).alias("rev_e4"),
    )
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .where(F.col("c_nat") == F.col("s_nat"))
    )
    return (
        joined.groupBy("n_name")
        .agg(F.sum("rev_e4").alias("rev_e4"))
        .select("n_name", (F.col("rev_e4").cast("double") / 10000).alias("revenue"))
    )


LOCAL_SUPPLIER_SQL = """
SELECT n.n_name,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000
         AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = '{region_name}'
  AND o.o_orderdate >= TIMESTAMP '{date_from}'
  AND o.o_orderdate < TIMESTAMP '{date_to}'
GROUP BY 1
"""


def distinct_users_per_type(events: DataFrame) -> DataFrame:
    """Exact grouped count-distinct (the reference has only distinct-on-key,
    MBoxParser.java:79-80; this is the aggregate form)."""
    return events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


DISTINCT_USERS_SQL = """
SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
FROM events GROUP BY 1
"""
