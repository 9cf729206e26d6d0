"""SQL frontend (SURVEY.md §3.3): the reference's Table API layer *is*
Catalyst here -- every relational operator is equally expressible as a
``spark.sql`` string over registered views. This module registers the
testdata tables and carries Spark-SQL texts for representative queries;
tests assert they produce byte-identical results to the DataFrame builders
(same logical plan, two frontends).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schemas import TESTDATA_TABLES
from ..sources import load_table


def register_tables(spark: SparkSession, sf_dir: str, prefix: str = "") -> list[str]:
    """Register every testdata table as `{prefix}{name}` temp views."""
    names = []
    for t in TESTDATA_TABLES:
        try:
            load_table(spark, t, sf_dir).createOrReplaceTempView(f"{prefix}{t}")
            names.append(f"{prefix}{t}")
        except Exception:  # table absent at this sf -- fine
            continue
    return names


# Spark SQL texts (TIMESTAMP_NTZ literals; otherwise ANSI).
PRICING_SUMMARY_SPARK_SQL = """
WITH li AS (
  SELECT l_returnflag, l_linestatus,
         CAST(round(l_quantity * 100) AS BIGINT) AS qty_c,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
         CAST(round(l_discount * 100) AS BIGINT) AS disc_c,
         CAST(round(l_tax * 100) AS BIGINT) AS tax_c
  FROM lineitem WHERE l_shipdate <= TIMESTAMP_NTZ '{cutoff}'
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

MEMBER_OTM_SPARK_SQL = """
WITH counts AS (
  SELECT substr(time, 1, 7) AS month,
         regexp_extract(sender, '<([^<>]*)>\\\\s*$', 1) AS sender,
         count(*) AS cnt
  FROM mails
  WHERE regexp_extract(sender, '<([^<>]*)>\\\\s*$', 1)
        NOT IN ('git@git.apache.org', 'jira@apache.org', 'no-reply@apache.org')
  GROUP BY 1, 2
)
SELECT month, sender FROM (
  SELECT month, sender, cnt, max(cnt) OVER (PARTITION BY month) AS mx FROM counts
) WHERE cnt = mx
"""


def pricing_summary_via_sql(
    spark: SparkSession, sf_dir: str, cutoff: str = "1998-09-02 00:00:00"
) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(PRICING_SUMMARY_SPARK_SQL.format(cutoff=cutoff))


def member_otm_via_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import mails as mails_plan

    mails_plan.mails_view(spark, sf_dir).createOrReplaceTempView("mails")
    return spark.sql(MEMBER_OTM_SPARK_SQL)
