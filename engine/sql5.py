"""Spark 4 SQL-surface batch 2 (r05, registered after the attestation
window): SQL-defined scalar functions and session variables — the two
remaining declarative-SQL features a SQL-first user would reach for before
writing any Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (parity with sibling modules)

from engine.registry import query
from engine.tables import load, sftag


@query(
    "sql_udf_sql_function",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
           round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2)
             AS charged
    FROM lineitem GROUP BY 1 ORDER BY 1
    """,
)
def sql_udf_sql_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar functions (CREATE TEMPORARY FUNCTION ... RETURN
    expr, Spark 3.5+/4): discounted price and full charge as named,
    reusable SQL UDFs applied in an aggregate query. Unlike Python UDFs,
    SQL UDFs inline into the plan at analysis time — the physical plan is
    IDENTICAL to writing the expression by hand (whole-stage codegen, no
    serialization boundary), which is exactly why they are the first
    resort for shared business logic. The oracle is the inlined form;
    hash equality proves the inlining is semantically invisible.

    100 TB: zero cost over the raw expression — same codegen, same
    pushdown; function resolution happens once on the driver."""
    tag = sftag(sf_dir)
    load(spark, sf_dir, "lineitem").createOrReplaceTempView(f"sg_li_udf_{tag}")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION sg_disc_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1.0 - d)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION sg_charge(p DOUBLE, d DOUBLE, t DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1.0 - d) * (1.0 + t)"
    )
    return spark.sql(
        f"""
        SELECT l_returnflag,
               round(sum(sg_disc_price(l_extendedprice, l_discount)), 2)
                 AS revenue,
               round(sum(sg_charge(l_extendedprice, l_discount, l_tax)), 2)
                 AS charged
        FROM sg_li_udf_{tag} GROUP BY 1 ORDER BY 1
        """
    )


@query(
    "sql_session_variable",
    oracle="""
    SELECT o_orderpriority, count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    WHERE o_totalprice >= 150000.0 AND o_orderpriority <> '3-MEDIUM'
    GROUP BY 1 ORDER BY 1
    """,
)
def sql_session_variable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session variables (DECLARE / SET VAR, Spark 4): a threshold and an
    excluded category declared once and referenced by name in the query —
    the SQL-script parameterization idiom (the procedural sibling of
    sql_parameterized_exec's bind markers). Variables resolve to literals
    at analysis time, so the plan (and pushdown) is identical to inlining
    them; the oracle is the inlined query.

    100 TB: like SQL UDFs, free — the variable reference is constant-
    folded before optimization, so the filter still pushes to the scan."""
    tag = sftag(sf_dir)
    load(spark, sf_dir, "orders").createOrReplaceTempView(f"sg_ord_var_{tag}")
    spark.sql(
        "DECLARE OR REPLACE VARIABLE sg_min_total DOUBLE DEFAULT 100000.0"
    )
    spark.sql("SET VAR sg_min_total = 150000.0")
    spark.sql(
        "DECLARE OR REPLACE VARIABLE sg_skip_prio STRING DEFAULT '3-MEDIUM'"
    )
    return spark.sql(
        f"""
        SELECT o_orderpriority, count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM sg_ord_var_{tag}
        WHERE o_totalprice >= sg_min_total
          AND o_orderpriority <> sg_skip_prio
        GROUP BY 1 ORDER BY 1
        """
    )
