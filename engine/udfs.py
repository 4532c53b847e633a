"""UDF / UDAF / UDTF surface: SURVEY.md §2.K.

Four escape hatches out of pure Catalyst, ordered fastest→slowest:
vectorized pandas_udf (Arrow batches) > grouped applyInPandas (Arrow, one
group per call) > Python UDTF > row-at-a-time Python UDF. Each key's logic is
also expressible in plain SQL so the DuckDB oracle can hash-check it — the
point is proving the Python boundary, not the math.

Scale notes (100 TB): the hot path of every other engine operator is
JVM-side; these Python boundaries exist for genuinely custom logic only.
Arrow batch size rides spark.sql.execution.arrow.maxRecordsPerBatch (10k
default); grouped UDAFs shuffle once on the group key and stream one Arrow
batch per group through a pooled Python worker — no driver involvement.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from engine.registry import query
from engine.tables import load


@query(
    "udf_python_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 2) AS charged
    FROM lineitem WHERE l_orderkey < 1000
    """,
)
def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF computing the charged price.

    Deliberately the slow path (one Python call per row, pickled rows) — the
    pandas_udf twin below is the production shape; this key proves plain UDF
    registration/execution works."""
    li = load(spark, sf_dir, "lineitem")

    @F.udf(T.DoubleType())
    def charged(price: float, disc: float, tax: float) -> float:
        return price * (1 - disc) * (1 + tax)

    # Round JVM-side: Python round() is half-even, which diverges from
    # Spark/DuckDB half-up on .xx5 boundaries (SURVEY §5.3 rule 6).
    return li.filter(F.col("l_orderkey") < 1000).select(
        "l_orderkey",
        "l_linenumber",
        F.round(charged("l_extendedprice", "l_discount", "l_tax"), 2).alias("charged"),
    )


@query(
    "udf_pandas_vectorized",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 2) AS charged
    FROM lineitem WHERE l_orderkey < 1000
    """,
)
def udf_pandas_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same logic as udf_python_scalar through an Arrow-vectorized pandas_udf:
    one Python call per ~10k-row Arrow batch, numpy math inside — the 10-100×
    faster shape (SURVEY §2.K)."""
    li = load(spark, sf_dir, "lineitem")

    @F.pandas_udf(T.DoubleType())
    def charged(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return price * (1 - disc) * (1 + tax)

    return li.filter(F.col("l_orderkey") < 1000).select(
        "l_orderkey",
        "l_linenumber",
        F.round(charged("l_extendedprice", "l_discount", "l_tax"), 2).alias("charged"),
    )


def _slope(pdf: pd.DataFrame) -> pd.DataFrame:
    """Population least-squares slope of extendedprice on quantity."""
    x = pdf["l_quantity"].to_numpy()
    y = pdf["l_extendedprice"].to_numpy()
    xm, ym = x.mean(), y.mean()
    denom = ((x - xm) ** 2).mean()
    # Zero-variance group -> NULL, matching DuckDB/Spark regr_slope (round(None)
    # would raise TypeError and kill the whole query).
    slope = round(float(((x - xm) * (y - ym)).mean() / denom), 4) if denom else None
    return pd.DataFrame(
        {"l_returnflag": [pdf["l_returnflag"].iloc[0]], "slope": [slope]}
    )


@query(
    "udaf_pandas_group",
    oracle="""
    SELECT l_returnflag, round(regr_slope(l_extendedprice, l_quantity), 4) AS slope
    FROM lineitem GROUP BY l_returnflag
    """,
)
def udaf_pandas_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map UDAF: per-returnflag regression slope via applyInPandas.

    One shuffle on the group key, then each group arrives as a single pandas
    frame in a Python worker (Arrow transfer). Groups here are few and huge —
    at 100 TB this pattern needs bounded per-group size (the 3 returnflag
    groups would each be ~33 TB: real deployments sub-key or sample; noted
    per SURVEY §7.3 rule 8)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.select("l_returnflag", "l_quantity", "l_extendedprice")
        .groupBy("l_returnflag")
        .applyInPandas(_slope, "l_returnflag string, slope double")
    )


@query(
    "udtf_python",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS token,
           generate_subscripts(string_split(text, ' '), 1) AS pos
    FROM documents WHERE doc_id < 50
    """,
)
def udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4): explode each doc into (doc_id, token, pos) rows
    via a LATERAL table function — the user-defined analogue of explode with
    ordinality."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, token string, pos int")
    class Tokenize:
        def eval(self, doc_id: int, text: str):
            if text is None:  # NULL text: no tokens, like unnest(NULL)
                return
            for i, tok in enumerate(text.split(" ")):
                yield doc_id, tok, i + 1

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    d.createOrReplaceTempView("sg_udtf_docs")
    spark.udtf.register("sg_tokenize", Tokenize)
    return spark.sql(
        "SELECT t.doc_id, t.token, t.pos "
        "FROM sg_udtf_docs, LATERAL sg_tokenize(doc_id, text) t"
    )


@query(
    "udf_python_arrow_scalar",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
    FROM lineitem GROUP BY 1 ORDER BY 1
    """,
)
def udf_python_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python scalar UDF (udf(..., useArrow=True), Spark
    3.5+/4): the third point of the scalar-UDF matrix beside the pickled
    row-at-a-time udf_python_scalar and the pandas_udf batch variant —
    same Python lambda, Arrow columnar transport, no pandas Series
    wrapper. Per-element Python math on IEEE doubles is bit-identical to
    the JVM expression, so the aggregate hash-matches the pure-SQL oracle.

    100 TB: still the slow path (per-element Python), but Arrow transport
    removes pickle overhead — the right choice when a scalar UDF is
    unavoidable and the logic resists vectorization."""
    disc = F.udf(lambda p, d: p * (1.0 - d), "double", useArrow=True)
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(
                F.sum(disc(F.col("l_extendedprice"), F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("l_returnflag")
    )
