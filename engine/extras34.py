"""Extras batch 34 module (r05 continuation): embedding isotropy audit
and Benford first-digit analysis.

SURVEY §2 families extended: §2.I (corpus-level embedding geometry: mean
cosine between ALL pairs computed EXACTLY from two aggregates via the
sum-vector identity — no pair enumeration at any scale), §2.D (Benford's
first-digit audit — the forensic screen for fabricated or truncated
numeric columns).

Determinism discipline (SURVEY §5.3): the isotropy identity is closed
arithmetic over per-dimension sums (rounded once); Benford digits come
from string arithmetic on the integer part; expected shares are fixed
log10 constants rounded identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.registry import query
from engine.tables import load


@query(
    "emb_isotropy_audit",
    oracle="""
    WITH comp AS (
      SELECT t.j, sum(CAST(embedding[CAST(t.j + 1 AS INT)] AS DOUBLE)) AS s
      FROM embeddings, UNNEST(range(0, len(embedding))) AS t(j)
      WHERE embedding IS NOT NULL AND len(embedding) = (SELECT len(embedding) FROM embeddings WHERE embedding IS NOT NULL GROUP BY 1 ORDER BY count(*) DESC, len(embedding) LIMIT 1)
      GROUP BY t.j
    ),
    norms AS (
      SELECT count(*) AS n,
             sum(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
               AS sum_sq
      FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) = (SELECT len(embedding) FROM embeddings WHERE embedding IS NOT NULL GROUP BY 1 ORDER BY count(*) DESC, len(embedding) LIMIT 1)
    ),
    agg AS (
      SELECT (SELECT sum(s * s) FROM comp) AS sum_vec_sq,
             n, sum_sq
      FROM norms
    )
    SELECT CAST(n AS BIGINT) AS n_vectors,
           round(sum_sq / n, 4) AS mean_sq_norm,
           round((sum_vec_sq - sum_sq) / (n * (n - 1.0)), 4)
             AS mean_pairwise_cos,
           ((sum_vec_sq - sum_sq) / (n * (n - 1.0)) > 0.05) AS anisotropic
    FROM agg
    """,
)
def emb_isotropy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding isotropy audit via the sum-vector identity: the mean
    dot product over ALL ordered pairs equals (‖Σx‖² − Σ‖x‖²)/(n(n−1)) —
    two aggregates replace n² pair enumerations, EXACTLY, at any corpus
    size. For L2-normalized vectors [DATA] mean dot = mean cosine; a
    markedly positive value means the embedding cloud points in a common
    direction (anisotropy — the known failure mode that inflates every
    cosine similarity and degrades retrieval; the flag trips above
    0.05).

    Plan: one explode→per-dimension-sum aggregate (dim-cardinality
    output) plus one scan for Σ‖x‖²; driver-side math on d+2 numbers.
    100 TB: this identity is WHY the audit is free at scale — the mean
    of a quadratic-size pair set from linear-time sums; the centering
    fix it motivates (subtract μ) is emb_pca_project's first step."""
    from engine.tables import vectors

    e = vectors(spark, sf_dir)
    comp = (
        e.select(F.posexplode("embedding").alias("j", "x"))
        .groupBy("j")
        .agg(F.sum(F.col("x").cast("double")).alias("s"))
    )
    sum_vec_sq = comp.agg(F.sum(F.col("s") * F.col("s")).alias("v")).first()["v"]
    # empty corpus: the per-dimension sum relation is empty and the sum is
    # NULL — 0.0 keeps the arithmetic below NULL-propagating exactly like
    # the oracle's (n=0 makes every downstream ratio NULL on both engines)
    sum_vec_sq = 0.0 if sum_vec_sq is None else sum_vec_sq
    self_dot = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norms = e.agg(
        F.count(F.lit(1)).alias("n"), F.sum(self_dot).alias("sum_sq")
    )
    # nullif: at n <= 1 there are no pairs — the mean pairwise cosine is
    # NULL on both engines (the oracle's x / 0.0 is NULL in DuckDB), not
    # an ANSI divide-by-zero error
    pairs = F.nullif(F.col("n") * (F.col("n") - 1.0), F.lit(0.0))
    return norms.select(
        F.col("n").cast("long").alias("n_vectors"),
        F.round(F.col("sum_sq") / F.col("n"), 4).alias("mean_sq_norm"),
        F.round(
            (F.lit(float(sum_vec_sq)) - F.col("sum_sq")) / pairs,
            4,
        ).alias("mean_pairwise_cos"),
        (
            (F.lit(float(sum_vec_sq)) - F.col("sum_sq")) / pairs > 0.05
        ).alias("anisotropic"),
    )


@query(
    "agg_benford_digit_audit",
    oracle="""
    WITH digits AS (
      SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                            1, 1) AS INT) AS d
      FROM orders WHERE o_totalprice >= 1
    ),
    obs AS (SELECT d, count(*) AS n FROM digits GROUP BY d),
    tot AS (SELECT sum(n) AS total FROM obs)
    SELECT o.d AS digit, o.n,
           round(CAST(o.n AS DOUBLE) / t.total, 4) AS observed_share,
           round(log10(1.0 + 1.0 / o.d), 4) AS benford_share,
           round(abs(CAST(o.n AS DOUBLE) / t.total - log10(1.0 + 1.0 / o.d)), 4)
             AS abs_deviation
    FROM obs o, tot t
    """,
)
def agg_benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit: the leading digit of every order total
    counted against Benford's law (P(d) = log10(1+1/d) — the
    distribution naturally-generated multi-scale amounts follow), with
    per-digit observed share, expected share, and absolute deviation.
    The forensic screen for fabricated, truncated, or threshold-gamed
    numeric columns; synthetic uniform-ish data shows large deviations —
    which is exactly what the audit is for (the test pins that the
    MACHINERY flags this corpus's non-Benford totals).

    Plan: leading digit is string arithmetic on the integer part (no
    float log in the hot path), one 9-row aggregate, expected shares
    are constants. 100 TB: one partial-agg pass; run per segment
    (GROUP BY supplier/region) to localize anomalies."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = F.substring(
        F.floor("o_totalprice").cast("long").cast("string"), 1, 1
    ).cast("int")
    obs = o.groupBy(d.alias("digit")).agg(F.count(F.lit(1)).alias("n"))
    tot = obs.agg(F.sum("n").alias("total"))
    benford = F.round(F.log10(1.0 + 1.0 / F.col("digit")), 4)
    share = F.col("n").cast("double") / F.col("total")
    return obs.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n",
        F.round(share, 4).alias("observed_share"),
        benford.alias("benford_share"),
        F.round(F.abs(share - F.log10(1.0 + 1.0 / F.col("digit"))), 4).alias(
            "abs_deviation"
        ),
    )
