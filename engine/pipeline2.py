"""Capstone #3 (r05 continuation): the pretraining-mix manifest — the full
curation chain [eval split-out → quality gate → exact dedup keeper →
n-gram decontamination → temperature mix] composed as ONE fused plan whose
output is the per-(lang, source) data manifest a training run consumes:
kept docs, kept tokens, temperature-mix rate, and the resulting token
budget.

Every stage re-states a contract already proven by its standalone key
(text_quality_logreg, dedup_cross_source's keeper rule, text_decontaminate's
shingle overlap, sample_temperature's n^0.5 mix), so the capstone verifies
COMPOSITION: filters chain before any shuffle, the dedup window and the
manifest aggregate reuse one partitioning each, and the eval shingle set
stays broadcast-sized.

Determinism discipline (SURVEY §5.3): the quality margin is raw IEEE with
identical association; sqrt is IEEE-exact; the only order-sensitive sums are
the ~20-term weight total (rounded to 6 before use) and integer token
counts; the budget multiplies a pre-rounded rate by an integer then floors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from engine.registry import query
from engine.tables import load

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")


@query(
    "pipeline_pretrain_mix",
    oracle="""
    WITH feats AS (
      SELECT doc_id, lang, source, text,
             4.0 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                    / CAST(len(string_split(text, ' ')) AS DOUBLE))
           + 5.0 * (CAST(len(list_filter(string_split(text, ' '),
                      x -> x IN ('the','a','of','and','to','in','is','on','for','with')))
                    AS DOUBLE)
                    / CAST(len(string_split(text, ' ')) AS DOUBLE))
           + 0.2 * (CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
                    / CAST(len(string_split(text, ' ')) AS DOUBLE))
           + 0.01 * CAST(len(string_split(text, ' ')) AS DOUBLE)
           - 3.75 AS margin
      FROM documents WHERE doc_id % 11 <> 0
    ),
    q AS (SELECT * FROM feats WHERE margin > 0),
    fps AS (
      SELECT *, md5(array_to_string(string_split(text, ' ')[1:16], ' ')) AS fp
      FROM q
    ),
    dd AS (
      SELECT * FROM (
        SELECT *, min(doc_id) OVER (PARTITION BY fp) AS keeper FROM fps
      ) WHERE doc_id = keeper
    ),
    evsh AS (
      SELECT DISTINCT array_to_string(string_split(text, ' ')[i:i+4], ' ') AS sh
      FROM documents, unnest(generate_series(1, len(string_split(text, ' ')) - 4)) AS g(i)
      WHERE doc_id % 11 = 0
    ),
    contaminated AS (
      SELECT DISTINCT d.doc_id
      FROM (SELECT doc_id,
                   array_to_string(string_split(text, ' ')[i:i+4], ' ') AS sh
            FROM dd, unnest(generate_series(1, len(string_split(text, ' ')) - 4)) AS g(i)) d
      JOIN evsh ON d.sh = evsh.sh
    ),
    clean AS (
      SELECT dd.* FROM dd LEFT JOIN contaminated c ON dd.doc_id = c.doc_id
      WHERE c.doc_id IS NULL
    ),
    manifest AS (
      SELECT lang, source, count(*) AS n_kept,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tok_kept,
             sqrt(CAST(count(*) AS DOUBLE)) AS w
      FROM clean GROUP BY lang, source
    ),
    tot AS (SELECT sum(w) AS sum_w, sum(tok_kept) AS total_tok FROM manifest)
    SELECT m.lang, m.source, m.n_kept, m.tok_kept,
           round(m.w / t.sum_w, 6) AS mix_rate,
           CAST(floor(round(m.w / t.sum_w, 6) * t.total_tok) AS BIGINT)
             AS tok_budget
    FROM manifest m CROSS JOIN tot t
    """,
)
def pipeline_pretrain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAPSTONE #3: the pretraining data manifest as one fused plan —

      eval split-out (doc_id % 11 = 0 held out)
        → frozen-model quality gate (margin > 0, zero-shuffle map)
        → exact dedup, first-occurrence keeper (one fp-window shuffle)
        → 5-token-shingle decontamination vs the eval set (explode +
          broadcast-sized eval join + anti join)
        → per-(lang, source) manifest with n^0.5 temperature-mix rates
          and floor(rate × total_tokens) budgets.

    100 TB plan audit: the quality filter and fingerprint are row-local
    and run BEFORE the first shuffle, so every survivor crosses the wire
    once; the dedup keeper is a window min on fp (no self-join); the eval
    shingle set derives from a fixed-size benchmark suite → always
    broadcastable; the manifest aggregate collapses to (lang × source)
    cells with the 2-scalar totals as a one-row cross join. No stage
    re-reads the corpus: documents is scanned twice total (corpus side +
    eval side), both column-pruned."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tok = F.size(toks).cast("double")
    margin = (
        F.lit(4.0) * (F.size(F.array_distinct(toks)).cast("double") / n_tok)
        + F.lit(5.0)
        * (
            F.size(F.filter(toks, lambda x: x.isin(*_STOPWORDS))).cast("double")
            / n_tok
        )
        + F.lit(0.2)
        * ((F.length("text") - (F.size(toks) - 1)).cast("double") / n_tok)
        + F.lit(0.01) * n_tok
        - F.lit(3.75)
    )
    corpus = d.filter(F.col("doc_id") % 11 != 0)
    q = corpus.withColumn("margin", margin).filter(F.col("margin") > 0)
    fp = F.md5(F.concat_ws(" ", F.slice(F.split("text", " "), 1, 16)))
    fps = q.withColumn("fp", fp)
    dd = (
        fps.withColumn("keeper", F.min("doc_id").over(Window.partitionBy("fp")))
        .filter(F.col("doc_id") == F.col("keeper"))
    )
    # CASE guard, not greatest(): sequence(1, 0) infers step -1 and yields
    # [1, 0] (the extras5 trap) — short docs must map to an empty array.
    # Tokenize once into `t` per consumer (r06): Catalyst does not CSE the
    # repeated split(text) across the lambda scope, so the old inline form
    # re-split every row three times inside the shingle fan-out.
    # shingle tokens via O(1) access, not slice() — slice inside a lambda
    # runs interpreted and copies the whole token array per shingle (r13)
    shingle_expr = F.expr(
        "CASE WHEN size(t) >= 5 THEN "
        "transform(sequence(1, size(t) - 4), "
        "i -> concat_ws(' ', t[i-1], t[i], t[i+1], t[i+2], t[i+3])) "
        "ELSE array() END"
    )
    evsh = (
        d.filter(F.col("doc_id") % 11 == 0)
        .select(F.split("text", " ").alias("t"))
        .select(F.explode(shingle_expr).alias("sh"))
        .distinct()
    )
    doc_sh = dd.select(
        "doc_id", F.split("text", " ").alias("t")
    ).select("doc_id", F.explode(shingle_expr).alias("sh"))
    contaminated = (
        doc_sh.join(F.broadcast(evsh), "sh").select("doc_id").distinct()
    )
    clean = dd.join(contaminated, "doc_id", "left_anti")
    manifest = clean.groupBy("lang", "source").agg(
        F.count("*").alias("n_kept"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("tok_kept"),
        F.sqrt(F.count("*").cast("double")).alias("w"),
    )
    tot = manifest.agg(
        F.sum("w").alias("sum_w"), F.sum("tok_kept").alias("total_tok")
    )
    rate = F.round(F.col("w") / F.col("sum_w"), 6)
    return (
        manifest.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "source",
            "n_kept",
            "tok_kept",
            rate.alias("mix_rate"),
            F.floor(rate * F.col("total_tok")).cast("bigint").alias("tok_budget"),
        )
    )
