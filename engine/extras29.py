"""Extras batch 29 module (r05 continuation): near-duplicate pair
explainability.

SURVEY §2 family extended: §2.I — the audit view over dedup decisions.
Pipelines that DELETE data need to show their work: for every near-dup
pair the kernel flags, emit the evidence a reviewer would ask for
(similarity, length ratio, containment, the planted shared-prefix
marker), so threshold tuning and spot audits read a table instead of
re-running ad-hoc comparisons.

Determinism discipline (SURVEY §5.3): all evidence columns are exact
integer/set arithmetic over the texts; ratios rounded once; pair identity
ordered (a_id < b_id) by the kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.registry import query
from engine.tables import load


@query(
    "dedup_pair_explain",
    oracle="""
    WITH sh AS (
      SELECT DISTINCT doc_id, substring(text, CAST(i AS INT), 5) AS g
      FROM documents, UNNEST(range(1, greatest(length(text) - 4, 1) + 1)) AS t(i)
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
      FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a_id, b_id, i, sa.n AS na, sb.n AS nb
      FROM inter
      JOIN sz sa ON sa.doc_id = a_id
      JOIN sz sb ON sb.doc_id = b_id
      WHERE 1.0 - i / CAST(sa.n + sb.n - i AS DOUBLE) <= 0.6
    )
    SELECT p.a_id, p.b_id,
           round(1.0 - p.i / CAST(p.na + p.nb - p.i AS DOUBLE), 4)
             AS jaccard_dist,
           round(CAST(least(length(da.text), length(db.text)) AS DOUBLE)
                 / greatest(length(da.text), length(db.text)), 4) AS len_ratio,
           round(p.i / CAST(least(p.na, p.nb) AS DOUBLE), 4) AS containment,
           (substring(da.text, 1, 40) = substring(db.text, 1, 40))
             AS prefix40_equal
    FROM pairs p
    JOIN documents da ON da.doc_id = p.a_id
    JOIN documents db ON db.doc_id = p.b_id
    """,
)
def dedup_pair_explain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pair explainability: every pair the MinHash kernel flags
    (dedup_near_minhash, shared kernel) joined back to its texts and
    annotated with the reviewer's evidence — exact shingle Jaccard
    distance, length ratio, shingle CONTAINMENT (intersection over the
    smaller set: high containment at moderate Jaccard = one doc embeds
    the other, a different dedup decision than two co-edited variants),
    and the 40-char shared-prefix marker this corpus's planted near-dups
    carry [DATA].

    Plan: the kernel's capped-bucket candidate generation bounds the
    pair set, and containment comes from the kernel's ``detail=True``
    columns — the EXACT (n_inter, n_a, n_b) its verify stage computes
    anyway — so this operator adds no join that touches a shingle set:
    the only additions are two hash joins against a (length, prefix40)
    projection of the corpus. (History: the first version re-shingled
    the corpus as string 5-grams — a second corpus-wide transform; the
    second reused the persisted ``hs`` sets but their honest in-memory
    size stats pushed the pair joins to sort-merge, shuffling every
    doc's hash set twice — measured +0.4 s at sf0.1 and a heavy-side
    shuffle at 100 TB. Pair-bounded arithmetic on already-computed ints
    beats both.) n_inter over xxhash64 sets equals the oracle's
    string-shingle arithmetic unless xxhash64 collides within a doc's
    ~1k-shingle set (≪1e-9; the kernel's jaccard_dist already relies on
    this). 100 TB: audit tables like this are the governance artifact
    dedup ships with — attrition manifests say HOW MANY
    (pipeline_dedup_cascade), this says WHY each."""
    from engine.llmops import minhash_near_pairs

    d = load(spark, sf_dir, "documents")
    pairs = minhash_near_pairs(d.select("doc_id", "text"), detail=True)
    meta = d.select(
        "doc_id",
        F.length("text").alias("len"),
        F.substring("text", 1, 40).alias("p40"),
    )
    j = pairs.join(
        meta.select(
            F.col("doc_id").alias("a_id"),
            F.col("len").alias("la"),
            F.col("p40").alias("pa"),
        ),
        "a_id",
    ).join(
        meta.select(
            F.col("doc_id").alias("b_id"),
            F.col("len").alias("lb"),
            F.col("p40").alias("pb"),
        ),
        "b_id",
    )
    # EXACT intersection per pair — deriving i back from the ROUNDED
    # distance would carry up to (na+nb)*5e-5 ≈ 0.1 shingles of error,
    # enough to flip containment's 4-dp rounding.
    return j.select(
        "a_id",
        "b_id",
        "jaccard_dist",
        F.round(
            F.least("la", "lb").cast("double") / F.greatest("la", "lb"), 4
        ).alias("len_ratio"),
        F.round(
            F.col("n_inter").cast("double")
            / F.least("n_a", "n_b").cast("double"),
            4,
        ).alias("containment"),
        (F.col("pa") == F.col("pb")).alias("prefix40_equal"),
    )
