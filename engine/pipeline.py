"""Round-4 capstone: the composed pretraining-corpus pipeline (SURVEY §2
extension; the reference at /root/reference is an empty directory — SURVEY
§2 is the operative spec).

``pipeline_corpus_datasheet`` chains the training-data stages the
individual keys demonstrate in isolation — prefix-fingerprint dedup,
quality gating, eval-set decontamination — into ONE DataFrame plan and
emits the per-language "datasheet" every corpus release ships with:
documents surviving each stage plus the final token budget. The point is
COMPOSITION: every stage is a column or a semi-join over the same scan,
so the whole pipeline is one job, not four.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from engine.registry import query
from engine.tables import load

_EVAL_MOD = 97  # doc_id % 97 == 0 → held-out eval split (~1%)
_MIN_TOKENS = 10
_MIN_DISTINCT_RATIO = 0.32
_SHINGLE = 5  # decontamination n-gram width (tokens)


@query(
    "pipeline_corpus_datasheet",
    oracle=f"""
    WITH train AS (
      SELECT doc_id, lang, text, string_split(text, ' ') AS ts
      FROM documents WHERE doc_id % {_EVAL_MOD} <> 0
    ),
    eval_sh AS (
      SELECT DISTINCT ts[CAST(i AS INT)] || ' ' || ts[CAST(i AS INT) + 1] || ' '
             || ts[CAST(i AS INT) + 2] || ' ' || ts[CAST(i AS INT) + 3] || ' '
             || ts[CAST(i AS INT) + 4] AS sh
      FROM (SELECT string_split(text, ' ') AS ts FROM documents
            WHERE doc_id % {_EVAL_MOD} = 0),
           UNNEST(range(1, greatest(len(ts) - {_SHINGLE - 2}, 1))) AS t(i)
    ),
    flagged AS (
      SELECT doc_id, lang,
             len(ts) AS n_tokens,
             (doc_id <> min(doc_id) OVER (PARTITION BY substring(text, 1, 40)))
               AS is_dup,
             (len(ts) >= {_MIN_TOKENS}
              AND len(list_distinct(ts)) >= {_MIN_DISTINCT_RATIO} * len(ts))
               AS quality_ok,
             EXISTS (
               SELECT 1 FROM eval_sh e,
                 UNNEST(range(1, greatest(len(ts) - {_SHINGLE - 2}, 1))) AS t(i)
               WHERE ts[CAST(i AS INT)] || ' ' || ts[CAST(i AS INT) + 1] || ' '
                     || ts[CAST(i AS INT) + 2] || ' ' || ts[CAST(i AS INT) + 3]
                     || ' ' || ts[CAST(i AS INT) + 4] = e.sh
             ) AS contaminated
      FROM train
    )
    SELECT lang,
           count(*) AS n_raw,
           CAST(sum(CASE WHEN NOT is_dup THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unique,
           CAST(sum(CASE WHEN NOT is_dup AND quality_ok THEN 1 ELSE 0 END)
                AS BIGINT) AS n_quality,
           CAST(sum(CASE WHEN NOT is_dup AND quality_ok AND NOT contaminated
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
           CAST(sum(CASE WHEN NOT is_dup AND quality_ok AND NOT contaminated
                         THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_clean
    FROM flagged GROUP BY lang ORDER BY lang
    """,
)
def pipeline_corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed pretraining-corpus pipeline as one plan, reported as a
    per-language datasheet with per-stage survival counts:

    1. **split** — doc_id % 97 == 0 is the held-out eval set; the rest is
       the training candidate pool (n_raw).
    2. **dedup** — prefix-fingerprint (first 40 chars) keep-min-doc_id, the
       cheap first-pass dedup that catches the corpus's planted
       shared-prefix near-dups before any MinHash spend (n_unique).
    3. **quality gate** — ≥10 tokens and ≥32% distinct-token ratio, the
       length/repetition heuristics of text_quality_score (n_quality).
    4. **decontamination** — drop any doc sharing a 5-token shingle with
       the eval split (text_decontaminate's semantics), via a left_semi
       mark-join against the broadcast eval shingle set (n_clean,
       tokens_clean = the final token budget).

    All stages are flags over ONE documents scan (window + expressions +
    one broadcast semi-join), aggregated once — no intermediate
    materialization.

    100 TB: stage order is the cost order — the 40-char window dedup and
    token arithmetic are near-free and shrink the doc set before the
    shingle explode (the only expensive step); the eval side is tiny by
    construction (~1%) so its distinct shingle set broadcasts. The
    per-stage counters come free from conditional aggregation, which is
    exactly how a production run reports stage losses without running
    four jobs."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text", F.split("text", " ").alias("ts")
    )
    train = d.filter(F.col("doc_id") % _EVAL_MOD != 0)
    ev = d.filter(F.col("doc_id") % _EVAL_MOD == 0)

    def shingles(col: str = "ts") -> F.Column:
        # empty-array guard: sequence(1, 0) infers step -1 and yields
        # [1, 0] (then element i=0 is out of bounds) — a <SHINGLE-token
        # doc must produce NO shingles, matching the oracle's empty range.
        # Tokens via O(1) element_at, not slice() — slice inside a lambda
        # runs interpreted and copies the whole array per shingle (r13
        # long-doc fix); i..i+SHINGLE-1 are in bounds under the gate.
        return F.array_distinct(
            F.transform(
                F.when(
                    F.size(col) >= _SHINGLE,
                    F.sequence(F.lit(1), F.size(col) - (_SHINGLE - 1)),
                ).otherwise(F.array().cast("array<int>")),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(F.col(col), i + j) for j in range(_SHINGLE)]
                ),
            )
        )

    eval_sh = ev.select(F.explode(shingles()).alias("sh")).distinct()
    # flags FIRST: the near-free dedup window and token arithmetic shrink
    # the pool before the shingle explode — only dedup+quality SURVIVORS
    # pay the one expensive stage (dropped docs' contamination flag is
    # never consumed downstream, so skipping them is semantics-neutral)
    w = Window.partitionBy(F.substring("text", 1, 40))
    base = train.select(
        "doc_id",
        "lang",
        "ts",
        F.size("ts").alias("n_tokens"),
        (F.col("doc_id") != F.min("doc_id").over(w)).alias("is_dup"),
        (
            (F.size("ts") >= _MIN_TOKENS)
            & (
                F.size(F.array_distinct("ts"))
                >= _MIN_DISTINCT_RATIO * F.size("ts")
            )
        ).alias("quality_ok"),
    )
    contaminated = (
        base.filter(~F.col("is_dup") & F.col("quality_ok"))
        .select("doc_id", F.explode(shingles()).alias("sh"))
        .join(F.broadcast(eval_sh), "sh", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("contaminated", F.lit(True))
    )
    flagged = (
        base.drop("ts")
        .join(contaminated, "doc_id", "left")
        .withColumn("contaminated", F.coalesce("contaminated", F.lit(False)))
    )
    keep = ~F.col("is_dup") & F.col("quality_ok") & ~F.col("contaminated")
    return (
        flagged.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_raw"),
            F.sum((~F.col("is_dup")).cast("long")).alias("n_unique"),
            F.sum((~F.col("is_dup") & F.col("quality_ok")).cast("long")).alias(
                "n_quality"
            ),
            F.sum(keep.cast("long")).alias("n_clean"),
            F.sum(F.when(keep, F.col("n_tokens")).otherwise(0)).alias(
                "tokens_clean"
            ),
        )
        .orderBy("lang")
    )
