"""Extras batch 26 module (r05 continuation): behavioral transition
matrix and chat-template rendering.

SURVEY §2 families extended: §2.E+§2.D (first-order Markov transition
counts/probabilities over per-user event sequences — the product-analytics
behavior-flow matrix), §2.I (chat-template rendering — the formatting leg
of an instruction-tuning pipeline: structured role turns, token budget,
truncation accounting).

Determinism discipline (SURVEY §5.3): transitions use lead over a
(ts, event_id) total order; probabilities are one rounded division of two
counts; the rendered template is a pure string function of the row, and
its JSON form is emitted as a string (rule 4: no struct columns in
output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from engine.registry import query
from engine.tables import load


@query(
    "agg_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_type
      FROM events
    ),
    cnt AS (
      SELECT from_type, to_type, count(*) AS n
      FROM seq WHERE to_type IS NOT NULL
      GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n,
           round(CAST(n AS DOUBLE)
                 / sum(n) OVER (PARTITION BY from_type), 4) AS p
    FROM cnt
    """,
)
def agg_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over user event sequences:
    for every (from_type → to_type) pair, the transition count and its
    row-normalized probability — the behavior-flow matrix product
    analytics reads ('after a click, 21% purchase'). Transitions pair
    each event with its successor via lead over the (ts, event_id) total
    order within user.

    Plan: one user-keyed shuffle for the lead window, then the pair
    count collapses to ≤|types|² rows with map-side partials; the
    probability window runs over that tiny matrix. 100 TB: same shape —
    the matrix is type-cardinality-bounded; higher-order chains just
    widen the key (lead(2), lead(3)) without changing the plan."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    cnt = seq.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    wp = Window.partitionBy("from_type")
    return cnt.withColumn(
        "p", F.round(F.col("n").cast("double") / F.sum("n").over(wp), 4)
    )


@query(
    "text_chat_template_render",
    oracle="""
    WITH base AS (
      SELECT doc_id, lang, source, text,
             len(string_split(text, ' ')) AS n_words
      FROM documents
    ),
    rendered AS (
      SELECT doc_id,
             '<|system|>You are a concise assistant.<|end|>'
               || '<|user|>Summarize the following ' || lang
               || ' document from ' || source || '.<|end|>'
               || '<|assistant|>'
               || CASE WHEN n_words > 64
                       THEN array_to_string((string_split(text, ' '))[1:64], ' ')
                       ELSE text END
               || '<|end|>' AS prompt,
             (n_words > 64) AS truncated,
             least(n_words, 64) + 14 AS approx_tokens
      FROM base
    )
    SELECT doc_id, md5(prompt) AS prompt_md5,
           CAST(len(prompt) AS BIGINT) AS prompt_chars,
           truncated,
           CAST(approx_tokens AS BIGINT) AS approx_tokens
    FROM rendered
    """,
)
def text_chat_template_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chat-template rendering — the formatting leg of an
    instruction-tuning pipeline: each document becomes a three-turn
    conversation (system / user / assistant) in a ChatML-style tag
    format, with the assistant turn budget-truncated at 64 words and a
    per-row truncation flag + approximate token count (word budget + the
    template's fixed overhead). Output carries the rendered prompt's md5
    and length, not the string itself (keeps the compare compact; the
    hash pins every byte of the template).

    Plan: pure row-local string assembly in codegen — zero shuffles,
    scan-speed, exactly like the quality-rule and HTML-strip passes it
    would pipeline with. 100 TB: rendering is never the bottleneck;
    budget accounting here (flag + estimate) is what lets the downstream
    packer (text_pack_sequences) bin-pack without re-tokenizing."""
    d = load(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n_words = F.size(words)
    body = F.when(
        n_words > 64, F.array_join(F.slice(words, 1, 64), " ")
    ).otherwise(F.col("text"))
    prompt = F.concat(
        F.lit("<|system|>You are a concise assistant.<|end|>"),
        F.lit("<|user|>Summarize the following "),
        F.col("lang"),
        F.lit(" document from "),
        F.col("source"),
        F.lit(".<|end|>"),
        F.lit("<|assistant|>"),
        body,
        F.lit("<|end|>"),
    )
    return d.select(
        "doc_id",
        F.md5(prompt).alias("prompt_md5"),
        F.length(prompt).cast("long").alias("prompt_chars"),
        (n_words > 64).alias("truncated"),
        (F.least(n_words, F.lit(64)) + 14).cast("long").alias("approx_tokens"),
    )
