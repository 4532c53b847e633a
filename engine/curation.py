"""Training-corpus curation operators (r03 batch): the data-engineering ops
an LLM training pipeline runs between raw corpus and tokenizer that were not
yet covered by engine.llmops/textops/trainext/pipeops — eval-set
decontamination, fixed-context sequence packing, domain-mix resampling, and
streaming enrichment against a static dimension.

All four are SURVEY §2.I/L-family extensions (the reference corpus at
/root/reference is an empty directory — SURVEY.md §2 is the operative spec,
as established in §0): each key has a full DuckDB oracle except none — all
four are SQL-expressible and FULL-checked.

Scale notes (100 TB) are per-operator; the common theme is that every one is
a broadcast join or a per-group window — no global sort, no driver
materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from engine.registry import query
from engine.tables import load


@query(
    "text_decontaminate",
    oracle="""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (SELECT doc_id, array_to_string(t[i:i+4], ' ') AS sh
           FROM tok, unnest(generate_series(1, len(t) - 4)) AS g(i)),
    ev AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 11 = 0)
    SELECT s.doc_id, count(DISTINCT s.sh) AS n_shared
    FROM sh s JOIN ev USING (sh)
    WHERE s.doc_id % 11 <> 0
    GROUP BY 1
    """,
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: flag training docs sharing any 5-token
    shingle with a held-out eval set (docs with doc_id % 11 == 0 stand in
    for the benchmark suite). Output = contaminated doc → count of distinct
    shared shingles; dropping those rows from the corpus is the standard
    n-gram-overlap decontamination pass (GPT-3/PaLM-style window, shortened
    to 5 tokens because the synthetic corpus' 31-token vocabulary makes
    longer exact runs vanishingly rare — mod 11 / k=5 is the smallest
    setting that yields real hits at every SF: 7 / 6 / 222 contaminated
    docs at sf0.001/0.01/0.1, i.e. non-vacuous on all driver checks).

    Shape: per-doc shingle transform (zero shuffle) → explode → broadcast
    semi-style join against the DISTINCT eval shingles → one hash agg.
    100 TB: the eval set is fixed-size (benchmarks, not corpus-scale), so
    its distinct-shingle set always broadcasts; corpus-side work is one
    explode + one shuffle on doc_id for the count-distinct — linear, and
    the shingle strings can be xxhash64'd to int64 before the shuffle when
    the corpus vocabulary is real text (kept as strings here for the
    cross-engine oracle)."""
    d = load(spark, sf_dir, "documents")
    t = F.split("text", " ")
    # sequence(1, n) with n < 1 would generate a DESCENDING range in Spark
    # (step defaults to -1), so gate short docs to an empty shingle array.
    n_sh = F.size(t) - 4
    shingles = F.when(
        n_sh >= 1,
        F.transform(
            F.sequence(F.lit(1), n_sh),
            lambda i: F.array_join(F.slice(t, i, 5), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    sh = d.select("doc_id", F.explode(shingles).alias("sh"))
    ev = sh.filter(F.col("doc_id") % 11 == 0).select("sh").distinct()
    return (
        sh.filter(F.col("doc_id") % 11 != 0)
        .join(F.broadcast(ev), "sh")
        .groupBy("doc_id")
        .agg(F.countDistinct("sh").alias("n_shared"))
    )


@query(
    "text_pack_sequences",
    oracle="""
    WITH t AS (SELECT doc_id, source,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
               FROM documents),
    w AS (SELECT doc_id, source, n_tokens,
                 CAST(coalesce(sum(n_tokens) OVER (
                        PARTITION BY source ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS BIGINT) AS cum_before
          FROM t)
    SELECT doc_id, source, n_tokens,
           CAST(cum_before // 512 AS BIGINT) AS seq_id,
           CAST(cum_before % 512 AS BIGINT) AS offset_in_seq
    FROM w
    """,
)
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-context sequence packing (concat-and-chunk): docs are laid out
    in deterministic order within each source shard, and each doc gets the
    512-token training sequence id + offset where its first token lands —
    the standard packing bookkeeping a tokenizer/dataloader needs (docs may
    straddle a boundary; offset_in_seq is where the doc STARTS).

    Shape: one running-sum window per source partition — no global sort.
    100 TB: packing is embarrassingly parallel across shards precisely
    because the layout is per-source (PARTITION BY source); a single global
    document order would serialize the cumsum. Source shards stream through
    the window operator with O(1) state (running sum), so executor memory
    is flat regardless of shard size."""
    d = load(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " ")).cast("long")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = d.select("doc_id", "source", n_tok.alias("n_tokens"))
    cum = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    return t.select(
        "doc_id",
        "source",
        "n_tokens",
        F.floor(cum / 512).cast("long").alias("seq_id"),
        (cum % 512).cast("long").alias("offset_in_seq"),
    )


@query(
    "sample_source_mix",
    oracle="""
    WITH h AS (SELECT doc_id, source,
                      (doc_id * 2654435761) % 2147483647 AS hk
               FROM documents),
    r AS (SELECT doc_id, source, hk,
                 row_number() OVER (PARTITION BY source ORDER BY hk, doc_id)
                   AS rn,
                 count(*) OVER (PARTITION BY source) AS cnt
          FROM h)
    SELECT doc_id, source FROM r
    WHERE rn <= CAST(ceil(cnt * 0.4) AS BIGINT)
    """,
)
def sample_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mix resampling: deterministically downsample every source to a
    40% rate by keeping the lowest multiplicative-hash ranks — the
    domain-weighting step of corpus mixing (each source's weight is a rate;
    hash-rank selection makes the subset stable across runs and engines,
    unlike rand()-based sampling). The hash is Knuth's 2654435761
    multiplicative scheme computed identically in both engines (xxhash64
    has no DuckDB twin).

    Shape: one window per source partition (rank + count in the same pass).
    100 TB: per-source rank selection is a WindowGroupLimit-class pattern —
    but with a RATE rather than a constant k the limit isn't known until
    the partition count is; at scale precompute per-source counts (tiny
    agg, broadcast back) and filter hk against the rate-quantile instead,
    which drops the sort entirely."""
    d = load(spark, sf_dir, "documents")
    hk = (F.col("doc_id") * F.lit(2654435761)) % F.lit(2147483647)
    w = Window.partitionBy("source").orderBy("hk", "doc_id")
    wc = Window.partitionBy("source")
    return (
        d.select("doc_id", "source", hk.alias("hk"))
        .withColumn("rn", F.row_number().over(w))
        .withColumn("cnt", F.count("*").over(wc))
        .filter(F.col("rn") <= F.ceil(F.col("cnt") * 0.4).cast("long"))
        .select("doc_id", "source")
    )


@query(
    "stream_static_enrich",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_events, round(sum(value), 2) AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1
    """,
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the events stream joined to the static
    customer dimension (broadcast — no state, unlike stream-stream joins),
    then aggregated per segment. The missing sibling of stream_stream_join
    in §2.J: dimension enrichment is the most common streaming join in
    practice and needs NO watermark, because the static side is re-read per
    micro-batch, not buffered.

    FULL-oracle for the same reason as the windowed streaming keys: the
    corpus is one file ⇒ one AvailableNow micro-batch ⇒ the completed
    memory-sink table equals the batch join+agg bit-for-bit.
    100 TB/day: the static side broadcasts per batch (refreshable dim); the
    aggregation state is O(segments). Complete output mode is fine because
    the result cardinality IS the segment count."""
    from engine.streaming import _run_stream, read_events_stream
    from engine.tables import sftag

    s = read_events_stream(spark, sf_dir)
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = s.join(F.broadcast(cust), s.user_id == cust.c_custkey)
    agg = joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
    out = _run_stream(agg, f"sg_static_enrich_{sftag(sf_dir)}", "complete")
    return out
