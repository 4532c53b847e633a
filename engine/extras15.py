"""Extras batch 15 module (r05 continuation): the Spark 4 textual-SQL
surface (EXECUTE IMMEDIATE + IDENTIFIER, SELECT * EXCEPT + ORDER BY ALL,
to_char/to_number, native LISTAGG ... WITHIN GROUP) plus two analytics
keys — Gopher-style corpus quality rules and per-customer max drawdown.

SURVEY §2 families extended: §2.H (number formatting round-trip), §2.D
(ordered string aggregation, this time via the native Spark 4 aggregate
rather than the array_sort(collect_list) composition `agg_string_agg_ordered`
uses), §2.I (rule-based corpus quality filter — the Gopher/C4 shape), §2.E
(two stacked windows: running sum → running max → drawdown), plus the SQL
dialect keys the reference's textual front-end would accept.

Determinism discipline (SURVEY §5.3): every LIMIT rides a total order
(unique key in the ORDER BY ALL column set); doubles pre-rounded before
formatting so both engines format the same value; ratios rounded once at
the end; window folds run in the same (date, key) sequence in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from engine.registry import query
from engine.tables import load, sftag


@query(
    "sql_execute_immediate",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n,
           round(sum(o_totalprice), 2) AS rev
    FROM orders
    WHERE o_totalprice >= 1000.0
    GROUP BY o_orderpriority
    """,
)
def sql_execute_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic SQL: EXECUTE IMMEDIATE runs a query held in a string with
    positional `?` parameters bound via USING, and the table reference
    itself resolves through the IDENTIFIER() clause — the injection-safe
    way to parameterize both values AND object names (Spark 4; the string
    never gets interpolated, the parser binds placeholders).

    Plan note: after binding, the statement plans identically to its
    static twin — same pushed filter, same partial aggregation; dynamic
    SQL costs nothing at execution time. 100 TB: parameter binding is the
    API multi-tenant schedulers use to template one audited query over
    thousands of table/threshold combinations without string-concat SQL
    injection risk."""
    tag = sftag(sf_dir)
    vw = f"sg_ei_orders_{tag}"
    load(spark, sf_dir, "orders").createOrReplaceTempView(vw)
    return spark.sql(
        "EXECUTE IMMEDIATE "
        "'SELECT o_orderpriority, count(*) AS n, "
        "round(sum(o_totalprice), 2) AS rev "
        "FROM IDENTIFIER(?) WHERE o_totalprice >= ? "
        "GROUP BY o_orderpriority' "
        f"USING '{vw}', 1000.0d"
    )


@query(
    "sql_star_except_order_all",
    oracle="""
    SELECT * EXCLUDE (c_acctbal, c_mktsegment)
    FROM customer
    ORDER BY ALL
    LIMIT 100
    """,
)
def sql_star_except_order_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection-by-subtraction and order-by-everything: SELECT * EXCEPT
    (cols) drops named columns at parse time (Spark 4 / DuckDB EXCLUDE),
    and ORDER BY ALL sorts by every remaining column left-to-right. The
    LIMIT is deterministic because c_custkey (unique) leads the surviving
    column set — ORDER BY ALL is a total order here.

    Plan note: EXCEPT is sugar over a narrowed projection, so column
    pruning reaches the parquet scan exactly as an explicit SELECT list
    would (ReadSchema shows only the 3 survivors); the global top-100
    runs as TakeOrderedAndProject, never a full sort. 100 TB: the wide-
    table ergonomic — drop the 2 payload columns of a 300-column scan
    without enumerating 298 names, while keeping the scan pruned."""
    tag = sftag(sf_dir)
    vw = f"sg_sx_customer_{tag}"
    load(spark, sf_dir, "customer").createOrReplaceTempView(vw)
    return spark.sql(
        f"""
        SELECT * EXCEPT (c_acctbal, c_mktsegment)
        FROM {vw}
        ORDER BY ALL
        LIMIT 100
        """
    )


@query(
    "fn_to_char_number",
    oracle="""
    SELECT o_orderkey,
           printf('%010.2f', round(o_totalprice, 2)) AS padded,
           round(o_totalprice, 2) AS parsed_back,
           TRUE AS roundtrip_ok
    FROM orders
    """,
)
def fn_to_char_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric formatting round-trip: to_char renders each (positive)
    order total against a zero-padded '0000000.00' template and to_number
    parses the string back; the emitted flag proves parse(format(x)) == x
    row-for-row. The input is pre-rounded to 2 decimals so both engines
    format the identical double (to_char's template rounding mode never
    engages — SURVEY §5.3 rule: round before, not inside, an
    engine-specific function).

    Oracle maps the template to printf('%010.2f') — zero-fill to width 10
    with 2 decimals is the same contract. Plan note: pure row-local
    codegen, zero shuffles; at 100 TB this is the formatting leg of any
    fixed-width export sink."""
    o = load(spark, sf_dir, "orders")
    rounded = F.round(F.col("o_totalprice"), 2)
    padded = F.to_char(rounded, F.lit("0000000.00"))
    return o.select(
        "o_orderkey",
        padded.alias("padded"),
        F.to_number(padded, F.lit("0000000.00")).cast("double").alias("parsed_back"),
        (F.to_number(padded, F.lit("0000000.00")).cast("double") == rounded).alias(
            "roundtrip_ok"
        ),
    )


@query(
    "agg_listagg_native",
    oracle="""
    SELECT c_nationkey,
           string_agg(seg, '|' ORDER BY seg) AS segments,
           count(*) AS n_segments
    FROM (SELECT DISTINCT c_nationkey, c_mktsegment AS seg FROM customer)
    GROUP BY c_nationkey
    """,
)
def agg_listagg_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation via the NATIVE Spark 4 `listagg(expr,
    sep) WITHIN GROUP (ORDER BY ...)` aggregate — the standard-SQL twin of
    `agg_string_agg_ordered`, which composes array_sort(collect_list)
    because pre-4.0 Spark had no ordered collect. Input is the distinct
    (nation, segment) relation, so the aggregate sees a bounded set.

    Plan note: listagg is a JVM-side ImperativeAggregate with map-side
    partials (each partial holds its local values; merge concatenates and
    the ORDER BY applies once at final) — unlike collect_list+sort it
    never materializes a Python-visible array column. Per-group state is
    the value list either way: at 100 TB keep the group domain bounded
    (distinct first, as here) or cap with a windowed top-k."""
    tag = sftag(sf_dir)
    vw = f"sg_la_customer_{tag}"
    load(spark, sf_dir, "customer").createOrReplaceTempView(vw)
    return spark.sql(
        f"""
        SELECT c_nationkey,
               listagg(seg, '|') WITHIN GROUP (ORDER BY seg) AS segments,
               count(*) AS n_segments
        FROM (SELECT DISTINCT c_nationkey, c_mktsegment AS seg FROM {vw})
        GROUP BY c_nationkey
        """
    )


@query(
    "text_gopher_quality_rules",
    oracle="""
    WITH feat AS (
      SELECT doc_id,
             len(string_split(trim(text), ' ')) AS n_words,
             round(CAST(len(replace(text, ' ', '')) AS DOUBLE)
                   / len(string_split(trim(text), ' ')), 4) AS mean_word_len,
             round(CAST(len(text) - len(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))
                        AS DOUBLE) / len(text), 4) AS symbol_ratio,
             (text LIKE '% the %' OR text LIKE '% and %' OR text LIKE '% of %'
              OR text LIKE '% to %' OR text LIKE '% in %') AS has_stopword
      FROM documents
    )
    SELECT doc_id, n_words, mean_word_len, symbol_ratio, has_stopword,
           (n_words BETWEEN 5 AND 100000
            AND mean_word_len BETWEEN 2.0 AND 12.0
            AND symbol_ratio <= 0.30
            AND has_stopword) AS keep
    FROM feat
    """,
)
def text_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based corpus quality gate in the Gopher/C4 style: per document
    emit word count, mean word length, symbol-to-character ratio, and an
    English-stopword-presence flag, then AND the rule thresholds into one
    `keep` verdict (word count in [5, 100k], mean word length in [2, 12],
    ≤30% symbol characters, at least one common stopword). The individual
    features stay in the output so downstream audits can attribute every
    rejection to the rule that fired.

    Plan note: entirely row-local string expressions inside whole-stage
    codegen — zero shuffles, zero Python. 100 TB: this is the first,
    cheapest pass of a pretraining pipeline (runs at scan speed, prunes
    the corpus before any shuffle-bearing dedup stage); the thresholds
    are the published Gopher ranges adapted to this corpus's synthetic
    text. Ratios round once at the end (§5.3)."""
    d = load(spark, sf_dir, "documents")
    words = F.split(F.trim(F.col("text")), " ")
    n_words = F.size(words)
    mean_wl = F.round(
        F.length(F.regexp_replace(F.col("text"), " ", "")).cast("double")
        / n_words.cast("double"),
        4,
    )
    sym = F.round(
        (
            F.length(F.col("text"))
            - F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z0-9 ]", ""))
        ).cast("double")
        / F.length(F.col("text")).cast("double"),
        4,
    )
    stop = (
        F.col("text").like("% the %")
        | F.col("text").like("% and %")
        | F.col("text").like("% of %")
        | F.col("text").like("% to %")
        | F.col("text").like("% in %")
    )
    feat = d.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        sym.alias("symbol_ratio"),
        stop.alias("has_stopword"),
    )
    return feat.withColumn(
        "keep",
        F.col("n_words").between(5, 100000)
        & F.col("mean_word_len").between(2.0, 12.0)
        & (F.col("symbol_ratio") <= 0.30)
        & F.col("has_stopword"),
    )


@query(
    "win_drawdown_max",
    oracle="""
    WITH seq AS (
      SELECT o_custkey,
             round(o_totalprice, 2) AS amt,
             sum(round(o_totalprice, 2))
               OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey) AS cum,
             max(round(o_totalprice, 2))
               OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey) AS peak_amt
      FROM orders
    ),
    dd AS (
      SELECT o_custkey, cum,
             max(cum) OVER (PARTITION BY o_custkey
                            ORDER BY cum
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS running_peak
      FROM seq
    )
    SELECT o_custkey,
           count(*) AS n_orders,
           round(max(running_peak - cum), 2) AS max_drawdown
    FROM dd
    GROUP BY o_custkey
    HAVING count(*) >= 3
    """,
)
def win_drawdown_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max drawdown per customer over the cumulative order-value series:
    running sum in (date, key) order, running peak of that sum, drawdown
    = peak − current, aggregated to the per-customer maximum (customers
    with ≥3 orders). Two stacked windows and one aggregate — the
    risk-analytics composition (peak-to-trough) on the same shuffle.

    NOTE a subtlety the oracle mirrors: because every o_totalprice is
    positive the cumulative series is monotone increasing, so running
    peak == current cum and true drawdown is 0 — the key's value is the
    WINDOW COMPOSITION being bit-identical across engines, which is why
    the running peak window in both engines orders by `cum` itself
    (monotone ⇒ same sequence as the date order, and a total order even
    on date ties). Amounts pre-rounded per §5.3 so the sequential fold
    is exact.

    Plan note: one hash shuffle on o_custkey serves both windows AND the
    final aggregate (same key, Catalyst reuses the partitioning); window
    state is O(1) per row. 100 TB: the canonical one-shuffle time-series
    scan — skew-sensitive only if one customer dominates, which salting
    or AQE skew handling absorbs."""
    o = load(spark, sf_dir, "orders")
    amt = F.round(F.col("o_totalprice"), 2)
    w_seq = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        "o_custkey",
        amt.alias("amt"),
        F.sum(amt).over(w_seq).alias("cum"),
    )
    w_peak = (
        Window.partitionBy("o_custkey")
        .orderBy("cum")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dd = seq.withColumn("running_peak", F.max("cum").over(w_peak))
    return (
        dd.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.max(F.col("running_peak") - F.col("cum")), 2).alias(
                "max_drawdown"
            ),
        )
        .filter(F.col("n_orders") >= 3)
    )
