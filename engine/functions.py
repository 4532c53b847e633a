"""Scalar function surface: SURVEY.md §2.H (strings, regex, edit distance,
dates, math, JSON, arrays incl. higher-order, maps, casts, conditionals).

Cross-engine parity rules applied here (SURVEY §5.3 + hard-won additions):
- per-row IEEE arithmetic (+,-,*,/, sqrt) is emitted RAW — bit-identical in
  both engines; round() on decimal-aligned data is a half-up/half-away trap.
- libm-backed fns (ln, pow with non-integer results) may differ by 1 ulp →
  round(…, 6) on both sides.
- ceil/floor: Spark returns BIGINT, DuckDB DOUBLE → oracle casts to BIGINT.
- date outputs are emitted as TIMESTAMP (not DATE) to keep pandas dtypes
  aligned across engines; weekday uses Spark `weekday` ↔ DuckDB `isodow - 1`.
- no raw MapType/ArrayType in output: maps → sorted key/value strings,
  arrays → array_join/array_to_string or scalar summaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.registry import query
from engine.tables import load


# fn_array_set_ops sits first in this module for visibility (its last driver
# verdict was the r02 canonicalizer crash, fixed in-tree by comma-joining
# arrays) — but WINDOW placement is controlled by name in
# engine/registry.py's _ATTEST_FIRST, not by registration order.
@query(
    "fn_array_set_ops",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           array_to_string(list_sort(list_distinct(list_concat(a, b))), ',') AS u,
           array_to_string(list_sort(list_distinct(
             list_filter(a, x -> NOT list_contains(b, x)))), ',') AS diff,
           CAST(list_position(a, 2) AS BIGINT) AS pos2,
           array_to_string(list_filter(a, x -> x <> 1), ',') AS removed,
           array_to_string(list_concat(a, b), ',') AS flat,
           (len(list_filter(a, x -> list_contains(b, x))) > 0) AS overlaps
    FROM (SELECT l_orderkey, l_linenumber,
                 range(1, l_linenumber * 2 + 1) AS a,
                 range(2, l_linenumber * 2 + 3, 2) AS b
          FROM lineitem WHERE l_orderkey < 3000)
    """,
)
def fn_array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set-operation surface: union/except (sorted for cross-engine
    stability — Spark preserves appearance order, DuckDB doesn't),
    position, remove, flatten, overlap test. All JVM higher-order/array
    expressions over derived sequences; zero shuffle. Array results are
    comma-joined to strings: the driver's canonicalizer sorts result columns
    with pandas, which cannot order array cells (scalar-columns-only output
    convention, same as agg_collect_sorted)."""

    def joined(col: F.Column) -> F.Column:
        return F.array_join(F.transform(col, lambda x: x.cast("string")), ",")

    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 3000)
    d = li.select(
        "l_orderkey",
        "l_linenumber",
        F.sequence(F.lit(1), F.col("l_linenumber") * 2).alias("a"),
        F.sequence(F.lit(2), F.col("l_linenumber") * 2 + 2, F.lit(2)).alias("b"),
    )
    return d.select(
        "l_orderkey",
        "l_linenumber",
        joined(F.array_sort(F.array_union("a", "b"))).alias("u"),
        joined(F.array_sort(F.array_except("a", "b"))).alias("diff"),
        F.array_position("a", 2).alias("pos2"),
        joined(F.array_remove("a", 1)).alias("removed"),
        joined(F.flatten(F.array("a", "b"))).alias("flat"),
        F.arrays_overlap("a", "b").alias("overlaps"),
    )


@query(
    "fn_string_core",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           lower(p_type) AS type_lower,
           trim(' ' || p_name || ' ') AS name_trimmed,
           substring(p_name, 1, 5) AS name_head,
           length(p_name) AS name_len,
           lpad(p_brand, 10, '*') AS brand_padded,
           replace(p_name, ' ', '_') AS name_snake,
           concat_ws('|', p_brand, p_type) AS brand_type
    FROM part
    """,
)
def fn_string_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_type").alias("type_lower"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("name_trimmed"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.length("p_name").alias("name_len"),
        F.lpad("p_brand", 10, "*").alias("brand_padded"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
    )


@query(
    "fn_string_regex",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '^([a-z]+) ([a-z]+)$', 1) AS word1,
           regexp_extract(p_name, '^([a-z]+) ([a-z]+)$', 2) AS word2,
           string_split(p_name, ' ')[1] AS first_token,
           array_to_string(regexp_extract_all(p_name, '([a-z]+)', 1), ',') AS all_tokens
    FROM part
    """,
)
def fn_string_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extraction; patterns stay POSIX-safe (Java regex vs RE2)."""
    p = load(spark, sf_dir, "part")
    two_words = r"^([a-z]+) ([a-z]+)$"
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", two_words, 1).alias("word1"),
        F.regexp_extract("p_name", two_words, 2).alias("word2"),
        F.element_at(F.split("p_name", " "), 1).alias("first_token"),
        F.array_join(F.regexp_extract_all("p_name", F.lit("([a-z]+)"), 1), ",").alias(
            "all_tokens"
        ),
    )


@query(
    "fn_string_distance",
    oracle="""
    SELECT a.p_partkey AS key_a, a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS lev_name,
           levenshtein(a.p_type, b.p_type) AS lev_type
    FROM part a JOIN part b ON b.p_partkey = a.p_partkey + 1
    """,
)
def fn_string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit distance between consecutive part names (DuckDB has no soundex,
    so the oracle-checked surface is levenshtein; SURVEY §2.H amended)."""
    p = load(spark, sf_dir, "part")
    a = p.select(F.col("p_partkey").alias("key_a"), F.col("p_name").alias("name_a"),
                 F.col("p_type").alias("type_a"))
    b = p.select((F.col("p_partkey") - 1).alias("key_a"), F.col("p_name").alias("name_b"),
                 F.col("p_type").alias("type_b"))
    return a.join(b, "key_a").select(
        "key_a",
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b").alias("lev_name"),
        F.levenshtein("type_a", "type_b").alias("lev_type"),
    )


@query(
    "fn_date_core",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS yr,
           month(o_orderdate) AS mo,
           day(o_orderdate) AS dom,
           quarter(o_orderdate) AS qtr,
           isodow(o_orderdate) - 1 AS dow_iso,
           date_trunc('month', o_orderdate) AS month_start,
           date_diff('day', o_orderdate, TIMESTAMP '1998-09-02 00:00:00') AS days_to_ref,
           o_orderdate + INTERVAL 3 MONTH AS plus3m
    FROM orders
    """,
)
def fn_date_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date parts + truncation + diff + interval arithmetic. weekday (0=Mon)
    ↔ isodow-1 normalizes the engines' dow conventions; month-end clamping of
    +3 months agrees (both clamp)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("qtr"),
        F.weekday("o_orderdate").alias("dow_iso"),
        F.date_trunc("month", F.col("o_orderdate")).cast("timestamp_ntz").alias("month_start"),
        F.datediff(F.lit("1998-09-02").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_ref"
        ),
        F.add_months(F.col("o_orderdate"), 3).cast("timestamp_ntz").alias("plus3m"),
    )


@query(
    "fn_math_core",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05) AS abs_disc_delta,
           ceil(l_extendedprice)::BIGINT AS price_ceil,
           floor(l_extendedprice)::BIGINT AS price_floor,
           power(l_quantity, 2) AS qty_sq,
           round(ln(l_extendedprice), 6) AS ln_price,
           sqrt(l_quantity) AS qty_sqrt,
           l_extendedprice / nullif(l_quantity - 25, 0) AS try_div
    FROM lineitem
    """,
)
def fn_math_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math core under ANSI mode: try_divide guards the reachable zero
    (l_quantity = 25). sqrt/abs/+/- are IEEE-exact → raw; ln is libm-backed →
    rounded 6; ceil/floor cast to BIGINT on the oracle (DuckDB returns
    DOUBLE)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_disc_delta"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.power("l_quantity", F.lit(2)).alias("qty_sq"),
        F.round(F.ln("l_extendedprice"), 6).alias("ln_price"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.try_divide(F.col("l_extendedprice"), F.col("l_quantity") - 25).alias("try_div"),
    )


@query(
    "fn_json_extract",
    oracle="""
    SELECT event_id,
           json_extract(props, '$.k')::BIGINT AS k,
           json_extract(props, '$.k')::BIGINT * 2 AS k2,
           json_extract(props, '$.missing')::BIGINT AS k_missing
    FROM events
    """,
)
def fn_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON string field extraction with a missing-path NULL case; both
    sides cast to BIGINT (get_json_object returns string, json_extract
    returns JSON)."""
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.select(
        "event_id",
        k.alias("k"),
        (k * 2).alias("k2"),
        F.get_json_object("props", "$.missing").cast("long").alias("k_missing"),
    )


@query(
    "fn_array_core",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           array_to_string(generate_series(1, l_linenumber), ',') AS seq_str,
           len(generate_series(1, l_linenumber)) AS seq_len,
           array_to_string(generate_series(1, l_linenumber)[1:2], ',') AS seq_head2,
           coalesce(array_to_string(list_sort(list_intersect(
             generate_series(1, l_linenumber), [2, 3, 4])), ','), '') AS seq_inter
    FROM lineitem
    """,
)
def fn_array_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array construction/slice/intersect/size over derived arrays. Array
    outputs are stringified (array_join) — raw list columns are not
    hash-stable across engines; intersect results are sorted first (set
    order is undefined in both engines)."""
    li = load(spark, sf_dir, "lineitem")
    seq = F.sequence(F.lit(1), F.col("l_linenumber"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.array_join(seq, ",").alias("seq_str"),
        F.size(seq).alias("seq_len"),
        F.array_join(F.slice(seq, 1, 2), ",").alias("seq_head2"),
        F.array_join(
            F.sort_array(F.array_intersect(seq, F.array(F.lit(2), F.lit(3), F.lit(4)))), ","
        ).alias("seq_inter"),
    )


@query(
    "fn_array_higher_order",
    oracle="""
    SELECT vec_id,
           round(list_aggregate(list_transform(embedding::DOUBLE[], x -> x * x),
                                'sum'), 6) AS l2norm2,
           len(list_filter(embedding::DOUBLE[], x -> x > 0)) AS n_pos,
           round(list_aggregate(list_filter(embedding::DOUBLE[], x -> x > 0),
                                'sum'), 6) AS sum_pos
    FROM embeddings
    """,
)
def fn_array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array fns (transform / filter / aggregate) — the JVM-side
    lambda path, no Python UDF. float→double cast on BOTH sides before the
    fold; fold order is left-to-right sequential in both engines, rounded 6
    to absorb any reassociation."""
    emb = load(spark, sf_dir, "embeddings")
    arr = F.transform("embedding", lambda x: x.cast("double"))
    pos = F.filter(arr, lambda x: x > 0)
    zero = F.lit(0.0)
    return emb.select(
        "vec_id",
        F.round(F.aggregate(arr, zero, lambda acc, x: acc + x * x), 6).alias("l2norm2"),
        F.size(pos).alias("n_pos"),
        F.round(F.aggregate(pos, zero, lambda acc, x: acc + x), 6).alias("sum_pos"),
    )


@query(
    "fn_map_ops",
    oracle="""
    SELECT p_partkey,
           'brand,type' AS mkeys,
           p_brand || ',' || p_type AS mvals,
           p_size * 2 AS doubled_from_map
    FROM part
    """,
)
def fn_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction (str_to_map, map_from_entries) with hash-stable
    output: sorted keys + values-in-key-order strings, never a raw MapType
    (map ordering is undefined). The oracle states the expected *values*
    directly — DuckDB has no str_to_map, and the point of the check is the
    map round-trip, which SQL can assert without maps."""
    p = load(spark, sf_dir, "part")
    m = F.str_to_map(
        F.concat(F.lit("brand:"), F.col("p_brand"), F.lit(",type:"), F.col("p_type")),
        F.lit(","),
        F.lit(":"),
    )
    skeys = F.sort_array(F.map_keys(m))
    m2 = F.map_from_entries(
        F.arrays_zip(
            F.array(F.lit("a"), F.lit("b")),
            F.array(F.col("p_size"), F.col("p_size") * 2),
        )
    )
    return p.select(
        "p_partkey",
        F.array_join(skeys, ",").alias("mkeys"),
        F.array_join(F.transform(skeys, lambda k: F.element_at(m, k)), ",").alias("mvals"),
        F.element_at(m2, "b").alias("doubled_from_map"),
    )


@query(
    "fn_cast_coerce",
    oracle="""
    SELECT p_partkey,
           TRY_CAST(string_split(p_brand, '#')[2] AS INTEGER) AS brand_num,
           TRY_CAST(p_name AS DOUBLE) AS not_a_number,
           p_size::VARCHAR AS size_str,
           floor(p_retailprice)::BIGINT AS price_floor_long,
           ((2000 + p_size % 20)::VARCHAR || '-01-15')::TIMESTAMP AS derived_ts
    FROM part
    """,
)
def fn_cast_coerce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI casts + try_cast for malformed input (p_name as double → NULL
    instead of a runtime error under ansi=true)."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.try_element_at(F.split("p_brand", "#"), F.lit(2)).cast("int").alias("brand_num"),
        F.col("p_name").try_cast("double").alias("not_a_number"),
        F.col("p_size").cast("string").alias("size_str"),
        F.floor("p_retailprice").alias("price_floor_long"),
        F.concat((F.lit(2000) + F.col("p_size") % 20).cast("string"), F.lit("-01-15"))
        .cast("timestamp_ntz")
        .alias("derived_ts"),
    )


@query(
    "fn_conditional",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 1000 THEN 'low'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS tier,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
           greatest(c_acctbal, 5000.0) AS bal_floor_5k,
           least(c_acctbal, 0.0) AS bal_cap_0
    FROM customer
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 1000, "low")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("tier"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_or_other"
        ),
        F.greatest(F.col("c_acctbal"), F.lit(5000.0)).alias("bal_floor_5k"),
        F.least(F.col("c_acctbal"), F.lit(0.0)).alias("bal_cap_0"),
    )


@query(
    "fn_hash_digest",
    oracle="""
    SELECT p_partkey,
           md5(p_name) AS name_md5,
           sha256(p_name) AS name_sha256
    FROM part
    """,
)
def fn_hash_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic digest surface: md5 + sha256 hex digests — the
    content-addressing primitives (dedup keys, cache keys, data lineage).
    Unlike the engine-internal hashes (xxhash64 vs duckdb hash, which never
    cross-match), these are standardized algorithms — byte-identical in any
    engine, so they are the RIGHT hash for persisted, cross-system keys."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.md5(F.col("p_name").cast("binary")).alias("name_md5"),
        F.sha2(F.col("p_name").cast("binary"), 256).alias("name_sha256"),
    )


@query(
    "fn_format_printf",
    oracle="""
    SELECT p_partkey,
           printf('%s|%05d|%x', p_name, p_size, p_partkey) AS formatted,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded
    FROM part
    """,
)
def fn_format_printf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-style string formatting (format_string ≡ printf) over string, int
    and hex conversions, plus lpad. Floating-point conversions (%f) are
    deliberately excluded: Java's %.2f rounds HALF_UP while C rounds
    half-even, so float formatting is NOT portable across engines — integer
    and string conversions are."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.format_string("%s|%05d|%x", "p_name", "p_size", "p_partkey").alias("formatted"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
    )


@query(
    "fn_struct_json_nested",
    oracle="""
    SELECT n_nationkey,
           to_json(struct_pack(name := n_name,
                               meta := struct_pack(id := n_nationkey,
                                                   region := n_regionkey)))::VARCHAR
             AS as_json,
           json_extract(to_json(struct_pack(name := n_name,
                                            meta := struct_pack(id := n_nationkey,
                                                                region := n_regionkey))),
                        '$.meta.id')::BIGINT AS id_back
    FROM nation
    """,
)
def fn_struct_json_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested struct construction → JSON serialization → path extraction
    round-trip. Field order in the JSON text is declaration order in both
    engines, and int/string scalars serialize identically — which is why the
    struct carries no doubles (float→text formatting is engine-specific).
    Struct ops are zero-cost column metadata in Tungsten; to_json is the
    only materialization."""
    n = load(spark, sf_dir, "nation")
    js = F.to_json(
        F.struct(
            F.col("n_name").alias("name"),
            F.struct(
                F.col("n_nationkey").alias("id"), F.col("n_regionkey").alias("region")
            ).alias("meta"),
        )
    )
    return n.select(
        "n_nationkey",
        js.alias("as_json"),
        F.get_json_object(js, "$.meta.id").cast("long").alias("id_back"),
    )


@query(
    "fn_interval_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS TIMESTAMP) AS plus_3m,
           CAST(CAST(o_orderdate AS DATE) - INTERVAL 10 DAY AS TIMESTAMP) AS minus_10d,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           CAST(date_trunc('quarter', CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS quarter_start,
           date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since
    FROM orders WHERE o_orderkey < 5000
    """,
)
def fn_interval_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar interval arithmetic: month addition (end-of-month clamping
    matches across engines), day subtraction, last_day, quarter truncation,
    day diffs. Month math is NOT commutative with day math — both engines
    clamp Jan 31 + 1 month to Feb 28 — which is why add_months exists as a
    distinct operation from +30d. Pure projection, zero shuffle."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 5000)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.add_months(d, 3).cast("timestamp_ntz").alias("plus_3m"),
        F.date_sub(d, 10).cast("timestamp_ntz").alias("minus_10d"),
        F.last_day(d).cast("timestamp_ntz").alias("month_end"),
        F.date_trunc("quarter", d).cast("timestamp_ntz").alias("quarter_start"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).cast("long").alias("days_since"),
    )


@query(
    "fn_try_arithmetic",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           TRY_CAST(l_orderkey::HUGEINT * 4000000000000000000::HUGEINT AS BIGINT)
             AS try_mul,
           TRY_CAST(l_orderkey::HUGEINT + 9223372036854775000::HUGEINT AS BIGINT)
             AS try_add_big,
           CASE WHEN l_linenumber = 1 THEN NULL
                ELSE l_quantity / (l_linenumber - 1) END AS try_div,
           TRY_CAST(CASE WHEN l_linenumber % 2 = 0
                         THEN '1999-01-02 03:04:05' ELSE 'nope' END AS TIMESTAMP)
             AS try_ts
    FROM lineitem WHERE l_orderkey < 3000
    """,
)
def fn_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRY-variant arithmetic under ANSI mode: overflow → NULL (not error),
    divide-by-zero → NULL, malformed timestamp → NULL. The tolerant-ETL
    counterpart of strict ANSI evaluation (etl_clean_coerce has the cast
    side). DuckDB lacks try_add/try_multiply, so the oracle reproduces the
    semantics by widening to HUGEINT and TRY_CASTing back — same NULL set."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 3000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_multiply(F.col("l_orderkey"), F.lit(4000000000000000000)).alias("try_mul"),
        F.try_add(F.col("l_orderkey"), F.lit(9223372036854775000)).alias("try_add_big"),
        F.try_divide(F.col("l_quantity"), F.col("l_linenumber") - 1).alias("try_div"),
        F.try_to_timestamp(
            F.when(F.col("l_linenumber") % 2 == 0, "1999-01-02 03:04:05").otherwise(
                "nope"
            )
        )
        .cast("timestamp_ntz")
        .alias("try_ts"),
    )


@query(
    "fn_string_split_part",
    oracle="""
    SELECT p_partkey,
           split_part(p_name, ' ', 1) AS adjective,
           split_part(p_name, ' ', 2) AS noun,
           split_part(p_name, ' ', 9) AS beyond
    FROM part
    """,
)
def fn_string_split_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split_part — 1-based field extraction with the empty-string (not
    NULL, not error) convention for out-of-range indices in both engines."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("adjective"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("noun"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(9)).alias("beyond"),
    )
