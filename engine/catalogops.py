"""Round-4 batch 21: the catalog / DDL surface (SURVEY §2 extension; the
reference at /root/reference is an empty directory — SURVEY §2 is the
operative spec).

An engine user doesn't only run queries over parquet paths — they CREATE
TABLE, INSERT, layer VIEWs, and CACHE hot relations. These keys prove that
lifecycle end-to-end on the session catalog (embedded metastore +
spark-warehouse), with the same oracle discipline as every query key.

- ``sql_ddl_insert_view``: CREATE TABLE AS SELECT → INSERT INTO → CREATE
  VIEW (aggregating) → query the view.
- ``sql_cache_table``: CACHE TABLE + re-query through the cache, with the
  InMemoryTableScan plan-asserted in tests; result identity is the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from engine.registry import query
from engine.tables import load, sftag


@query(
    "sql_ddl_insert_view",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
      FROM orders WHERE o_orderpriority = '1-URGENT'
      UNION ALL
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
      FROM orders WHERE o_orderpriority = '2-HIGH'
    )
    SELECT o_orderpriority, count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM base GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def sql_ddl_insert_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The catalog lifecycle as SQL DDL: CREATE TABLE AS SELECT the urgent
    orders into a managed parquet table, INSERT INTO the high-priority
    slice (append), CREATE OR REPLACE a VIEW aggregating it, and query the
    view. The oracle recomputes the same relation straight from the source
    — proving the managed table + append + view stack loses nothing. All
    objects are sf-tagged and idempotently re-created (DROP IF EXISTS), so
    repeated runs and fresh driver sessions converge on identical state.

    100 TB: managed tables give INSERT atomicity per statement and a
    metastore identity that views, caching, and ANALYZE statistics hang
    off — the operational layer over bare parquet paths. Appends are the
    cheap incremental-ingest path (new files only); the view is pure
    metadata (re-planned per query, zero storage)."""
    import shutil
    from urllib.parse import urlparse

    tag = sftag(sf_dir)
    load(spark, sf_dir, "orders").createOrReplaceTempView(f"sg_src_orders_{tag}")
    tbl = f"sg_ddl_orders_{tag}"
    vw = f"sg_ddl_prio_view_{tag}"
    spark.sql(f"DROP VIEW IF EXISTS {vw}")
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    # A FRESH session (new in-memory metastore) doesn't know a table a
    # previous session created, so DROP IF EXISTS is a no-op while the
    # managed LOCATION still exists on disk and CREATE fails with
    # LOCATION_ALREADY_EXISTS — remove the orphaned directory explicitly.
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{wh}/{tbl}", ignore_errors=True)
    spark.sql(
        f"""
        CREATE TABLE {tbl} USING parquet AS
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        FROM sg_src_orders_{tag} WHERE o_orderpriority = '1-URGENT'
        """
    )
    spark.sql(
        f"""
        INSERT INTO {tbl}
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        FROM sg_src_orders_{tag} WHERE o_orderpriority = '2-HIGH'
        """
    )
    spark.sql(
        f"""
        CREATE OR REPLACE VIEW {vw} AS
        SELECT o_orderpriority, count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM {tbl} GROUP BY o_orderpriority
        """
    )
    return spark.sql(f"SELECT * FROM {vw} ORDER BY o_orderpriority")


@query(
    "sql_cache_table",
    oracle="""
    SELECT c_nationkey, count(*) AS n_cust,
           round(avg(c_acctbal), 4) AS avg_bal
    FROM customer GROUP BY c_nationkey ORDER BY c_nationkey
    """,
)
def sql_cache_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CACHE TABLE: pin a relation columnar-in-memory and query through the
    cache — the hot-dimension pattern for dashboards and repeated
    small-table joins. The cache is EAGER here (no LAZY) so the key
    actually exercises materialization, and the aggregate's result
    identity against the uncached source is the oracle; the
    InMemoryTableScan plan shape is asserted in tests/test_catalogops.py.

    100 TB: cache the SMALL hot relations (dims, recent partitions), never
    the fact table — executor storage memory competes with shuffle/exec
    memory; Spark's columnar cache compresses and prunes columns, and a
    cached plan invalidates automatically when the underlying table is
    refreshed (REFRESH TABLE)."""
    tag = sftag(sf_dir)
    cname = f"sg_cached_cust_{tag}"
    load(spark, sf_dir, "customer").createOrReplaceTempView(f"sg_src_cust_{tag}")
    spark.sql(f"DROP VIEW IF EXISTS {cname}")
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY VIEW {cname} AS "
        f"SELECT c_custkey, c_nationkey, c_acctbal FROM sg_src_cust_{tag}"
    )
    spark.sql(f"CACHE TABLE {cname}")
    return spark.sql(
        f"""
        SELECT c_nationkey, count(*) AS n_cust,
               round(avg(c_acctbal), 4) AS avg_bal
        FROM {cname} GROUP BY c_nationkey ORDER BY c_nationkey
        """
    )


@query(
    "sql_parameterized_exec",
    oracle="""
    SELECT l_returnflag, count(*) AS n,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    WHERE l_quantity >= 25 AND l_discount BETWEEN 0.02 AND 0.08
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def sql_parameterized_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (Spark 3.4+ named parameter markers) composed with
    EXECUTE IMMEDIATE (Spark 4): the filter thresholds arrive as BOUND
    PARAMETERS (:min_qty etc.), not string-interpolated literals — the
    injection-safe templating path for user-facing query services — and
    the statement itself is dispatched through EXECUTE IMMEDIATE ... USING,
    the dynamic-SQL entry point stored procedures and drivers use. The
    oracle is the same query with the literals inlined: binding must be
    semantically invisible.

    100 TB: parameter markers keep the PLAN CACHE effective — a thousand
    differently-parameterized runs of one template parse and analyze once
    apiece instead of exploding the analyzed-plan space with distinct
    literal trees."""
    tag = sftag(sf_dir)
    load(spark, sf_dir, "lineitem").createOrReplaceTempView(f"sg_li_param_{tag}")
    # NAMED markers (:min_qty), not positional '?': binding is by name, so
    # reordering the USING list cannot silently swap thresholds.
    return spark.sql(
        f"""
        EXECUTE IMMEDIATE
          'SELECT l_returnflag, count(*) AS n,
                  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
           FROM sg_li_param_{tag}
           WHERE l_quantity >= :min_qty AND l_discount BETWEEN :lo_disc AND :hi_disc
           GROUP BY l_returnflag ORDER BY l_returnflag'
          USING 25 AS min_qty, 0.02 AS lo_disc, 0.08 AS hi_disc
        """
    )


@query(
    "join_lateral_topk",
    oracle="""
    SELECT o.o_orderkey, t.l_linenumber, t.l_extendedprice
    FROM (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000) o,
    LATERAL (
      SELECT l_linenumber, l_extendedprice
      FROM lineitem
      WHERE l_orderkey = o.o_orderkey
      ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2
    ) t
    ORDER BY o.o_orderkey, t.l_extendedprice DESC, t.l_linenumber
    """,
)
def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery join (Spark 3.2+): for each high-value
    order, its top-2 lineitems by price — the per-row-parameterized
    subquery with ORDER BY ... LIMIT that a plain join cannot express and
    that pre-LATERAL SQL needed a window + filter rewrite for
    (win_row_number_topk is exactly that rewrite; this is the declarative
    form). Deterministic (price DESC, linenumber) tie-break.

    100 TB: Catalyst decorrelates the lateral into a join + per-key
    WindowGroupLimit-style evaluation — same physical cost as the window
    rewrite, so the form is a readability choice, not a performance one;
    the outer filter (o_totalprice > 400000) prunes the driving side
    before any lineitem work."""
    tag = sftag(sf_dir)
    load(spark, sf_dir, "orders").createOrReplaceTempView(f"sg_lat_orders_{tag}")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView(f"sg_lat_li_{tag}")
    return spark.sql(
        f"""
        SELECT o.o_orderkey, t.l_linenumber, t.l_extendedprice
        FROM (SELECT o_orderkey FROM sg_lat_orders_{tag}
              WHERE o_totalprice > 400000) o,
        LATERAL (
          SELECT l_linenumber, l_extendedprice
          FROM sg_lat_li_{tag}
          WHERE l_orderkey = o.o_orderkey
          ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2
        ) t
        ORDER BY o.o_orderkey, t.l_extendedprice DESC, t.l_linenumber
        """
    )
