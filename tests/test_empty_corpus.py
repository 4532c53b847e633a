"""r12 empty-corpus hardening: a 100 TB pipeline routinely meets empty
sources (an empty incremental batch, a filtered-out shard, a fresh
partition), and the fixed sf corpora never exercise that shape. The r12
sweep of all 364 keys against an all-empty (0-row, schema-correct) corpus
found 24 failures; these tests pin the fixed ones — partitioned-write
read-backs, driver-side constants (np.stack / first()[0] / 1/n), and
NULL-aggregate parity — against the same DuckDB oracles on the same empty
corpus.

Known, documented exclusions (engine semantics, not bugs — see
docs/SCALE.md r12):
- agg_cube / agg_rollup / agg_grouping_sets / agg_grouping_id /
  agg_ab_ttest: Spark's GROUPING SETS on empty input emit 0 rows even for
  the () set; DuckDB follows the SQL standard and emits the grand-total
  row. Verified directly: `df.cube(...).agg(...)` on range(0) -> [].
- scan_binary_files: oracle hardcodes the sf0.01 directory (static-oracle
  driver contract), so it cannot be retargeted at a synthetic corpus.
"""

from __future__ import annotations

import duckdb
import pyarrow.parquet as pq
import pytest

from engine.tables import TABLES
from tests.conftest import SF_DIR, assert_frames_match

# every key fixed (or proven already-green) by the r12 empty-corpus sweep
EMPTY_SAFE_KEYS = [
    # partitioned-write read-backs (explicit schema / absent-dir guards)
    "sink_parquet_roundtrip",
    "scan_partition_prune",
    "sink_hive_partitioned",
    "join_dynamic_partition_prune",
    "etl_partition_overwrite_dynamic",
    "etl_targeted_erasure",
    # driver-side constants over empty input
    "sim_topk_pairs",
    "dedup_embedding_cosine",
    "sim_knn_query",
    "sim_ann_ivf",
    "sim_ann_rp_lsh",
    "pipeline_ann_index_build",
    "emb_pca_project",
    "emb_isotropy_audit",
    "plan_observe_metrics",
    "graph_bfs_hops",
    "graph_pagerank_iter",
    # NULL-aggregate parity
    "dedup_exact_embedding",
    "scan_metadata_columns",
]


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("sg_empty")
    for t in TABLES:
        schema = pq.read_schema(f"{SF_DIR}/{t}.parquet")
        pq.write_table(schema.empty_table(), str(out / f"{t}.parquet"))
    return str(out)


@pytest.fixture(scope="module")
def empty_duck(empty_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{empty_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("key", EMPTY_SAFE_KEYS)
def test_empty_corpus_oracle_parity(spark, empty_dir, empty_duck, key):
    from engine.registry import collect

    queries, oracles = collect()
    fn = getattr(queries[key], "__wrapped__", queries[key])
    sp = fn(spark, empty_dir).toPandas()
    du = empty_duck.sql(oracles[key]).df()
    assert_frames_match(sp, du, key)


# keys the r12 ONE-ROW sweep crashed or diverged (a single-row table /
# zero-variance group / sub-k collect group is routine inside any filtered
# shard at scale) — plus the ANSI discovery: the session runs Spark 4's
# ANSI mode, so x/0 on a degenerate group KILLS the job instead of
# emitting NULL. Each fix reproduces the oracle's NULL/saturation
# semantics (DuckDB's x/0 is NULL; least() skips NULLs).
ONE_ROW_KEYS = [
    "agg_rate_smoothing",       # zero-view prior: b/0 -> NULL smoothing
    "agg_topk_collect",         # sub-k group: try_element_at NULL slots
    "emb_isotropy_audit",       # n=1: no pairs, NULL mean cosine
    "emb_pca_project",          # zero-variance corpus: trace 0 guard
    "emb_scalar_quantize",      # constant dim: mx==mn saturates to 255
    "win_anomaly_zscore",       # zero-variance type: z NULL, row dropped
    "sql_pivot_clause",         # missing pivot cell: count 0, not NULL
    "scan_metadata_columns",    # n<4 rows -> n files (least(4, n) oracle)
    "sim_ann_ivf",              # 1 centroid < nprobe: probe width clamps
    "pipeline_ann_index_build", # same clamp in the build/serve kernels
    # r13 quantile-bucket rewrites: 1 row -> all 63 splits equal, bkt=63
    "agg_weighted_percentile",
    "text_pack_sequences",
]


@pytest.fixture(scope="module")
def one_row_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("sg_one")
    for t in TABLES:
        tb = pq.read_table(f"{SF_DIR}/{t}.parquet")
        pq.write_table(tb.slice(0, 1), str(out / f"{t}.parquet"))
    return str(out)


@pytest.fixture(scope="module")
def one_row_duck(one_row_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{one_row_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("key", ONE_ROW_KEYS)
def test_one_row_corpus_oracle_parity(spark, one_row_dir, one_row_duck, key):
    from engine.registry import collect

    queries, oracles = collect()
    fn = getattr(queries[key], "__wrapped__", queries[key])
    sp = fn(spark, one_row_dir).toPandas()
    du = one_row_duck.sql(oracles[key]).df()
    assert_frames_match(sp, du, key)


# keys the r12 NULL-TEXT sweep crashed or diverged (NULL text/lang rows are
# the routine ingestion-corruption shape). Two asymmetry classes: Python
# kernels receiving None (mapInPandas/UDTF/fake decode), and Spark
# expressions that DON'T null-propagate where the oracle's do —
# concat_ws skips NULL args, xxhash64(NULL) returns the seed constant
# (so NULL docs all shared one shingle and paired as near-dups), and
# greatest() skips NULLs into a live sequence().
NULL_TEXT_KEYS = [
    "dedup_cross_source",        # fp md5(NULL) now NULL, groups NULL texts
    "dedup_near_minhash",        # NULL doc -> empty shingle set, no pairs
    "dedup_pair_explain",        # same shingle kernel
    "multimodal_decode_pipeline",  # NULL payload -> NULL meta + features
    "scan_text_lines",           # NULL survives the text-file round-trip
    "text_fingerprint",          # NULL text -> no windows
    "text_pack_sequences",       # all-NULL bucket sums coalesce to 0
    "udf_mapinpandas_stream",    # pandas .str NULL-propagation
    "udtf_python",               # eval(None) yields no tokens
]


@pytest.fixture(scope="module")
def null_text_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.compute as pc

    out = tmp_path_factory.mktemp("sg_nulls")
    for t in TABLES:
        tb = pq.read_table(f"{SF_DIR}/{t}.parquet")
        if t == "documents":
            mask = pc.is_in(tb.column("doc_id"), value_set=pa.array([7, 8, 9]))
            cols = {}
            for name in tb.column_names:
                col = tb.column(name)
                if name in ("text", "lang"):
                    cols[name] = pc.if_else(mask, pa.nulls(len(tb), col.type), col)
                else:
                    cols[name] = col
            tb = pa.table(cols)
        pq.write_table(tb, str(out / f"{t}.parquet"))
    return str(out)


@pytest.fixture(scope="module")
def null_text_duck(null_text_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{null_text_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("key", NULL_TEXT_KEYS)
def test_null_text_corpus_oracle_parity(spark, null_text_dir, null_text_duck, key):
    from engine.registry import collect

    queries, oracles = collect()
    fn = getattr(queries[key], "__wrapped__", queries[key])
    sp = fn(spark, null_text_dir).toPandas()
    du = null_text_duck.sql(oracles[key]).df()
    assert_frames_match(sp, du, key)


# keys the r12 NULL-EMBEDDING sweep crashed or diverged (a left-join
# enrichment miss / failed inference produces NULL vectors). The contract
# (engine.tables.vectors + `embedding IS NOT NULL` in the oracles): vector
# math ignores NULL embeddings the way SQL aggregates ignore NULL scalars.
# Notable crash class: pyarrow's flatten() silently DROPS null lists, so
# the np reshape misaligned ids against vectors before raising.
NULL_EMB_KEYS = [
    "dedup_embedding_cosine",
    "emb_isotropy_audit",
    "emb_norm_profile",
    "emb_pca_project",
    "emb_random_projection_jl",
    "sim_ann_ivf",
    "sim_ann_rp_lsh",
    "sim_hybrid_rrf_fusion",
    "sim_knn_query",
    "sim_topk_pairs",
]


@pytest.fixture(scope="module")
def null_emb_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.compute as pc

    out = tmp_path_factory.mktemp("sg_nullemb")
    for t in TABLES:
        tb = pq.read_table(f"{SF_DIR}/{t}.parquet")
        if t == "embeddings":
            mask = pc.is_in(tb.column("vec_id"), value_set=pa.array([7, 8, 9]))
            cols = {
                n: (
                    pc.if_else(mask, pa.nulls(len(tb), tb.column(n).type), tb.column(n))
                    if n == "embedding"
                    else tb.column(n)
                )
                for n in tb.column_names
            }
            tb = pa.table(cols)
        pq.write_table(tb, str(out / f"{t}.parquet"))
    return str(out)


@pytest.fixture(scope="module")
def null_emb_duck(null_emb_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{null_emb_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("key", NULL_EMB_KEYS)
def test_null_emb_corpus_oracle_parity(spark, null_emb_dir, null_emb_duck, key):
    from engine.registry import collect

    queries, oracles = collect()
    fn = getattr(queries[key], "__wrapped__", queries[key])
    sp = fn(spark, null_emb_dir).toPandas()
    du = null_emb_duck.sql(oracles[key]).df()
    assert_frames_match(sp, du, key)


# the COMBINATION corpus (r12): dup groups + NULL text/lang + NULL
# embeddings + a duplicated NULL-text group + a duplicated sub-n-gram
# group, all at once — the interaction regime (collapse paths meeting
# NULLs) none of the single-axis fixtures exercise. The full 364-key
# sweep at r12 found three interaction bugs pinned here: array_join of a
# NULL match list ('' on DuckDB via coalesce), sequence(0, -1, 4) being
# an ERROR where generate_series is empty (sub-frame payloads), and
# LATERAL VIEW OUTER emitting a (NULL, NULL) row for NULL token arrays
# where unnest(NULL) emits nothing.
COMBO_KEYS = [
    "fn_regexp_extract_all",
    "multimodal_frame_sample",
    "sql_lateral_view",
    # dup-collapse x NULL interaction pins (passed the sweep; keep green)
    "dedup_ngram_jaccard",
    "dedup_semdedup",
    "emb_kmeans_lloyd",
    "sim_ann_ivf",
    "dedup_cross_source",
]


@pytest.fixture(scope="module")
def combo_dir(tmp_path_factory):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    out = tmp_path_factory.mktemp("sg_combo")
    for t in TABLES:
        tb = pq.read_table(f"{SF_DIR}/{t}.parquet")
        if t == "documents":
            mask = pc.is_in(tb.column("doc_id"), value_set=pa.array([7, 8, 9]))
            cols = {
                n: (
                    pc.if_else(mask, pa.nulls(len(tb), tb.column(n).type), tb.column(n))
                    if n in ("text", "lang")
                    else tb.column(n)
                )
                for n in tb.column_names
            }
            df = pa.table(cols).to_pandas()
            extra = df[df.doc_id < 5].copy()
            extra["doc_id"] += 1_000_000
            nulldup = df[df.doc_id == 7]
            nd2 = pd.concat(
                [nulldup.assign(doc_id=2_000_000), nulldup.assign(doc_id=2_000_001)]
            )
            short = df[df.doc_id == 10]
            sh2 = pd.concat(
                [
                    short.assign(doc_id=3_000_000, text="two words"),
                    short.assign(doc_id=3_000_001, text="two words"),
                ]
            )
            tb = pa.Table.from_pandas(
                pd.concat([df, extra, nd2, sh2], ignore_index=True),
                preserve_index=False,
            )
        if t == "embeddings":
            mask = pc.is_in(tb.column("vec_id"), value_set=pa.array([7, 8, 9]))
            cols = {
                n: (
                    pc.if_else(mask, pa.nulls(len(tb), tb.column(n).type), tb.column(n))
                    if n == "embedding"
                    else tb.column(n)
                )
                for n in tb.column_names
            }
            df = pa.table(cols).to_pandas()
            extra = df[df.vec_id < 3].copy()
            extra["vec_id"] += 1_000_000
            tb = pa.Table.from_pandas(
                pd.concat([df, extra], ignore_index=True), preserve_index=False
            )
        pq.write_table(tb, str(out / f"{t}.parquet"))
    return str(out)


@pytest.fixture(scope="module")
def combo_duck(combo_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{combo_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("key", COMBO_KEYS)
def test_combo_corpus_oracle_parity(spark, combo_dir, combo_duck, key):
    from engine.registry import collect

    queries, oracles = collect()
    fn = getattr(queries[key], "__wrapped__", queries[key])
    sp = fn(spark, combo_dir).toPandas()
    du = combo_duck.sql(oracles[key]).df()
    assert_frames_match(sp, du, key)


def test_null_emb_ann_index_build_no_crash(spark, null_emb_dir):
    """pipeline_ann_index_build is excluded from oracle parity on this
    corpus BY DESIGN: its FULL oracle relies on the IVF serve path's
    recall being exactly 1.0 on the UNMODIFIED corpus (fixed centroids +
    clustered data); removing 3 vectors shifts cluster membership and a
    true neighbor can land in an unprobed cluster. The r12 fix under test
    is the crash (ids misaligned against a null-dropping flatten) — the
    build/serve must now run and return the full 5x5 result."""
    from engine.registry import collect

    queries, _ = collect()
    fn = getattr(
        queries["pipeline_ann_index_build"],
        "__wrapped__",
        queries["pipeline_ann_index_build"],
    )
    rows = fn(spark, null_emb_dir).collect()
    assert len(rows) == 25 and all(r["sim"] is not None for r in rows)


# keys the r13 NULL-SOURCE sweep fixed or keep-green-pins (ADVICE r12: the
# degenerate corpora nulled text/lang/embedding but never source, leaving
# the source-bucketing joins unexercised). Sweep of all 364 keys against a
# 15-NULL-source corpus: 362 PASS, 2 FAIL — pipeline_dedup_cascade (its
# manifest equi-joins on source zeroed the NULL group's attrition counts;
# now eqNullSafe) and scan_binary_files (the documented static-oracle
# exclusion, not a bug). text_pack_sequences / sample_source_mix shipped
# eqNullSafe in the same round before the sweep and pass here.
NULL_SOURCE_KEYS = [
    "pipeline_dedup_cascade",   # manifest joins now eqNullSafe on source
    "text_pack_sequences",      # bucket-stats joins eqNullSafe (ADVICE)
    "sample_source_mix",        # bucket-stats joins eqNullSafe (ADVICE)
    # keep-green pins: source-grouped keys that already keep NULL groups
    "dedup_cross_source",
    "sample_balanced_lang",
    "text_source_vocab_jaccard",
]


@pytest.fixture(scope="module")
def null_source_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.compute as pc

    out = tmp_path_factory.mktemp("sg_nullsource")
    for t in TABLES:
        tb = pq.read_table(f"{SF_DIR}/{t}.parquet")
        if t == "documents":
            # a MULTI-row NULL group (15 docs) so it spans buckets and
            # windows, unlike a 1-row degenerate group
            mask = pc.and_(
                pc.greater_equal(tb.column("doc_id"), pa.scalar(11)),
                pc.less_equal(tb.column("doc_id"), pa.scalar(25)),
            )
            cols = {
                n: (
                    pc.if_else(mask, pa.nulls(len(tb), tb.column(n).type), tb.column(n))
                    if n == "source"
                    else tb.column(n)
                )
                for n in tb.column_names
            }
            tb = pa.table(cols)
        pq.write_table(tb, str(out / f"{t}.parquet"))
    return str(out)


@pytest.fixture(scope="module")
def null_source_duck(null_source_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{null_source_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("key", NULL_SOURCE_KEYS)
def test_null_source_corpus_oracle_parity(
    spark, null_source_dir, null_source_duck, key
):
    from engine.registry import collect

    queries, oracles = collect()
    fn = getattr(queries[key], "__wrapped__", queries[key])
    sp = fn(spark, null_source_dir).toPandas()
    du = null_source_duck.sql(oracles[key]).df()
    assert_frames_match(sp, du, key)


# r13 UNICODE corpus (sixth axis, VERDICT r12 item 4): multibyte UTF-8,
# combining marks, astral-plane emoji/math chars, RTL scripts, Turkish
# dotted/dotless i, full-width forms, ZWJ sequences. Sweep of all 364
# keys: 360 PASS, 4 FAIL — multimodal_decode_pipeline (oracle summed raw
# code points, == byte sum only for ASCII; now maps each code point to
# its UTF-8 byte-sum arithmetically), text_normalize_stopwords (engine
# divergence pinned below, not masked), pipeline_dedup_cascade (the
# r13 NULL-source fix mid-edit, passes now) and scan_binary_files (the
# documented static-oracle exclusion).
UNICODE_KEYS = [
    "multimodal_decode_pipeline",  # UTF-8 byte-sum oracle fix (r13)
    "pipeline_dedup_cascade",
    # keep-green pins: char-vs-byte-sensitive text kernels
    "multimodal_frame_sample",     # char-offset frames both engines
    "text_token_counts",
    "text_fingerprint",
    "dedup_near_minhash",
    "text_chunk_overlap",
    "fn_string_core",
]

_UNI_DOCS = {
    30: "café café naïve NAÏVE résumé",
    31: "日本語テスト 中文分析 한국어 日本語テスト",
    32: "\U0001F600 \U0001F469‍\U0001F4BB \U0001F1FA\U0001F1F8 \U0001D518\U0001D52B\U0001D526",
    33: "مرحبا بالعالم שלום עולם",
    34: "İstanbul İstanbul istanbul ıstanbul",
    35: "ＨＥＬＬＯ ｗｏｒｌｄ tab\there",
    36: "á̂̃stack è́ combining̈marḱ zero​width",
    37: "ß sharp STRASSE straße ẞ",
    38: "\U0010FFFF edge � replacement   line sep",
    39: "日本語テスト 中文分析 한국어 日本語テスト",  # dup of 31
    40: "café café naïve NAÏVE résumé",              # dup of 30
}


@pytest.fixture(scope="module")
def unicode_dir(tmp_path_factory):
    import pyarrow as pa

    out = tmp_path_factory.mktemp("sg_unicode")
    for t in TABLES:
        tb = pq.read_table(f"{SF_DIR}/{t}.parquet")
        if t == "documents":
            df = tb.to_pandas()
            for did, txt in _UNI_DOCS.items():
                df.loc[df.doc_id == did, "text"] = txt
            tb = pa.Table.from_pandas(df, schema=tb.schema, preserve_index=False)
        pq.write_table(tb, str(out / f"{t}.parquet"))
    return str(out)


@pytest.fixture(scope="module")
def unicode_duck(unicode_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{unicode_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("key", UNICODE_KEYS)
def test_unicode_corpus_oracle_parity(spark, unicode_dir, unicode_duck, key):
    from engine.registry import collect

    queries, oracles = collect()
    fn = getattr(queries[key], "__wrapped__", queries[key])
    sp = fn(spark, unicode_dir).toPandas()
    du = unicode_duck.sql(oracles[key]).df()
    assert_frames_match(sp, du, key)


def test_unicode_case_mapping_divergence_pinned(spark, unicode_dir, unicode_duck):
    """text_normalize_stopwords is EXCLUDED from unicode oracle parity BY
    DESIGN (the only lower()-output key the r13 sweep failed): Spark's
    lower() is Java's full Unicode case mapping — lower('İ') = 'i' +
    U+0307 combining dot (two code points) — while DuckDB's utf8proc
    simple mapping gives plain 'i'. Both are conformant; a user switching
    engines sees Spark's own documented behavior, same policy as the
    grouping-sets-on-empty divergence (docs/SCALE.md r12/r13). This test
    pins BOTH semantics so a silent change in either engine surfaces."""
    from engine.registry import collect

    queries, _ = collect()
    fn = getattr(
        queries["text_normalize_stopwords"],
        "__wrapped__",
        queries["text_normalize_stopwords"],
    )
    sp = {
        r["doc_id"]: r["normalized"]
        for r in fn(spark, unicode_dir).filter("doc_id = 34").collect()
    }
    assert sp[34] == "i̇stanbul i̇stanbul istanbul ıstanbul"
    du = unicode_duck.sql(
        "SELECT array_to_string(list_filter(string_split(lower(text), ' '),"
        " t -> length(t) > 1), ' ') AS n FROM documents WHERE doc_id = 34"
    ).fetchone()[0]
    assert du == "istanbul istanbul istanbul ıstanbul"


# r13 LONG-DOCUMENT corpus (seventh axis): heavy-tailed doc lengths are
# the real crawl shape (one multi-MB concatenated dump among normal
# docs). An engine-side sweep with a 1M-token / 5 MB doc found a whole
# QUADRATIC-in-doc-length class: per-index substring(text, i, k) scans
# from the string start every call (no O(1) char offsets on UTF8String),
# split(text) referenced inside a lambda re-tokenizes per element, and
# slice(arr, i, k) inside a lambda runs interpreted (no codegen in
# higher-order functions) and copies the WHOLE array per call — plus
# join-inferred isnotnull filters pushing BELOW the gram projection and
# re-inlining split() into the lambda (fixed with a persist barrier).
# Eight kernels hung or ground for minutes on ONE such doc; all now run
# the 1M-token corpus in seconds (docs/SCALE.md r13). This fixture is
# parity-SIZED (5k/2k tokens): the DuckDB oracles themselves are
# quadratic on million-token docs (string_split per lambda element), so
# correctness pins run here and the 1M-token timing evidence lives in
# the rehearsal record.
LONG_DOC_KEYS = [
    "dedup_minhash_signature",   # element_at shingles, inner char fold
    "dedup_near_minhash",        # bound char-array 5-gram shingles
    "dedup_ngram_jaccard",       # persist barrier vs filter re-inline
    "text_containment",          # same kernel + persist barrier
    "text_fingerprint",          # bound code array, O(1) window folds
    "text_decontaminate",        # element_at shingles
    "text_chunk_overlap",        # struct-array explode, no toks copy
    "multimodal_frame_sample",   # struct-array explode, O(1) frame chars
    "multimodal_signal_energy",  # bound code array, O(1) frame folds
    "multimodal_decode_pipeline",  # 8dp + per-block round: ~1.6 GB envelope
    "dedup_simhash",             # char-array token hash
    "pipeline_dedup_cascade",    # composes the fixed minhash kernel
]


@pytest.fixture(scope="module")
def long_doc_dir(tmp_path_factory):
    import random

    import pyarrow as pa

    out = tmp_path_factory.mktemp("sg_longdoc")
    rng = random.Random(13)
    vocab = [f"w{i:03d}" for i in range(500)]
    long_text = " ".join(rng.choice(vocab) for _ in range(5_000))
    mid_text = " ".join(rng.choice(vocab) for _ in range(2_000))
    for t in TABLES:
        tb = pq.read_table(f"{SF_DIR}/{t}.parquet")
        if t == "documents":
            df = tb.to_pandas()
            df.loc[df.doc_id == 50, "text"] = long_text
            df.loc[df.doc_id == 51, "text"] = mid_text
            df.loc[df.doc_id == 52, "text"] = mid_text  # dup long pair
            tb = pa.Table.from_pandas(df, schema=tb.schema, preserve_index=False)
        pq.write_table(tb, str(out / f"{t}.parquet"))
    return str(out)


@pytest.fixture(scope="module")
def long_doc_duck(long_doc_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{long_doc_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("key", LONG_DOC_KEYS)
def test_long_doc_corpus_oracle_parity(spark, long_doc_dir, long_doc_duck, key):
    from engine.registry import collect

    queries, oracles = collect()
    fn = getattr(queries[key], "__wrapped__", queries[key])
    sp = fn(spark, long_doc_dir).toPandas()
    if key not in oracles:
        assert len(sp) > 0  # ROWS-only key (xxhash64 banding)
        return
    du = long_doc_duck.sql(oracles[key]).df()
    assert_frames_match(sp, du, key)


# r13 RAGGED-EMBEDDING corpus (eighth axis): wrong-dimension vectors from
# failed/partial inference — the enrichment-corruption shape the
# NULL-embedding axis doesn't cover. Sweep of all 364 keys with dims
# 32/32/1 injected among 64s: 12 keys crashed (np.stack "all input arrays
# must have the same shape", reshape misalignment, ANSI element_at OOB)
# or died in the ORACLE (DuckDB list_inner_product rejects mismatched
# dims). Contract (engine.tables.vectors, extending the r12 NULL rule):
# a wrong-dim vector is un-embeddable in the corpus's vector space — the
# vector table IS the modal-dim subspace (ties to the smaller dim; one
# cached probe job per corpus; oracles carry the matching
# len(embedding) = <modal subquery> predicate, structurally BEFORE any
# list_dot_product so DuckDB cannot reorder the conjuncts into a crash).
RAGGED_EMB_KEYS = [
    "dedup_embedding_cosine",
    "dedup_semdedup",
    "emb_binary_quantize",
    "emb_cosine_histogram",
    "emb_kmeans_lloyd",
    "emb_pca_project",
    "emb_random_projection_jl",
    "sim_ann_ivf",
    "sim_ann_rp_lsh",
    "sim_eval_ndcg",
    "sim_knn_query",
    "sim_topk_pairs",
]


@pytest.fixture(scope="module")
def ragged_emb_dir(tmp_path_factory):
    import pyarrow as pa

    out = tmp_path_factory.mktemp("sg_ragged")
    for t in TABLES:
        tb = pq.read_table(f"{SF_DIR}/{t}.parquet")
        if t == "embeddings":
            df = tb.to_pandas()
            for vid, keep in ((11, 32), (12, 32), (13, 1)):
                df.loc[df.vec_id == vid, "embedding"] = df.loc[
                    df.vec_id == vid, "embedding"
                ].map(lambda v, k=keep: v[:k])
            tb = pa.Table.from_pandas(df, schema=tb.schema, preserve_index=False)
        pq.write_table(tb, str(out / f"{t}.parquet"))
    return str(out)


@pytest.fixture(scope="module")
def ragged_emb_duck(ragged_emb_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{ragged_emb_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("key", RAGGED_EMB_KEYS)
def test_ragged_emb_corpus_oracle_parity(
    spark, ragged_emb_dir, ragged_emb_duck, key
):
    from engine.registry import collect

    queries, oracles = collect()
    fn = getattr(queries[key], "__wrapped__", queries[key])
    sp = fn(spark, ragged_emb_dir).toPandas()
    du = ragged_emb_duck.sql(oracles[key]).df()
    assert_frames_match(sp, du, key)
