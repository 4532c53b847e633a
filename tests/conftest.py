"""Shared fixtures: one warm SparkSession per test run, a DuckDB connection
with the ten corpus views, and the Spark-vs-DuckDB comparator that mirrors the
driver's t2 check (row-count + schema + order-insensitive value compare)."""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The suite's plan-shape asserts pin the LOCAL profile (no AdaptiveSparkPlan
# wrappers); an inherited SPARK_GRAFT_AQE=true would fail them confusingly.
# AQE behavior is tested explicitly via runtime confs in tests/test_aqe.py.
os.environ["SPARK_GRAFT_AQE"] = "false"

from engine.session import get_spark  # noqa: E402
from engine.tables import TABLES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_MID = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("spark-graft-tests", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_datetime64_any_dtype(col):
            # canonical 6-digit string, mirroring scripts/driver_sim.canon
            # (r14): the far-future collect fallback (collect_pdf) returns
            # Spark timestamps as yyyy-MM-dd HH:mm:ss.ffffff STRINGS when
            # pandas' ns range can't hold them, so the DuckDB side's
            # datetime64 must render to the identical bytes.
            df[c] = (
                col.astype("datetime64[us]")
                .dt.strftime("%Y-%m-%d %H:%M:%S.%f")
                .fillna("NaT")
            )
        elif pd.api.types.is_float_dtype(col):
            df[c] = col.astype("float64")
        elif pd.api.types.is_integer_dtype(col):
            df[c] = col.astype("Int64")
        elif pd.api.types.is_bool_dtype(col):
            df[c] = col.astype("boolean")
        elif col.dtype == object:
            # array-typed results (Spark arrays / DuckDB lists) arrive as
            # ndarrays or lists — not sortable/comparable; canonicalize
            df[c] = col.map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
    if len(df):
        df = df.sort_values(by=list(df.columns), na_position="last", kind="mergesort")
    return df.reset_index(drop=True)


def assert_frames_match(sp: pd.DataFrame, du: pd.DataFrame, key: str) -> None:
    assert sorted(sp.columns) == sorted(du.columns), (
        f"{key}: column mismatch spark={sorted(sp.columns)} duck={sorted(du.columns)}"
    )
    assert len(sp) == len(du), f"{key}: row count spark={len(sp)} duck={len(du)}"
    a, b = _normalize(sp), _normalize(du)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            af = av.astype("float64").to_numpy()
            bf = bv.astype("float64").to_numpy()
            ok = np.isclose(af, bf, rtol=1e-9, atol=1e-10, equal_nan=True)
            assert ok.all(), f"{key}.{c}: float mismatch at rows {np.where(~ok)[0][:5]}: " \
                f"spark={af[~ok][:5]} duck={bf[~ok][:5]}"
        else:
            an = av.where(pd.notna(av), None).tolist()
            bn = bv.where(pd.notna(bv), None).tolist()
            assert an == bn, (
                f"{key}.{c}: value mismatch; first diff at "
                f"{next((i, x, y) for i, (x, y) in enumerate(zip(an, bn)) if x != y)}"
            )


def run_compare(spark, duck, key: str, sf_dir: str = SF_DIR) -> None:
    from engine.registry import collect

    queries, oracles = collect()
    sp = queries[key](spark, sf_dir).toPandas()
    # Oracle strings are static and sf0.01-bound by the driver contract
    # (the driver only ever runs them there). The few oracles that embed a
    # filesystem path (read_blob in scan_binary_files) hardcode the sf0.01
    # dir; retarget them when this faster sf0.001 loop runs.
    sql = oracles[key]
    if sf_dir != SF_DIR_MID:
        sql = sql.replace(SF_DIR_MID, sf_dir)
    du = duck.sql(sql).df()
    assert_frames_match(sp, du, key)
