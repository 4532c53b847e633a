"""Unit tests for the r04 governance keys (engine/governance.py)."""

from __future__ import annotations

from tests.conftest import SF_DIR


def test_mask_preserves_shape_and_removes_content(spark):
    from engine.registry import collect

    queries, _ = collect()
    rows = queries["fn_mask_pii"](spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        assert len(r["name_masked"]) == r["name_len"]  # format-preserving
        assert set(r["phone_masked"]) <= set("n-")     # digits gone, dashes kept
        assert not any(ch.isdigit() for ch in r["name_masked"])


def test_aes_roundtrip_all_ok_and_padded_length(spark):
    from engine.registry import collect

    queries, _ = collect()
    rows = queries["fn_aes_roundtrip"](spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["roundtrip_ok"], r
        assert r["cipher_len"] % 16 == 0 and r["cipher_len"] > 0


def test_compression_codecs_agree(spark):
    from engine.registry import collect

    queries, _ = collect()
    rows = {r["fmt"]: (r["n"], r["total"]) for r in
            queries["sink_compression_codecs"](spark, SF_DIR).collect()}
    assert rows["parquet_zstd"] == rows["csv_gzip"]
    assert rows["parquet_zstd"][0] > 0
