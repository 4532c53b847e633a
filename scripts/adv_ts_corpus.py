"""Tenth degenerate axis (r14): adversarial timestamps.

The window / streaming / as-of / session / resample families all consume
`events.ts`, `orders.o_orderdate` or `lineitem.l_shipdate`, and every prior
axis left those columns untouched — the corpus timestamps are uniformly
benign (one month of 2024, microsecond-unique, mid-range). Real ingest is
not: clock bugs ship pre-1970 epochs (negative µs), sentinel rows carry
year-9999 "never expires" stamps (one of which poisons any watermark it
reaches), bursts collide at the identical microsecond (the (ts,) ordering
stops being total), and boundary-exact stamps (midnight month starts,
23:59:59.999999 month ends, epoch zero, Monday 00:00 week seams) sit
exactly on every date_trunc seam the engine buckets by.

Injected shapes, all deterministic (no RNG), all under NEW unique ids so
this axis composes independently of the dup-id axis:

- events (+24 rows):
  - 5 pre-1970: 1969-12-31 23:59:59.999999 − k days (negative epoch µs),
    ids 910000+.
  - 4 far-future sentinels: 9999-06-15 12:00:00 + k hours, ids 920000+
    (headroom for +INTERVAL arithmetic) … plus ONE exact
    max-timestamp row 9999-12-31 23:59:59.999999, id 920999.
  - 6 identical-microsecond ties at 2024-01-15 12:00:00 exactly,
    distinct ids 930000+, distinct values (ordering by ts alone is a
    coin flip; by (ts, event_id) must stay total).
  - 8 boundary-exact stamps, ids 940000+: epoch 1970-01-01 00:00:00,
    month seam 2024-02-01 00:00:00 and 2024-01-31 23:59:59.999999,
    week seam Monday 2024-01-08 00:00:00 and Sunday
    2024-01-07 23:59:59.999999, hour seam 2024-01-10 05:00:00 and
    04:59:59.999999, and a DST-like spring-forward gap edge
    2024-03-10 03:00:00 (tz is UTC everywhere; the shape is the seam).
- orders (+6 rows, o_orderkey 910000+): o_orderdate at 1969-12-25,
  epoch 1970-01-01, 9999-06-15, and exact month seams
  1995-01-01 / 1994-12-31 (inside the TPC-H filter ranges) + 1992-01-01.
- lineitem (+6 rows, matching orderkeys, l_linenumber 1): l_shipdate
  mirroring the same shapes so ship-vs-order interval logic sees them.

Used by the r14 sweep and by tests/test_empty_corpus.py's adv_ts fixture —
ONE generator so the pinned tests exercise exactly the swept corpus.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def _TS(s: str) -> pd.Timestamp:
    # µs resolution explicitly: the default ns unit overflows at year 9999
    return pd.Timestamp(s).as_unit("us")


def _events_extra(df: pd.DataFrame) -> pd.DataFrame:
    proto = df.iloc[0]
    rows = []

    def add(eid, ts, etype, value, user_id=7):
        rows.append(
            {
                "event_id": eid,
                "ts": ts,
                "user_id": user_id,
                "event_type": etype,
                "value": value,
                "props": proto["props"],
            }
        )

    for k in range(5):  # pre-1970 (negative epoch µs)
        add(910000 + k, _TS("1969-12-31 23:59:59.999999") - pd.Timedelta(days=k), "click", 1.25 + k)
    for k in range(4):  # far-future sentinels with interval headroom
        add(920000 + k, _TS(f"9999-06-15 {12 + k}:00:00"), "error", 9.5 + k)
    add(920999, _TS("9999-12-31 23:59:59.999999"), "view", 99.0)  # exact max ts
    for k in range(6):  # identical-microsecond burst
        add(930000 + k, _TS("2024-01-15 12:00:00"), "view", 10.0 + k, user_id=11 + k)
    seams = [
        _TS("1970-01-01 00:00:00"),
        _TS("2024-02-01 00:00:00"),
        _TS("2024-01-31 23:59:59.999999"),
        _TS("2024-01-08 00:00:00"),
        _TS("2024-01-07 23:59:59.999999"),
        _TS("2024-01-10 05:00:00"),
        _TS("2024-01-10 04:59:59.999999"),
        _TS("2024-03-10 03:00:00"),
    ]
    for k, ts in enumerate(seams):
        add(940000 + k, ts, "purchase", 20.0 + k, user_id=3 + k)
    return pd.DataFrame(rows)


_ORDER_DATES = [
    _TS("1969-12-25"),
    _TS("1970-01-01"),
    _TS("9999-06-15"),
    _TS("1995-01-01"),
    _TS("1994-12-31"),
    _TS("1992-01-01"),
]


def _orders_extra(df: pd.DataFrame) -> pd.DataFrame:
    out = []
    for k, dt in enumerate(_ORDER_DATES):
        r = df.iloc[k % len(df)].copy()
        r["o_orderkey"] = 910000 + k
        r["o_orderdate"] = dt
        out.append(r)
    return pd.DataFrame(out)


def _lineitem_extra(df: pd.DataFrame) -> pd.DataFrame:
    out = []
    for k, dt in enumerate(_ORDER_DATES):
        r = df.iloc[k % len(df)].copy()
        r["l_orderkey"] = 910000 + k
        r["l_linenumber"] = 1
        r["l_shipdate"] = dt
        out.append(r)
    return pd.DataFrame(out)


def build(out_dir: str, sf_dir: str = "/root/testdata/sf0.01") -> str:
    import os

    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        tb = pq.read_table(f"{sf_dir}/{t}.parquet")
        df = tb.to_pandas()
        extra = None
        if t == "events":
            extra = _events_extra(df)
        elif t == "orders":
            extra = _orders_extra(df)
        elif t == "lineitem":
            extra = _lineitem_extra(df)
        if extra is not None:
            df = pd.concat([df, extra], ignore_index=True)
        out = pa.Table.from_pandas(df, schema=tb.schema, preserve_index=False)
        pq.write_table(out, f"{out_dir}/{t}.parquet")
    return out_dir


if __name__ == "__main__":
    import sys

    build(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sg_adv_ts")
    print("built")
