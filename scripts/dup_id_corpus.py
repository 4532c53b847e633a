"""Ninth degenerate axis (r14): duplicate / colliding ids.

Every keeper contract, as-of join, multimodal_join (doc_id = vec_id) and
incremental-refresh classification in the engine assumes doc_id / vec_id /
event_id / o_orderkey are unique. A real re-crawl or a retried ingest batch
violates all of them: the same id arrives again with a DIFFERENT payload
(recrawled text, re-embedded vector, corrected order) or an IDENTICAL one
(exact replay). This builds an sf0.01-derived corpus that injects both
shapes plus doc_id↔vec_id misalignment, deterministically (no RNG):

- documents: doc_ids 11–20 get one colliding extra row each (different
  text/source/lang), 21 is TRIPLICATED, 22 gets an exact-replay copy.
- embeddings: vec_ids 11–15 collide with a different vector (negated) and
  label; vec_ids 31–35 are DROPPED (docs without vectors) and 501–505
  ADDED (vectors without docs) — the misalignment shape.
- events: event_ids 101–110 collide at ts+1h with different value;
  201–203 collide at the IDENTICAL timestamp (tie-break stress).
- orders 11–20, lineitem first 10 (orderkey, linenumber) pairs,
  customer 11–15, supplier 11–12, part 11–15, nation 3: each gets one
  colliding row with perturbed payload.

Used by the r14 sweep and by tests/test_empty_corpus.py's dup_id fixture —
ONE generator so the pinned tests exercise exactly the swept corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def build(out_dir: str, sf_dir: str = "/root/testdata/sf0.01") -> str:
    import os

    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        tb = pq.read_table(f"{sf_dir}/{t}.parquet")
        df = tb.to_pandas()
        extra = None
        if t == "documents":
            base = df[df.doc_id.between(11, 20)].copy()
            base["text"] = [
                f"recrawl variant {i} of this document with drifted words"
                for i in range(len(base))
            ]
            base["source"] = "recrawl"
            base["n_chars"] = base["text"].str.len()
            tri = df[df.doc_id == 21].copy()
            tri2 = tri.copy()
            tri["text"] = "second crawl of doc twenty one entirely new words"
            tri["n_chars"] = tri["text"].str.len()
            tri2["text"] = "third crawl of doc twenty one shares new words"
            tri2["n_chars"] = tri2["text"].str.len()
            replay = df[df.doc_id == 22].copy()  # byte-identical replay
            extra = pd.concat([base, tri, tri2, replay])
        elif t == "embeddings":
            df = df[~df.vec_id.between(31, 35)]  # docs without vectors
            coll = df[df.vec_id.between(11, 15)].copy()
            coll["embedding"] = coll["embedding"].map(
                lambda v: np.negative(np.asarray(v, dtype=np.float32))
            )
            coll["label"] = (coll["label"] + 1) % 10
            orphan = df[df.vec_id.between(41, 45)].copy()  # vectors w/o docs
            orphan["vec_id"] = orphan["vec_id"] + 460  # 501–505
            extra = pd.concat([coll, orphan])
        elif t == "events":
            shift = df[df.event_id.between(101, 110)].copy()
            shift["ts"] = shift["ts"] + pd.Timedelta(hours=1)
            shift["value"] = shift["value"] * 2.0 + 1.0
            shift["event_type"] = "replay"
            tie = df[df.event_id.between(201, 203)].copy()  # identical ts
            tie["value"] = tie["value"] + 100.0
            extra = pd.concat([shift, tie])
        elif t == "orders":
            o = df[df.o_orderkey.between(11, 20) | (df.o_orderkey % 1500 == 7)].head(10).copy()
            o["o_totalprice"] = o["o_totalprice"] + 1000.0
            o["o_orderdate"] = o["o_orderdate"] + pd.Timedelta(days=1)
            o["o_orderpriority"] = "5-LOW"
            extra = o
        elif t == "lineitem":
            li = df.head(10).copy()
            li["l_quantity"] = li["l_quantity"] + 1.0
            li["l_extendedprice"] = li["l_extendedprice"] * 1.1
            extra = li
        elif t == "customer":
            c = df[df.c_custkey.between(11, 15)].copy()
            c["c_acctbal"] = c["c_acctbal"] - 500.0
            c["c_mktsegment"] = "MACHINERY"
            extra = c
        elif t == "supplier":
            s = df[df.s_suppkey.between(11, 12)].copy()
            s["s_acctbal"] = s["s_acctbal"] + 1.0
            extra = s
        elif t == "part":
            p = df[df.p_partkey.between(11, 15)].copy()
            p["p_retailprice"] = p["p_retailprice"] + 10.0
            p["p_brand"] = "Brand#99"
            extra = p
        elif t == "nation":
            n = df[df.n_nationkey == 3].copy()
            n["n_name"] = "DUPLIKAT"
            extra = n
        if extra is not None:
            df = pd.concat([df, extra], ignore_index=True)
        out = pa.Table.from_pandas(df, schema=tb.schema, preserve_index=False)
        pq.write_table(out, f"{out_dir}/{t}.parquet")
    return out_dir


if __name__ == "__main__":
    import sys

    build(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sg_dup_id")
    print("built")
