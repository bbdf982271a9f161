"""Deterministic scale-up of the driver testdata: replicate sf0.1 K times
with id-shifted keys into a new sf directory (default /tmp/sf1.0, K=10 ->
1M events), so the headline bench can be run at a 10x scale point without
external data. Entity keys are shifted per replica (sessions, documents and
vectors stay independent across replicas); timestamps are kept, so per-key
event-time structure is identical to sf0.1.

Usage: python tools/make_sf.py [K] [out_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

# table -> (id columns to shift, shift stride per replica)
SHIFTS = {
    "events": (["event_id", "user_id"], {"event_id": 1_000_000, "user_id": 100_000}),
    "documents": (["doc_id"], {"doc_id": 1_000_000}),
    "embeddings": (["vec_id"], {"vec_id": 1_000_000}),
    "orders": (["o_orderkey", "o_custkey"], {"o_orderkey": 10_000_000, "o_custkey": 1_000_000}),
    "lineitem": (["l_orderkey"], {"l_orderkey": 10_000_000}),
    "customer": (["c_custkey"], {"c_custkey": 1_000_000}),
    "supplier": (["s_suppkey"], {"s_suppkey": 1_000_000}),
    "part": (["p_partkey"], {"p_partkey": 1_000_000}),
}
COPY_ONLY = ["nation", "region"]


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1.0"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t, (cols, strides) in SHIFTS.items():
        desc = con.execute(f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").df()
        allcols = desc["column_name"].tolist()
        parts = []
        for r in range(k):
            sel = ", ".join(
                f"{c} + {r * strides[c]} AS {c}" if c in strides else c
                for c in allcols
            )
            parts.append(f"SELECT {sel} FROM '{SRC}/{t}.parquet'")
        union = " UNION ALL ".join(parts)
        con.execute(f"COPY ({union}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")
    for t in COPY_ONLY:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{out}/{t}.parquet'"
            " (FORMAT PARQUET)"
        )
    print(f"wrote {out} (K={k})")


if __name__ == "__main__":
    main()
