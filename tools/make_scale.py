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

Replica CONTENT is perturbed so similarity queries scale honestly too
(round-4 ADVICE: identical replica text/embeddings would make every doc
gain factor-1 exact twins, and near-dup pair counts would grow
quadratically in the factor). Replica 0 keeps the original bytes; replica
``i > 0``:

- ``documents.text``: every vowel becomes ONE per-replica consonant
  letter (see ``_TEXT_PERTURB``). A single appended tag token is NOT
  enough — that is literally how the contract's planted clones are built
  (one extra token leaves 5-token-shingle Jaccard at (T-4)/(T-3) ≈ 0.98)
  — and additive-only schemes (per-token suffixes) leave all ORIGINAL
  char-3-grams in the set, which measured gram Jaccard 0.836 on
  repetitive docs, over the 0.8 threshold. Single-letter vowel rewriting
  changes every vowel-touching gram/token/shingle (cross-replica
  similarity collapses below every pair threshold) while preserving text
  length, token boundaries, and per-doc token counts exactly — so scaled
  ratios measure the engine, not fixture drift. ``n_chars`` carries
  through unchanged (lengths are preserved).
- ``embeddings.embedding``: each element ``x`` becomes
  ``x * (1 + 0.8 cos((9973 + 101 i) x))`` — deterministic and replica-
  dependent through the FREQUENCY, not the phase: an additive phase
  ``cos(θ + i)`` leaves replica pairs with multiplier correlation
  ``cos(i - j)`` (≈ 0.96 at |i−j| = 6; measured max cross-replica
  cosine 0.9967, OVER the 0.99 near-dup threshold), while frequency
  offsets ≫ 2π/spread(x) decorrelate every replica pair. Simulated and
  measured worst same-base cosine ≈ 0.94 at amplitude 0.8.

Usage:
    python tools/make_scale.py [--factor 10] [--src /root/testdata/sf0.1] \
        [--dest /tmp/sf1]

Then: SPARK_GRAFT_SF_DIR=/tmp/sf1 python bench.py
"""

from __future__ import annotations

import argparse
import os
import sys

import duckdb

# Runnable as `python tools/<name>.py` without PYTHONPATH: the repo root
# (one level up) hosts __spark_entry__ and siddhi_io_cdc_spark.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

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

#: table -> {column: SQL expression (over t.<col> and r.i) replacing it in
#: replicas i > 0}. Keeps replica 0 byte-identical to the source.
#: Every vowel becomes ONE per-replica consonant (replica i -> the i-th
#: letter of a 20-consonant alphabet), so text LENGTH, token boundaries,
#: and token/char counts are all IDENTICAL to the source — scaled-bench
#: ratios then measure engine behavior, not fixture drift (the round-5 v1
#: scheme 'q' || i injected digits, which TOKEN_RE splits into separate
#: tokens, inflating per-doc token volume ~3x and making every token-bound
#: query look superlinear). Cross-replica similarity still collapses:
#: ~38% of characters (the vowels) differ between any two replicas, so
#: vowel-bearing tokens, 5-token shingles, and char-3-grams all diverge
#: (measured on a 30-doc sample: max cross-replica token-shingle Jaccard
#: 0.0, max char-3-gram Jaccard 0.23 — far under the 0.7/0.8 pair
#: thresholds), and per-token simhash inputs decorrelate.
_TEXT_PERTURB = (
    r"regexp_replace(t.text, '[aeiou]', "
    r"substr('bcdfghjklmnpqrstvwxz', (r.i % 20) + 1, 1), 'g')"
)

PERTURB: dict[str, dict[str, str]] = {
    "documents": {
        "text": _TEXT_PERTURB,
    },
    "embeddings": {
        "embedding": (
            "list_transform(t.embedding, x -> "
            "CAST(x * (1 + 0.8 * cos(x * (9973.0 + 101.0 * r.i))) AS FLOAT))"
        ),
    },
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
    # The vowel-substitution letter cycles through a 20-consonant alphabet
    # (r.i % 20), so replicas i and i+20 would be byte-identical — planting
    # cross-replica exact twins that silently break the 'no new duplicate
    # pairs' invariant the whole perturbation scheme exists to preserve.
    # Refuse factors past the alphabet instead of producing a subtly wrong
    # fixture (factor 20 = sf2 from sf0.1 covers every measured point).
    if factor > 20:
        raise ValueError(
            f"factor={factor} > 20: text perturbation cycles its 20-letter "
            "alphabet, so replicas 20 apart are byte-identical and would "
            "plant cross-replica exact duplicates. Scale from a larger src "
            "instead (e.g. factor 10 from an sf1 build)."
        )
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
        perturbed = PERTURB.get(tbl, {})
        if not shifts:
            sql = f"COPY (SELECT * FROM read_parquet('{path}')) TO '{dest}/{tbl}.parquet' (FORMAT PARQUET)"
        else:
            proj = ", ".join(
                f"t.{c} + r.i * {strides[shifted[c]]} AS {c}"
                if c in shifted
                else (
                    f"CASE WHEN r.i = 0 THEN t.{c} ELSE {perturbed[c]} END AS {c}"
                    if c in perturbed
                    else f"t.{c}"
                )
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
