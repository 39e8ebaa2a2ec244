"""PQ ADC recall@10 vs exact L2 top-10 — the quantization-quality curve
for RECALL.md.

Codes come from the same argmin the engine computes (tests pin
pq_encode == numpy argmin on every fixture vector), so the sweep runs the
numpy equivalent for speed; trained codebooks come from the REAL
`pq_train` (Spark MLlib k-means per subspace).

Usage: PYTHONPATH=/root/repo python tools/make_pq_recall.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_QUERIES = 100
M = 8


def recall_at_10(
    vecs: np.ndarray, cb: np.ndarray, qidx: np.ndarray, rerank: int = 0
) -> float:
    m, _k, d = cb.shape
    codes = np.stack(
        [
            np.argmin(
                ((vecs[:, j * d : (j + 1) * d][:, None, :] - cb[j][None]) ** 2).sum(-1),
                axis=1,
            )
            for j in range(m)
        ],
        axis=1,
    )
    hits = 0
    for qi in qidx:
        q = vecs[qi]
        exact = np.argsort(((vecs - q) ** 2).sum(1), kind="stable")[:10]
        lut = np.stack(
            [((cb[j] - q[j * d : (j + 1) * d]) ** 2).sum(1) for j in range(m)]
        )
        adc = lut[np.arange(m)[None, :], codes].sum(1)
        if rerank:
            short = np.argsort(adc, kind="stable")[:rerank]
            ex = ((vecs[short] - q) ** 2).sum(1)
            approx = short[np.argsort(ex, kind="stable")[:10]]
        else:
            approx = np.argsort(adc, kind="stable")[:10]
        hits += len(set(exact) & set(approx))
    return hits / (10 * len(qidx))


def main() -> int:
    import duckdb

    from siddhi_io_cdc_spark.functions.similarity import pq_codebooks, pq_train
    from siddhi_io_cdc_spark.session import get_spark

    vecs = np.array(
        [
            r[0]
            for r in duckdb.sql(
                f"SELECT embedding FROM read_parquet('{SF_DIR}/embeddings.parquet') "
                "ORDER BY vec_id"
            ).fetchall()
        ],
        dtype=np.float64,
    )
    dim = vecs.shape[1]
    rs = np.random.RandomState(123)
    qidx = rs.choice(len(vecs), size=min(N_QUERIES, len(vecs)), replace=False)

    spark = get_spark("pq-recall", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    print(f"## PQ (m={M}) recall@10 — {SF_DIR}, corpus {len(vecs)}, "
          f"{len(qidx)} queries")
    for k in (16, 64, 256):
        cb_p = pq_codebooks(dim, m=M, k=k)
        cb_t = pq_train(emb, m=M, k=k)
        bits = M * int(np.log2(k))
        print(
            f"k={k:4d} ({bits:3d}-bit code, {dim * 4 * 8 // bits}x compression): "
            f"pseudo={recall_at_10(vecs, cb_p, qidx):.4f} "
            f"trained={recall_at_10(vecs, cb_t, qidx):.4f} "
            f"trained+rerank100={recall_at_10(vecs, cb_t, qidx, rerank=100):.4f}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
