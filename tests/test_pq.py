"""Product quantization: encode agreement with a numpy argmin reference,
ADC top-k equality, trained-codebook quality, guards, and the map-only
encode plan."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from siddhi_io_cdc_spark.functions.similarity import (
    pq_codebooks,
    pq_encode,
    pq_topk,
    pq_train,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


CB = pq_codebooks(64, m=8, k=16)


def test_pq_encode_matches_numpy_argmin(emb):
    rows = pq_encode(emb, CB).select("embedding", "pq_code").collect()
    assert rows
    for r in rows:
        v = np.asarray(r.embedding, dtype=np.float64)
        for j in range(8):
            d = ((CB[j] - v[j * 8 : (j + 1) * 8]) ** 2).sum(axis=1)
            assert r.pq_code[j] == int(np.argmin(d))


def test_pq_encode_tie_breaks_to_lowest_index(spark):
    # duplicate centroids -> exact tie -> array_position picks the first
    cb = np.zeros((1, 3, 2))
    cb[0, 0] = [1.0, 1.0]
    cb[0, 1] = [5.0, 5.0]
    cb[0, 2] = [1.0, 1.0]
    df = spark.createDataFrame([([1.0, 1.0],)], "embedding array<double>")
    assert pq_encode(df, cb).first().pq_code == [0]


def test_pq_topk_equals_numpy_adc(emb):
    rows = pq_encode(emb, CB).select("vec_id", "embedding", "pq_code").collect()
    q = rows[0].embedding
    qv = np.asarray(q, dtype=np.float64)
    lut = np.stack([((CB[j] - qv[j * 8 : (j + 1) * 8]) ** 2).sum(axis=1) for j in range(8)])
    scores = {r.vec_id: float(sum(lut[j][r.pq_code[j]] for j in range(8))) for r in rows}
    ref = [i for i, _ in sorted(scores.items(), key=lambda kv: (kv[1], kv[0]))[:10]]
    got = [r.vec_id for r in pq_topk(emb, q, CB, k=10).collect()]
    assert got == ref


def test_pq_topk_precomputed_codes_identical(emb):
    q = emb.where(F.col("vec_id") == 1).first().embedding
    on_the_fly = pq_topk(emb, q, CB, k=10).collect()
    stored = pq_topk(
        pq_encode(emb, CB), q, CB, k=10, code_col="pq_code"
    ).collect()
    assert on_the_fly == stored


def test_pq_train_beats_pseudo_codebooks(emb):
    rows = [np.asarray(r.embedding, dtype=np.float64) for r in emb.limit(200).collect()]
    trained = pq_train(emb, m=8, k=16)
    assert trained.shape == (8, 16, 8)

    def qerr(cb):
        e = 0.0
        for v in rows:
            for j in range(8):
                e += ((cb[j] - v[j * 8 : (j + 1) * 8]) ** 2).sum(axis=1).min()
        return e / len(rows)

    assert qerr(trained) < qerr(CB)


def test_pq_guards(spark, emb):
    with pytest.raises(ValueError):
        pq_codebooks(64, m=7)
    with pytest.raises(ValueError):
        pq_train(emb, m=7)
    with pytest.raises(ValueError):
        pq_train(spark.createDataFrame([], "embedding array<double>"), m=8)


def test_pq_encode_plan_is_map_only(emb):
    plan = (
        pq_encode(emb, CB)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Python" not in plan


def test_pq_topk_rerank_matches_numpy_two_stage(emb):
    rows = pq_encode(emb, CB).select("vec_id", "embedding", "pq_code").collect()
    q = rows[3].embedding
    qv = np.asarray(q, dtype=np.float64)
    lut = np.stack([((CB[j] - qv[j * 8 : (j + 1) * 8]) ** 2).sum(axis=1) for j in range(8)])
    adc = {r.vec_id: (float(sum(lut[j][r.pq_code[j]] for j in range(8))), r.vec_id) for r in rows}
    short = sorted(adc, key=lambda i: adc[i])[:50]
    by_id = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in rows}
    exact = sorted(short, key=lambda i: (((by_id[i] - qv) ** 2).sum(), i))[:10]
    got = [r.vec_id for r in pq_topk(emb, q, CB, k=10, rerank=50).collect()]
    assert got == exact


def test_pq_topk_rerank_improves_recall(emb):
    rows = [(r.vec_id, np.asarray(r.embedding, dtype=np.float64)) for r in emb.collect()]
    q = rows[7][1]
    truth = {i for i, _ in sorted(rows, key=lambda t: (((t[1] - q) ** 2).sum(), t[0]))[:10]}
    plain = {r.vec_id for r in pq_topk(emb, list(q), CB, k=10).collect()}
    rr = {r.vec_id for r in pq_topk(emb, list(q), CB, k=10, rerank=200).collect()}
    assert len(rr & truth) >= len(plain & truth)


def test_pq_topk_rerank_guard(emb):
    q = [0.0] * 64
    with pytest.raises(ValueError):
        pq_topk(emb, q, CB, k=10, rerank=5)
