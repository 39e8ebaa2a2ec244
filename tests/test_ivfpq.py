"""IVFADC materialized layout: probe parity with a numpy two-stage
reference, partition pruning, and codebook round-trip."""

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from siddhi_io_cdc_spark.functions.similarity import (
    ivf_assign,
    pq_codebooks,
    probe_ivfpq_index,
    write_ivfpq_index,
)


@pytest.fixture(scope="module")
def index(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivfpq") / "index")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    centroids, codebooks = write_ivfpq_index(
        emb, path, nlist=8, pq_m=8, pq_k=16
    )
    return path, centroids, codebooks, emb


def _numpy_probe(emb_rows, centroids, codebooks, q, nprobe, rerank, k):
    qv = np.asarray(q, dtype=np.float64)
    probes = set(np.argsort(-(centroids @ qv), kind="stable")[:nprobe].tolist())
    m, _kc, d = codebooks.shape
    lut = np.stack(
        [((codebooks[j] - qv[j * d : (j + 1) * d]) ** 2).sum(1) for j in range(m)]
    )
    cands = []
    for vid, vec in emb_rows:
        v = np.asarray(vec, dtype=np.float64)
        cell = int(np.argmax(centroids @ v))
        if cell not in probes:
            continue
        codes = [
            int(np.argmin(((codebooks[j] - v[j * d : (j + 1) * d]) ** 2).sum(1)))
            for j in range(m)
        ]
        adc = round(float(sum(lut[j][codes[j]] for j in range(m))), 6)
        cands.append((vid, v, adc))
    short = sorted(cands, key=lambda t: (t[2], t[0]))[:rerank]
    exact = sorted(
        ((vid, round(float(((v - qv) ** 2).sum()), 6)) for vid, v, _ in short),
        key=lambda t: (t[1], t[0]),
    )[:k]
    return [vid for vid, _ in exact]


def test_probe_matches_numpy_two_stage(spark, index):
    path, centroids, codebooks, emb = index
    rows = [(r.vec_id, r.embedding) for r in emb.collect()]
    for qid in (0, 17, 101):
        q = dict(rows)[qid]
        got = [
            r.vec_id
            for r in probe_ivfpq_index(
                spark, path, q, k=10, nprobe=3, rerank=60
            ).collect()
        ]
        assert got == _numpy_probe(rows, centroids, codebooks, q, 3, 60, 10)


def test_probe_scan_is_partition_pruned(spark, index):
    path, _centroids, _codebooks, emb = index
    q = emb.first().embedding
    df = probe_ivfpq_index(spark, path, q, k=5, nprobe=2, rerank=20)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "cell" in plan.split("PartitionFilters")[1][:200]


def test_codebooks_round_trip(spark, index):
    path, centroids, codebooks, _emb = index
    from siddhi_io_cdc_spark.functions.similarity import _hadoop_read_text

    stored = np.array(
        json.loads(_hadoop_read_text(spark, path + "/_pq_codebooks.json"))
    )
    assert stored.shape == codebooks.shape
    assert np.array_equal(stored, codebooks)


def test_stored_cells_match_ivf_assign(spark, index):
    path, centroids, _codebooks, emb = index
    stored = spark.read.parquet(path).select("vec_id", "cell")
    recomputed = emb.select(
        "vec_id", ivf_assign(F.col("embedding"), centroids).alias("cell2")
    )
    bad = stored.join(recomputed, "vec_id").where(F.col("cell") != F.col("cell2"))
    assert bad.count() == 0
