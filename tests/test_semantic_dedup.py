"""SemDeDup: k-means-cell-blocked semantic dedup (Abbas et al. 2023)."""

import pytest
from pyspark.sql import functions as F

from siddhi_io_cdc_spark.functions.dedup import semantic_dedup, semantic_dedup_pairs
from siddhi_io_cdc_spark.functions.similarity import ivf_centroids


@pytest.fixture(scope="module")
def vecs(spark):
    # two tight clusters on orthogonal axes + one isolated vector;
    # ids chosen so canonical-min keeps 0 and 10
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0, 0.0]),   # near-dup of 0
        (2, [0.998, 0.02, 0.0, 0.0]),   # near-dup of 0 and 1 (one component)
        (10, [0.0, 1.0, 0.0, 0.0]),
        (11, [0.0, 0.999, 0.012, 0.0]),  # near-dup of 10
        (20, [0.5, 0.5, 0.5, 0.5]),      # isolated
    ]
    return spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")


def test_pairs_within_threshold(vecs):
    cents = ivf_centroids(4, nlist=2)
    pairs = semantic_dedup_pairs(vecs, cents, tau=0.999).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert got == {(0, 1), (0, 2), (1, 2), (10, 11)}
    assert all(r.cosine >= 0.999 for r in pairs)


def test_keep_one_per_component(vecs):
    cents = ivf_centroids(4, nlist=2)
    kept = {r.vec_id for r in semantic_dedup(vecs, cents, tau=0.999).collect()}
    assert kept == {0, 10, 20}


def test_cell_blocking_bounds_pairs(vecs):
    # tau low enough that cross-cluster cosines qualify, but vectors in
    # different cells are never compared: with enough cells the orthogonal
    # clusters separate and no cross-cluster pair can appear
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    pairs = {(r.id_a, r.id_b) for r in semantic_dedup_pairs(vecs, cents, tau=0.0).collect()}
    # (vector 20 dots both centroids equally and ties into cell 0)
    cluster_x, cluster_y = {0, 1, 2, 20}, {10, 11}
    for a, b in pairs:
        assert not (a in cluster_x and b in cluster_y), f"cross-cell pair {(a, b)}"
        assert not (a in cluster_y and b in cluster_x), f"cross-cell pair {(a, b)}"
    assert (10, 11) in pairs and (0, 1) in pairs
