"""ML data-frame analytics outlier detection: the four published
methods (OutlierDetection.java:288 LOF/LDOF/DISTANCE_KTH_NN/
DISTANCE_KNN) vs an independent brute-force implementation."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.ops.ml import outlier_detection


def _brute(mat: np.ndarray, k: int, method: str) -> np.ndarray:
    """Straight-from-the-paper reference scorer (full distance
    matrix, no chunking — independent of the engine's code path)."""
    n = len(mat)
    dm = np.sqrt(((mat[:, None, :] - mat[None, :, :]) ** 2).sum(-1))
    np.fill_diagonal(dm, np.inf)
    order = np.argsort(dm, axis=1, kind="stable")[:, :k]
    rows = np.arange(n)[:, None]
    kdists = dm[rows, order]
    if method == "distance_kth_nn":
        return kdists[:, -1]
    if method == "distance_knn":
        return kdists.mean(axis=1)
    if method == "ldof":
        out = np.empty(n)
        for i in range(n):
            nb = order[i]
            sub = dm[np.ix_(nb, nb)].copy()
            iu = np.triu_indices(k, 1)
            inner = sub[iu].mean() if k > 1 else 0.0
            out[i] = kdists[i].mean() / max(inner, 1e-300)
        return out
    # lof
    kd = kdists[:, -1]
    reach = np.maximum(kdists, kd[order])
    lrd = 1.0 / np.maximum(reach.mean(axis=1), 1e-300)
    return lrd[order].mean(axis=1) / lrd


@pytest.fixture(scope="module")
def data(spark):
    rng = np.random.default_rng(42)
    mat = rng.normal(size=(80, 8))
    mat[79] += 25.0  # planted far outlier
    rows = [(int(i), [float(x) for x in mat[i]]) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df.repartition(4).cache(), mat


@pytest.mark.parametrize("method", ["distance_kth_nn", "distance_knn",
                                    "ldof", "lof"])
def test_matches_brute_force(data, method):
    df, mat = data
    got = {r["vec_id"]: r["outlier_score"] for r in
           outlier_detection(df, n_neighbors=5, method=method).collect()}
    want = _brute(mat, 5, method)
    assert len(got) == 80
    for i in range(80):
        assert got[i] == pytest.approx(want[i], rel=1e-9), (method, i)


def test_planted_outlier_ranks_first(data):
    df, _ = data
    for method in ("distance_knn", "lof"):
        top = (outlier_detection(df, n_neighbors=5, method=method)
               .orderBy(F.desc("outlier_score")).first())
        assert top["vec_id"] == 79, method


def test_validation(data, spark):
    df, _ = data
    with pytest.raises(ValueError):
        outlier_detection(df, method="zscore")
    with pytest.raises(ValueError):
        outlier_detection(df, n_neighbors=0)
    with pytest.raises(ValueError):
        outlier_detection(df, n_neighbors=80)  # k >= corpus size
    with pytest.raises(ValueError):
        outlier_detection(df, max_broadcast=10)
