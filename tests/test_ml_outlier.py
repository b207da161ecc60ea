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


# ---- tree-ensemble inference ------------------------------------------

TREE_A = {"nodes": [
    {"node_index": 0, "split_feature": 0, "threshold": 2.0,
     "left_child": 1, "right_child": 2, "default_left": True},
    {"leaf_value": 1.0},
    {"node_index": 2, "split_feature": 1, "threshold": 5.0,
     "left_child": 3, "right_child": 4},
    {"leaf_value": 2.0},
    {"leaf_value": 3.0},
]}
TREE_B = {"nodes": [
    {"node_index": 0, "split_feature": 1, "threshold": 4.0,
     "left_child": 1, "right_child": 2, "default_left": False},
    {"leaf_value": 10.0},
    {"leaf_value": 20.0},
]}


@pytest.fixture(scope="module")
def feat_df(spark):
    return spark.createDataFrame(
        [(1, 1.0, 3.0), (2, 3.0, 3.0), (3, 3.0, 7.0), (4, None, 6.0)],
        "id int, f0 double, f1 double")


def test_tree_weighted_sum(spark, feat_df):
    from elasticsearch_spark.ops.ml import ensemble_infer

    model = {"trained_models": [TREE_A, TREE_B],
             "aggregate_output": {"weighted_sum": {"weights": [0.5, 1.0]}}}
    out = ensemble_infer(model, ["f0", "f1"])
    got = {r["id"]: r["p"] for r in feat_df.select(
        "id", out["predicted_value"].alias("p")).collect()}
    # id=1: A=1.0 (f0<2), B=10 (f1<4) -> 0.5+10; id=2: A: f0>=2,f1<5 -> 2, B=10
    # id=3: A: f0>=2,f1>=5 -> 3, B: f1>=4 -> 20; id=4: f0 null -> default_left A=1, B: f1>=4 -> 20
    assert got == {1: 10.5, 2: 11.0, 3: 21.5, 4: 20.5}


def test_tree_logistic_and_exponent(spark, feat_df):
    import math

    from elasticsearch_spark.ops.ml import ensemble_infer

    model = {"trained_models": [TREE_A],
             "aggregate_output": {"logistic_regression": {"weights": [1.0]}}}
    out = ensemble_infer(model, ["f0", "f1"],
                         classification_labels=["lo", "hi"])
    r1 = feat_df.where("id = 1").select(
        out["predicted_value"].alias("v"),
        out["prediction_probability"].alias("p")).first()
    p1 = 1.0 / (1.0 + math.exp(-1.0))
    assert r1["v"] == "hi" and r1["p"] == pytest.approx(p1)
    exp_model = {"trained_models": [TREE_A],
                 "aggregate_output": {"exponent": {"weights": [1.0]}}}
    got = feat_df.where("id = 3").select(ensemble_infer(
        exp_model, ["f0", "f1"])["predicted_value"].alias("p")).first()
    assert got["p"] == pytest.approx(math.exp(3.0))


def test_tree_weighted_mode(spark):
    from elasticsearch_spark.ops.ml import ensemble_infer

    # three stumps voting classes {0,1}: class = f0 >= t for varied t
    def stump(t, lo, hi):
        return {"nodes": [
            {"node_index": 0, "split_feature": 0, "threshold": t,
             "left_child": 1, "right_child": 2},
            {"leaf_value": lo}, {"leaf_value": hi}]}

    model = {"trained_models": [stump(1.0, 0, 1), stump(2.0, 0, 1),
                                stump(3.0, 0, 1)],
             "aggregate_output": {"weighted_mode": {
                 "weights": [1.0, 1.0, 1.0], "num_classes": 2}}}
    df = spark.createDataFrame([(1, 0.5), (2, 2.5), (3, 9.0)],
                               "id int, f0 double")
    out = ensemble_infer(model, ["f0"], classification_labels=["no", "yes"])
    got = {r["id"]: (r["v"], round(r["p"], 6)) for r in df.select(
        "id", out["predicted_value"].alias("v"),
        out["prediction_probability"].alias("p")).collect()}
    assert got[1] == ("no", 1.0)       # 0 votes yes
    assert got[2] == ("yes", round(2 / 3, 6))  # 2 of 3 vote yes
    assert got[3] == ("yes", 1.0)


def test_tree_plan_is_codegen_only(spark, feat_df):
    from elasticsearch_spark.ops.ml import ensemble_infer

    model = {"trained_models": [TREE_A, TREE_B],
             "aggregate_output": {"weighted_sum": {}}}
    out = feat_df.select(ensemble_infer(
        model, ["f0", "f1"])["predicted_value"].alias("p"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_inference_pipeline_agg(spark):
    """inference pipeline agg (InferencePipelineAggregationBuilder):
    model runs over bucket metrics via buckets_path renames; bucket
    columns stay intact."""
    from elasticsearch_spark.ops.ml import inference_bucket_agg

    buckets = spark.createDataFrame(
        [("a", 1.0, 3.0), ("b", 3.0, 7.0)],
        "key string, avg_x double, max_y double")
    model = {"trained_models": [TREE_A, TREE_B],
             "aggregate_output": {"weighted_sum": {"weights": [0.5, 1.0]}}}
    out = inference_bucket_agg(
        buckets, model, {"f0": "avg_x", "f1": "max_y"})
    got = {r["key"]: r["inference_predicted_value"]
           for r in out.collect()}
    assert got == {"a": 10.5, "b": 21.5}
    assert set(out.columns) == {"key", "avg_x", "max_y",
                                "inference_predicted_value"}


def test_categorize_messages(spark):
    """ML log categorization: numeric/hex variable parts collapse, date
    stopwords drop, categories rank by doc_count then key."""
    from elasticsearch_spark.ops.ml import categorize_messages

    rows = (
        [(f"Failed login from 10.0.0.{i} port {1000 + i}",) for i in range(5)]
        + [(f"Disk full on /dev/sda at 9{i}%",) for i in range(3)]
        + [("Service started on Monday GMT",)]
        + [("deadbeef cafe 123abc",)]  # all hex / digit-led -> no category
    )
    df = spark.createDataFrame(rows, "message string")
    out = categorize_messages(df, "message").collect()
    got = [(r["mlcategory"], r["category_key"], r["doc_count"],
            r["examples"][0]) for r in out]
    assert got == [
        (1, "Failed login from port", 5, "Failed login from 10.0.0.0 port 1000"),
        (2, "Disk full on dev sda at", 3, "Disk full on /dev/sda at 90%"),
        (3, "Service started on", 1, "Service started on Monday GMT"),
    ]
    # the reference-style category regex matches its own examples
    import re as _re
    for r in out:
        assert _re.search(r["regex"], r["examples"][0])
    assert out[0]["regex"] == ".*?Failed.+?login.+?from.+?port.*?"


def test_categorize_messages_char_filters(spark):
    """categorization_filters run as pattern_replace char filters
    BEFORE tokenization (CategorizationAnalyzerConfig charFilters)."""
    from elasticsearch_spark.ops.ml import categorize_messages

    df = spark.createDataFrame(
        [("ERROR found in module alpha",),
         ("WARN found in module beta",)], "message string")
    out = categorize_messages(
        df, "message", categorization_filters=["^(ERROR|WARN)"]).collect()
    keys = sorted(r["category_key"] for r in out)
    assert keys == ["found in module alpha", "found in module beta"]


def test_evaluate_classification_counts(spark):
    from elasticsearch_spark.ops.ml import evaluate_classification

    rows = [("a", "a"), ("a", "b"), ("b", "b"), ("b", "b"), ("c", "a")]
    df = spark.createDataFrame(rows, ["actual", "pred"])
    got = {r["clazz"]: r for r in
           evaluate_classification(df, "actual", "pred").collect()}
    assert got["a"]["tp"] == 1 and got["a"]["n_actual"] == 2
    assert got["a"]["n_predicted"] == 2
    assert abs(got["a"]["precision"] - 0.5) < 1e-12
    assert abs(got["b"]["recall"] - 1.0) < 1e-12
    # class only ever actual, never predicted: precision NULL, recall 0
    assert got["c"]["n_predicted"] == 0 and got["c"]["precision"] is None


def test_evaluate_regression_exact(spark):
    from elasticsearch_spark.ops.ml import evaluate_regression

    rows = [(1.0, 2.0), (2.0, 2.0), (3.0, 5.0), (4.0, 4.5)]
    df = spark.createDataFrame(rows, ["a", "p"])
    r = evaluate_regression(df, "a", "p", huber_delta=1.0).collect()[0]
    errs = [1.0, 0.0, 2.0, 0.5]
    mse = sum(e * e for e in errs) / 4
    assert abs(r["mse"] - mse) < 1e-12
    assert abs(r["mae"] - sum(errs) / 4) < 1e-12
    import statistics
    var = statistics.pvariance([1.0, 2.0, 3.0, 4.0])
    assert abs(r["r_squared"] - (1 - mse / var)) < 1e-12
    huber = (0.5 * 1.0 + 0.0 + (2.0 - 0.5) + 0.5 * 0.25) / 4
    assert abs(r["huber"] - huber) < 1e-12


def test_evaluate_auc_roc(spark):
    from elasticsearch_spark.ops.ml import evaluate_auc_roc

    # perfect separation -> AUC 1; inverted -> 0; ties averaged
    perfect = spark.createDataFrame(
        [(1, 0.9), (1, 0.8), (0, 0.2), (0, 0.1)], ["y", "s"])
    assert abs(evaluate_auc_roc(perfect, "y", "s").collect()[0]["auc"] - 1.0) < 1e-12
    inverted = spark.createDataFrame(
        [(0, 0.9), (0, 0.8), (1, 0.2), (1, 0.1)], ["y", "s"])
    assert abs(evaluate_auc_roc(inverted, "y", "s").collect()[0]["auc"]) < 1e-12
    # brute-force Mann-Whitney comparison on pseudo-random data
    import numpy as np
    rng = np.random.RandomState(7)
    ys = (rng.rand(200) > 0.6).astype(int)
    ss = np.round(rng.rand(200) * 0.3 + ys * 0.2, 2)  # noisy + many ties
    df = spark.createDataFrame(
        [(int(y), float(s)) for y, s in zip(ys, ss)], ["y", "s"])
    got = evaluate_auc_roc(df, "y", "s").collect()[0]["auc"]
    pos, neg = ss[ys == 1], ss[ys == 0]
    wins = (pos[:, None] > neg[None, :]).sum()
    ties = (pos[:, None] == neg[None, :]).sum()
    want = (wins + 0.5 * ties) / (len(pos) * len(neg))
    assert abs(got - want) < 1e-12
