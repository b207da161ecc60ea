"""ML data-frame analytics: outlier detection.

Reference: x-pack/plugin/core/.../ml/dataframe/analyses/
OutlierDetection.java (config: n_neighbors, method enum
OutlierDetection.java:288-289 LOF | LDOF | DISTANCE_KTH_NN |
DISTANCE_KNN) — the actual scoring runs in the reference's native
analytics process, so the published method definitions are
implemented here directly:

  - distance_kth_nn   distance to the k-th nearest neighbor
  - distance_knn      mean distance to the k nearest neighbors
  - ldof              mean kNN distance / mean pairwise distance
                      among the kNN set (Zhang et al. 2009)
  - lof               classic local outlier factor (Breunig et al.
                      2000): mean(lrd(neighbor)/lrd(x)) with
                      reachability distances

(The reference additionally ensemble-normalizes scores into [0,1]
inside the native process; raw method scores are returned here and
rank identically.)

Spark shape — two strategies:

  - ``broadcast`` (default): the (id, vector) matrix is collected once
    (bounded by ``max_broadcast`` rows, raises beyond) and broadcast;
    a mapInPandas pass then scores each partition's rows against the
    full matrix with chunked numpy — O(N^2) total FLOPs spread across
    the cluster, no driver-side loop, one job. Right whenever the
    vector table fits a broadcast (tens of millions of rows of small
    vectors).
  - at 100 TB the corpus is NOT broadcastable: bucket candidates first
    with the existing ANN machinery (ops/similarity.py hyperplane-LSH
    or IVF), compute neighbor pairs within buckets, then aggregate
    per-point scores over the pair table — the same aggregation this
    module performs after its distance step. The broadcast strategy is
    deliberately the exact-oracle path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

METHODS = ("distance_kth_nn", "distance_knn", "ldof", "lof")


def _knn_of(chunk: np.ndarray, mat: np.ndarray, self_idx: np.ndarray | None,
            k: int) -> tuple[np.ndarray, np.ndarray]:
    """k nearest neighbors of each chunk row against the full matrix.
    Returns (dists[c,k], idx[c,k]) sorted ascending by distance with
    index tie-break; self matches (exact id) are excluded."""
    # (c, N) squared euclidean via the expansion trick, clipped for fp
    d2 = (
        (chunk * chunk).sum(axis=1)[:, None]
        + (mat * mat).sum(axis=1)[None, :]
        - 2.0 * chunk @ mat.T
    )
    np.clip(d2, 0.0, None, out=d2)
    if self_idx is not None:
        d2[np.arange(chunk.shape[0]), self_idx] = np.inf
    # argsort on (distance, index) for deterministic ties
    order = np.argsort(d2, axis=1, kind="stable")[:, :k]
    rows = np.arange(chunk.shape[0])[:, None]
    return np.sqrt(d2[rows, order]), order


def outlier_detection(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_neighbors: int = 5,
    method: str = "distance_knn",
    max_broadcast: int = 2_000_000,
    chunk: int = 1024,
) -> DataFrame:
    """Per-row outlier score. Returns DataFrame(id_col, outlier_score
    double)."""
    if method not in METHODS:
        raise ValueError(f"method must be one of {METHODS}")
    k = int(n_neighbors)
    if k <= 0:
        raise ValueError("n_neighbors must be a positive integer")
    spark = df.sparkSession
    head = df.select(id_col, vec_col).limit(max_broadcast + 1).toPandas()
    if len(head) > max_broadcast:
        raise ValueError(
            "corpus exceeds max_broadcast; bucket candidates with "
            "ops.similarity LSH/IVF first (see module docstring)")
    ids = head[id_col].to_numpy()
    mat = np.stack(head[vec_col].to_numpy()).astype(np.float64)
    n = len(ids)
    if k >= n:
        raise ValueError("n_neighbors must be < corpus size")
    bc = spark.sparkContext.broadcast((ids, mat))

    # LOF needs every point's k-distance and lrd; both are global
    # N-vectors computed once here (one more O(N^2/chunk) numpy sweep,
    # still driver-free at execution: the arrays ride the broadcast).
    if method == "lof":
        kd = np.empty(n)
        knn_d = np.empty((n, k))
        knn_i = np.empty((n, k), dtype=np.int64)
        for s in range(0, n, chunk):
            e = min(s + chunk, n)
            d, o = _knn_of(mat[s:e], mat, np.arange(s, e), k)
            knn_d[s:e], knn_i[s:e] = d, o
            kd[s:e] = d[:, -1]
        reach = np.maximum(knn_d, kd[knn_i])
        lrd = 1.0 / np.maximum(reach.mean(axis=1), 1e-300)
        bc = spark.sparkContext.broadcast((ids, mat, lrd, kd))

    def score_part(batches):
        if method == "lof":
            b_ids, b_mat, b_lrd, b_kd = bc.value
        else:
            b_ids, b_mat = bc.value
        lookup = {v: i for i, v in enumerate(b_ids)}
        for pdf in batches:
            if pdf.empty:
                continue
            out_ids, out_scores = [], []
            for s in range(0, len(pdf), chunk):
                part = pdf.iloc[s:s + chunk]
                cids = part[id_col].to_numpy()
                cvec = np.stack(part[vec_col].to_numpy()).astype(np.float64)
                self_idx = np.array([lookup[v] for v in cids])
                d, o = _knn_of(cvec, b_mat, self_idx, k)
                if method == "distance_kth_nn":
                    sc = d[:, -1]
                elif method == "distance_knn":
                    sc = d.mean(axis=1)
                elif method == "ldof":
                    inner = np.empty(len(cids))
                    for j in range(len(cids)):
                        nb = b_mat[o[j]]
                        dd = np.sqrt(np.maximum(
                            (nb * nb).sum(1)[:, None]
                            + (nb * nb).sum(1)[None, :]
                            - 2.0 * nb @ nb.T, 0.0))
                        m = dd[np.triu_indices(k, 1)].mean() if k > 1 else 0.0
                        inner[j] = max(m, 1e-300)
                    sc = d.mean(axis=1) / inner
                else:  # lof
                    # reach(x, o) = max(d(x, o), kdist(o))
                    reach_x = np.maximum(d, b_kd[o])
                    lrd_x = 1.0 / np.maximum(reach_x.mean(axis=1), 1e-300)
                    sc = b_lrd[o].mean(axis=1) / lrd_x
                out_ids.append(cids)
                out_scores.append(sc)
            yield pd.DataFrame({
                id_col: np.concatenate(out_ids),
                "outlier_score": np.concatenate(out_scores),
            })

    id_type = dict(df.dtypes)[id_col]
    from elasticsearch_spark.spread import spread_input

    # re-spread before the Python pass: a 1-row-group input would run
    # every kNN chunk on one worker (guide §2.5; no-op at scale)
    return spread_input(df.select(id_col, vec_col)).mapInPandas(
        score_part, schema=f"{id_col} {id_type}, outlier_score double")


# ---- trained-model inference: tree ensembles --------------------------


def compile_tree(nodes: list[dict], feature_cols: list[str]):
    """Compile one decision tree to a single Catalyst expression.

    Reference model format: x-pack/plugin/core/.../ml/inference/
    trainedmodel/tree/ (Tree.java / TreeNode.java): nodes hold
    ``split_feature`` (index into the feature list), ``threshold``,
    ``left_child``/``right_child`` (< goes left), ``default_left``
    (null routing), leaves hold ``leaf_value``.

    Spark shape: the tree folds into nested CASE WHEN — the whole
    ensemble evaluates inside whole-stage codegen with zero Python and
    zero shuffles, the exact analogue of the reference evaluating a
    loaded model node-locally per doc (InferenceProcessor.java).
    """

    def build(i: int):
        node = nodes[i]
        if "leaf_value" in node:
            return F.lit(float(node["leaf_value"]))
        feat = F.col(feature_cols[int(node["split_feature"])]).cast("double")
        thr = F.lit(float(node["threshold"]))
        left = build(int(node["left_child"]))
        right = build(int(node["right_child"]))
        default = left if node.get("default_left", True) else right
        return (
            F.when(feat.isNull(), default)
            .when(feat < thr, left)
            .otherwise(right)
        )

    return build(0)


def ensemble_infer(
    model: dict,
    feature_cols: list[str],
    classification_labels: list[str] | None = None,
):
    """Tree-ensemble inference column(s).

    ``model``: {"trained_models": [{"nodes": [...]}, ...],
    "aggregate_output": one of
      {"weighted_sum": {"weights": [...]}}          (regression)
      {"exponent": {"weights": [...]}}              (regression)
      {"logistic_regression": {"weights": [...]}}   (binary classes)
      {"weighted_mode": {"weights": [...], "num_classes": C}}
    } — mirroring Ensemble.java's output aggregators (ensemble/
    WeightedSum.java, Exponent.java, LogisticRegression.java,
    WeightedMode.java).

    Returns a dict of named Columns: ``predicted_value`` always;
    ``prediction_probability`` for classification outputs.
    """
    trees = [compile_tree(t["nodes"], feature_cols)
             for t in model["trained_models"]]
    agg = model["aggregate_output"]
    kind, cfg = next(iter(agg.items()))
    weights = [float(w) for w in cfg.get(
        "weights", [1.0] * len(trees))]
    if len(weights) != len(trees):
        raise ValueError("one weight per tree required")
    wsum = None
    for t, w in zip(trees, weights):
        term = t * F.lit(w)
        wsum = term if wsum is None else wsum + term
    if kind == "weighted_sum":
        return {"predicted_value": wsum}
    if kind == "exponent":
        return {"predicted_value": F.exp(wsum)}
    if kind == "logistic_regression":
        prob1 = F.lit(1.0) / (F.lit(1.0) + F.exp(-wsum))
        labels = classification_labels or ["false", "true"]
        pred = F.when(prob1 >= 0.5, F.lit(labels[1])) \
            .otherwise(F.lit(labels[0]))
        return {"predicted_value": pred,
                "prediction_probability": F.greatest(
                    prob1, F.lit(1.0) - prob1)}
    if kind == "weighted_mode":
        n_classes = int(cfg["num_classes"])
        votes = []
        for c in range(n_classes):
            v = None
            for t, w in zip(trees, weights):
                term = F.when(t.cast("int") == c, F.lit(w)) \
                    .otherwise(F.lit(0.0))
                v = term if v is None else v + term
            votes.append(v)
        arr = F.array(*votes)
        best = F.array_max(arr)
        # first class index reaching the max vote (deterministic ties):
        # a reversed WHEN chain leaves the LOWEST matching index on top
        idx = None
        for c in reversed(range(n_classes)):
            cond = votes[c] == best
            idx = F.when(cond, F.lit(c)) if idx is None else \
                F.when(cond, F.lit(c)).otherwise(idx)
        total = None
        for v in votes:
            total = v if total is None else total + v
        labels = classification_labels
        pv = idx if labels is None else F.element_at(
            F.array(*[F.lit(x) for x in labels]), idx + 1)
        return {"predicted_value": pv,
                "prediction_probability": best / total}
    raise ValueError(f"unknown aggregate_output {kind!r}")


def inference_bucket_agg(
    buckets,
    model: dict,
    bucket_paths: dict[str, str],
    classification_labels: list[str] | None = None,
    out_prefix: str = "inference",
):
    """``inference`` pipeline aggregation (reference: x-pack/plugin/ml/
    .../aggs/inference/InferencePipelineAggregationBuilder.java): run a
    trained model over each bucket's metric values, at reduce time.

    ``bucket_paths``: {model_feature_name: bucket_column} — the
    reference's ``buckets_path`` map resolving model features to
    sibling aggregation results. The compiled model is the same
    CASE-WHEN codegen as :func:`ensemble_infer`, so the "pipeline"
    variant costs one projection over the (coordinator-small) bucket
    frame — no shuffle, no Python."""
    from pyspark.sql import functions as F

    feature_cols = list(bucket_paths.keys())
    renamed = buckets
    for feat, col in bucket_paths.items():
        if feat != col:
            renamed = renamed.withColumn(feat, F.col(col))
    cols = ensemble_infer(model, feature_cols, classification_labels)
    out = renamed
    for name, col in cols.items():
        out = out.withColumn(f"{out_prefix}_{name}", col)
    return out.drop(*[f for f in feature_cols
                      if f not in buckets.columns])


_ML_DATE_STOPWORDS = [
    "Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday",
    "Sunday", "Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun",
    "January", "February", "March", "April", "May", "June", "July",
    "August", "September", "October", "November", "December",
    "Jan", "Feb", "Mar", "Apr", "Jun", "Jul", "Aug", "Sep", "Oct",
    "Nov", "Dec", "GMT", "UTC",
]

# ml_classic tokenizer (MlClassicTokenizer.java): [A-Za-z0-9]+ runs
# allowing _ . - in the middle, trailing ._- stripped (the regex
# requires the last char alphanumeric, which IS the strip)
_ML_TOKEN_RE = "[a-zA-Z0-9](?:[a-zA-Z0-9._-]*[a-zA-Z0-9])?"
# drop: all-hex tokens (dots and dashes count as hex per the
# tokenizer's haveNonHex rule) and tokens starting with a digit
_ML_HEX_RE = "^[0-9a-fA-F.-]+$"


def categorize_messages(
    df,
    text_col: str = "message",
    categorization_filters: list[str] | None = None,
    examples: int = 1,
):
    """ML log categorization (reference: x-pack/plugin/ml/.../job/
    categorization/{MlClassicTokenizer,CategorizationAnalyzer}.java +
    CategorizationAnalyzerConfig.buildDefaultCategorizationAnalyzer:
    ml_classic tokenizer + weekday/month/GMT/UTC stopwords, with
    optional pattern_replace char filters first).

    The C++ categorizer assigns a category per distinct analyzed token
    sequence (variable parts — numbers, hex ids, timestamps — are
    dropped by the tokenizer, so log lines differing only in those
    collapse together). Re-expressed order-independently: the category
    KEY is the analyzed token sequence; ``mlcategory`` numbers are
    assigned by (doc_count DESC, key ASC) instead of first-seen order
    (a stream-order concept with no distributed meaning — documented
    divergence).

    Everything is Catalyst: regexp_extract_all + filter/array ops, one
    hash aggregation. Returns (mlcategory, category_key, doc_count,
    examples array<string>).

    Scale note: the integer ``mlcategory`` ranking is a global window
    (one-task sort over the CATEGORY frame — fine while categories ≪
    docs, which is the point of categorization); at extreme category
    cardinality drop the id and key on ``category_key`` directly."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    c = F.col(text_col)
    for pat in categorization_filters or []:
        c = F.regexp_replace(c, pat, "")
    prepared = df.withColumn("_cat_txt", c)
    stop_arr = ", ".join(f"'{w}'" for w in _ML_DATE_STOPWORDS)
    toks = F.expr(
        "filter(regexp_extract_all(_cat_txt, '" + _ML_TOKEN_RE + "', 0),"
        " t -> NOT t rlike '" + _ML_HEX_RE + "'"
        " AND NOT t rlike '^[0-9]'"
        " AND NOT array_contains(array(" + stop_arr + "), t))"
    )
    grouped = (
        prepared.withColumn("_key", F.concat_ws(" ", toks))
        .filter(F.col("_key") != "")
        .groupBy(F.col("_key").alias("category_key"))
        .agg(
            F.count("*").alias("doc_count"),
            # examples=1 (default) keeps the aggregation state BOUNDED
            # (a single min, scale-safe); >1 collects the distinct
            # message set per category first — fine for log corpora
            # where categories have few distinct variants, documented
            # as unbounded otherwise
            (F.array(F.min(F.col(text_col))) if examples == 1 else
             F.slice(F.sort_array(F.collect_set(F.col(text_col))),
                     1, examples)).alias("examples"),
        )
    )
    w = Window.orderBy(F.desc("doc_count"), F.asc("category_key"))
    # the category regex the reference's results carry
    # (CategorizerState / GrokPatternCreator.java builds the same
    # ".*?tok.+?tok.*?" shape from the category's fixed tokens)
    regex = F.concat(
        F.lit(".*?"),
        F.regexp_replace(F.col("category_key"), " ", ".+?"),
        F.lit(".*?"),
    )
    return (
        grouped.withColumn("mlcategory", F.row_number().over(w))
        .withColumn("regex", regex)
        .select("mlcategory", "category_key", "regex", "doc_count",
                "examples")
    )


def train_linear_regression(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    l2: float = 0.0,
) -> dict:
    """DFA regression TRAINING, closed form (reference: x-pack/plugin/ml
    dataframe analytics regression jobs,
    DataFrameAnalyticsManager.java — the reference trains boosted
    trees; the honest Spark-first narrow analogue is exact least
    squares, which is deterministic and one-pass).

    Scale shape: the ONLY distributed work is one aggregation building
    the Gram matrix X'X and moment vector X'y — d*(d+3)/2 + 1 sums for
    d features — with map-side partials; the d x d solve happens on the
    driver (d is tens, never data-sized). 100 TB of rows stream through
    one exchange of a single tiny row.

    Returns {"intercept": float, "coefficients": {col: float},
    "n": long} — coefficients feed :func:`ensemble_infer`-style codegen
    scoring or the ingest inference processor directly.
    """
    import numpy as np

    cols = [F.lit(1.0).alias("_b")] + [
        F.col(c).cast("double") for c in feature_cols]
    names = ["_b", *feature_cols]
    d = len(names)
    aggs = []
    for i in range(d):
        for j in range(i, d):
            aggs.append(F.sum(cols[i] * cols[j]).alias(f"xx_{i}_{j}"))
    y = F.col(label_col).cast("double")
    for i in range(d):
        aggs.append(F.sum(cols[i] * y).alias(f"xy_{i}"))
    aggs.append(F.count("*").alias("_n"))
    row = df.agg(*aggs).first()

    xtx = np.zeros((d, d))
    for i in range(d):
        for j in range(i, d):
            xtx[i, j] = xtx[j, i] = float(row[f"xx_{i}_{j}"])
    xty = np.array([float(row[f"xy_{i}"]) for i in range(d)])
    if l2:
        reg = np.eye(d) * float(l2)
        reg[0, 0] = 0.0  # never regularize the intercept
        xtx = xtx + reg
    beta = np.linalg.solve(xtx, xty)
    return {
        "intercept": float(beta[0]),
        "coefficients": dict(zip(feature_cols, map(float, beta[1:]))),
        "n": int(row["_n"]),
    }


def linear_regression_sql(
    feature_cols: list[str],
    label_col: str,
    table: str = "t",
) -> str:
    """DuckDB twin of :func:`train_linear_regression` for d <= 2 via
    the textbook closed forms (regr_slope/regr_intercept for one
    feature; explicit 2x2 Cramer solve for two) — enough to
    cross-check the Gram-matrix path numerically."""
    if len(feature_cols) == 1:
        x, yy = feature_cols[0], label_col
        return (f"SELECT regr_intercept({yy}, {x}) AS intercept, "
                f"regr_slope({yy}, {x}) AS c0, "
                f"count(*)::BIGINT AS n FROM {table}")
    raise ValueError("SQL twin supports exactly one feature")


def train_gaussian_nb(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    var_smoothing: float = 1e-9,
    round_digits: int = 9,
) -> dict:
    """DFA CLASSIFICATION training as Gaussian naive Bayes (reference:
    x-pack/plugin/ml dataframe analytics Classification.java — the
    reference trains boosted trees in its native process; the honest
    Spark-first narrow analogue is a one-pass closed-form classifier,
    mirroring how train_linear_regression stands in for regression).

    Scale shape: training IS one aggregation — groupBy(label) with
    count + avg + var_pop per feature (map-side partials, one exchange
    of one row per class). The model is class-count-sized, never
    data-sized.

    Parameters are rounded to ``round_digits`` decimals so the scoring
    expressions built from them are bit-identical constants on any
    engine (Spark and the DuckDB twin aggregate in different orders;
    rounding absorbs the last-ulp drift, exactly like the SmallFloat
    norm quantization absorbs Lucene's).
    """
    aggs: list = [F.count("*").alias("_n")]
    for c in feature_cols:
        aggs.append(F.avg(F.col(c).cast("double")).alias(f"mu_{c}"))
        aggs.append(F.var_pop(F.col(c).cast("double")).alias(f"var_{c}"))
    rows = df.groupBy(F.col(label_col).cast("string").alias("_cls")).agg(*aggs).collect()
    total = sum(r["_n"] for r in rows)
    classes = {}
    for r in sorted(rows, key=lambda r: r["_cls"]):
        var = {
            c: round(float(r[f"var_{c}"]) + var_smoothing, round_digits)
            for c in feature_cols
        }
        classes[r["_cls"]] = {
            "log_prior": round(float(np.log(r["_n"] / total)), round_digits),
            "mu": {c: round(float(r[f"mu_{c}"]), round_digits) for c in feature_cols},
            "var": var,
            # the Gaussian normalization constant is rounded too, so the
            # only per-row arithmetic left is (x-mu)^2/(2 var) — identical
            # IEEE-754 ops on every engine
            "log_norm": {
                c: round(float(0.5 * np.log(2.0 * np.pi * var[c])), round_digits)
                for c in feature_cols
            },
        }
    return {"classes": classes, "features": list(feature_cols), "n": int(total)}


def _nb_score(model: dict, cls: str, feats: dict):
    """log P(class) + sum_f log N(x_f; mu, var) as one Catalyst
    expression over rounded literal parameters — term order is fixed
    (feature list order) so any engine evaluating the same sequence of
    IEEE-754 ops gets the same double."""
    p = model["classes"][cls]
    expr = F.lit(p["log_prior"])
    for c in model["features"]:
        mu, var = p["mu"][c], p["var"][c]
        x = feats[c]
        expr = expr - F.lit(p["log_norm"][c])
        expr = expr - (x - F.lit(mu)) * (x - F.lit(mu)) / F.lit(2.0 * var)
    return expr


def gaussian_nb_classify(
    df: DataFrame,
    model: dict,
    output_col: str = "pred",
) -> DataFrame:
    """Score every class with pure codegen arithmetic and pick the
    argmax; ties break to the lexically-smallest class name (the
    deterministic analogue of the reference's stable top-classes
    ordering). No UDF, no shuffle — a projection."""
    feats = {c: F.col(c).cast("double") for c in model["features"]}
    names = sorted(model["classes"])
    scores = [_nb_score(model, cls, feats) for cls in names]
    # argmax, ties to the smallest name: walking names in sorted order,
    # the first class whose score is >= every LATER class's score is
    # the earliest maximum (earlier classes already failed the test)
    pred = F.lit(names[-1])
    for i in range(len(names) - 2, -1, -1):
        cond = None
        for j in range(i + 1, len(names)):
            c = scores[i] >= scores[j]
            cond = c if cond is None else (cond & c)
        pred = F.when(cond, F.lit(names[i])).otherwise(pred)
    return df.withColumn(output_col, pred)


def gaussian_nb_sql(
    feature_cols: list[str],
    label_col: str,
    id_col: str,
    table: str = "t",
    var_smoothing: float = 1e-9,
    round_digits: int = 9,
    prelude: str = "",
) -> str:
    """DuckDB twin: train (same one-pass aggregation, same rounding)
    and classify (same term order) in one statement, returning
    per-class predicted counts. ``prelude`` lets the caller prepend
    feature-derivation CTEs (it is inserted after WITH verbatim)."""
    mu_var = ", ".join(
        f"round(avg({c}), {round_digits}) AS mu_{c}, "
        f"round(var_pop({c}) + {var_smoothing!r}, {round_digits}) AS var_{c}"
        for c in feature_cols
    )
    log_norms = ", ".join(
        f"round(0.5 * ln(2 * pi() * round(var_pop({c}) + {var_smoothing!r},"
        f" {round_digits})), {round_digits}) AS ln_{c}"
        for c in feature_cols
    )
    score = (
        f"m.log_prior"
        + "".join(
            f" - m.ln_{c} "
            f"- (d.{c} - m.mu_{c}) * (d.{c} - m.mu_{c}) / (2 * m.var_{c})"
            for c in feature_cols
        )
    )
    return f"""
WITH {prelude}model AS (
  SELECT CAST({label_col} AS VARCHAR) AS cls,
         round(ln(count(*) * 1.0 / (SELECT count(*) FROM {table})), {round_digits}) AS log_prior,
         {mu_var}, {log_norms}
  FROM {table} GROUP BY 1),
scored AS (
  SELECT d.{id_col} AS _rid, m.cls, {score} AS s
  FROM {table} d CROSS JOIN model m),
best AS (
  SELECT _rid, min(cls) AS pred
  FROM (SELECT _rid, cls, s,
               max(s) OVER (PARTITION BY _rid) AS mx FROM scored)
  WHERE s = mx GROUP BY _rid)
SELECT pred, count(*)::BIGINT AS doc_count
FROM best GROUP BY pred ORDER BY pred
"""


# ---------------------------------------------------------------------------
# ml.evaluate_data_frame (x-pack/plugin/core/.../ml/dataframe/evaluation:
# Accuracy / Precision / Recall / MulticlassConfusionMatrix, regression
# MeanSquaredError / RSquared / HuberMetric, outlier AucRoc)
# ---------------------------------------------------------------------------


def evaluate_classification(
    df: DataFrame, actual_col: str, predicted_col: str
) -> DataFrame:
    """Per-class evaluation: (clazz, n_actual, n_predicted, tp,
    precision, recall) sorted by class — the multiclass section of
    ml.evaluate_data_frame. Three hash aggs joined on the class key;
    full-outer so a class that is only ever predicted (or only ever
    actual) still reports, like MulticlassConfusionMatrix."""
    act = df.groupBy(F.col(actual_col).alias("clazz")).agg(
        F.count("*").alias("n_actual"))
    pred = df.groupBy(F.col(predicted_col).alias("clazz")).agg(
        F.count("*").alias("n_predicted"))
    tp = (
        df.filter(F.col(actual_col) == F.col(predicted_col))
        .groupBy(F.col(actual_col).alias("clazz"))
        .agg(F.count("*").alias("tp"))
    )
    out = (
        act.join(pred, "clazz", "full_outer")
        .join(tp, "clazz", "left")
        .na.fill(0, ["n_actual", "n_predicted", "tp"])
    )
    return out.select(
        "clazz", "n_actual", "n_predicted", "tp",
        F.when(F.col("n_predicted") > 0,
               F.col("tp") / F.col("n_predicted")).alias("precision"),
        F.when(F.col("n_actual") > 0,
               F.col("tp") / F.col("n_actual")).alias("recall"),
    ).orderBy("clazz")


def evaluate_regression(
    df: DataFrame, actual_col: str, predicted_col: str, huber_delta: float = 1.0
) -> DataFrame:
    """One-row regression metrics: mse, rmse, mae, r_squared, huber —
    a single partial/final aggregation pass (no second scan: r² uses
    var_pop(actual) = ss_tot/n so one agg suffices)."""
    a, p = F.col(actual_col).cast("double"), F.col(predicted_col).cast("double")
    err = a - p
    d = float(huber_delta)
    huber = F.when(
        F.abs(err) <= d, err * err / 2.0
    ).otherwise(d * (F.abs(err) - d / 2.0))
    agg = df.agg(
        F.avg(err * err).alias("mse"),
        F.avg(F.abs(err)).alias("mae"),
        F.avg(huber).alias("huber"),
        F.var_pop(a).alias("_var_a"),
    )
    return agg.select(
        "mse",
        F.sqrt(F.col("mse")).alias("rmse"),
        "mae",
        (F.lit(1.0) - F.col("mse") / F.col("_var_a")).alias("r_squared"),
        "huber",
    )


def evaluate_auc_roc(
    df: DataFrame, actual_col: str, score_col: str
) -> DataFrame:
    """One-row AUC-ROC via the Mann-Whitney rank statistic:
    AUC = (sum of positive ranks - P(P+1)/2) / (P*N), ties averaged.

    Scale shape: scores are first collapsed to (score, n_pos, n_neg)
    by a hash agg, so the only ordered pass runs over DISTINCT scores —
    the same reduction the reference's AucRoc makes by evaluating at
    fixed percentile thresholds. At extreme score cardinality,
    quantize the score column first (round/percentile_approx bins)."""
    y = F.col(actual_col).cast("int")
    per = df.groupBy(F.col(score_col).alias("_s")).agg(
        F.sum(y).alias("_np"),
        F.sum(F.lit(1) - y).alias("_nn"),
    )
    w = Window.orderBy("_s").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per.withColumn(
        "_below", F.coalesce(F.sum(F.col("_np") + F.col("_nn")).over(w), F.lit(0))
    )
    # average rank of the tied block [below+1 .. below+np+nn]
    avg_rank = F.col("_below") + (F.col("_np") + F.col("_nn") + 1) / 2.0
    sums = ranked.agg(
        F.sum(F.col("_np") * avg_rank).alias("_rank_pos"),
        F.sum("_np").alias("_p"),
        F.sum("_nn").alias("_n"),
    )
    return sums.select(
        (
            (F.col("_rank_pos") - F.col("_p") * (F.col("_p") + 1) / 2.0)
            / (F.col("_p") * F.col("_n"))
        ).alias("auc"),
        F.col("_p").alias("n_positive"),
        F.col("_n").alias("n_negative"),
    )
