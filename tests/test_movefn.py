"""moving_fn MovingFunctions model set (MovingFunctions.java parity)."""

import math

import numpy as np
import pytest

from elasticsearch_spark.aggs.movefn import (
    MOVING_MODELS, holt_winters_py, moving_fn,
)


def _ref_linear(vals):
    avg, total, cur = 0.0, 1, 1
    for v in vals:
        avg += v * cur
        total += cur
        cur += 1
    return None if total == 1 else avg / total


def _ref_ewma(vals, alpha):
    avg = None
    for v in vals:
        avg = v if avg is None else v * alpha + avg * (1 - alpha)
    return avg


def _ref_holt(vals, alpha, beta):
    s = b = last_s = last_b = 0.0
    n = 0
    for v in vals:
        if n == 0:
            s, b = v, 0.0
        else:
            s = alpha * v + (1 - alpha) * (last_s + last_b)
            b = beta * (s - last_s) + (1 - beta) * last_b
        n += 1
        last_s, last_b = s, b
    return None if n == 0 else s


@pytest.fixture(scope="module")
def buckets(spark):
    rows = [(i, float(v)) for i, v in enumerate(
        [10, 12, 9, 14, 20, 3, 7, 11, 16, 2, 8, 13])]
    return spark.createDataFrame(rows, "key int, m double")


def _col(df, model, window, shift=0, **kw):
    out = moving_fn(df, "m", model, window, shift=shift, **kw)
    return {r["key"]: r[f"m_{model}"] for r in out.collect()}


def test_window_semantics_exclude_current(buckets):
    """shift=0 window is [i-window, i) — the current bucket is NOT in
    its own window (MovFnPipelineAggregator.java:100)."""
    got = _col(buckets, "sum", window=3)
    vals = [10, 12, 9, 14, 20, 3, 7, 11, 16, 2, 8, 13]
    for i in range(len(vals)):
        assert got[i] == pytest.approx(sum(vals[max(0, i - 3):i]))
    # shift=1 includes the current bucket
    got1 = _col(buckets, "sum", window=3, shift=1)
    for i in range(len(vals)):
        assert got1[i] == pytest.approx(
            sum(vals[max(0, i - 2):i + 1]))


def test_simple_models(buckets):
    vals = [10, 12, 9, 14, 20, 3, 7, 11, 16, 2, 8, 13]
    for model, fn in [
        ("max", max), ("min", min),
        ("unweighted_avg", lambda w: sum(w) / len(w)),
        ("std_dev",
         lambda w: math.sqrt(sum((v - sum(w) / len(w)) ** 2 for v in w)
                             / len(w))),
    ]:
        got = _col(buckets, model, window=4)
        for i in range(1, len(vals)):
            w = vals[max(0, i - 4):i]
            assert got[i] == pytest.approx(fn(w)), (model, i)
        assert got[0] is None  # empty window -> NaN/null


def test_weighted_models(buckets):
    vals = [10, 12, 9, 14, 20, 3, 7, 11, 16, 2, 8, 13]
    lin = _col(buckets, "linear_weighted_avg", window=5)
    ew = _col(buckets, "ewma", window=5, alpha=0.4)
    ho = _col(buckets, "holt", window=6, alpha=0.5, beta=0.2)
    for i in range(len(vals)):
        w = vals[max(0, i - 5):i]
        assert lin[i] == pytest.approx(_ref_linear(w), nan_ok=True) or (
            lin[i] is None and _ref_linear(w) is None)
        if w:
            assert ew[i] == pytest.approx(_ref_ewma(w, 0.4))
        w6 = vals[max(0, i - 6):i]
        if w6:
            assert ho[i] == pytest.approx(_ref_holt(w6, 0.5, 0.2))


def test_holt_winters(buckets, spark):
    """holt_winters: pandas-UDF result equals the direct transcription;
    a seasonal ramp forecasts within the seasonal structure."""
    # seasonal series period=3, two+ full seasons in an 8-wide window
    vals = [10.0, 20.0, 30.0, 12.0, 22.0, 32.0,
            14.0, 24.0, 34.0, 16.0, 26.0, 36.0]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "key int, m double")
    got = _col(df, "holt_winters", window=9, alpha=0.5, beta=0.2,
               gamma=0.1, period=3)
    for i in range(len(vals)):
        w = np.array(vals[max(0, i - 9):i])
        want = holt_winters_py(w, 0.5, 0.2, 0.1, 3, False)
        if math.isnan(want):
            assert got[i] is None
        else:
            assert got[i] == pytest.approx(want)
    # enough data at the tail and the forecast tracks the ramp
    assert got[len(vals) - 1] is not None
    assert 10 < got[len(vals) - 1] < 45


def test_model_registry():
    assert set(MOVING_MODELS) == {
        "max", "min", "sum", "unweighted_avg", "std_dev",
        "linear_weighted_avg", "ewma", "holt", "holt_winters"}
    with pytest.raises(ValueError):
        moving_fn(None, "m", "nope", 3)
