"""Distributed ridge/OLS via sufficient statistics
(operators/regression): numpy-lstsq parity, ridge shrinkage, NULL
exclusion, and the scale plan shape (one tiny agg, UDF-free scoring)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cdh_integrate_carbondata2_3_spark.operators.regression import (
    ridge_fit,
    ridge_score,
)


def _data(spark, n=500, seed=3):
    rng = np.random.default_rng(seed)
    x1 = rng.normal(0, 2, n)
    x2 = rng.normal(5, 1, n)
    y = 3.0 * x1 - 1.5 * x2 + 4.0 + rng.normal(0, 0.1, n)
    rows = [(float(a), float(b), float(c)) for a, b, c in zip(x1, x2, y)]
    return spark.createDataFrame(rows, "x1 double, x2 double, y double"), \
        np.column_stack([x1, x2, np.ones(n)]), y


def test_ols_matches_numpy_lstsq(spark):
    df, X, y = _data(spark)
    m = ridge_fit(df, ["x1", "x2"], "y")
    want, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert m["n"] == 500
    assert m["coef"]["x1"] == pytest.approx(want[0], rel=1e-9)
    assert m["coef"]["x2"] == pytest.approx(want[1], rel=1e-9)
    assert m["intercept"] == pytest.approx(want[2], rel=1e-9)


def test_ridge_matches_numpy_closed_form_and_shrinks(spark):
    df, X, y = _data(spark)
    lam = 50.0
    m = ridge_fit(df, ["x1", "x2"], "y", l2=lam)
    reg = np.eye(3) * lam
    reg[2, 2] = 0.0                       # intercept not penalized
    want = np.linalg.solve(X.T @ X + reg, X.T @ y)
    assert m["coef"]["x1"] == pytest.approx(want[0], rel=1e-9)
    assert m["coef"]["x2"] == pytest.approx(want[1], rel=1e-9)
    ols = ridge_fit(df, ["x1", "x2"], "y")
    assert abs(m["coef"]["x1"]) < abs(ols["coef"]["x1"])  # shrinkage


def test_null_rows_excluded(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0), (2.0, 4.0), (None, 99.0), (3.0, None), (3.0, 6.0)],
        "x double, y double")
    m = ridge_fit(df, ["x"], "y")
    assert m["n"] == 3
    assert m["coef"]["x"] == pytest.approx(2.0, abs=1e-9)
    assert m["intercept"] == pytest.approx(0.0, abs=1e-9)


def test_score_is_codegen_expression_no_udf_no_shuffle(spark):
    df, _X, _y = _data(spark, n=100)
    m = ridge_fit(df, ["x1", "x2"], "y")
    scored = ridge_score(df, m)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan and "ArrowEval" not in plan, plan
    r = scored.select(F.max(F.abs(F.col("score") - F.col("y")))).first()[0]
    assert r < 1.0                        # noise-scale residuals


def test_fit_plan_is_single_partial_aggregate(spark):
    """The whole fit is ONE tiny aggregation — corpus never shuffles,
    partial aggregation runs map-side (the 100 TB property). Asserted
    on ridge_fit's OWN sufficient-statistics frame, so a regression
    inside the operator (extra pass, repartition, UDF) fails here."""
    from cdh_integrate_carbondata2_3_spark.operators.regression import (
        _ridge_stats_frame)
    df, _X, _y = _data(spark, n=100)
    agg, d = _ridge_stats_frame(df, ["x1", "x2"], "y", intercept=True)
    assert d == 3
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "partial" in plan.lower(), plan
    assert plan.count("Exchange") == 1, plan      # only the final combine
    assert "EvalPython" not in plan and "ArrowEval" not in plan, plan


def test_empty_and_no_features_raise(spark):
    df = spark.createDataFrame([], "x double, y double")
    with pytest.raises(ValueError, match="no complete rows"):
        ridge_fit(df, ["x"], "y")
    with pytest.raises(ValueError, match="at least one feature"):
        ridge_fit(df, [], "y")


def test_logit_recovers_planted_coefficients_and_optimality(spark):
    """IRLS logistic fit: the gradient at the solution is ~0 (an
    algorithm-independent optimality certificate), planted
    coefficients are recovered within sampling error, and scoring is
    a codegen expression."""
    from cdh_integrate_carbondata2_3_spark.operators.regression import (
        logit_fit, logit_score)
    rng = np.random.default_rng(11)
    n = 4000
    x1 = rng.normal(0, 1, n)
    x2 = rng.normal(0, 1, n)
    eta = 1.2 * x1 - 0.8 * x2 + 0.5
    y = (rng.random(n) < 1 / (1 + np.exp(-eta))).astype(int)
    df = spark.createDataFrame(
        [(float(a), float(b), int(c)) for a, b, c in zip(x1, x2, y)],
        "x1 double, x2 double, y bigint")
    m = logit_fit(df, ["x1", "x2"], "y")
    assert m["grad_norm"] < 1e-6          # stationary point reached
    assert m["coef"]["x1"] == pytest.approx(1.2, abs=0.2)
    assert m["coef"]["x2"] == pytest.approx(-0.8, abs=0.2)
    assert m["intercept"] == pytest.approx(0.5, abs=0.2)
    scored = logit_score(df, m)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "Exchange" not in plan, plan
    # probabilities calibrated in bulk: mean(prob) == mean(y) exactly
    # at the MLE (score equation for the intercept)
    mp, my = scored.agg(F.avg("prob"), F.avg("y")).first()
    assert mp == pytest.approx(my, abs=1e-6)


def test_logit_ridge_shrinks_and_separable_data_is_bounded(spark):
    from cdh_integrate_carbondata2_3_spark.operators.regression import (
        logit_fit)
    # perfectly separable data: unpenalized MLE diverges; the ridge
    # penalty keeps coefficients finite and the fit usable
    rows = [(float(i), 1 if i > 0 else 0) for i in range(-40, 41) if i != 0]
    df = spark.createDataFrame(rows, "x double, y bigint")
    m = logit_fit(df, ["x"], "y", l2=1.0, max_iter=50)
    assert np.isfinite(m["coef"]["x"]) and m["coef"]["x"] > 0
    assert abs(m["coef"]["x"]) < 50
    m2 = logit_fit(df, ["x"], "y", l2=10.0, max_iter=50)
    assert abs(m2["coef"]["x"]) < abs(m["coef"]["x"])    # shrinkage


def test_logit_grad_norm_describes_returned_beta_and_max_iter_guard(spark):
    """The optimality certificate must be measured AT the returned
    coefficients even when the loop exits by max_iter mid-descent."""
    from cdh_integrate_carbondata2_3_spark.operators.regression import (
        logit_fit, logit_score)
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, 800)
    y = (rng.random(800) < 1 / (1 + np.exp(-(2.0 * x)))).astype(int)
    df = spark.createDataFrame(
        [(float(a), int(b)) for a, b in zip(x, y)], "x double, y bigint")
    m = logit_fit(df, ["x"], "y", max_iter=2)       # deliberately early
    # recompute the gradient at the RETURNED model independently
    scored = logit_score(df, m)
    g = scored.select(
        F.sum((F.col("y") - F.col("prob")) * F.col("x")),
        F.sum(F.col("y") - F.col("prob"))).first()
    indep = max(abs(g[0]), abs(g[1]))
    assert m["grad_norm"] == pytest.approx(indep, rel=1e-6, abs=1e-9)
    with pytest.raises(ValueError, match="max_iter"):
        logit_fit(df, ["x"], "y", max_iter=0)


def test_logit_unpenalized_separable_stays_finite(spark):
    """ADVICE r6: with l2=0 on perfectly separable data the MLE
    diverges and undamped Newton used to overflow into nan
    coefficients with only grad_norm as the tell. With step damping
    the iterates stay FINITE (they march toward saturation at
    ≤ _MAX_STEP per round), the returned model still separates the
    classes, and nothing non-finite is ever returned silently."""
    from cdh_integrate_carbondata2_3_spark.operators.regression import (
        logit_fit, logit_score)
    rows = [(float(i), 1 if i > 0 else 0)
            for i in range(-40, 41) if i != 0]
    df = spark.createDataFrame(rows, "x double, y bigint")
    m = logit_fit(df, ["x"], "y", l2=0.0, max_iter=30)
    assert np.isfinite(m["coef"]["x"]) and np.isfinite(m["intercept"])
    assert np.isfinite(m["grad_norm"])
    assert m["coef"]["x"] > 0
    probs = {r["x"]: r["prob"] for r in logit_score(df, m).collect()}
    assert probs[40.0] > 0.99 and probs[-40.0] < 0.01


def test_logit_quadratic_convergence_untouched_by_damping(spark):
    """Damping must not slow well-posed fits: a clean overlapping
    dataset still converges to a ~0 gradient certificate in few
    iterations."""
    from cdh_integrate_carbondata2_3_spark.operators.regression import (
        logit_fit)
    rng = np.random.default_rng(7)
    x = rng.normal(0, 1, 1500)
    y = (rng.random(1500) < 1 / (1 + np.exp(-(1.5 * x - 0.3)))).astype(int)
    df = spark.createDataFrame(
        [(float(a), int(b)) for a, b in zip(x, y)], "x double, y bigint")
    m = logit_fit(df, ["x"], "y")
    assert m["grad_norm"] < 1e-6 and m["iters"] <= 10
    assert m["coef"]["x"] == pytest.approx(1.5, abs=0.35)
