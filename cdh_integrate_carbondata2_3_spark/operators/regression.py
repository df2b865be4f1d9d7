"""Distributed ridge / OLS regression via sufficient statistics.

The 100 TB-correct shape for fitting a small linear model (quality
classifier, length predictor, calibration curve) over a huge corpus:

1. ONE aggregation pass computes the Gram matrix ``XᵀX`` and moment
   vector ``Xᵀy`` as d(d+1)/2 + d scalar sums — map-side partial
   aggregation, a single tiny exchange, nothing corpus-sized moves;
2. the (d+1)×(d+1) normal-equation solve happens on the DRIVER with
   numpy (d is model width, never data size);
3. scoring is a broadcast of d+1 LITERALS folded into a column
   expression — whole-stage codegen, no UDF, no second shuffle.

This is deliberately NOT an iterative SGD: for linear least squares
the sufficient statistics are exact, so one pass beats any number of
epochs. Reference analogue: none (the reference has no ML surface);
pipeline role per SURVEY.md §7 "LLM-pipeline extras" — e.g. fitting
a document-quality score y ≈ β·features on a sample, then scoring
the full corpus JVM-side.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _ridge_stats_frame(df: DataFrame, cols: list[str], target_col: str,
                       intercept: bool) -> tuple[DataFrame, int]:
    """The ONE-pass sufficient-statistics frame ridge_fit collects —
    factored out so tests can assert the actual plan shape (single
    partial-aggregating exchange, no UDF, corpus never shuffles)."""
    clean = df
    for c in [*cols, target_col]:
        clean = clean.where(F.col(c).isNotNull())
    terms = [F.col(c).cast("double") for c in cols]
    if intercept:
        terms.append(F.lit(1.0))
    y = F.col(target_col).cast("double")
    d = len(terms)
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for i in range(d):
        for j in range(i, d):
            aggs.append(F.sum(terms[i] * terms[j]).alias(f"__g_{i}_{j}"))
        aggs.append(F.sum(terms[i] * y).alias(f"__m_{i}"))
    return clean.agg(*aggs), d


def ridge_fit(df: DataFrame, feature_cols: Sequence[str],
              target_col: str, l2: float = 0.0,
              intercept: bool = True) -> dict:
    """Fit ``target ≈ β · features`` by ridge-regularized least
    squares in ONE aggregation pass. Returns
    ``{"coef": {col: β}, "intercept": b, "n": rows}``.

    ``l2`` penalizes the feature weights only (never the intercept),
    matching the standard ridge convention. Rows with a NULL feature
    or target are excluded (they carry no information for the normal
    equations)."""
    cols = list(feature_cols)
    if not cols:
        raise ValueError("ridge_fit: need at least one feature column")
    agg_df, d = _ridge_stats_frame(df, cols, target_col, intercept)
    row = agg_df.collect()[0]
    n = row["__n"]
    if n == 0:
        raise ValueError("ridge_fit: no complete rows to fit on")
    g = np.zeros((d, d))
    m = np.zeros(d)
    for i in range(d):
        for j in range(i, d):
            g[i, j] = g[j, i] = row[f"__g_{i}_{j}"]
        m[i] = row[f"__m_{i}"]
    if l2:
        reg = np.eye(d) * float(l2)
        if intercept:
            reg[d - 1, d - 1] = 0.0          # never penalize the intercept
        g = g + reg
    beta = np.linalg.solve(g, m)
    coef = {c: float(b) for c, b in zip(cols, beta)}
    return {"coef": coef,
            "intercept": float(beta[-1]) if intercept else 0.0,
            "n": int(n)}


# per-iteration cap on the largest Newton step component (logit
# units) — see the damping comment in logit_fit
_MAX_STEP = 8.0


def logit_fit(df: DataFrame, feature_cols: Sequence[str],
              target_col: str, l2: float = 0.0,
              max_iter: int = 25, tol: float = 1e-8) -> dict:
    """Fit a binary logistic model P(y=1) = σ(β·x + b) by IRLS
    (Newton-Raphson): each iteration is ONE aggregation pass
    computing the weighted Gram ``XᵀWX`` and gradient ``Xᵀ(y−p)``
    with the current β folded in as literals (p = σ(β·x) evaluates
    JVM-side), then a (d+1)-dim driver solve — the classic
    scale-correct shape for a CCNet/fastText-style quality
    classifier: the corpus never shuffles, per pass one tiny
    exchange. Converges quadratically; ``max_iter`` bounds passes.

    Returns ``{"coef", "intercept", "n", "iters", "grad_norm"}`` —
    ``grad_norm`` is max|Xᵀ(y−p)| evaluated AT THE RETURNED
    coefficients (≈0 at the optimum, an algorithm-independent
    optimality certificate; ridge shifts the gradient by the penalty
    term, already accounted for). When the loop exits by
    ``max_iter`` a final gradient-only pass refreshes it so the
    certificate always describes the returned model."""
    cols = list(feature_cols)
    if not cols:
        raise ValueError("logit_fit: need at least one feature column")
    if max_iter < 1:
        raise ValueError("logit_fit: max_iter must be >= 1")
    clean = df
    for c in [*cols, target_col]:
        clean = clean.where(F.col(c).isNotNull())
    d = len(cols) + 1

    def one_pass(beta: np.ndarray, want_h: bool):
        terms = [F.col(c).cast("double") for c in cols] + [F.lit(1.0)]
        y = F.col(target_col).cast("double")
        eta = F.lit(float(beta[-1]))
        for c, b in zip(cols, beta):
            eta = eta + F.col(c).cast("double") * F.lit(float(b))
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
        w = p * (F.lit(1.0) - p)
        aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
        for i in range(d):
            if want_h:
                for j in range(i, d):
                    aggs.append(F.sum(w * terms[i] * terms[j])
                                .alias(f"__h_{i}_{j}"))
            aggs.append(F.sum((y - p) * terms[i]).alias(f"__g_{i}"))
        row = clean.agg(*aggs).collect()[0]
        if row["__n"] == 0:
            raise ValueError("logit_fit: no complete rows to fit on")
        h = np.zeros((d, d))
        g = np.zeros(d)
        for i in range(d):
            if want_h:
                for j in range(i, d):
                    h[i, j] = h[j, i] = row[f"__h_{i}_{j}"]
            g[i] = row[f"__g_{i}"]
        if l2:
            g = g - np.append(beta[:-1], 0.0) * float(l2)
            if want_h:
                reg = np.eye(d) * float(l2)
                reg[d - 1, d - 1] = 0.0
                h = h + reg
        return int(row["__n"]), h, g

    beta = np.zeros(d)
    n = 0
    grad_norm = float("inf")
    stepped_last = False
    iters = 0
    for iters in range(1, max_iter + 1):
        n, h, g = one_pass(beta, want_h=True)
        grad_norm = float(np.abs(g).max())
        step = np.linalg.solve(h + np.eye(d) * 1e-12, g)
        if not np.all(np.isfinite(step)):
            raise ValueError(
                "logit_fit: Newton step is non-finite (singular Hessian "
                "— data may be linearly separable; add l2 regularization)")
        # Damping: on (quasi-)separable data w = p(1−p) → 0 makes H
        # near-singular and the raw Newton step explodes toward the
        # divergent MLE, overflowing σ and returning nan with only
        # grad_norm as the tell. Halve the step until its largest
        # component is ≤ _MAX_STEP (a logit shift of 8 per iteration
        # already saturates σ) — near the optimum steps are small, so
        # quadratic convergence is untouched; on separable data the
        # iterates stay finite and the honest grad_norm certificate
        # reports the non-convergence.
        while np.abs(step).max() > _MAX_STEP:
            step *= 0.5
        if np.abs(step).max() < tol:
            # β is already stationary — grad_norm above was measured
            # at exactly the β being returned
            stepped_last = False
            break
        beta = beta + step
        stepped_last = True
    if stepped_last:
        # exited after stepping (converged on the last allowed step
        # or hit max_iter): refresh the certificate at the FINAL β
        n, _h, g = one_pass(beta, want_h=False)
        grad_norm = float(np.abs(g).max())
    if not np.all(np.isfinite(beta)) or not np.isfinite(grad_norm):
        raise ValueError(
            "logit_fit: non-finite coefficients — the likelihood has no "
            "finite maximum (separable data); add l2 regularization")
    return {"coef": {c: float(b) for c, b in zip(cols, beta)},
            "intercept": float(beta[-1]), "n": int(n),
            "iters": iters, "grad_norm": grad_norm}


def logit_score(df: DataFrame, model: dict,
                out: str = "prob") -> DataFrame:
    """Attach P(y=1) = σ(intercept + Σ βᵢ·featureᵢ) as a pure column
    expression (codegen, no UDF — the 100 TB scoring map)."""
    eta = F.lit(float(model.get("intercept", 0.0)))
    for c, b in model["coef"].items():
        eta = eta + F.col(c).cast("double") * F.lit(float(b))
    return df.withColumn(out, F.lit(1.0) / (F.lit(1.0) + F.exp(-eta)))


def ridge_score(df: DataFrame, model: dict,
                out: str = "score") -> DataFrame:
    """Attach ``out = intercept + Σ βᵢ·featureᵢ`` as a column
    expression — the coefficients fold in as literals, so scoring
    stays inside whole-stage codegen (no UDF, no shuffle, no
    broadcast join; at 100 TB this is a free map)."""
    expr = F.lit(float(model.get("intercept", 0.0)))
    for c, b in model["coef"].items():
        expr = expr + F.col(c).cast("double") * F.lit(float(b))
    return df.withColumn(out, expr)
