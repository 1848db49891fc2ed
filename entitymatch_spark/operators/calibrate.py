"""Calibrated threshold combiner: a logistic blend over pair features.

north_star: "...score pairs ... with a calibrated threshold combiner".
The five pair features (jaccard, lev_sim, jw, cosine, containment) are
blended by a logistic model fit on labeled pairs. Training data is
small (labeled pairs only), so the fit runs driver-side on numpy with
deterministic full-batch gradient descent — no extra Spark dependency,
no randomness. Application is a pure column expression (sigmoid of the
affine blend), fully JVM-side and codegen'd.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FEATURES = ["jaccard", "lev_sim", "jw", "cosine", "containment"]


@dataclass
class CalibratedModel:
    weights: dict[str, float]
    bias: float
    threshold: float = 0.5  # on the calibrated probability

    def probability(self) -> Column:
        z = F.lit(self.bias)
        for k, w in self.weights.items():
            z = z + F.col(k) * F.lit(w)
        return 1.0 / (1.0 + F.exp(-z))

    def apply(self, scored: DataFrame, out_col: str = "p_match") -> DataFrame:
        return scored.withColumn(out_col, self.probability())

    def matches(self, scored: DataFrame) -> DataFrame:
        return self.apply(scored).filter(F.col("p_match") >= self.threshold)


def fit_logistic(
    X: np.ndarray,
    y: np.ndarray,
    feature_names: list[str] | None = None,
    l2: float = 1e-3,
    lr: float = 0.5,
    iters: int = 2000,
) -> CalibratedModel:
    """Deterministic full-batch logistic regression (numpy).

    Features are standardized internally; returned weights/bias are
    folded back to raw feature space so application is a plain column
    expression.
    """
    feature_names = feature_names or FEATURES
    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    mu = X.mean(axis=0)
    sd = X.std(axis=0)
    sd[sd == 0] = 1.0
    Xs = (X - mu) / sd
    n, d = Xs.shape
    w = np.zeros(d)
    b = 0.0
    for _ in range(iters):
        z = Xs @ w + b
        p = 1.0 / (1.0 + np.exp(-np.clip(z, -30, 30)))
        g = p - y
        gw = Xs.T @ g / n + l2 * w
        gb = g.mean()
        w -= lr * gw
        b -= lr * gb
    # fold standardization back into raw-space coefficients
    w_raw = w / sd
    b_raw = b - float((w * (mu / sd)).sum())
    return CalibratedModel(
        weights={k: float(v) for k, v in zip(feature_names, w_raw)},
        bias=float(b_raw),
    )


def calibrate_from_labeled_pairs(
    scored: DataFrame,
    labels: DataFrame,
    feature_cols: list[str] | None = None,
    id_a: str = "id_a",
    id_b: str = "id_b",
    label_a: str = "url_a",
    label_b: str = "url_b",
    label_col: str = "is_match",
) -> CalibratedModel:
    """Join scored candidate pairs with labeled pairs and fit the blend.

    Labeled pairs missed by blocking are excluded from the fit (they
    carry no feature vector); blocking recall is asserted separately in
    the e2e tests.
    """
    feature_cols = feature_cols or FEATURES
    # canonicalize the label orientation: candidate pairs are emitted
    # with id_a < id_b, and nothing requires the caller's labels to be
    # sorted — a reversed label would fail the equi-join and silently
    # vanish from the fit, indistinguishable from a blocking miss
    joined = scored.join(
        labels.select(
            F.least(F.col(label_a), F.col(label_b)).alias(id_a),
            F.greatest(F.col(label_a), F.col(label_b)).alias(id_b),
            F.col(label_col).cast("int").alias("__y"),
        ),
        [id_a, id_b],
    )
    pdf = joined.select(*feature_cols, "__y").toPandas()
    if len(pdf) < 10:
        raise ValueError(f"too few labeled candidate pairs to calibrate: {len(pdf)}")
    if pdf[feature_cols].isna().any().any():
        # a NULL feature would flow through the numpy fit as NaN and
        # poison every weight without error — the returned model then
        # matches NOTHING (NaN >= threshold is false)
        bad = [c for c in feature_cols if pdf[c].isna().any()]
        raise ValueError(
            f"labeled candidate pairs carry null features in {bad}; "
            "coalesce or drop them before calibrating"
        )
    return fit_logistic(
        pdf[feature_cols].to_numpy(), pdf["__y"].to_numpy(), feature_cols
    )
