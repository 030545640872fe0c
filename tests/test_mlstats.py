"""Distributed ML sufficient-statistics and trainer tests."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from cumulus_etl_spark.operators import textstats as T
from cumulus_etl_spark.operators.mlstats import gram_matrix, linreg_fit, logreg_train_gd
from cumulus_etl_spark.sources import table


def _featurized(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "source",
        F.col("n_chars").cast("double").alias("y"),
        T.token_count("text").cast("double").alias("n_tokens"),
        T.punct_count("text").cast("double").alias("n_punct"),
    )


def test_gram_matrix_matches_numpy(spark, sf_smoke):
    f = _featurized(spark, sf_smoke)
    xtx, xty, n = gram_matrix(f, ["n_tokens", "n_punct"], "y")
    rows = f.collect()
    X = np.array([[r["n_tokens"], r["n_punct"], 1.0] for r in rows])
    Y = np.array([r["y"] for r in rows])
    assert n == len(rows)
    assert np.allclose(np.array(xtx), X.T @ X)
    assert np.allclose(np.array(xty), X.T @ Y)


def test_linreg_fit_matches_lstsq(spark, sf_smoke):
    f = _featurized(spark, sf_smoke)
    w, r2 = linreg_fit(f, ["n_tokens", "n_punct"], "y")
    rows = f.collect()
    X = np.array([[r["n_tokens"], r["n_punct"], 1.0] for r in rows])
    Y = np.array([r["y"] for r in rows])
    ref, *_ = np.linalg.lstsq(X, Y, rcond=None)
    assert np.allclose(w, ref, rtol=1e-8)
    # n_chars is nearly linear in token count for space-joined words.
    assert r2 > 0.9


def test_logreg_loss_decreases_and_matches_reference(spark, sf_smoke):
    f = _featurized(spark, sf_smoke)
    label = (F.col("source") == "src0").cast("double")
    w, losses = logreg_train_gd(f, ["n_tokens", "n_punct"], label, lr=0.5, iters=8)
    assert losses[-1] < losses[0]

    # numpy reference with identical standardization + updates
    rows = f.select("n_tokens", "n_punct", label.alias("lab")).collect()
    X = np.array([[r["n_tokens"], r["n_punct"]] for r in rows])
    Y = np.array([r["lab"] for r in rows])
    mu, sd = X.mean(axis=0), X.std(axis=0)
    sd[sd == 0] = 1.0
    Xs = np.hstack([(X - mu) / sd, np.ones((len(X), 1))])
    wr = np.zeros(3)
    n = len(X)
    for _ in range(8):
        p = 1.0 / (1.0 + np.exp(-(Xs @ wr)))
        wr = wr - 0.5 * (Xs.T @ (p - Y)) / n
    assert np.allclose(w, wr, atol=1e-8)
