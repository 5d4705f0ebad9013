"""Engine-local parity tests for the rows-only ML-fit primitives
(operators/ml.py): each distributed fit is replayed serially in numpy
(identical seeds, identical iteration counts) on the collected fixture
and must agree up to partial-fold fp drift. The two naive-Bayes
queries are hash-oracled by the driver sweep; here they get cheap
structural invariants only."""

import hashlib

import numpy as np
import pytest

from java_mapreduce_framework_spark.operators import ml
from java_mapreduce_framework_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb_np(spark, sf_small):
    rows = (
        load_table(spark, sf_small, "embeddings")
        .select("vec_id", "embedding", "label")
        .collect()
    )  # test-side collect: fixture-sized, not engine code
    rows.sort(key=lambda r: r["vec_id"])
    X = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    y = np.array([r["label"] for r in rows], dtype=np.float64)
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    return ids, X, y


def test_linreg_normal_matches_numpy_lstsq(spark, sf_small, emb_np):
    _, X, y = emb_np
    out = {
        r["term"]: r["value"]
        for r in ml.linreg_normal(
            load_table(spark, sf_small, "embeddings")
        ).collect()
    }
    Z = np.column_stack([X[:, :8], np.ones(len(X))])
    beta, *_ = np.linalg.lstsq(Z, y, rcond=None)
    got = np.array([out[f"f{i}"] for i in range(8)] + [out["bias"]])
    assert np.allclose(got, beta, atol=1e-5)
    resid = y - Z @ beta
    sst = np.sum((y - y.mean()) ** 2)
    r2 = 1.0 - resid @ resid / sst
    assert abs(out["r2"] - r2) < 1e-5
    assert out["n"] == len(X)


def _irls_numpy(X, y, n_feat=4, iters=4):
    Z = np.column_stack([X[:, :n_feat], np.ones(len(X))])
    beta = np.zeros(n_feat + 1)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(Z @ beta)))
        g = Z.T @ (y - p)
        H = (Z * (p * (1.0 - p))[:, None]).T @ Z
        beta = beta + np.linalg.solve(H, g)
    return Z, beta


def test_logreg_irls_matches_numpy_irls(spark, sf_small, emb_np):
    _, X, y_raw = emb_np
    y = (y_raw >= 5).astype(np.float64)
    out = {
        r["term"]: r["value"]
        for r in ml.logreg_irls(
            load_table(spark, sf_small, "embeddings")
        ).collect()
    }
    Z, beta = _irls_numpy(X, y)
    got = np.array([out[f"f{i}"] for i in range(4)] + [out["bias"]])
    assert np.allclose(got, beta, atol=1e-5)
    z = Z @ beta
    ll = float(np.mean(np.logaddexp(0.0, -z) + (1.0 - y) * z))
    acc = float(np.mean((z >= 0.0) == (y > 0.5)))
    assert abs(out["log_loss"] - ll) < 1e-5
    assert abs(out["accuracy"] - acc) < 1e-9


def _lloyd_numpy(ids, X, k=8, iters=5):
    order = np.argsort(
        np.array(
            [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
        )
    )
    C = X[order[:k]].copy()
    for _ in range(iters):
        d2 = (
            (X * X).sum(axis=1)[:, None]
            - 2.0 * X @ C.T
            + (C * C).sum(axis=1)[None, :]
        )
        a = np.argmin(d2, axis=1)
        for c in range(k):
            if (a == c).any():
                C[c] = X[a == c].mean(axis=0)
    d2 = (
        (X * X).sum(axis=1)[:, None]
        - 2.0 * X @ C.T
        + (C * C).sum(axis=1)[None, :]
    )
    a = np.argmin(d2, axis=1)
    dist = np.sqrt(np.maximum(d2[np.arange(len(X)), a], 0.0))
    return a, dist, C


def test_kmeans_lloyd_matches_numpy_lloyd(spark, sf_small, emb_np):
    ids, X, _ = emb_np
    got = {
        r["vec_id"]: (r["cluster_id"], r["dist"])
        for r in ml.kmeans_lloyd(
            load_table(spark, sf_small, "embeddings")
        ).collect()
    }
    a, dist, _ = _lloyd_numpy(ids, X)
    assert len(got) == len(ids)
    mismatched = sum(
        1 for i, vid in enumerate(ids) if got[vid][0] != a[i]
    )
    assert mismatched == 0
    max_dist_err = max(
        abs(got[vid][1] - dist[i]) for i, vid in enumerate(ids)
    )
    assert max_dist_err < 1e-5


def test_naive_bayes_train_invariants(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    rows = ml.naive_bayes_train(docs).collect()
    langs = {r["lang"] for r in rows}
    # exactly top-10 bigrams per language, priors sum to 1 in exp space
    for lang in langs:
        assert sum(1 for r in rows if r["lang"] == lang) == 10
    priors = {r["lang"]: r["prior"] for r in rows}
    assert abs(sum(np.exp(p) for p in priors.values()) - 1.0) < 1e-4
    assert all(r["log_prob"] < 0 for r in rows)


def test_naive_bayes_confusion_partitions_corpus(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    rows = ml.naive_bayes_confusion(docs).collect()
    n_docs_in = docs.filter("length(text) >= 2").count()
    assert sum(r["n_docs"] for r in rows) == n_docs_in
    # the fixture's text is synthetic with a weak language signal, so
    # the NB fit only has to clearly beat the uniform-random baseline
    # (n / n_langs); it actually lands near the majority-class rate
    correct = sum(r["n_docs"] for r in rows if r["lang"] == r["pred_lang"])
    n_langs = docs.select("lang").distinct().count()
    assert correct > 1.5 * n_docs_in / n_langs


def _adaboost_numpy(X, y_raw, n_feat=8, rounds=5):
    y = (y_raw >= 5).astype(np.float64)
    ys = 2.0 * y - 1.0
    Xf = X[:, :n_feat]
    mean = np.round(Xf.mean(axis=0), 6)
    std = np.round(Xf.std(axis=0), 6)
    offsets = np.array([-1.5, -1.0, -0.5, 0.0, 0.5, 1.0, 1.5])
    grid = np.round(mean[:, None] + std[:, None] * offsets[None, :], 6)
    stumps = []
    for _ in range(rounds):
        m = np.zeros(len(Xf))
        for f, t, pol, alpha in stumps:
            m += alpha * (np.where(Xf[:, f] <= t, 1.0, -1.0) * pol)
        w = np.exp(-ys * m)
        total = w.sum()
        best = None
        for f in range(n_feat):
            for ti in range(grid.shape[1]):
                h = np.where(Xf[:, f] <= grid[f, ti], 1.0, -1.0)
                e_pos = round(float(w[h != ys].sum() / total), 9)
                for pol, e in ((1, e_pos), (-1, round(1.0 - e_pos, 9))):
                    cand = (e, f, ti, pol)
                    if best is None or cand < best:
                        best = cand
        e, f, ti, pol = best
        e = min(max(e, 1e-9), 1.0 - 1e-9)
        alpha = 0.5 * float(np.log((1.0 - e) / e))
        stumps.append((f, float(grid[f, ti]), pol, alpha))
    m = np.zeros(len(Xf))
    for f, t, pol, alpha in stumps:
        m += alpha * (np.where(Xf[:, f] <= t, 1.0, -1.0) * pol)
    acc = float(np.mean((m >= 0.0) == (ys > 0.0)))
    return stumps, acc


def test_adaboost_stumps_matches_numpy_replay(spark, sf_small, emb_np):
    ids, X, y_raw = emb_np
    rows = ml.adaboost_stumps(
        load_table(spark, sf_small, "embeddings")
    ).collect()
    got_stumps = [
        (r["feature"], r["threshold"], r["polarity"], r["alpha"])
        for r in sorted(
            (r for r in rows if r["round"] >= 0), key=lambda r: r["round"]
        )
    ]
    got_acc = next(r["err"] for r in rows if r["round"] == -1)
    ref_stumps, ref_acc = _adaboost_numpy(X, y_raw)
    assert len(got_stumps) == len(ref_stumps) == 5
    for g, r in zip(got_stumps, ref_stumps):
        assert g[0] == r[0] and g[2] == r[2]  # same feature + polarity
        assert abs(g[1] - r[1]) < 1e-9  # same threshold
        assert abs(g[3] - r[3]) < 1e-6  # alpha up to fold drift
    assert abs(got_acc - ref_acc) < 1e-9
    # boosting sanity: every chosen round error strictly < 0.5
    assert all(r["err"] < 0.5 for r in rows if r["round"] >= 0)


def test_logreg_ridge_sweep_matches_numpy_and_shrinks(spark, sf_small, emb_np):
    _, X, y_raw = emb_np
    y = (y_raw >= 5).astype(np.float64)
    Z = np.column_stack([X[:, :4], np.ones(len(X))])
    out = ml.logreg_ridge_sweep(
        load_table(spark, sf_small, "embeddings")
    ).collect()
    by_lam = {}
    for r in out:
        by_lam.setdefault(r["lam"], {})[r["term"]] = r["value"]
    assert set(by_lam) == {0.0, 0.1, 1.0}
    norms = {}
    for lam, vals in by_lam.items():
        beta = np.zeros(5)
        for _ in range(4):
            p = 1.0 / (1.0 + np.exp(-(Z @ beta)))
            g = Z.T @ (y - p) - lam * np.append(beta[:-1], 0.0)
            H = (Z * (p * (1.0 - p))[:, None]).T @ Z + lam * np.diag(
                [1.0] * 4 + [0.0]
            )
            beta = beta + np.linalg.solve(H, g)
        got = np.array([vals[f"f{i}"] for i in range(4)] + [vals["bias"]])
        assert np.allclose(got, beta, atol=1e-5), lam
        norms[lam] = float(np.linalg.norm(got[:-1]))
    # ridge must shrink the (non-intercept) coefficient norm
    assert norms[1.0] < norms[0.1] < norms[0.0]
    # lam=0 must equal the unregularized fit exactly
    plain = {
        r["term"]: r["value"]
        for r in ml.logreg_irls(load_table(spark, sf_small, "embeddings")).collect()
    }
    for t in [f"f{i}" for i in range(4)] + ["bias"]:
        assert abs(by_lam[0.0][t] - plain[t]) < 1e-9
