"""Distributed model-fitting primitives (SURVEY.md §2B training-data
extensions): the classifier/regressor/clustering layer a 100 TB
curation pipeline runs on top of its relational core -- a naive-Bayes
language classifier (train + apply, pure relational algebra, both
hash-oracled), exact multi-feature linear regression by normal
equations, logistic regression by fixed-iteration IRLS/Newton, and
Lloyd k-means with deterministic seeding.

Shared design across the family:

- every "model" is sufficient-statistics-sized (a vocab-bounded count
  table, a (d+1) x (d+1) moment matrix, k x d centroids), built with
  partial->final aggregation over ONE corpus scan per pass;
- the only ``collect()`` calls pull those model-sized statistics to
  the driver (marked ``# bounded``), where a few-KB numpy solve/eigh
  closes the loop; the corpus itself never leaves the executors;
- fitted parameters are broadcast back for the apply / next-iteration
  pass, so per-row work stays a vectorized Arrow-batch GEMM;
- iteration counts are FIXED, seeds are content-derived (md5), and
  outputs are rounded post-arithmetic, so results are deterministic
  and reproducible across cluster layouts up to partial-fold fp drift
  (~1e-12, absorbed by the 6-decimal rounding discipline).

Reference licence: the reference's map->shuffle->sort->reduce core is
exactly the count/sum substrate these fits decompose into
(``WordCount.java:23-52`` is a degenerate event-count trainer); the
iterative fits correspond to chained jobs in its model (SURVEY.md
§2A job chaining, ``MasterServlet.java`` FIFO queue).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------- shared

def _char_bigrams(documents: DataFrame) -> DataFrame:
    """(doc_id, lang, bigram) occurrence stream over lowercased text.

    ``sequence(1, length-1)`` needs the ``length >= 2`` guard on BOTH
    engines: Spark's ``sequence(1, 0)`` DESCENDS instead of returning
    empty (house gotcha), and the guard keeps the row universe
    identical to the oracle's ``range(1, length)``.

    Pairs are built over the ``split(t, '')`` char ARRAY, not via
    ``substring(t, i, 2)``: UTF8String substring scans from the start
    for non-ASCII, turning a positional loop into O(n^2) per document
    (the char_entropy lesson -- ~4-5x on the CJK slice); array
    subscripts are O(1)."""
    from ..sources.tables import spread_scan

    return (
        spread_scan(documents.select("doc_id", "lang", "text"), "doc_id")
        .filter(F.length("text") >= 2)
        .select(
            "doc_id", "lang", F.split(F.lower("text"), "").alias("c")
        )
        .select(
            "doc_id",
            "lang",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(c) - 1),"
                    " i -> c[i-1] || c[i])"
                )
            ).alias("bigram"),
        )
    )


def _nb_model(documents: DataFrame, counts: DataFrame | None = None):
    """Multinomial NB sufficient statistics over char bigrams:
    returns (model, langs) where model = (lang, bigram, cnt, log_prob)
    and langs = (lang, tot, v, dflt, n_docs, prior). Laplace-smoothed:
    log_prob = ln((cnt+1)/(tot+V)), unseen-bigram default
    dflt = ln(1/(tot+V)). All log-probs rounded to 6 decimals at the
    model boundary so train and apply share bit-identical parameters
    with the oracle.

    ``counts`` (lang, bigram, cnt) may be passed in pre-materialized
    (the apply path derives it from its own per-doc stream so the
    corpus is scanned once); when absent it is built here and
    localCheckpoint'ed -- counts is VOCAB-bounded (|langs| x bigram
    alphabet), and its four downstream consumers (tot / vocab /
    model / langs) would each re-run the corpus explode otherwise."""
    if counts is None:
        counts = (
            _char_bigrams(documents)
            .groupBy("lang", "bigram")
            .agg(F.count("*").alias("cnt"))
            .localCheckpoint()
        )
    tot = counts.groupBy("lang").agg(F.sum("cnt").alias("tot"))
    vocab = counts.agg(F.count_distinct("bigram").alias("v"))  # 1 row
    # Priors normalize over the SCORED population -- the length >= 2
    # corpus the bigram stream is built from -- not all documents, so
    # a language whose docs are all single-char cannot skew priors for
    # classes it never contributes bigrams to (round-5 advisory).
    scored_pop = documents.filter(F.length("text") >= 2)
    n_total = scored_pop.agg(F.count("*").alias("n_total"))  # 1 row
    priors = (
        scored_pop.groupBy("lang")
        .agg(F.count("*").alias("n_docs"))
        .join(F.broadcast(n_total))
        .withColumn(
            "prior", F.round(F.log(F.col("n_docs") / F.col("n_total")), 6)
        )
        .select("lang", "n_docs", "prior")
    )
    langs = (
        tot.join(F.broadcast(vocab))
        .withColumn("dflt", F.round(F.log(1.0 / (F.col("tot") + F.col("v"))), 6))
        .join(F.broadcast(priors), "lang")
    )
    model = (
        counts.join(F.broadcast(tot), "lang")
        .join(F.broadcast(vocab))
        .withColumn(
            "log_prob",
            F.round(F.log((F.col("cnt") + 1.0) / (F.col("tot") + F.col("v"))), 6),
        )
        .select("lang", "bigram", "cnt", "log_prob")
    )
    return model, langs


def naive_bayes_train(documents: DataFrame, top_n: int = 10) -> DataFrame:
    """Train a multinomial naive-Bayes language classifier on char
    bigrams and emit the head of the model: the ``top_n``
    highest-count bigrams per language with their Laplace-smoothed
    log-probabilities and the class prior.

    Pure relational algebra -- the same count/sum substrate as
    WordCount: one bigram-explode scan, a (lang, bigram) partial+final
    count, two model-sized side aggregates (per-lang totals, global
    vocab) broadcast back. The per-lang top-n rank window runs over
    the VOCAB-bounded count table, not the corpus, so the single
    window shuffle is model-sized at any corpus scale.

    Emits (lang, bigram, cnt, log_prob, prior), top_n rows per lang,
    rank tie-broken by bigram."""
    model, langs = _nb_model(documents)
    w = Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("bigram"))
    return (
        model.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_n)
        .join(F.broadcast(langs.select("lang", "prior")), "lang")
        .select("lang", "bigram", "cnt", "log_prob", "prior")
    )


def naive_bayes_confusion(documents: DataFrame) -> DataFrame:
    """Apply the naive-Bayes language model back over the corpus and
    emit the confusion matrix (true lang x predicted lang, doc
    counts) -- train + inference as one declarative plan, the
    classifier analogue of the reference's chained-job pattern.

    Score(doc, lang) = prior + sum over the doc's bigram occurrences
    of log_prob(lang, bigram), unseen bigrams at the smoothed default.
    Plan shape for 100 TB: per-doc bigram multiplicities (one
    partial+final agg over the explode scan) cross the |langs|-row
    class table (broadcast nested-loop BY DESIGN -- the row universe
    is docs x classes), left-join the vocab-bounded model BROADCAST on
    (lang, bigram), one keyed partial+final sum to (doc, lang), a
    per-doc argmax window (|langs| rows per key), and a final
    |langs|^2-row count. Nothing scales super-linearly in the corpus;
    the model tables are vocabulary-bounded.

    Scores are rounded to 6 decimals pre-ranking (house discipline:
    partial-fold fp drift ~1e-13 cannot flip a 1e-6 rounding).

    The corpus explode runs ONCE: the per-doc multiplicity table
    ``docb`` is localCheckpoint'ed (the hashed-shingle-stream pattern
    from the dedup family -- materialize the compressed distinct
    (doc, gram) form, ~3x smaller than the raw occurrence stream, and
    both the model counts and the scoring join re-read it instead of
    re-exploding the corpus)."""
    docb = (
        _char_bigrams(documents)
        .groupBy(
            F.col("doc_id"), F.col("lang").alias("lang_true"), F.col("bigram")
        )
        .agg(F.count("*").alias("m"))
        .localCheckpoint()
    )
    counts = (
        docb.groupBy(F.col("lang_true").alias("lang"), F.col("bigram"))
        .agg(F.sum("m").alias("cnt"))
        .localCheckpoint()  # vocab-bounded, derived from materialized docb
    )
    model, langs = _nb_model(documents, counts=counts)
    scored = (
        docb.join(
            F.broadcast(
                langs.select(
                    F.col("lang").alias("cls"), "prior", "dflt"
                )
            )
        )
        .join(
            F.broadcast(
                model.select(
                    F.col("lang").alias("cls"), "bigram", "log_prob"
                )
            ),
            ["cls", "bigram"],
            "left",
        )
        .withColumn("part", F.col("m") * F.coalesce("log_prob", "dflt"))
        .groupBy("doc_id", "lang_true", "cls", "prior")
        .agg(F.sum("part").alias("ll"))
        .withColumn("score", F.round(F.col("prior") + F.col("ll"), 6))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("cls"))
    pred = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    return pred.groupBy(
        F.col("lang_true").alias("lang"), F.col("cls").alias("pred_lang")
    ).agg(F.count("*").alias("n_docs"))


# ------------------------------------------------- moment-matrix fits

def _tagged_moment_pass(df: DataFrame, build):
    """Run ``build(X, y) -> list[(i, j, value)] arrays`` per Arrow
    batch over (features, target) and fold the tagged partials with
    one grouped SUM. Returns the folded rows (driver-side, bounded:
    the tag universe is model-sized by construction)."""

    def kernel(batches):
        acc = {}
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["x"]]
            )
            y = pdf["y"].to_numpy(dtype=np.float64)
            for i, j, v in build(X, y):
                acc[(i, j)] = acc.get((i, j), 0.0) + v
        if acc:
            ks = list(acc)
            yield pd.DataFrame(
                {
                    "i": np.array([k[0] for k in ks], dtype="int32"),
                    "j": np.array([k[1] for k in ks], dtype="int32"),
                    "partial": np.array([acc[k] for k in ks]),
                }
            )

    return (
        df.mapInPandas(kernel, "i int, j int, partial double")
        .groupBy("i", "j")
        .agg(F.sum("partial").alias("v"))
        .collect()  # bounded: (d+1)^2 + O(d) tagged moments, model-sized
    )


def _features(embeddings: DataFrame, n_feat: int, target) -> DataFrame:
    """Narrow (x: first n_feat dims, y) projection -- the scan the
    moment passes run over. ``slice`` keeps column pruning effective:
    only the embedding and label columns are read."""
    return embeddings.select(
        F.slice("embedding", 1, n_feat).alias("x"), target.alias("y")
    )


def linreg_normal(embeddings: DataFrame, n_feat: int = 8) -> DataFrame:
    """Exact multi-feature linear regression via normal equations --
    the distributed closed-form fit (features: the first ``n_feat``
    embedding dims + intercept; target: the label as a real).

    Pass 1 accumulates the full moment matrix per Arrow batch (a
    (d+1) x (d+1) GEMM on [X|1] extended with y as one more column --
    X'X, X'y, y'y and the counts fall out of ONE product), folds the
    ~(d+2)^2 tagged partials with a grouped SUM, and solves the
    (d+1)-dim system on the driver (# bounded collect, few KB).
    Pass 2 never rescans: SSE/SST derive from the SAME moments
    (SSE = y'y - 2b'X'y + b'X'Xb), so the corpus is scanned exactly
    once. Work is embarrassingly parallel; the shuffle moves
    O(d^2) rows per task regardless of corpus size.

    Emits (term, value): coefficients f0..f{n-1}, 'bias', plus fit
    diagnostics 'r2' and 'n' -- rounded to 6 decimals.

    Rows-only by declared design: the driver-side solve is not
    SQL-expressible; coefficient parity vs numpy lstsq is pinned in
    tests/test_ml.py and RECALL.json."""
    feats = _features(embeddings, n_feat, F.col("label").cast("double"))
    d = n_feat + 1  # + intercept

    def build(X, y):
        Z = np.column_stack([X, np.ones(len(X)), y])  # [X | 1 | y]
        G = Z.T @ Z  # one GEMM: X'X, X'y, y'y, sums, n
        dd = G.shape[0]
        jj, ii = np.meshgrid(np.arange(dd), np.arange(dd))
        return zip(ii.ravel().tolist(), jj.ravel().tolist(), G.ravel())

    folded = _tagged_moment_pass(feats, build)
    G = np.zeros((d + 1, d + 1))
    for r in folded:
        G[r["i"], r["j"]] = r["v"]
    A = G[:d, :d]  # [X|1]'[X|1]
    b = G[:d, d]  # [X|1]'y
    yy = G[d, d]  # y'y
    n = A[d - 1, d - 1]  # 1'1
    beta = np.linalg.solve(A, b)
    sse = yy - 2.0 * beta @ b + beta @ A @ beta
    y_mean = b[d - 1] / n  # (1'y)/n
    sst = yy - n * y_mean * y_mean
    r2 = 1.0 - sse / sst if sst > 0 else float("nan")
    terms = [f"f{i}" for i in range(n_feat)] + ["bias"]
    rows = [(t, round(float(c), 6)) for t, c in zip(terms, beta)]
    rows += [("r2", round(float(r2), 6)), ("n", float(n))]
    spark = embeddings.sparkSession
    return spark.createDataFrame(rows, "term string, value double")


def logreg_irls(
    embeddings: DataFrame, n_feat: int = 4, iters: int = 4
) -> DataFrame:
    """Distributed logistic regression by fixed-iteration IRLS/Newton
    (binary target: label >= 5; features: first ``n_feat`` embedding
    dims + intercept).

    Each of the ``iters`` rounds is one corpus scan: a vectorized
    Arrow-batch kernel computes p = sigmoid(X beta) under the
    BROADCAST current beta and accumulates the gradient X'(y - p) and
    Hessian X'WX (W = p(1-p)) as tagged partials; a grouped SUM folds
    them, the (d+1)-dim Newton step solves on the driver (# bounded),
    and the updated beta broadcasts into the next round -- the
    reference's chained-job pattern with a model-sized barrier. A
    final scan scores log-loss and training accuracy. Total: iters+1
    linear scans, O(d^2) shuffle rows per task, no per-pair work.

    Deterministic: beta starts at zero, iteration count is fixed, and
    partial-fold fp drift (~1e-12 per round) is absorbed by the
    6-decimal output rounding.

    Emits (term, value): coefficients f0..f{n-1}, 'bias',
    'log_loss' (mean), 'accuracy', 'n'.

    Rows-only by declared design (driver-side Newton solve is not
    SQL-expressible); numpy-IRLS parity pinned in tests/test_ml.py
    and RECALL.json."""
    feats = _features(
        embeddings, n_feat, (F.col("label") >= 5).cast("double")
    )
    d = n_feat + 1
    beta = np.zeros(d)

    for _ in range(iters):
        bcur = beta.copy()

        def build(X, y, bcur=bcur):
            Z = np.column_stack([X, np.ones(len(X))])
            p = 1.0 / (1.0 + np.exp(-(Z @ bcur)))
            g = Z.T @ (y - p)  # gradient, d
            H = (Z * (p * (1.0 - p))[:, None]).T @ Z  # Hessian, d x d
            jj, ii = np.meshgrid(np.arange(d), np.arange(d))
            out = list(zip(ii.ravel().tolist(), jj.ravel().tolist(), H.ravel()))
            out += [(i, -1, v) for i, v in enumerate(g)]
            return out

        folded = _tagged_moment_pass(feats, build)
        H = np.zeros((d, d))
        g = np.zeros(d)
        for r in folded:
            if r["j"] == -1:
                g[r["i"]] = r["v"]
            else:
                H[r["i"], r["j"]] = r["v"]
        beta = beta + np.linalg.solve(H, g)

    bfin = beta.copy()

    def build_metrics(X, y, bfin=bfin):
        Z = np.column_stack([X, np.ones(len(X))])
        z = Z @ bfin
        # stable log(1+exp(.)): log-loss = mean(log1p(exp(-z)) + (1-y) z)
        ll = np.logaddexp(0.0, -z) + (1.0 - y) * z
        acc_n = float(np.sum((z >= 0.0) == (y > 0.5)))
        return [(0, -2, float(ll.sum())), (1, -2, acc_n), (2, -2, float(len(y)))]

    folded = _tagged_moment_pass(feats, build_metrics)
    m = {r["i"]: r["v"] for r in folded}
    n = m[2]
    terms = [f"f{i}" for i in range(n_feat)] + ["bias"]
    rows = [(t, round(float(c), 6)) for t, c in zip(terms, beta)]
    rows += [
        ("log_loss", round(m[0] / n, 6)),
        ("accuracy", round(m[1] / n, 6)),
        ("n", float(n)),
    ]
    spark = embeddings.sparkSession
    return spark.createDataFrame(rows, "term string, value double")


# ------------------------------------------------------------- k-means

def kmeans_lloyd(
    embeddings: DataFrame, k: int = 8, iters: int = 5
) -> DataFrame:
    """Lloyd k-means over the embedding corpus with deterministic
    content-derived seeding and a FIXED iteration count; emits the
    final assignment (vec_id, cluster_id, dist) for every vector.

    Seeding: the k vectors with the smallest md5(vec_id) hex (the
    repo's cross-engine hash discipline) seed clusters 0..k-1 in hash
    order -- reproducible on any cluster layout, no RNG. Each Lloyd
    round is ONE corpus scan: the current k x d centroid matrix
    broadcasts into a vectorized Arrow-batch kernel (distances via
    one GEMM, argmin assignment), which emits k x (d+1) per-task
    partial sums/counts; a grouped SUM folds them and the k x d
    recompute happens on the driver (# bounded collect, k*d doubles).
    Empty clusters keep their previous centroid. A final scan emits
    assignments. Total: iters+1 linear scans, model-sized shuffles,
    no per-pair work -- the plan that survives 100 TB (k-NN-style
    all-pairs would not).

    Rows-only by declared design (iterative driver-coordinated fit,
    not SQL-expressible); numpy-Lloyd parity (identical seeds,
    identical iteration count) pinned in tests/test_ml.py, inertia
    ratio recorded in RECALL.json."""
    seeds = (
        embeddings.select(
            "vec_id",
            "embedding",
            F.md5(F.col("vec_id").cast("string")).alias("h"),
        )
        .orderBy("h")
        .limit(k)
        .collect()  # bounded: k seed rows, model-sized by construction
    )
    C = np.stack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in seeds]
    )
    d = C.shape[1]

    for _ in range(iters):
        Ccur = C.copy()

        def kernel(batches, Ccur=Ccur):
            acc_sum = np.zeros((k, d))
            acc_n = np.zeros(k)
            seen = False
            for pdf in batches:
                if not len(pdf):
                    continue
                seen = True
                X = np.stack(
                    [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
                )
                d2 = (
                    (X * X).sum(axis=1)[:, None]
                    - 2.0 * X @ Ccur.T
                    + (Ccur * Ccur).sum(axis=1)[None, :]
                )
                a = np.argmin(d2, axis=1)  # ties -> lowest cluster id
                for c in range(k):
                    mask = a == c
                    if mask.any():
                        acc_sum[c] += X[mask].sum(axis=0)
                        acc_n[c] += float(mask.sum())
            if seen:
                cc = np.repeat(np.arange(k), d + 1)
                jj = np.tile(np.arange(-1, d), k)
                vv = np.column_stack([acc_n, acc_sum]).ravel()
                yield pd.DataFrame(
                    {
                        "c": cc.astype("int32"),
                        "j": jj.astype("int32"),
                        "partial": vv,
                    }
                )

        folded = (
            embeddings.select("embedding")
            .mapInPandas(kernel, "c int, j int, partial double")
            .groupBy("c", "j")
            .agg(F.sum("partial").alias("v"))
            .collect()  # bounded: k x (d+1) centroid moments
        )
        sums = np.zeros((k, d))
        ns = np.zeros(k)
        for r in folded:
            if r["j"] == -1:
                ns[r["c"]] = r["v"]
            else:
                sums[r["c"], r["j"]] = r["v"]
        C = np.where((ns > 0)[:, None], sums / np.maximum(ns, 1.0)[:, None], C)

    Cfin = C.copy()

    def assign_kernel(batches, Cfin=Cfin):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            d2 = (
                (X * X).sum(axis=1)[:, None]
                - 2.0 * X @ Cfin.T
                + (Cfin * Cfin).sum(axis=1)[None, :]
            )
            a = np.argmin(d2, axis=1)
            dist = np.sqrt(np.maximum(d2[np.arange(len(X)), a], 0.0))
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].astype("int64"),
                    "cluster_id": a.astype("int32"),
                    "dist": np.round(dist, 6),
                }
            )

    return embeddings.select("vec_id", "embedding").mapInPandas(
        assign_kernel, "vec_id long, cluster_id int, dist double"
    )


def knn_classify(embeddings: DataFrame, k: int = 5) -> DataFrame:
    """Leave-one-out k-NN classification over the embedding corpus:
    every vector is labeled by the majority label of its k nearest
    cosine neighbors (self excluded), and the result is summarized as
    the label x predicted-label confusion matrix -- the standard
    embedding-quality probe (silhouette's supervised cousin) run
    before trusting embeddings for dedup or curation.

    Composes the declared operators: the exact ``embedding_knn_graph``
    (distributed block-GEMM, engine-deterministic (cosine, id) rank
    order) supplies neighbors; one equi-join attaches neighbor labels;
    a keyed count + per-source argmax window (k rows per key) takes
    the vote, ties broken by (count desc, label asc); a final
    |labels|^2-bounded count emits the matrix. Everything downstream
    of the k-NN graph is linear in N x k. The ANN family substitutes
    as the candidate generator at corpus scale.

    Emits (label, pred_label, n_vecs)."""
    from .similarity import embedding_knn_graph

    knn = embedding_knn_graph(embeddings, k=k)
    labels = embeddings.select("vec_id", "label")
    votes = knn.join(
        labels.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("nb_label"),
        ),
        "neighbor_id",
    )
    tally = votes.groupBy("vec_id", "nb_label").agg(
        F.count("*").alias("votes")
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("votes"), F.asc("nb_label")
    )
    pred = (
        tally.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("nb_label").alias("pred_label"))
    )
    return (
        pred.join(labels, "vec_id")
        .groupBy("label", "pred_label")
        .agg(F.count("*").alias("n_vecs"))
    )


def adaboost_stumps(
    embeddings: DataFrame, n_feat: int = 8, rounds: int = 5
) -> DataFrame:
    """Fixed-round AdaBoost over decision stumps (binary target:
    label >= 5; features: first ``n_feat`` embedding dims) -- boosting
    as the reference's chained-job pattern: each round is ONE corpus
    scan that scores every candidate stump under the current example
    weights, a model-sized driver reduction picks the best, and the
    grown ensemble broadcasts into the next round.

    Statelessness is the scale trick: example weights are NEVER
    materialized. w_i = exp(-y_i * margin_i) is recomputed row-locally
    each round from the broadcast ensemble (R stumps, a few hundred
    bytes), so no corpus-sized weight column is written, shuffled, or
    checkpointed -- the classic Spark translation of sequential
    boosting state.

    Candidate grid: per-feature thresholds at mean + std * {-1.5..1.5}
    from one moments pass (pinned at 6 decimals), both polarities --
    2 x 7 x n_feat candidates per round. The per-round kernel is a
    vectorized numpy sweep emitting one weighted-error partial per
    candidate per task; a grouped SUM folds them. Candidate errors are
    rounded to 9 decimals before the argmin (partial-fold drift
    ~1e-12 cannot flip it; structurally identical candidates tie-break
    on (feature, threshold index, polarity)).

    Emits per round (round, feature, threshold, polarity, alpha,
    err) plus a summary row (round = -1) whose ``err`` column carries
    the final ensemble training accuracy.

    Rows-only by declared design (driver-coordinated iterative fit);
    numpy-replay parity pinned in tests/test_ml.py + RECALL.json."""
    feats = _features(
        embeddings, n_feat, (F.col("label") >= 5).cast("double")
    )

    # one moments pass -> deterministic per-feature threshold grid
    def build_moments(X, y):
        out = []
        for f in range(n_feat):
            out.append((f, 0, float(X[:, f].sum())))
            out.append((f, 1, float((X[:, f] ** 2).sum())))
        out.append((-1, 0, float(len(X))))
        return out

    folded = _tagged_moment_pass(feats, build_moments)
    sx = np.zeros(n_feat)
    sxx = np.zeros(n_feat)
    n = 0.0
    for r in folded:
        if r["i"] == -1:
            n = r["v"]
        elif r["j"] == 0:
            sx[r["i"]] = r["v"]
        else:
            sxx[r["i"]] = r["v"]
    mean = np.round(sx / n, 6)
    std = np.round(np.sqrt(np.maximum(sxx / n - (sx / n) ** 2, 0.0)), 6)
    offsets = np.array([-1.5, -1.0, -0.5, 0.0, 0.5, 1.0, 1.5])
    grid = np.round(mean[:, None] + std[:, None] * offsets[None, :], 6)

    stumps: list[tuple[int, float, int, float]] = []  # (f, t, pol, alpha)
    n_thr = grid.shape[1]
    for _ in range(rounds):
        cur = list(stumps)

        def build_round(X, y, cur=cur):
            ys = 2.0 * y - 1.0  # {0,1} -> {-1,+1}
            m = np.zeros(len(X))
            for f, t, pol, alpha in cur:
                m += alpha * (np.where(X[:, f] <= t, 1.0, -1.0) * pol)
            w = np.exp(-ys * m)
            out = [(-1, -1, float(w.sum()))]
            for f in range(n_feat):
                xf = X[:, f]
                for ti in range(n_thr):
                    h = np.where(xf <= grid[f, ti], 1.0, -1.0)
                    wrong_pos = float(w[h != ys].sum())
                    # polarity +1 stored at tag ti, polarity -1 at
                    # ti + n_thr (its error is total - wrong_pos,
                    # folded driver-side from the same partial)
                    out.append((f, ti, wrong_pos))
            return out

        folded = _tagged_moment_pass(feats, build_round)
        total_w = 0.0
        wrong = np.zeros((n_feat, n_thr))
        for r in folded:
            if r["i"] == -1:
                total_w = r["v"]
            else:
                wrong[r["i"], r["j"]] = r["v"]
        errs_pos = np.round(wrong / total_w, 9)
        errs_neg = np.round(1.0 - errs_pos, 9)
        best = None  # (err, f, ti, pol)
        for f in range(n_feat):
            for ti in range(n_thr):
                for pol, e in ((1, errs_pos[f, ti]), (-1, errs_neg[f, ti])):
                    cand = (float(e), f, ti, pol)
                    if best is None or cand < best:
                        best = cand
        e, f, ti, pol = best
        e = min(max(e, 1e-9), 1.0 - 1e-9)
        alpha = 0.5 * float(np.log((1.0 - e) / e))
        stumps.append((f, float(grid[f, ti]), pol, alpha))

    sfin = list(stumps)

    def build_metrics(X, y, sfin=sfin):
        ys = 2.0 * y - 1.0
        m = np.zeros(len(X))
        for f, t, pol, alpha in sfin:
            m += alpha * (np.where(X[:, f] <= t, 1.0, -1.0) * pol)
        correct = (m >= 0.0) == (ys > 0.0)  # margin 0 predicts +1
        return [(0, -2, float(correct.sum())), (1, -2, float(len(X)))]

    folded = _tagged_moment_pass(feats, build_metrics)
    met = {r["i"]: r["v"] for r in folded}
    acc = met[0] / met[1]
    rows = []
    for rd, (f, t, pol, alpha) in enumerate(stumps):
        # reconstruct the round's chosen error from alpha: alpha =
        # 0.5 ln((1-e)/e)  =>  e = 1 / (1 + exp(2 alpha))
        e = 1.0 / (1.0 + float(np.exp(2.0 * alpha)))
        rows.append(
            (rd, f, round(float(t), 6), pol, round(alpha, 6), round(e, 6))
        )
    rows.append((-1, -1, 0.0, 0, 0.0, round(acc, 6)))
    spark = embeddings.sparkSession
    return spark.createDataFrame(
        rows,
        "round int, feature int, threshold double, polarity int,"
        " alpha double, err double",
    )


def logreg_ridge_sweep(
    embeddings: DataFrame,
    lambdas: tuple = (0.0, 0.1, 1.0),
    n_feat: int = 4,
    iters: int = 4,
) -> DataFrame:
    """Ridge-regularized logistic regression for a WHOLE hyperparameter
    sweep in shared scans -- the 100 TB training pattern: when three
    models need the same data pass, run one pass that feeds all three.

    Each IRLS round is ONE corpus scan whose kernel evaluates every
    lambda's current beta (all broadcast together) and emits that
    model's gradient + Hessian partials under a model-id tag; one
    grouped SUM folds the whole sweep and the driver takes one
    (d+1)-dim Newton step per lambda (L2 term added driver-side:
    grad -= lambda * beta, H += lambda * I, intercept unpenalized).
    Total cost: iters + 1 scans for len(lambdas) models -- scan count
    is independent of sweep width.

    Emits (lam, term, value): per-lambda coefficients plus 'log_loss'
    (unpenalized mean) and 'accuracy' from the shared metrics pass.

    Rows-only by declared design; numpy-replay parity (identical
    rounds, identical regularization) pinned in tests/test_ml.py +
    RECALL.json."""
    feats = _features(
        embeddings, n_feat, (F.col("label") >= 5).cast("double")
    )
    d = n_feat + 1
    L = len(lambdas)
    betas = [np.zeros(d) for _ in range(L)]

    for _ in range(iters):
        bcur = [b.copy() for b in betas]

        def build(X, y, bcur=bcur):
            Z = np.column_stack([X, np.ones(len(X))])
            out = []
            for m, beta in enumerate(bcur):
                p = 1.0 / (1.0 + np.exp(-(Z @ beta)))
                g = Z.T @ (y - p)
                H = (Z * (p * (1.0 - p))[:, None]).T @ Z
                # tag layout: i = m * (d + 1) + row, j = col (or -1
                # for the gradient) -- one flat tag space per model
                base = m * (d + 1)
                jj, ii = np.meshgrid(np.arange(d), np.arange(d))
                out += list(
                    zip((base + ii).ravel().tolist(), jj.ravel().tolist(), H.ravel())
                )
                out += [(base + i, -1, v) for i, v in enumerate(g)]
            return out

        folded = _tagged_moment_pass(feats, build)
        Hs = [np.zeros((d, d)) for _ in range(L)]
        gs = [np.zeros(d) for _ in range(L)]
        for r in folded:
            m, i = divmod(r["i"], d + 1)
            if r["j"] == -1:
                gs[m][i] = r["v"]
            else:
                Hs[m][i, r["j"]] = r["v"]
        for m, lam in enumerate(lambdas):
            reg = lam * np.eye(d)
            reg[d - 1, d - 1] = 0.0  # intercept unpenalized
            g = gs[m] - lam * np.append(betas[m][:-1], 0.0)
            betas[m] = betas[m] + np.linalg.solve(Hs[m] + reg, g)

    bfin = [b.copy() for b in betas]

    def build_metrics(X, y, bfin=bfin):
        Z = np.column_stack([X, np.ones(len(X))])
        out = []
        for m, beta in enumerate(bfin):
            z = Z @ beta
            ll = np.logaddexp(0.0, -z) + (1.0 - y) * z
            acc_n = float(np.sum((z >= 0.0) == (y > 0.5)))
            out += [
                (m, -2, float(ll.sum())),
                (m, -3, acc_n),
                (m, -4, float(len(y))),
            ]
        return out

    folded = _tagged_moment_pass(feats, build_metrics)
    met = {(r["i"], r["j"]): r["v"] for r in folded}
    terms = [f"f{i}" for i in range(n_feat)] + ["bias"]
    rows = []
    for m, lam in enumerate(lambdas):
        n = met[(m, -4)]
        for t, c in zip(terms, betas[m]):
            rows.append((float(lam), t, round(float(c), 6)))
        rows.append((float(lam), "log_loss", round(met[(m, -2)] / n, 6)))
        rows.append((float(lam), "accuracy", round(met[(m, -3)] / n, 6)))
    spark = embeddings.sparkSession
    return spark.createDataFrame(rows, "lam double, term string, value double")


def knn_link_prediction(embeddings: DataFrame, k: int = 5, top: int = 20) -> DataFrame:
    """Common-neighbor link prediction over the k-NN graph: for every
    non-adjacent pair sharing at least one neighbor, score by neighbor
    Jaccard |N(a) n N(b)| / |N(a) u N(b)| and emit the ``top``
    strongest predicted links -- the classic graph-completion baseline
    (who SHOULD be connected), run on the same substrate as the dedup
    cluster family.

    Plan: undirect the knn edges (union + distinct), one wedge join
    keyed on the shared neighbor (fan-out bounded by the hub's degree
    <= 2k -- the graph is degree-bounded by construction, so no
    degree-ordering trick is needed), a broadcastable degree table
    joined back, existing edges removed with a LEFT ANTI join, scores
    rounded 4 pre-ranking, and the global top collapses to
    TakeOrderedAndProject. Every shuffle keys on a vertex id.

    Emits (doc_a, doc_b, common, jaccard), jac desc / (a, b) asc."""
    from .similarity import embedding_knn_graph

    knn = embedding_knn_graph(embeddings, k=k).select("vec_id", "neighbor_id")
    edges = (
        knn.union(
            knn.select(
                F.col("neighbor_id").alias("vec_id"),
                F.col("vec_id").alias("neighbor_id"),
            )
        )
        .distinct()
        .localCheckpoint()  # vertex-degree-bounded edge list, consumed 4x
    )
    deg = edges.groupBy("vec_id").agg(F.count("*").alias("deg"))
    wedges = (
        edges.select(F.col("neighbor_id").alias("a"), F.col("vec_id").alias("x"))
        .join(
            edges.select(
                F.col("neighbor_id").alias("b"), F.col("vec_id").alias("x")
            ),
            "x",
        )
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("common"))
    )
    non_adjacent = wedges.join(
        edges.select(F.col("vec_id").alias("a"), F.col("neighbor_id").alias("b")),
        ["a", "b"],
        "left_anti",
    )
    jac = F.col("common") / (F.col("da") + F.col("db") - F.col("common"))
    return (
        non_adjacent.join(deg.select(F.col("vec_id").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("vec_id").alias("b"), F.col("deg").alias("db")), "b")
        .select(
            F.col("a").alias("doc_a"),
            F.col("b").alias("doc_b"),
            "common",
            F.round(jac, 4).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), F.asc("doc_a"), F.asc("doc_b"))
        .limit(top)
    )


def roc_auc_lang_length(documents: DataFrame) -> DataFrame:
    """ROC-AUC of document length as a detector of English documents,
    via the rank-sum identity AUC = (sum of positive midranks -
    n_pos*(n_pos+1)/2) / (n_pos*n_neg) -- the evaluation kernel every
    classifier audit needs, computed WITHOUT materializing a curve
    (the Mann-Whitney U equivalence turns it into one grouped rank
    fold; at 100 TB the per-score compression means the rank stage
    sees distinct score values, not documents).

    Midranks over the ascending score (n_chars) are kept DOUBLED so
    ties stay exact integers (the house midrank discipline):
    2*midrank = 2*(count strictly below) + ties + 1 per score value.
    AUC = (sum_r2_pos - 2*n_pos*(n_pos+1)/2) / (2*n_pos*n_neg) is one
    integer ratio, rounded at integer 1e-6 scale.

    Emits ONE row (n_pos, n_neg, sum_r2_pos, auc).
    """
    per_score = documents.groupBy(F.col("n_chars").alias("score")).agg(
        F.count("*").alias("t"),
        F.sum((F.col("lang") == "en").cast("long")).alias("pos"),
    )
    w = Window.orderBy("score").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = per_score.select(
        "t",
        "pos",
        F.coalesce(F.sum("t").over(w), F.lit(0)).alias("below"),
    )
    agg = ranked.agg(
        F.sum(
            F.col("pos") * (2 * F.col("below") + F.col("t") + 1)
        ).alias("sum_r2_pos"),
        F.sum("pos").alias("n_pos"),
        F.sum(F.col("t") - F.col("pos")).alias("n_neg"),
    )
    auc = (
        F.col("sum_r2_pos") - F.col("n_pos") * (F.col("n_pos") + 1)
    ).cast("double") / (
        F.lit(2.0) * F.col("n_pos") * F.col("n_neg")
    )
    return agg.filter((F.col("n_pos") > 0) & (F.col("n_neg") > 0)).select(
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        F.col("sum_r2_pos").cast("long").alias("sum_r2_pos"),
        (
            F.round(auc * F.lit(1e6)).cast("long") / F.lit(1e6)
        ).alias("auc"),
    )


def pr_curve_lang_length(documents: DataFrame, cuts: int = 10) -> DataFrame:
    """Precision/recall curve of the length-as-English-detector at 10
    coverage cuts (top 10%, 20%, ... of documents by descending
    score) -- ``roc_auc_lang_length``'s operating-points companion:
    AUC says whether the score ranks well, the curve says what you
    get at the threshold you can afford.

    Documents are ranked by (score DESC, doc_id) -- the unique-key
    tiebreak, so every rank is deterministic on both engines; the cut
    rows are rn = floor(N*k/10), selected by a 10-row constant grid
    join against the 1-row corpus total (both broadcast). Cumulative
    positives are an exact integer running sum; precision and recall
    are one integer ratio each at integer 1e-6 scale.

    Scale: no document-cardinality global window. The rank space is
    compressed to distinct (score, t, pos) rows first (exactly
    ``roc_auc_lang_length``'s discipline), the one-partition running
    sum runs over that score-bounded stream, and each rank_cut is
    located inside its score bucket by a 10-row broadcast inequality
    join; only then does the operator touch documents again --
    restricted to the <= 10 hit buckets, windowed per cut (partition
    size bounded by the largest tie group, never the corpus).

    Emits (cut_pct, rank_cut, score_cut, n_pos_at_cut, precision,
    recall).
    """
    spark = documents.sparkSession
    per_score = documents.groupBy(F.col("n_chars").alias("score")).agg(
        F.count("*").alias("t"),
        F.sum((F.col("lang") == "en").cast("long")).alias("pos"),
    )
    # Exclusive prefix sums over DISTINCT scores (descending): the
    # only one-partition window, score-cardinality by construction.
    w = Window.orderBy(F.col("score").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = per_score.select(
        "score",
        "t",
        F.coalesce(F.sum("t").over(w), F.lit(0)).alias("below_t"),
        F.coalesce(F.sum("pos").over(w), F.lit(0)).alias("below_pos"),
    )
    tot = documents.agg(
        F.count("*").alias("n"),
        F.sum((F.col("lang") == "en").cast("long")).alias("n_pos"),
    )
    grid = spark.range(1, cuts + 1).select(
        F.col("id").cast("int").alias("k")
    )
    cuts_df = grid.crossJoin(F.broadcast(tot)).select(
        "k",
        "n_pos",
        F.floor(F.col("n") * F.col("k") / F.lit(cuts))
        .cast("long")
        .alias("rank_cut"),
    ).filter(F.col("rank_cut") >= 1)
    # Locate each cut's score bucket: below_t < rank_cut <= below_t+t.
    # 10-row broadcast inequality join against the compressed stream.
    located = cum.join(
        F.broadcast(cuts_df),
        (F.col("rank_cut") > F.col("below_t"))
        & (F.col("rank_cut") <= F.col("below_t") + F.col("t")),
    ).select(
        "k",
        "n_pos",
        "rank_cut",
        "score",
        "below_pos",
        (F.col("rank_cut") - F.col("below_t")).alias("offset"),
    )
    # Resolve the in-bucket rank: only docs in the <= cuts hit
    # buckets survive the broadcast semi-restriction; the window is
    # partitioned per cut (bounded by the largest tie group).
    in_bucket = documents.select(
        F.col("n_chars").alias("score"),
        "doc_id",
        (F.col("lang") == "en").cast("long").alias("p"),
    ).join(F.broadcast(located), "score")
    wg = Window.partitionBy("k").orderBy("doc_id")
    at_cut = in_bucket.select(
        "k",
        "n_pos",
        "rank_cut",
        "score",
        "below_pos",
        "offset",
        F.row_number().over(wg).alias("rg"),
        F.sum("p")
        .over(wg.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cumg"),
    ).filter(F.col("rg") == F.col("offset"))
    return (
        at_cut.select(
            "k",
            "n_pos",
            "rank_cut",
            "score",
            (F.col("below_pos") + F.col("cumg")).alias("cum_pos"),
        )
        .select(
            (F.col("k") * F.lit(100 // cuts)).alias("cut_pct"),
            F.col("rank_cut").cast("long").alias("rank_cut"),
            F.col("score").cast("long").alias("score_cut"),
            F.col("cum_pos").cast("long").alias("n_pos_at_cut"),
            (
                F.round(
                    F.col("cum_pos") * F.lit(1e6)
                    / F.col("rank_cut").cast("double")
                ).cast("long")
                / F.lit(1e6)
            ).alias("precision"),
            (
                F.round(
                    F.col("cum_pos") * F.lit(1e6)
                    / F.col("n_pos").cast("double")
                ).cast("long")
                / F.lit(1e6)
            ).alias("recall"),
        )
    )


def ridge_two_feature(lineitem: DataFrame, lam: float = 1000.0) -> DataFrame:
    """Closed-form ridge regression of line-item revenue (cents) on
    (quantity, discount-percent) -- the two-feature extension of
    ``ml_linreg_normal``'s single-feature fit, small enough that the
    2x2 normal equations (X'X + lambda*I) beta = X'y solve as pure
    scalar expressions on BOTH engines (no numpy, no collect): the
    regularized-fit primitive demonstrated end-to-end in SQL algebra.

    Sufficient statistics are exact integers off ONE scan (y in
    cents, discount in integer percent-hundredths); the centered
    moments, the 2x2 determinant, the two slopes, and the intercept
    are each one double expression written in the same operation
    order on both engines. Ridge shrinks toward zero on the centered
    scale (the standard parameterization: intercept unpenalized).

    Emits ONE row (n, beta_qty, beta_disc, intercept, lam).
    """
    base = lineitem.select(
        F.col("l_quantity").cast("long").alias("x1"),
        F.round(F.col("l_discount") * 10000).cast("long").alias("x2"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    )
    agg = base.agg(
        F.count("*").alias("n"),
        F.sum("x1").alias("s1"),
        F.sum("x2").alias("s2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
    )
    n = F.col("n").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    sy = F.col("sy").cast("double")
    c11 = F.col("s11").cast("double") - s1 * s1 / n
    c22 = F.col("s22").cast("double") - s2 * s2 / n
    c12 = F.col("s12").cast("double") - s1 * s2 / n
    c1y = F.col("s1y").cast("double") - s1 * sy / n
    c2y = F.col("s2y").cast("double") - s2 * sy / n
    det = (c11 + F.lit(lam)) * (c22 + F.lit(lam)) - c12 * c12
    b1 = (c1y * (c22 + F.lit(lam)) - c2y * c12) / det
    b2 = ((c11 + F.lit(lam)) * c2y - c12 * c1y) / det
    icpt = sy / n - b1 * (s1 / n) - b2 * (s2 / n)
    return agg.filter(F.col("n") > 2).select(
        F.col("n").cast("long").alias("n"),
        F.round(b1, 6).alias("beta_qty"),
        F.round(b2, 6).alias("beta_disc"),
        F.round(icpt, 4).alias("intercept"),
        F.lit(lam).alias("lam"),
    )
