"""ml section of the declared query registry -- bodies verbatim
from the monolithic plans/registry.py (round-8 maintainability split;
identical registry() output, zero plan changes)."""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from ...operators import (  # noqa: F401
    analytics,
    dedup,
    ml,
    multimodal,
    relational,
    similarity,
    temporal,
    text,
)
from ...sources.tables import load_table  # noqa: F401
from .core import (  # noqa: F401
    _QUALITY_EXPR,
    _QUALITY_MEASURES_CTE,
    _TOKS,
    _register,
    _t,
)


# ------------------------------------------------- ML-fit primitives

#: Char-bigram occurrence stream + naive-Bayes model CTEs, shared
#: verbatim by the ml_naive_bayes_train / ml_naive_bayes_confusion
#: oracles (mirror of operators/ml.py::_char_bigrams / _nb_model).
#: range(1, length) == Spark's sequence(1, length-1); the length >= 2
#: guard keeps the row universe identical (Spark sequence(1, 0)
#: DESCENDS -- house gotcha).
_NB_MODEL_CTE = """
    grams AS (
      SELECT doc_id, lang,
             unnest(list_transform(range(1, length(lower(text))),
                                   i -> substring(lower(text), i, 2))) AS bigram
      FROM documents WHERE length(text) >= 2),
    counts AS (SELECT lang, bigram, count(*) AS cnt FROM grams GROUP BY 1, 2),
    tot AS (SELECT lang, sum(cnt) AS tot FROM counts GROUP BY 1),
    vocab AS (SELECT count(DISTINCT bigram) AS v FROM counts),
    pri AS (
      -- priors over the scored (length >= 2) population, mirroring
      -- operators/ml.py::_nb_model
      SELECT lang,
             round(ln(count(*) * 1.0 /
                      (SELECT count(*) FROM documents
                       WHERE length(text) >= 2)), 6) AS prior
      FROM documents WHERE length(text) >= 2 GROUP BY 1),
    model AS (
      SELECT c.lang, c.bigram, c.cnt,
             round(ln((c.cnt + 1.0) / (t.tot + v.v)), 6) AS log_prob
      FROM counts c JOIN tot t ON t.lang = c.lang CROSS JOIN vocab v)
"""


@_register(
    "ml_naive_bayes_train",
    f"""
    WITH {_NB_MODEL_CTE},
    ranked AS (
      SELECT lang, bigram, cnt, log_prob,
             row_number() OVER (PARTITION BY lang
                                ORDER BY cnt DESC, bigram) AS rn
      FROM model)
    SELECT r.lang, r.bigram, CAST(r.cnt AS BIGINT) AS cnt, r.log_prob, p.prior
    FROM ranked r JOIN pri p ON p.lang = r.lang
    WHERE r.rn <= 10
    """,
    note="multinomial NB language model head: Laplace-smoothed "
    "char-bigram log-probs + class priors, top-10 bigrams per lang; "
    "the rank window runs over the vocab-bounded count table, not the "
    "corpus",
)
def _ml_naive_bayes_train(spark, sf):
    return ml.naive_bayes_train(_t(spark, sf, "documents"))


@_register(
    "ml_naive_bayes_confusion",
    f"""
    WITH {_NB_MODEL_CTE},
    langs AS (
      SELECT t.lang, p.prior, round(ln(1.0 / (t.tot + v.v)), 6) AS dflt
      FROM tot t CROSS JOIN vocab v JOIN pri p ON p.lang = t.lang),
    docb AS (
      SELECT doc_id, lang AS lang_true, bigram, count(*) AS m
      FROM grams GROUP BY 1, 2, 3),
    scored AS (
      SELECT d.doc_id, d.lang_true, l.lang AS cls,
             round(l.prior + sum(d.m * coalesce(mo.log_prob, l.dflt)), 6)
               AS score
      FROM docb d CROSS JOIN langs l
      LEFT JOIN model mo ON mo.lang = l.lang AND mo.bigram = d.bigram
      GROUP BY 1, 2, 3, l.prior),
    pred AS (
      SELECT doc_id, lang_true, cls,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, cls) AS rn
      FROM scored)
    SELECT lang_true AS lang, cls AS pred_lang,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM pred WHERE rn = 1 GROUP BY 1, 2
    """,
    note="NB train + inference in one declarative plan: per-doc "
    "bigram multiplicities cross the |langs|-row class table "
    "(broadcast by design), vocab-bounded model broadcast-left-joined, "
    "scores rounded 6 pre-ranking; emits the |langs|^2 confusion matrix",
)
def _ml_naive_bayes_confusion(spark, sf):
    return ml.naive_bayes_confusion(_t(spark, sf, "documents"))


@_register(
    "ml_knn_link_prediction",
    """
    WITH scored AS (
      SELECT a.vec_id, b.vec_id AS neighbor_id,
             round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                          CAST(b.embedding AS DOUBLE[])), 6)
               AS cosine
      FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
    nn AS (
      SELECT vec_id, neighbor_id FROM (
        SELECT vec_id, neighbor_id,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cosine DESC, neighbor_id) AS rank
        FROM scored) WHERE rank <= 5),
    edges AS (
      SELECT DISTINCT * FROM (
        SELECT vec_id, neighbor_id FROM nn
        UNION ALL
        SELECT neighbor_id AS vec_id, vec_id AS neighbor_id FROM nn)),
    deg AS (SELECT vec_id, count(*) AS deg FROM edges GROUP BY 1),
    wedges AS (
      SELECT e1.neighbor_id AS a, e2.neighbor_id AS b, count(*) AS common
      FROM edges e1 JOIN edges e2 ON e1.vec_id = e2.vec_id
      WHERE e1.neighbor_id < e2.neighbor_id
      GROUP BY 1, 2),
    nonadj AS (
      SELECT w.a, w.b, w.common FROM wedges w
      WHERE NOT EXISTS (SELECT 1 FROM edges e
                        WHERE e.vec_id = w.a AND e.neighbor_id = w.b))
    SELECT a AS doc_a, b AS doc_b, CAST(common AS BIGINT) AS common,
           round(common * 1.0 / (da.deg + db.deg - common), 4) AS jaccard
    FROM nonadj JOIN deg da ON da.vec_id = a JOIN deg db ON db.vec_id = b
    ORDER BY jaccard DESC, doc_a, doc_b LIMIT 20
    """,
    note="common-neighbor link prediction on the knn graph: wedge "
    "join fan-out bounded by the <=2k vertex degree, anti-join "
    "removes existing edges, TakeOrderedAndProject top-20; oracle is "
    "the brute-force N^2 graph mirror",
)
def _ml_knn_link_prediction(spark, sf):
    return ml.knn_link_prediction(_t(spark, sf, "embeddings"))


@_register(
    "ml_knn_classify",
    """
    WITH scored AS (
      SELECT a.vec_id, b.vec_id AS neighbor_id, b.label AS nb_label,
             round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                          CAST(b.embedding AS DOUBLE[])), 6)
               AS cosine
      FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
    nn AS (
      SELECT vec_id, nb_label,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored),
    tally AS (
      SELECT vec_id, nb_label, count(*) AS votes
      FROM nn WHERE rank <= 5 GROUP BY 1, 2),
    pred AS (
      SELECT vec_id, nb_label AS pred_label,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY votes DESC, nb_label) AS rn
      FROM tally)
    SELECT e.label, p.pred_label, CAST(count(*) AS BIGINT) AS n_vecs
    FROM pred p JOIN embeddings e USING (vec_id)
    WHERE p.rn = 1 GROUP BY 1, 2
    """,
    note="leave-one-out k-NN majority-vote classification composed on "
    "the exact block-GEMM knn graph (engine-deterministic (cosine, id) "
    "rank); vote argmax tie-broken (count desc, label asc); oracle is "
    "the brute-force N^2 mirror",
)
def _ml_knn_classify(spark, sf):
    return ml.knn_classify(_t(spark, sf, "embeddings"))


@_register(
    "text_readability",
    f"""
    WITH m AS (
      SELECT doc_id,
             CAST(len({_TOKS}) AS INTEGER) AS n_words,
             CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+')))
               AS INTEGER) AS n_sentences,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
               AS INTEGER) AS n_syllables
      FROM documents
      WHERE len({_TOKS}) > 0)
    SELECT doc_id, n_words, n_sentences, n_syllables,
           round(206.835 - 1.015 * (n_words * 1.0 / n_sentences)
                 - 84.6 * (n_syllables * 1.0 / n_words), 4) AS flesch
    FROM m
    """,
    note="Flesch reading-ease per doc: three row-local regexp counts "
    "over the pruned (doc_id, text) scan, no shuffle; vowel-group "
    "syllables counted corpus-wide (groups cannot span whitespace)",
)
def _text_readability(spark, sf):
    return text.text_readability(_t(spark, sf, "documents"))


@_register(
    "multimodal_audio_spectrogram",
    None,
    note="rows-only by declared design (no FFT in the oracle engine): "
    "real STFT over the RIFF/WAVE decode path, Hann window + rFFT "
    "power per frame inside the Arrow kernel; pure-tone dominant-bin "
    "physics pinned in tests/test_multimodal.py + RECALL.json",
)
def _multimodal_audio_spectrogram(spark, sf):
    return multimodal.audio_spectrogram(
        multimodal.attach_audio_payload(_t(spark, sf, "documents"))
    )


def _mmr_oracle(
    n_queries: int = 3, k: int = 10, shortlist: int = 50, lam: float = 0.7
) -> str:
    """Unrolled greedy-MMR oracle: one (div, argmax-pick, selected)
    CTE triple per rank -- the kmeans/PQ unrolled-iteration
    discipline applied to a greedy selection. Cosines are the proven
    ``similarity_topk`` cross-engine identity
    (list_cosine_similarity over DOUBLE casts, rounded 6); scores
    round to 6 BEFORE the argmax with nid as tie-break, exactly the
    engine's comparison."""
    mu = round(1.0 - lam, 10)
    rounds = []
    for r in range(2, k + 1):
        rounds.append(f"""
    div{r} AS (
      SELECT c.qid, c.nid, c.rel, max(p.c) AS div
      FROM sl c
      JOIN sel{r - 1} s ON s.qid = c.qid
      JOIN ps p ON p.qid = c.qid AND p.na = c.nid AND p.nb = s.nid
      WHERE NOT EXISTS (SELECT 1 FROM sel{r - 1} x
                        WHERE x.qid = c.qid AND x.nid = c.nid)
      GROUP BY 1, 2, 3),
    pick{r} AS MATERIALIZED (
      SELECT qid, nid, rel, score, {r} AS rnk FROM (
        SELECT qid, nid, rel,
               round({lam} * rel - {mu} * div, 6) AS score,
               row_number() OVER (PARTITION BY qid
                 ORDER BY round({lam} * rel - {mu} * div, 6) DESC,
                          nid) AS rn
        FROM div{r}) WHERE rn = 1),
    sel{r} AS MATERIALIZED (
      SELECT * FROM sel{r - 1} UNION ALL SELECT * FROM pick{r})""")
    chain = ",".join(rounds)
    return f"""
    WITH q AS (
      SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
      FROM embeddings WHERE vec_id < {n_queries}),
    s AS (
      SELECT qid, e.vec_id AS nid,
             round(list_cosine_similarity(qe,
                   CAST(e.embedding AS DOUBLE[])), 6) AS rel
      FROM q CROSS JOIN embeddings e WHERE e.vec_id <> qid),
    sl AS MATERIALIZED (
      SELECT qid, nid, rel FROM (
        SELECT qid, nid, rel,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY rel DESC, nid) AS rnk
        FROM s) WHERE rnk <= {shortlist}),
    ps AS MATERIALIZED (
      SELECT a.qid, a.nid AS na, b.nid AS nb,
             round(list_cosine_similarity(
                   CAST(ea.embedding AS DOUBLE[]),
                   CAST(eb.embedding AS DOUBLE[])), 6) AS c
      FROM sl a JOIN sl b ON a.qid = b.qid AND a.nid <> b.nid
      JOIN embeddings ea ON ea.vec_id = a.nid
      JOIN embeddings eb ON eb.vec_id = b.nid),
    pick1 AS MATERIALIZED (
      SELECT qid, nid, rel, score, 1 AS rnk FROM (
        SELECT qid, nid, rel, round({lam} * rel, 6) AS score,
               row_number() OVER (PARTITION BY qid
                 ORDER BY round({lam} * rel, 6) DESC, nid) AS rn
        FROM sl) WHERE rn = 1),
    sel1 AS MATERIALIZED (SELECT * FROM pick1),{chain}
    SELECT CAST(qid AS BIGINT) AS qid, CAST(rnk AS INT) AS rank,
           CAST(nid AS BIGINT) AS nid,
           round(rel, 4) AS relevance,
           round(score, 4) AS mmr_score
    FROM sel{k}
    """


@_register(
    "similarity_mmr",
    _mmr_oracle(),
    note="greedy maximal-marginal-relevance rerank (k sequential "
    "argmaxes) over the distributed exact shortlist; round-12 "
    "promotion from rows-only: the oracle unrolls the greedy "
    "selection as one (div, argmax, selected) CTE triple per rank "
    "over the same 6-rounded cosine identity, so the full rerank "
    "hash-verifies; numpy-replay parity stays in "
    "tests/test_similarity.py, diversity gain in RECALL.json",
)
def _similarity_mmr(spark, sf):
    return similarity.similarity_mmr(_t(spark, sf, "embeddings"))


@_register(
    "ml_linreg_normal",
    """
    WITH f AS (
      SELECT CAST(embedding[1] AS DOUBLE) AS x,
             CAST(label AS DOUBLE) AS y
      FROM embeddings),
    r AS (
      SELECT regr_slope(y, x) AS f0,
             regr_intercept(y, x) AS bias,
             regr_r2(y, x) AS r2,
             CAST(count(*) AS DOUBLE) AS n
      FROM f)
    SELECT 'f0' AS term, round(f0, 6) AS value FROM r
    UNION ALL SELECT 'bias', round(bias, 6) FROM r
    UNION ALL SELECT 'r2', round(r2, 6) FROM r
    UNION ALL SELECT 'n', n FROM r
    """,
    note="HASH-ORACLED since round 10 (VERDICT r09 item 5): the "
    "declared query is the single-feature projection (n_feat=1), so "
    "the normal-equation fit collapses to simple regression and "
    "DuckDB's regr_slope/regr_intercept/regr_r2 oracle it exactly "
    "(the engine's moment-matrix GEMM + 2x2 solve lands within fp "
    "drift of the covariance formulas, inside the 1e-6 rounding). "
    "The general multi-feature form stays in operators/ml.py with "
    "numpy-lstsq parity pinned in tests/test_ml.py + RECALL.json.",
)
def _ml_linreg_normal(spark, sf):
    return ml.linreg_normal(_t(spark, sf, "embeddings"), n_feat=1)


def _irls_feat_cte(n_feat: int) -> str:
    """Shared feature projection: first n_feat embedding dims +
    intercept, target = (label >= 5)."""
    d = n_feat + 1
    feat_sel = ",\n             ".join(
        [
            f"CAST(embedding[{i + 1}] AS DOUBLE) AS x{i}"
            for i in range(n_feat)
        ]
        + [f"1.0 AS x{d - 1}", "CAST(label >= 5 AS INT) + 0.0 AS y"]
    )
    return f"""f AS MATERIALIZED (
      SELECT {feat_sel}
      FROM embeddings)"""


def _irls_chain(pfx: str, lam: float, n_feat: int, iters: int) -> str:
    """One unrolled IRLS/Newton chain (CTE fragment; assumes the
    shared ``f`` feature CTE): per round, one corpus moment pass
    (gradient + Hessian as 1-row sums under the previous beta) and a
    GENERATED closed-form Cholesky solve of the (d+1)-dim Newton
    step, written as lateral column aliases (H + lam*I is SPD, so
    unpivoted Cholesky is stable; vs numpy's pivoted LU the betas
    differ at ~1e-13, far inside the 1e-6 output rounding). The L2
    term enters exactly as the engine's driver-side step: H += lam*I
    and g -= lam*beta with the INTERCEPT unpenalized."""
    d = n_feat + 1

    def chol_exprs() -> str:
        # ridge-adjusted moments, L entries, forward solve u, back
        # solve step s0..s{d-1} -- all lateral aliases in one SELECT
        lines = []
        for i in range(d):
            for j in range(i, d):
                adj = f" + {lam}" if (i == j and i < d - 1 and lam) else ""
                lines.append(f"h{i}{j}{adj} AS a{i}{j}")
        for i in range(d):
            adj = f" - {lam} * b{i}" if (i < d - 1 and lam) else ""
            lines.append(f"g{i}{adj} AS e{i}")
        for i in range(d):
            for j in range(i + 1):
                dots = " - ".join(
                    [f"a{min(i, j)}{max(i, j)}"]
                    + [f"l{i}{t} * l{j}{t}" for t in range(j)]
                )
                if i == j:
                    lines.append(f"sqrt({dots}) AS l{i}{i}")
                else:
                    lines.append(f"({dots}) / l{j}{j} AS l{i}{j}")
        for i in range(d):
            dots = " - ".join(
                [f"e{i}"] + [f"l{i}{t} * u{t}" for t in range(i)]
            )
            lines.append(f"({dots}) / l{i}{i} AS u{i}")
        for i in range(d - 1, -1, -1):
            dots = " - ".join(
                [f"u{i}"] + [f"l{t}{i} * s{t}" for t in range(i + 1, d)]
            )
            lines.append(f"({dots}) / l{i}{i} AS s{i}")
        return ",\n             ".join(lines)

    z = " + ".join(f"b{i} * x{i}" for i in range(d))
    hsums = ",\n             ".join(
        f"sum(w * x{i} * x{j}) AS h{i}{j}"
        for i in range(d)
        for j in range(i, d)
    )
    gsums = ",\n             ".join(
        f"sum((y - p) * x{i}) AS g{i}" for i in range(d)
    )
    b0 = ", ".join(f"0.0 AS b{i}" for i in range(d))
    parts = [f"""
    {pfx}beta0 AS (SELECT {b0})"""]
    for r in range(1, iters + 1):
        newb = ", ".join(f"b{i} + s{i} AS b{i}" for i in range(d))
        parts.append(f"""
    {pfx}m{r} AS MATERIALIZED (
      SELECT {hsums},
             {gsums}
      FROM (SELECT f.*, 1.0 / (1.0 + exp(-({z}))) AS p,
                   p * (1.0 - p) AS w
            FROM f CROSS JOIN {pfx}beta{r - 1})),
    {pfx}step{r} AS (
      SELECT {chol_exprs()}
      FROM {pfx}m{r} CROSS JOIN {pfx}beta{r - 1}),
    {pfx}beta{r} AS MATERIALIZED (
      SELECT {newb} FROM {pfx}beta{r - 1} CROSS JOIN {pfx}step{r})""")
    return ",".join(parts)


def _irls_metrics_cte(pfx: str, n_feat: int, iters: int) -> str:
    """Final-scan metrics under the fitted beta: log-loss via the
    stable softplus identity max(t,0)+ln(1+exp(-|t|)) -- numpy's
    logaddexp -- so no exp overflow at any z; accuracy by the same
    z >= 0 decision."""
    d = n_feat + 1
    z = " + ".join(f"b{i} * x{i}" for i in range(d))
    return f"""{pfx}met AS MATERIALIZED (
      SELECT sum(greatest(-z, 0.0) + ln(1.0 + exp(-abs(z)))
                 + (1.0 - y) * z) AS ll,
             sum(CASE WHEN (z >= 0.0) = (y > 0.5)
                      THEN 1 ELSE 0 END) AS acc,
             count(*) AS n
      FROM (SELECT f.y, ({z}) AS z FROM f CROSS JOIN {pfx}beta{iters}))"""


def _irls_oracle(n_feat: int = 4, iters: int = 4) -> str:
    d = n_feat + 1
    coef_rows = "\n    UNION ALL ".join(
        f"SELECT 'f{i}' AS term, round(b{i}, 6) AS value FROM beta{iters}"
        for i in range(n_feat)
    )
    return f"""
    WITH {_irls_feat_cte(n_feat)},{_irls_chain("", 0.0, n_feat, iters)},
    {_irls_metrics_cte("", n_feat, iters)}
    {coef_rows}
    UNION ALL SELECT 'bias', round(b{d - 1}, 6) FROM beta{iters}
    UNION ALL SELECT 'log_loss', round(ll / n, 6) FROM met
    UNION ALL SELECT 'accuracy', round(acc * 1.0 / n, 6) FROM met
    UNION ALL SELECT 'n', n + 0.0 FROM met
    """


@_register(
    "ml_logreg_irls",
    _irls_oracle(),
    note="fixed-iteration IRLS/Newton logistic fit, driver-side "
    "(d+1)-dim solves between broadcast scans; round-12 promotion "
    "from rows-only: the oracle unrolls each Newton round as a 1-row "
    "moment pass plus a generated closed-form Cholesky solve, so "
    "coefficients AND metrics hash-verify; numpy-IRLS parity stays "
    "pinned in tests/test_ml.py + RECALL.json",
)
def _ml_logreg_irls(spark, sf):
    return ml.logreg_irls(_t(spark, sf, "embeddings"))


def _ridge_sweep_oracle(
    lambdas=(0.0, 0.1, 1.0), n_feat: int = 4, iters: int = 4
) -> str:
    """The sweep oracle composes one ``_irls_chain`` per lambda over
    the SHARED feature CTE -- the engine runs the three fits off one
    tagged scan per round, the oracle runs three unrolled chains;
    identical per-model arithmetic either way (the L2 step enters as
    H + lam*I / g - lam*beta, intercept unpenalized)."""
    d = n_feat + 1
    chains = ",".join(
        _irls_chain(f"la{m}_", lam, n_feat, iters)
        + ",\n    "
        + _irls_metrics_cte(f"la{m}_", n_feat, iters)
        for m, lam in enumerate(lambdas)
    )
    rows = []
    for m, lam in enumerate(lambdas):
        p = f"la{m}_"
        for i in range(n_feat):
            rows.append(
                f"SELECT {lam} + 0.0 AS lam, 'f{i}' AS term, "
                f"round(b{i}, 6) AS value FROM {p}beta{iters}"
            )
        rows.append(
            f"SELECT {lam} + 0.0, 'bias', round(b{d - 1}, 6) "
            f"FROM {p}beta{iters}"
        )
        rows.append(
            f"SELECT {lam} + 0.0, 'log_loss', round(ll / n, 6) "
            f"FROM {p}met"
        )
        rows.append(
            f"SELECT {lam} + 0.0, 'accuracy', round(acc * 1.0 / n, 6) "
            f"FROM {p}met"
        )
    union = "\n    UNION ALL ".join(rows)
    return f"""
    WITH {_irls_feat_cte(n_feat)},{chains}
    {union}
    """


@_register(
    "ml_logreg_ridge_sweep",
    _ridge_sweep_oracle(),
    note="whole ridge-lambda sweep trained in SHARED scans (one pass "
    "per Newton round feeds every lambda's gradient+Hessian under a "
    "model-id tag) -- scan count independent of sweep width; "
    "round-12 promotion from rows-only: one unrolled Cholesky-Newton "
    "chain per lambda in the oracle, so all three models' "
    "coefficients AND metrics hash-verify; numpy-replay parity stays "
    "in tests/test_ml.py + RECALL.json",
)
def _ml_logreg_ridge_sweep(spark, sf):
    return ml.logreg_ridge_sweep(_t(spark, sf, "embeddings"))


@_register(
    "ml_adaboost_stumps",
    None,
    note="rows-only by declared design: fixed-round boosted-stump fit "
    "with stateless weight recompute (w = exp(-y*margin) row-locally "
    "from the broadcast ensemble -- no corpus-sized weight column); "
    "numpy-replay parity pinned in tests/test_ml.py + RECALL.json",
)
def _ml_adaboost_stumps(spark, sf):
    return ml.adaboost_stumps(_t(spark, sf, "embeddings"))


def _kmeans_oracle(k: int = 8, iters: int = 5) -> str:
    """Unrolled Lloyd k-means oracle: one (dist, argmin-assign,
    centroid-update) CTE triple per round, exactly the engine's
    md5-seeded, fixed-iteration, ties-to-lowest-cluster,
    empty-cluster-keeps-centroid semantics -- the pagerank/
    eigenvector unrolled-iteration oracle discipline. CTEs stay
    MATERIALIZED or DuckDB inlines the chain geometrically. The
    double chains differ from the engine's GEMM identity
    (|x|^2 - 2xC + |C|^2 vs sum((x-c)^2)) only at ~1e-15 -- far
    inside the 1e-6 dist rounding and the comparator's 9-digit
    canonicalization; argmin flips would need two centroids
    equidistant to ~1e-15, checked green at both gate SFs."""
    rounds = []
    for r in range(1, iters + 1):
        rounds.append(f"""
    dist{r} AS MATERIALIZED (
      SELECT u.vec_id, c.c, sum((u.x - c.cx) * (u.x - c.cx)) AS d2
      FROM u JOIN cent{r - 1} c USING (dim) GROUP BY 1, 2),
    asg{r} AS MATERIALIZED (
      SELECT vec_id, c FROM (
        SELECT vec_id, c,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d2, c) AS rn
        FROM dist{r}) WHERE rn = 1),
    newc{r} AS (
      SELECT a.c, u.dim, avg(u.x) AS cx
      FROM asg{r} a JOIN u USING (vec_id) GROUP BY 1, 2),
    cent{r} AS MATERIALIZED (
      SELECT p.c, p.dim, coalesce(n.cx, p.cx) AS cx
      FROM cent{r - 1} p
      LEFT JOIN newc{r} n ON p.c = n.c AND p.dim = n.dim)""")
    chain = ",".join(rounds)
    return f"""
    WITH u AS MATERIALIZED (
      SELECT vec_id, CAST(t.i - 1 AS INT) AS dim, t.v AS x
      FROM (SELECT vec_id,
                   unnest(list_transform(CAST(embedding AS DOUBLE[]),
                          (v, i) -> struct_pack(v := v, i := i))) AS t
            FROM embeddings)),
    seed AS (
      SELECT vec_id,
             row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)))
               - 1 AS c
      FROM embeddings),
    cent0 AS MATERIALIZED (
      SELECT s.c, u.dim, u.x AS cx
      FROM seed s JOIN u USING (vec_id) WHERE s.c < {k}),{chain},
    distf AS (
      SELECT u.vec_id, c.c, sum((u.x - c.cx) * (u.x - c.cx)) AS d2
      FROM u JOIN cent{iters} c USING (dim) GROUP BY 1, 2),
    asgf AS (
      SELECT vec_id, c, d2,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY d2, c) AS rn
      FROM distf)
    SELECT CAST(vec_id AS BIGINT) AS vec_id,
           CAST(c AS INT) AS cluster_id,
           round(sqrt(d2), 6) AS dist
    FROM asgf WHERE rn = 1
    """


@_register(
    "ml_kmeans_lloyd",
    _kmeans_oracle(),
    note="driver-coordinated Lloyd fit (fixed 5 rounds, md5-seeded, "
    "argmin ties to lowest cluster, empty clusters hold position); "
    "round-12 promotion from rows-only (VERDICT r11 #3): the oracle "
    "unrolls the identical iteration as MATERIALIZED CTE rounds, so "
    "the full assignment hash-verifies; numpy-Lloyd parity stays "
    "pinned in tests/test_ml.py",
)
def _ml_kmeans_lloyd(spark, sf):
    return ml.kmeans_lloyd(_t(spark, sf, "embeddings"))


@_register(
    "stats_gini",
    """
    WITH spend AS (
      SELECT c_nationkey, c_custkey,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS x
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2),
    ranked AS (
      SELECT c_nationkey, c_custkey, x,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY x, c_custkey) AS i
      FROM spend),
    agg AS (
      SELECT c_nationkey, count(*) AS n, sum(x) AS sx,
             sum(CAST(i * x AS DECIMAL(28,2))) AS six
      FROM ranked GROUP BY 1)
    SELECT c_nationkey, CAST(n AS INT) AS n_customers,
           round(CAST(sx AS DOUBLE), 2) AS total_spend,
           round(2.0 * CAST(six AS DOUBLE) / (n * CAST(sx AS DOUBLE))
                 - (n + 1.0) / n, 4) AS gini
    FROM agg
    """,
    note="per-nation Gini of customer lifetime spend via the exact "
    "rank formula: DECIMAL-exact sums, one customer agg + one "
    "per-nation window -- tie rank-sums are order-invariant so the "
    "coefficient is deterministic",
)
def _stats_gini(spark, sf):
    return analytics.stats_gini(
        _t(spark, sf, "orders"), _t(spark, sf, "customer")
    )


@_register(
    "dp_noisy_counts",
    """
    WITH g AS (
      SELECT event_type,
             strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
             count(*) AS cnt
      FROM events GROUP BY 1, 2),
    n AS (
      SELECT event_type, day, cnt,
             md5('dp|' || event_type || '|' || day) AS h
      FROM g),
    u AS (
      SELECT event_type, day, cnt,
             ((  (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 4096
               + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 256
               + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 16
               + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1))
              + 0.5) / 65536.0 - 0.5 AS uu
      FROM n)
    SELECT event_type, day,
           round(cnt + (-1.0) * sign(uu) * ln(1 - 2 * abs(uu)), 4)
             AS noisy_count
    FROM u
    """,
    note="eps-DP-style noisy count release with key-derived "
    "deterministic Laplace noise (md5 -> 4-hex-digit midpoint "
    "uniform -> inverse CDF); true counts never emitted",
)
def _dp_noisy_counts(spark, sf):
    return analytics.dp_noisy_counts(_t(spark, sf, "events"))


@_register(
    "basket_lift_topk",
    """
    WITH baskets AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    tot AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM baskets),
    item AS (
      SELECT l_partkey, count(*) AS supp FROM baskets
      GROUP BY 1 HAVING count(*) >= 2),
    freq AS (
      SELECT b.l_orderkey, b.l_partkey
      FROM baskets b JOIN item USING (l_partkey)),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             count(*) AS support
      FROM freq a JOIN freq b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2)
    SELECT part_a, part_b, CAST(support AS BIGINT) AS support,
           round(support * 1.0 / sa.supp, 4) AS confidence,
           round((support * n_orders) * 1.0 / (sa.supp * sb.supp), 4)
             AS lift
    FROM pairs
    JOIN item sa ON sa.l_partkey = part_a
    JOIN item sb ON sb.l_partkey = part_b
    CROSS JOIN tot
    ORDER BY lift DESC, support DESC, part_a, part_b
    LIMIT 20
    """,
    note="market-basket lift top-20 with the a-priori prune: "
    "below-min-support items semi-joined out BEFORE the pair "
    "self-join; 1-row total-orders broadcast scalar (allowlisted); "
    "TakeOrderedAndProject top-k",
)
def _basket_lift_topk(spark, sf):
    return analytics.basket_lift_topk(_t(spark, sf, "lineitem"))


@_register(
    "column_profile",
    """
    WITH wide AS (
      SELECT count(*) AS n_rows,
        count(l_quantity) AS q_n, count(DISTINCT l_quantity) AS q_d,
        CAST(min(l_quantity) AS DOUBLE) AS q_min,
        CAST(max(l_quantity) AS DOUBLE) AS q_max,
        sum(CAST(l_quantity AS DECIMAL(28,4))) AS q_sum,
        count(l_extendedprice) AS e_n,
        count(DISTINCT l_extendedprice) AS e_d,
        CAST(min(l_extendedprice) AS DOUBLE) AS e_min,
        CAST(max(l_extendedprice) AS DOUBLE) AS e_max,
        sum(CAST(l_extendedprice AS DECIMAL(28,4))) AS e_sum,
        count(l_discount) AS d_n, count(DISTINCT l_discount) AS d_d,
        CAST(min(l_discount) AS DOUBLE) AS d_min,
        CAST(max(l_discount) AS DOUBLE) AS d_max,
        sum(CAST(l_discount AS DECIMAL(28,4))) AS d_sum,
        count(l_tax) AS t_n, count(DISTINCT l_tax) AS t_d,
        CAST(min(l_tax) AS DOUBLE) AS t_min,
        CAST(max(l_tax) AS DOUBLE) AS t_max,
        sum(CAST(l_tax AS DECIMAL(28,4))) AS t_sum,
        count(l_returnflag) AS r_n,
        count(DISTINCT l_returnflag) AS r_d,
        CAST(min(length(l_returnflag)) AS DOUBLE) AS r_min,
        CAST(max(length(l_returnflag)) AS DOUBLE) AS r_max,
        sum(CAST(length(l_returnflag) AS DECIMAL(28,4))) AS r_sum,
        count(l_linestatus) AS s_n, count(DISTINCT l_linestatus) AS s_d,
        CAST(min(length(l_linestatus)) AS DOUBLE) AS s_min,
        CAST(max(length(l_linestatus)) AS DOUBLE) AS s_max,
        sum(CAST(length(l_linestatus) AS DECIMAL(28,4))) AS s_sum,
        count(l_linenumber) AS l_n, count(DISTINCT l_linenumber) AS l_d,
        CAST(min(l_linenumber) AS DOUBLE) AS l_min,
        CAST(max(l_linenumber) AS DOUBLE) AS l_max,
        sum(CAST(l_linenumber AS DECIMAL(28,4))) AS l_sum
      FROM lineitem),
    long AS (
      SELECT 'l_quantity' AS col_name, n_rows, q_n AS n_nonnull,
             q_d AS n_distinct, q_min AS min_v, q_max AS max_v,
             CAST(q_sum AS DOUBLE) AS sum_v FROM wide
      UNION ALL SELECT 'l_extendedprice', n_rows, e_n, e_d, e_min,
             e_max, CAST(e_sum AS DOUBLE) FROM wide
      UNION ALL SELECT 'l_discount', n_rows, d_n, d_d, d_min, d_max,
             CAST(d_sum AS DOUBLE) FROM wide
      UNION ALL SELECT 'l_tax', n_rows, t_n, t_d, t_min, t_max,
             CAST(t_sum AS DOUBLE) FROM wide
      UNION ALL SELECT 'l_returnflag', n_rows, r_n, r_d, r_min, r_max,
             CAST(r_sum AS DOUBLE) FROM wide
      UNION ALL SELECT 'l_linestatus', n_rows, s_n, s_d, s_min, s_max,
             CAST(s_sum AS DOUBLE) FROM wide
      UNION ALL SELECT 'l_linenumber', n_rows, l_n, l_d, l_min, l_max,
             CAST(l_sum AS DOUBLE) FROM wide)
    SELECT col_name, CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_nonnull AS BIGINT) AS n_nonnull,
           round(n_nonnull * 1.0 / n_rows, 4) AS completeness,
           CAST(n_distinct AS BIGINT) AS n_distinct,
           min_v, max_v,
           round(sum_v / n_nonnull, 4) AS mean_v
    FROM long
    """,
    note="single-scan Deequ-style column profile (describe side of "
    "quality_constraints): two-level (col,value) aggregate -- map-side "
    "duplicate collapse, shuffle bounded by true cardinality, no "
    "mixed-distinct Expand; strings profiled by length, keyed by "
    "value; means fold DECIMAL then divide once in double",
)
def _column_profile(spark, sf):
    return relational.column_profile(_t(spark, sf, "lineitem"))


@_register(
    "sql_udf_quality",
    f"""
    WITH {_QUALITY_MEASURES_CTE}
    SELECT doc_id, {_QUALITY_EXPR} AS quality
    FROM m
    """,
    note="registered-UDF surface: the quality formula as a named "
    "spark.udf.register'd Arrow pandas_udf invoked from spark.sql -- "
    "same bit-level formula as quality_score, so the shared "
    "expression oracle applies verbatim",
)
def _sql_udf_quality(spark, sf):
    return text.sql_udf_quality(spark, _t(spark, sf, "documents"))


@_register(
    "udtf_sentence_split",
    """
    WITH segs AS (
      SELECT doc_id,
             unnest(string_split_regex(text, '[.!?]+')) AS sentence,
             generate_subscripts(string_split_regex(text, '[.!?]+'), 1) AS pos
      FROM documents)
    SELECT doc_id,
           CAST(row_number() OVER (PARTITION BY doc_id ORDER BY pos) - 1
                AS INTEGER) AS sent_idx,
           sentence
    FROM segs
    WHERE sentence <> ''
    """,
    note="registered-UDTF surface: Python table function splitting "
    "docs into sentences on [.!?]+ runs, invoked via SQL LATERAL -- "
    "the reference's multi-emit Job.map as a SQL-facing extension "
    "point; empty segments dropped, raw segment bytes kept",
)
def _udtf_sentence_split(spark, sf):
    return text.udtf_sentence_split(spark, _t(spark, sf, "documents"))


@_register(
    "sql_udaf_median",
    """
    SELECT lang, source,
           round(CAST(median(n_chars) AS DOUBLE), 1) AS median_chars,
           count(*) AS n_docs
    FROM documents GROUP BY lang, source
    """,
    note="registered-UDAF surface (completes the UDF/UDTF/UDAF "
    "extension triad): grouped-aggregate pandas UDFs (numpy median + "
    "count) invoked from spark.sql under GROUP BY -- np.median's "
    "interpolated midpoint equals quantile_cont(0.5) bit-for-bit on "
    "int-valued input",
)
def _sql_udaf_median(spark, sf):
    return text.sql_udaf_median(spark, _t(spark, sf, "documents"))


@_register(
    "quality_gopher_flags",
    f"""
    WITH toks AS (
      SELECT doc_id, text, {_TOKS} AS t,
             string_split(text, chr(10)) AS lines
      FROM documents),
    m AS (
      SELECT doc_id,
        CAST(len(t) AS INTEGER) AS n_words,
        length(regexp_replace(lower(text),
                              '[ ' || chr(9) || chr(10) || chr(11)
                                   || chr(12) || chr(13) || ']',
                              '', 'g')) AS tok_chars,
        length(text) - length(replace(text, '#', '')) AS n_hash,
        (length(text) - length(replace(text, '...', ''))) / 3
          AS n_ellipsis,
        greatest(len(lines), 1) AS n_lines,
        len(list_filter(lines,
            l -> ltrim(l) LIKE '-%' OR ltrim(l) LIKE '*%'))
          AS bullet_lines,
        len(list_filter(lines, l -> rtrim(l) LIKE '%...'))
          AS ellipsis_lines,
        len(list_filter(['the','a','of','and','to','in','is'],
            s -> list_contains(t, s))) AS stop_hits
      FROM toks)
    SELECT doc_id, n_words,
      round(tok_chars * 1.0 / greatest(n_words, 1), 4) AS mean_word_len,
      CAST(n_words >= 50 AND n_words <= 100000 AS INT) AS f_word_count,
      CAST(tok_chars * 1.0 / greatest(n_words, 1) >= 3.0
           AND tok_chars * 1.0 / greatest(n_words, 1) <= 10.0 AS INT)
        AS f_mean_word_len,
      CAST((n_hash + n_ellipsis) * 1.0 / greatest(n_words, 1) < 0.1
           AS INT) AS f_symbol_ratio,
      CAST(bullet_lines * 1.0 / n_lines <= 0.9 AS INT) AS f_bullet_lines,
      CAST(ellipsis_lines * 1.0 / n_lines <= 0.3 AS INT)
        AS f_ellipsis_lines,
      CAST(stop_hits >= 2 AS INT) AS f_stopwords,
      CAST(CAST(n_words >= 50 AND n_words <= 100000 AS INT)
         * CAST(tok_chars * 1.0 / greatest(n_words, 1) >= 3.0
                AND tok_chars * 1.0 / greatest(n_words, 1) <= 10.0 AS INT)
         * CAST((n_hash + n_ellipsis) * 1.0 / greatest(n_words, 1) < 0.1
                AS INT)
         * CAST(bullet_lines * 1.0 / n_lines <= 0.9 AS INT)
         * CAST(ellipsis_lines * 1.0 / n_lines <= 0.3 AS INT)
         * CAST(stop_hits >= 2 AS INT) AS INT) AS keep
    FROM m
    """,
    note="Gopher/Dolma-style rule-based quality gate: auditable "
    "per-rule INT flags (word-count/mean-word-length bounds, "
    "symbol-to-word ratio, bullet/ellipsis line fractions, distinct "
    "stopword minimum) + conjunctive keep -- all row-local length "
    "arithmetic and array filters, map-only at any scale",
)
def _quality_gopher_flags(spark, sf):
    return text.quality_gopher_flags(_t(spark, sf, "documents"))


@_register(
    "corpus_token_budget",
    f"""
    WITH agg AS (
      SELECT lang, CAST(sum(len({_TOKS})) AS BIGINT) AS n_tokens
      FROM documents GROUP BY lang),
    tot AS (SELECT sum(sqrt(CAST(n_tokens AS DOUBLE))) AS ptot FROM agg)
    SELECT lang, n_tokens,
           round(sqrt(CAST(n_tokens AS DOUBLE)) / ptot, 6) AS temp_share,
           round(sqrt(CAST(n_tokens AS DOUBLE)) / ptot * 1000000.0, 2)
             AS alloc_tokens,
           round(sqrt(CAST(n_tokens AS DOUBLE)) / ptot * 1000000.0
                 / n_tokens, 4) AS epochs
    FROM agg CROSS JOIN tot
    """,
    note="token-budget planner: temperature (sqrt) shares over exact "
    "per-language token sums allocate a fixed budget and report the "
    "implied epoch/oversampling count per language; one token-sum "
    "agg + a 1-row totals broadcast",
)
def _corpus_token_budget(spark, sf):
    return text.corpus_token_budget(_t(spark, sf, "documents"))


_SQL_PIVOT_QTY = """
    SELECT l_returnflag,
           CAST(COALESCE(o, 0) AS DOUBLE) AS qty_open,
           CAST(COALESCE(f, 0) AS DOUBLE) AS qty_finished
    FROM (SELECT l_returnflag, l_linestatus,
                 CAST(l_quantity AS DECIMAL(18,2)) AS q FROM lineitem)
    PIVOT (SUM(q) FOR l_linestatus IN ('O' AS o, 'F' AS f))
"""


@_register(
    "sql_pivot_qty",
    """
    SELECT l_returnflag,
           CAST(COALESCE(sum(CASE WHEN l_linestatus = 'O'
                 THEN CAST(l_quantity AS DECIMAL(18,2)) END), 0)
                AS DOUBLE) AS qty_open,
           CAST(COALESCE(sum(CASE WHEN l_linestatus = 'F'
                 THEN CAST(l_quantity AS DECIMAL(18,2)) END), 0)
                AS DOUBLE) AS qty_finished
    FROM lineitem GROUP BY l_returnflag
    """,
    note="SQL PIVOT intake shape: Spark's native FROM ... PIVOT "
    "(SUM FOR col IN (...)) syntax, which Catalyst lowers to the "
    "same conditional-aggregate plan the oracle states explicitly "
    "with CASE -- one scan, one grouped agg, DECIMAL-exact sums",
)
def _sql_pivot_qty(spark, sf):
    from ..sql import run_sql

    return run_sql(spark, sf, _SQL_PIVOT_QTY)


