"""text section of the declared query registry -- bodies verbatim
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
    _DE,
    _EN,
    _ES,
    _EVTS,
    _QUALITY_EXPR,
    _QUALITY_MEASURES_CTE,
    _TOKS,
    _WORDS_CTE,
    _register,
    _t,
)


# ---------------------------------------------- text / flagship (M1/M5)


@_register(
    "wordcount",
    _WORDS_CTE + "SELECT word, count(*) AS cnt FROM words GROUP BY word",
    note="flagship; reference job/WordCount.java with standard total-count semantics",
)
def _wordcount(spark, sf):
    return text.wordcount(_t(spark, sf, "documents"))


@_register(
    "wordcount_records_containing",
    _WORDS_CTE + "SELECT word, count(DISTINCT doc_id) AS n_docs FROM words GROUP BY word",
    note="literal reference semantics (values.length quirk, SURVEY 2A)",
)
def _wordcount_records_containing(spark, sf):
    return text.wordcount_records_containing(_t(spark, sf, "documents"))


@_register(
    "text_stats",
    f"""
    WITH toks AS (SELECT doc_id, text, {_TOKS} AS t FROM documents)
    SELECT doc_id,
           CAST(len(t) AS INTEGER) AS n_tokens,
           CAST(length(text) AS INTEGER) AS n_chars_measured,
           round(coalesce(list_sum(list_transform(t, s -> length(s))), 0) * 1.0
                 / greatest(len(t), 1), 4) AS avg_token_len,
           CAST(len(list_distinct(t)) AS INTEGER) AS n_unique_tokens
    FROM toks
    """,
)
def _text_stats(spark, sf):
    return text.text_stats(_t(spark, sf, "documents"))


@_register(
    "lang_id",
    f"""
    WITH toks AS (SELECT doc_id, lang, {_TOKS} AS t FROM documents),
    h AS (
      SELECT doc_id, lang,
             CAST(len(list_filter(t, x -> x IN {_EN})) AS INTEGER) AS en_hits,
             CAST(len(list_filter(t, x -> x IN {_ES})) AS INTEGER) AS es_hits,
             CAST(len(list_filter(t, x -> x IN {_DE})) AS INTEGER) AS de_hits
      FROM toks)
    SELECT doc_id, lang, en_hits, es_hits, de_hits,
           CASE WHEN en_hits >= es_hits AND en_hits >= de_hits THEN 'en'
                WHEN es_hits >= de_hits THEN 'es'
                ELSE 'de' END AS pred_lang
    FROM h
    """,
)
def _lang_id(spark, sf):
    return text.lang_id(_t(spark, sf, "documents"))


@_register(
    "lang_id_confusion",
    f"""
    WITH toks AS (SELECT doc_id, lang, {_TOKS} AS t FROM documents),
    h AS (
      SELECT doc_id, lang,
             CAST(len(list_filter(t, x -> x IN {_EN})) AS INTEGER) AS en_hits,
             CAST(len(list_filter(t, x -> x IN {_ES})) AS INTEGER) AS es_hits,
             CAST(len(list_filter(t, x -> x IN {_DE})) AS INTEGER) AS de_hits
      FROM toks),
    p AS (
      SELECT lang,
             CASE WHEN en_hits >= es_hits AND en_hits >= de_hits THEN 'en'
                  WHEN es_hits >= de_hits THEN 'es'
                  ELSE 'de' END AS pred_lang
      FROM h),
    cm AS (SELECT lang, pred_lang, count(*) AS n_docs
           FROM p GROUP BY lang, pred_lang)
    SELECT lang, pred_lang, CAST(n_docs AS BIGINT) AS n_docs,
           round(n_docs * 1.0
                 / sum(n_docs) OVER (PARTITION BY lang), 4) AS class_frac
    FROM cm
    """,
    note="lang-ID confusion matrix vs the labeled lang column "
    "(per-class recall diagonal + error mass): lang_id expressions "
    "verbatim into ONE pair aggregate; class-share window over the "
    "matrix, never the corpus",
)
def _lang_id_confusion(spark, sf):
    return text.lang_id_confusion(_t(spark, sf, "documents"))


@_register(
    "quality_score",
    f"""
    WITH {_QUALITY_MEASURES_CTE}
    SELECT doc_id, n_tokens,
           round(n_punct * 1.0 / greatest(n_chars, 1), 4) AS punct_ratio,
           round(stop_hits * 1.0 / greatest(n_tokens, 1), 4) AS stopword_ratio,
           {_QUALITY_EXPR} AS quality
    FROM m
    """,
)
def _quality_score(spark, sf):
    return text.quality_score(_t(spark, sf, "documents"))


@_register(
    "quality_stratify",
    f"""
    WITH {_QUALITY_MEASURES_CTE},
    q AS (
      SELECT doc_id, {_QUALITY_EXPR} AS quality
      FROM m),
    t AS (
      SELECT round(quantile_cont(quality, 0.25), 6) AS t1,
             round(quantile_cont(quality, 0.50), 6) AS t2,
             round(quantile_cont(quality, 0.75), 6) AS t3
      FROM q)
    SELECT doc_id, quality,
           CAST(CASE WHEN quality <= t1 THEN 1
                     WHEN quality <= t2 THEN 2
                     WHEN quality <= t3 THEN 3
                     ELSE 4 END AS INTEGER) AS quartile
    FROM q CROSS JOIN t
    """,
    note="threshold-broadcast stratification, not a global ntile window",
)
def _quality_stratify(spark, sf):
    return text.quality_stratify(_t(spark, sf, "documents"))


@_register(
    "token_count_bpe",
    f"""
    SELECT doc_id,
           CAST(len({_TOKS}) AS INTEGER) AS n_ws_tokens,
           CAST(len(regexp_extract_all(lower(text),
                '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS INTEGER) AS n_bpe_tokens
    FROM documents
    """,
)
def _token_count_bpe(spark, sf):
    return text.token_count_bpe(_t(spark, sf, "documents"))


@_register(
    "token_fertility",
    f"""
    WITH base AS (
      SELECT lang,
             len({_TOKS}) AS ws,
             len(regexp_extract_all(lower(text),
                 '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS bpe,
             length(text) AS chars
      FROM documents),
    agg AS (
      SELECT lang,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(ws) AS BIGINT) AS n_ws_tokens,
             CAST(sum(bpe) AS BIGINT) AS n_bpe_tokens,
             CAST(sum(chars) AS BIGINT) AS n_chars
      FROM base GROUP BY lang)
    SELECT lang, n_docs, n_ws_tokens, n_bpe_tokens, n_chars,
           CASE WHEN n_ws_tokens > 0
                THEN round(n_bpe_tokens * 1.0 / n_ws_tokens, 4) END
             AS fertility,
           CASE WHEN n_bpe_tokens > 0
                THEN round(n_chars * 1.0 / n_bpe_tokens, 4) END
             AS chars_per_token
    FROM agg
    """,
    note="per-language tokenizer fertility (BPE tokens per word, "
    "chars per token): the multilingual tokenizer health check; "
    "map-side pretokenizers shared with token_count_bpe, ONE "
    "partial->final aggregate, ratios row-local on the alphabet",
)
def _token_fertility(spark, sf):
    return text.token_fertility(_t(spark, sf, "documents"))


@_register(
    "text_normalize",
    """
    WITH n AS (
      SELECT doc_id,
             trim(regexp_replace(regexp_replace(lower(text),
                  '[^a-z0-9\\s.,;:!?''-]', ' ', 'g'), '\\s+', ' ', 'g')) AS norm_text
      FROM documents)
    SELECT doc_id, norm_text, CAST(length(norm_text) AS INTEGER) AS n_chars_norm
    FROM n
    """,
)
def _text_normalize(spark, sf):
    return text.text_normalize(_t(spark, sf, "documents"))


def _pii_redact_oracle_sql() -> str:
    """Generated from the SAME pattern constants the Spark operator
    compiles (operators/text.py), one chained CTE per redaction stage
    in the same order -- the pattern strings provably cannot drift
    between engine and oracle (the sampling-oracle discipline).
    DuckDB's standard single-quoted literals pass backslashes through
    verbatim, so the Python constants embed unchanged."""
    stages = (
        (text.EMAIL_REGEX, "<EMAIL>", "n_emails"),
        (text.IPV6_REGEX, "<IPV6>", "n_ipv6"),
        (text.IPV4_REGEX, "<IPV4>", "n_ipv4"),
        (text.CCARD_REGEX, "<CCARD>", "n_ccards"),
        (text.SSN_REGEX, "<SSN>", "n_ssns"),
        (text.PHONE_REGEX, "<PHONE>", "n_phones"),
    )
    ctes = ["s0 AS (SELECT doc_id, text AS t FROM documents)"]
    kept: list[str] = []
    for i, (pat, token, name) in enumerate(stages, start=1):
        prev_cols = "".join(f"{c}, " for c in kept)
        ctes.append(
            f"""s{i} AS (
      SELECT doc_id, {prev_cols}
             CAST(len(regexp_extract_all(t, '{pat}')) AS INTEGER) AS {name},
             regexp_replace(t, '{pat}', '{token}', 'g') AS t
      FROM s{i - 1})"""
        )
        kept.append(name)
    cols = ", ".join(kept)
    return (
        "WITH " + ",\n    ".join(ctes)
        + f"\n    SELECT doc_id, {cols}, t AS redacted FROM s{len(stages)}"
    )


@_register(
    "pii_redact",
    _pii_redact_oracle_sql(),
    note="six-stage typed PII scrub (email/IPv6/IPv4/credit-card/SSN/"
    "phone) -- each stage counts+rewrites the previous stage's output "
    "so broad digit shapes can't re-match scrubbed narrow ones; "
    "identical Java∩RE2 pattern strings on both engines, oracle "
    "GENERATED from the same constants",
)
def _pii_redact(spark, sf):
    return text.pii_redact(_t(spark, sf, "documents"))


@_register(
    "length_histogram",
    """
    SELECT CAST(floor(length(text) / 100) AS BIGINT) * 100 AS bucket_lo,
           count(*) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS total_chars,
           CAST(min(length(text)) AS INTEGER) AS min_chars,
           CAST(max(length(text)) AS INTEGER) AS max_chars
    FROM documents GROUP BY 1
    """,
)
def _length_histogram(spark, sf):
    return text.length_histogram(_t(spark, sf, "documents"))


# Sampling oracles are GENERATED from the same rate constants and
# threshold encoding the Spark predicates use (operators/text.py::
# SAMPLE_RATE / MIX_RATES / hash_threshold) — editing a rate can't
# desynchronize the oracle.
_MIX_PREDICATE = "substr(md5(CAST(doc_id AS VARCHAR) || ':' || lang), 1, 4)"

_MIX_WHERE = "\n       OR ".join(
    f"(lang = '{lang}' AND {_MIX_PREDICATE} < '{text.hash_threshold(rate)}')"
    for lang, rate in sorted(text.MIX_RATES.items())
)


@_register(
    "sample_deterministic",
    f"""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '{text.hash_threshold(text.SAMPLE_RATE)}'
    """,
    note=f"content-hash Bernoulli sample, rate {text.SAMPLE_RATE}; exact cross-engine",
)
def _sample_deterministic(spark, sf):
    return text.sample_deterministic(_t(spark, sf, "documents"))


@_register(
    "corpus_mix",
    f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE {_MIX_WHERE}
    """,
    note=f"per-language deterministic mix rates {text.MIX_RATES}",
)
def _corpus_mix(spark, sf):
    return text.corpus_mix(_t(spark, sf, "documents"))


@_register(
    "ngram_counts",
    f"""
    WITH toks AS (SELECT {_TOKS} AS t FROM documents),
    g AS (
      SELECT unnest(list_transform(range(1, len(t)),
                    i -> t[i] || ' ' || t[i+1])) AS ngram
      FROM toks WHERE len(t) >= 2)
    SELECT ngram, count(*) AS cnt
    FROM g GROUP BY ngram HAVING count(*) >= 2
    """,
    note="bigram LM statistics; singleton tail pruned",
)
def _ngram_counts(spark, sf):
    return text.ngram_counts(_t(spark, sf, "documents"))


@_register(
    "repetition_score",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    g AS (SELECT doc_id,
                 CASE WHEN len(t) >= 3
                      THEN list_transform(range(1, len(t) - 1),
                                          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                      ELSE [] END AS grams
          FROM toks)
    SELECT doc_id,
           CAST(len(grams) AS INT) AS n_grams,
           CASE WHEN len(grams) > 0
                THEN round((len(grams) - len(list_distinct(grams)))
                           / CAST(len(grams) AS DOUBLE), 4)
                ELSE 0.0 END AS repetition_ratio
    FROM g
    """,
    note="per-doc 3-gram repetition ratio (boilerplate/looping-text "
    "quality filter); map-only scan, no shuffle",
)
def _repetition_score(spark, sf):
    return text.repetition_score(_t(spark, sf, "documents"))


@_register(
    "quality_dup_ngram_frac",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    inst AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
      FROM toks WHERE len(t) >= 3),
    mult AS (
      SELECT doc_id, shingle, count(*) AS cnt
      FROM inst GROUP BY doc_id, shingle),
    dfreq AS (SELECT shingle, count(*) AS df FROM mult GROUP BY shingle)
    SELECT doc_id,
           CAST(sum(cnt) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN df >= 2 THEN cnt ELSE 0 END) AS BIGINT)
             AS dup_grams,
           round(sum(CASE WHEN df >= 2 THEN cnt ELSE 0 END) * 1.0
                 / sum(cnt), 4) AS dup_frac
    FROM mult JOIN dfreq USING (shingle)
    GROUP BY doc_id
    """,
    note="corpus-wide duplicate 3-gram fraction per doc (the "
    "Gopher/Dolma dup-ngram signal, cross-doc where repetition_score "
    "is within-doc): gram multiplicities + ONE df count + one keyed "
    "join back; 8-byte hashed shingle keys engine-side",
)
def _quality_dup_ngram_frac(spark, sf):
    return text.dup_ngram_fraction(_t(spark, sf, "documents"))


@_register(
    "corpus_datasheet",
    f"""
    WITH base AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len({_TOKS})) AS BIGINT) AS n_tokens,
             count(DISTINCT md5(text)) AS n_distinct
      FROM documents),
    lang AS (SELECT lang, count(*) AS c FROM documents GROUP BY lang),
    ent AS (
      SELECT CAST(count(*) AS BIGINT) AS n_langs, sum(c) AS nn,
             list_reduce(list_transform(list(c ORDER BY lang),
                                        c -> c * log2(c)),
                         (a, b) -> a + b) AS s
      FROM lang),
    {_QUALITY_MEASURES_CTE},
    q AS (SELECT round(avg({_QUALITY_EXPR}), 4) AS mean_quality FROM m)
    SELECT n_docs, n_tokens,
           round((n_docs - n_distinct) * 1.0 / n_docs, 4) AS dup_rate,
           n_langs,
           round(log2(nn) - s / nn, 4) AS lang_entropy,
           mean_quality
    FROM base CROSS JOIN ent CROSS JOIN q
    """,
    note="one-row corpus datasheet (size, tokens, exact-dup rate, "
    "language-mix entropy, mean quality -- the release headline a "
    "weekly rebuild diffs): three bounded aggregations, sorted-fold "
    "entropy over the language alphabet, shared quality expression",
)
def _corpus_datasheet(spark, sf):
    return text.corpus_datasheet(_t(spark, sf, "documents"))


@_register(
    "dedup_novelty_frac",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
      FROM toks WHERE len(t) >= 3),
    owner AS (SELECT shingle, min(doc_id) AS first_doc
              FROM sh GROUP BY shingle)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           round(sum(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END) * 1.0
                 / count(*), 4) AS novelty_frac
    FROM sh JOIN owner USING (shingle)
    GROUP BY doc_id
    """,
    note="first-occurrence novelty per doc (fraction of its distinct "
    "3-grams it contributed FIRST, by min doc_id): the attribution "
    "dual of quality_dup_ngram_frac for dedup-aware sampling; same "
    "two-shuffle envelope, nothing quadratic in df",
)
def _dedup_novelty_frac(spark, sf):
    return text.novelty_fraction(_t(spark, sf, "documents"))


@_register(
    "sequence_packing",
    f"""
    WITH t AS (SELECT doc_id, lang, len({_TOKS}) AS n_tokens FROM documents)
    SELECT doc_id, lang, CAST(n_tokens AS INT) AS n_tokens,
           CAST(floor((sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id)
                       - n_tokens) / 2048.0) AS INT) AS pack_id
    FROM t
    """,
    note="greedy first-fit-by-order sequence packing into 2048-token "
    "packs per language (training-batch construction); one running-sum "
    "window per lang partition",
)
def _sequence_packing(spark, sf):
    return text.sequence_packing(_t(spark, sf, "documents"))


@_register(
    "rolling_window_range",
    f"""
    SELECT user_id, event_id,
           count(*) OVER w AS n_recent,
           CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
               AS recent_value
    FROM {_EVTS}
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
                 RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
    """,
    note="trailing 10-minute RANGE-frame window per user (count + "
    "DECIMAL-exact value sum); integer-microsecond frame bounds are "
    "engine-identical",
)
def _rolling_window_range(spark, sf):
    from ...operators import temporal

    return temporal.rolling_window_range(_t(spark, sf, "events"))


#: Shared decontamination-pairs oracle: the Bloom variant is
#: bit-identical to the exact operator BY CONTRACT (the bitmap only
#: prefilters; the verify join decides) -- one SQL text enforces it.
_DECON_PAIRS_SQL = f"""
    WITH toks AS (SELECT doc_id, source, {_TOKS} AS t FROM documents),
    sh AS (
      SELECT doc_id, source,
             unnest(list_distinct(list_transform(range(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS shingle
      FROM toks WHERE len(t) >= 3)
    SELECT c.doc_id, b.doc_id AS bench_doc_id, count(*) AS n_shared_shingles
    FROM (SELECT * FROM sh WHERE source <> 'src0') c
    JOIN (SELECT * FROM sh WHERE source = 'src0') b USING (shingle)
    GROUP BY c.doc_id, b.doc_id
    HAVING count(*) >= 2
"""


@_register(
    "decontaminate_overlap",
    _DECON_PAIRS_SQL,
    note="train/benchmark n-gram contamination pairs; hashed join keys in Spark",
)
def _decontaminate_overlap(spark, sf):
    return text.decontaminate_overlap(_t(spark, sf, "documents"))


@_register(
    "decontaminate_bloom",
    _DECON_PAIRS_SQL,
    note="decontaminate_overlap through a Bloom prefilter (the "
    "join_bloom_pruned kernel over benchmark shingles): corpus "
    "shingles that cannot match drop MAP-SIDE before the exact "
    "verify join -- bit-identical result (no false negatives), "
    "shared oracle; the 100 TB shuffle-bytes path",
)
def _decontaminate_bloom(spark, sf):
    return text.decontaminate_bloom(_t(spark, sf, "documents"))


@_register(
    "doc_fingerprint",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents)
    SELECT doc_id,
           list_min(list_transform(range(1, len(t) - 1),
                    i -> md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS fingerprint
    FROM toks WHERE len(t) >= 3
    """,
)
def _doc_fingerprint(spark, sf):
    return text.doc_fingerprint(_t(spark, sf, "documents"))


@_register(
    "tfidf_top_terms",
    _WORDS_CTE
    + """,
    tf AS (SELECT doc_id, word, count(*) AS tf FROM words GROUP BY doc_id, word),
    df AS (SELECT word, count(DISTINCT doc_id) AS df FROM words GROUP BY word),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT doc_id, word, round(tf * ln(n_docs * 1.0 / df), 6) AS tfidf
      FROM tf JOIN df USING (word) CROSS JOIN n),
    r AS (
      SELECT doc_id, word, tfidf,
             row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, word) AS rnk
      FROM scored)
    SELECT doc_id, word, round(tfidf, 4) AS tfidf, CAST(rnk AS INTEGER) AS rnk
    FROM r WHERE rnk <= 5
    """,
)
def _tfidf_top_terms(spark, sf):
    return text.tfidf_top_terms(_t(spark, sf, "documents"))


@_register(
    "embedding_centroids",
    """
    SELECT label, CAST(u.i AS INTEGER) AS pos, round(avg(u.v), 4) + 0.0 AS centroid_val
    FROM (SELECT label,
                 unnest(list_transform(CAST(embedding AS DOUBLE[]),
                        (x, i) -> struct_pack(v := x, i := i))) AS u
          FROM embeddings)
    GROUP BY label, u.i
    """,
    note="per-label mean vector in long form (label, pos, value)",
)
def _embedding_centroids(spark, sf):
    return similarity.embedding_centroids(_t(spark, sf, "embeddings"))


