"""Text operators: the flagship wordcount family + text-analysis ops
for LLM data pipelines (language ID, quality scoring, token counting,
document fingerprinting). SURVEY.md sections 2B and M5.

All pure built-in expressions (split/explode/filter/regexp/md5) --
JVM-side, no Python in the hot path. Tokenization is the shared
definition in ``functions/text.py`` so every consumer agrees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens_col, words_exploded

# Stopword lists for the n-gram/stopword language heuristic. Tiny and
# deterministic on purpose: real language ID would ship fastText or a
# char-n-gram model as a broadcast side input; the heuristic keeps the
# operator oracle-checkable.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "es": ("el", "la", "de", "y", "es", "un", "que"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu"),
}

#: BPE-ish pretokenizer: letter runs, digit runs, single punctuation.
BPE_REGEX = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def wordcount(documents: DataFrame) -> DataFrame:
    """Flagship: total occurrences per token (the reference's shipped
    job, ``job/WordCount.java:23-52``, with the emission-count quirk
    fixed -- see wordcount_records_containing for literal semantics).

    Plan shape: scan -> generate(explode) -> partial hash agg ->
    exchange on word -> final agg. Shuffle carries (word, partial
    count), not token occurrences, so 100 TB of text shuffles only
    vocabulary x partitions.
    """
    return words_exploded(documents).groupBy("word").agg(F.count("*").alias("cnt"))


def wordcount_records_containing(documents: DataFrame) -> DataFrame:
    """Literal reference semantics: ``WordCount.map`` pre-aggregates
    per record and ``reduce`` returns values.length
    (``job/WordCount.java:25-42,51``), i.e. the number of *records
    containing* the word, not total occurrences."""
    return (
        words_exploded(documents)
        .groupBy("word")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
    )


def text_stats(documents: DataFrame) -> DataFrame:
    """Per-document token/char statistics (LLM-pipeline quality
    signals). Everything derived from one tokens array -- computed
    once, no shuffle at all."""
    toks = tokens_col("text")
    return documents.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("n_chars_measured"),
        F.round(
            F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + F.length(t))
            / F.greatest(F.size(toks), F.lit(1)),
            4,
        ).alias("avg_token_len"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """Stopword-hit language heuristic. Deterministic argmax with
    fixed preference order en > es > de on ties."""
    toks = tokens_col("text")

    def _hit_counter(ws):
        # single-arg lambda: a two-arg lambda would make F.filter pass
        # the element index as the second argument
        return lambda t: t.isin(*ws)

    hits = {
        lang: F.size(F.filter(toks, _hit_counter(ws))).alias(f"{lang}_hits")
        for lang, ws in STOPWORDS.items()
    }
    df = documents.select("doc_id", "lang", *hits.values())
    pred = (
        F.when(
            (F.col("en_hits") >= F.col("es_hits")) & (F.col("en_hits") >= F.col("de_hits")),
            F.lit("en"),
        )
        .when(F.col("es_hits") >= F.col("de_hits"), F.lit("es"))
        .otherwise(F.lit("de"))
    )
    return df.select("doc_id", "lang", "en_hits", "es_hits", "de_hits", pred.alias("pred_lang"))


def quality_score(documents: DataFrame) -> DataFrame:
    """Composite quality score from length / punctuation / stopword
    ratios -- the standard cheap pre-filter before expensive LLM-data
    stages. Score in [0, 1]; all built-in expressions."""
    toks = tokens_col("text")
    n_tokens = F.size(toks)
    n_chars = F.length("text")
    n_punct = F.length(F.regexp_replace(F.lower("text"), r"[a-z0-9\s]", ""))
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS["en"])))
    punct_ratio = n_punct * F.lit(1.0) / F.greatest(n_chars, F.lit(1))
    stop_ratio = stop_hits * F.lit(1.0) / F.greatest(n_tokens, F.lit(1))
    length_factor = F.least(n_tokens * F.lit(1.0) / F.lit(100.0), F.lit(1.0))
    score = length_factor * (1 - punct_ratio) * (F.lit(0.5) + F.lit(0.5) * stop_ratio)
    return documents.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(score, 4).alias("quality"),
    )


def token_count_bpe(documents: DataFrame) -> DataFrame:
    """Token counting: whitespace tokens vs a BPE-ish regex
    pretokenization (letter runs / digit runs / punctuation singletons)
    -- the cheap proxy for 'how many LLM tokens is this doc'."""
    return documents.select(
        "doc_id",
        F.size(tokens_col("text")).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(BPE_REGEX), 0)).alias("n_bpe_tokens"),
    )


def doc_fingerprint(documents: DataFrame, shingle_len: int = 3) -> DataFrame:
    """Content fingerprint: minimum md5 over word 3-gram shingles
    (a 1-permutation MinHash). Rolling-hash analog kept in SQL-checkable
    form; docs shorter than the shingle length are excluded.
    Fingerprint equality => near-certain shared content window."""
    toks = tokens_col("text")
    df = documents.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= shingle_len)
    fp = F.array_min(
        F.expr(
            f"transform(sequence(1, size(toks) - {shingle_len - 1}), "
            f"i -> md5(concat_ws(' ', slice(toks, i, {shingle_len}))))"
        )
    )
    return df.select("doc_id", fp.alias("fingerprint"))


def tfidf_top_terms(documents: DataFrame, k: int = 5) -> DataFrame:
    """Top-k characteristic terms per document by tf-idf.

    Three aggregations over the exploded token stream -- term
    frequency per (doc, word), document frequency per word, corpus
    size -- composed with ln(N/df) idf and a per-doc rank window.
    All shuffles key on word or doc_id; df is a second aggregate of
    the SAME exploded stream, so at scale the token explosion is
    computed once per branch (persist the token stream if the
    scheduler shows it dominating). The tiny corpus-size scalar rides
    a cross join (broadcast, 1 row)."""
    from pyspark.sql import Window

    from ..functions.text import words_exploded

    words = words_exploded(documents)
    tf = words.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    df = words.groupBy("word").agg(F.count_distinct("doc_id").alias("df"))
    n = documents.select(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df, "word")
        .crossJoin(F.broadcast(n))
        .withColumn("tfidf", F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("word"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("doc_id", "word", F.round("tfidf", 4).alias("tfidf"), F.col("rnk").cast("int").alias("rnk"))
    )


def curation_pipeline(
    documents: DataFrame,
    min_quality: float = 0.2,
    langs: tuple[str, ...] = ("en",),
) -> DataFrame:
    """End-to-end training-data curation: exact dedup -> language
    filter -> quality gate -> per-doc token accounting. The composed
    form a 100 TB pre-training pipeline actually runs, declared as one
    operator so the whole chain is oracle-checked.

    Plan shape: one shuffle for the dedup window (content hash), then
    the language/quality stages are pure per-row expressions fused
    into the same stage by codegen -- the pipeline costs one pass over
    the corpus plus the dedup exchange, and the token accounting adds
    no further shuffle."""
    from .dedup import dedup_apply

    kept = dedup_apply(documents)
    toks = tokens_col("text")
    n_tokens = F.size(toks)
    n_chars = F.length("text")
    n_punct = F.length(F.regexp_replace(F.lower("text"), r"[a-z0-9\s]", ""))
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS["en"])))
    punct_ratio = n_punct * F.lit(1.0) / F.greatest(n_chars, F.lit(1))
    stop_ratio = stop_hits * F.lit(1.0) / F.greatest(n_tokens, F.lit(1))
    length_factor = F.least(n_tokens * F.lit(1.0) / F.lit(100.0), F.lit(1.0))
    score = length_factor * (1 - punct_ratio) * (F.lit(0.5) + F.lit(0.5) * stop_ratio)
    return (
        kept.filter(F.col("lang").isin(*langs))
        .withColumn("quality", F.round(score, 4))
        .filter(F.col("quality") >= min_quality)
        .select(
            "doc_id",
            "lang",
            F.col("quality"),
            n_tokens.alias("n_tokens"),
            F.size(F.regexp_extract_all(F.lower("text"), F.lit(BPE_REGEX), 0)).alias(
                "n_bpe_tokens"
            ),
        )
    )
