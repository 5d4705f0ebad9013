"""Shared tokenization expressions.

One tokenizer definition used by every text operator (wordcount,
text_stats, dedup shingling, Job-API WordCount) so Spark results,
the DuckDB oracle SQL, and the Python Job API agree exactly:

    tokens(text) = non-empty pieces of lower(text) split on \\s+

The reference splits on a single space without lowering
(``job/WordCount.java:29``); the engine normalizes case and collapses
whitespace -- a deliberate upgrade, flagged in SURVEY.md section 2A.
All expressions are built-in (JVM, codegen'd); no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: DuckDB-side equivalent of tokens_col, for oracle SQL assembly.
TOKENS_SQL_DUCKDB = (
    "list_filter(string_split_regex(lower({col}), '\\s+'), t -> t <> '')"
)


def tokens_col(col: str | Column = "text") -> Column:
    """array<string> of non-empty lowercase whitespace tokens."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != "")


def words_exploded(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, word) with one row per token occurrence."""
    return docs.select(
        F.col(id_col),
        F.explode(tokens_col(text_col)).alias("word"),
    )


def tokenize_py(text: str) -> list[str]:
    """Python-side tokenizer with identical semantics, for the Job API
    (``plans/jobs.py``) so Job-API wordcount hash-matches the SQL oracle."""
    return [t for t in text.lower().split() if t]


def grams_expr(n: int, toks_name: str = "toks") -> str:
    """SQL-expression fragment producing the array of space-joined
    word n-grams of a token-array column — the ONE definition of gram
    construction shared by shingling (``operators/dedup.shingles``),
    fingerprinting (``operators/text.doc_fingerprint``), and n-gram
    counting (``operators/text.ngram_counts``), so gram semantics
    (separator, slice bounds) can never drift between them. Caller
    guards ``size(toks) >= n`` (Spark's ``sequence(1, 0)`` counts
    DOWN, so an unguarded short doc would yield garbage grams)."""
    return (
        f"transform(sequence(1, size({toks_name}) - {n - 1}), "
        f"i -> concat_ws(' ', slice({toks_name}, i, {n})))"
    )
