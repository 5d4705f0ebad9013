"""Declared query registry: the single source of truth behind
``__spark_entry__.py``'s ``queries()`` / ``oracle_sql()`` contract.

Every operator from SURVEY.md section 2B registers here as a
``QuerySpec``: a PySpark callable ``(spark, sf_dir) -> DataFrame``
plus (when SQL-expressible) the equivalent ANSI SQL the DuckDB oracle
runs over the same parquet fixtures. Column names and types are
aligned on both sides because the driver's comparison hashes values
under name-sorted columns.

Alignment rules used throughout (SURVEY.md section 7 risk register):
- every computed column aliased identically in Spark and SQL;
- DuckDB widths cast to Spark's (year/length/rank -> INT, sum(int) ->
  BIGINT vs DuckDB's HUGEINT);
- doubles rounded (2 for money, 4 for ratios, 6 pre-ranking) on both
  sides, after arithmetic written in the same order;
- timestamps compared under UTC (session tz pinned in ``_prep``);
- ties in every ORDER BY broken by a unique key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ...operators import (
    analytics,
    dedup,
    ml,
    multimodal,
    relational,
    similarity,
    temporal,
    text,
)
from ...session import tune_session
from ...sources.tables import load_table

# ---------------------------------------------------------------- helpers

#: DuckDB tokenizer fragment == functions.text.tokens_col semantics.
_TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), s -> s <> '')"

#: (doc_id, word) occurrence stream, shared by the wordcount family.
_WORDS_CTE = f"""
WITH words AS (
  SELECT doc_id, unnest({_TOKS}) AS word
  FROM documents
)
"""

#: events with ts truncated ns -> us, matching Spark's microsecond
#: timestamp representation (see sources.tables.load_table).
_EVTS = (
    "(SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props "
    "FROM events) evts"
)

_EN = "('the','a','of','and','to','in','is')"
_ES = "('el','la','de','y','es','un','que')"
_DE = "('der','die','das','und','ist','ein','zu')"

#: Quality-score formula + its measures CTE, shared verbatim by the
#: quality_score / quality_stratify / curation_pipeline oracles so the
#: formula lives in ONE place on the SQL side (mirror of
#: operators/text.py::quality_score).
_QUALITY_EXPR = (
    "round(least(n_tokens * 1.0 / 100.0, 1.0)"
    " * (1 - n_punct * 1.0 / greatest(n_chars, 1))"
    " * (0.5 + 0.5 * (stop_hits * 1.0 / greatest(n_tokens, 1))), 4)"
)

_QUALITY_MEASURES_CTE = f"""
    toks AS (SELECT doc_id, text, {_TOKS} AS t FROM documents),
    m AS (
      SELECT doc_id,
             CAST(len(t) AS INTEGER) AS n_tokens,
             length(text) AS n_chars,
             length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g')) AS n_punct,
             len(list_filter(t, x -> x IN {_EN})) AS stop_hits
      FROM toks)
"""


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible, rows-only check
    note: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


#: Registered names whose implementing function deliberately does not
#: follow the `_<name>` convention (shared impls, historical names).
_NAME_EXEMPT: set[str] = set()


def _register(name: str, oracle: str | None, note: str = ""):
    def deco(fn):
        # Decorator-placement guard: an edit that splices a new
        # registration between another query's decorator and its def
        # silently rebinds that query to the WRONG function (it has
        # happened twice: graph_common_neighbors round 6, then
        # vocab_coverage). The `_<name>` convention makes the splice
        # a hard import error instead of a silent wrong answer.
        if name not in _NAME_EXEMPT and fn.__name__ != f"_{name}":
            raise AssertionError(
                f"@_register({name!r}) decorates {fn.__name__}; expected "
                f"_{name} -- a new registration was likely spliced between "
                "another query's decorator and its def"
            )

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_session(spark)
            return fn(spark, sf_dir)

        # Collision guard (round 11): a later module re-registering an
        # existing name SILENTLY replaced its fn AND oracle (it
        # happened twice in one round: multimodal_image_entropy and
        # embedding_quantize_int8 got duplicated under the same names
        # with different semantics, and the sweep kept passing because
        # fn and oracle were swapped TOGETHER). Hard-fail instead.
        if name in _REGISTRY:
            raise AssertionError(
                f"duplicate registration of {name!r} -- the name is "
                "already declared by an earlier registry module"
            )
        _REGISTRY[name] = QuerySpec(name, wrapped, oracle, note)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def registry() -> dict[str, QuerySpec]:
    return dict(_REGISTRY)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {n: s.oracle for n, s in _REGISTRY.items() if s.oracle is not None}


