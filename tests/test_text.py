from pyspark.sql import Row

from java_mapreduce_framework_spark.functions.text import tokenize_py
from java_mapreduce_framework_spark.operators import text


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, lang="en", source="t", n_chars=len(t)) for i, t in enumerate(rows)]
    )


def test_wordcount_total_occurrences(spark):
    docs = _docs(spark, ["a b a", "A  b"])
    got = {r["word"]: r["cnt"] for r in text.wordcount(docs).collect()}
    assert got == {"a": 3, "b": 2}


def test_wordcount_records_containing_reference_quirk(spark):
    # reference semantics: 'a' appears in 2 records (not 3 occurrences)
    docs = _docs(spark, ["a b a", "A  b"])
    got = {r["word"]: r["n_docs"] for r in text.wordcount_records_containing(docs).collect()}
    assert got == {"a": 2, "b": 2}


def test_tokenize_py_matches_spark_tokenizer(spark):
    samples = ["Hello  World", " lead trail ", "", "ONE"]
    docs = _docs(spark, samples)
    spark_tokens = {
        r["doc_id"]: r["toks"]
        for r in docs.selectExpr(
            "doc_id", "filter(split(lower(text), '\\\\s+'), t -> t != '') AS toks"
        ).collect()
    }
    for i, s in enumerate(samples):
        assert tokenize_py(s) == spark_tokens[i]


def test_doc_fingerprint_short_docs_excluded(spark):
    docs = _docs(spark, ["one two", "one two three four"])
    out = text.doc_fingerprint(docs).collect()
    assert [r["doc_id"] for r in out] == [1]


def test_doc_fingerprint_equal_for_equal_content(spark):
    docs = _docs(spark, ["x y z w", "x y z w", "different words here now"])
    fps = {r["doc_id"]: r["fingerprint"] for r in text.doc_fingerprint(docs).collect()}
    assert fps[0] == fps[1] != fps[2]


def test_lang_id_prefers_stopword_hits(spark):
    docs = _docs(spark, ["the cat is in the hat", "el gato es de la casa"])
    got = {r["doc_id"]: r["pred_lang"] for r in text.lang_id(docs).collect()}
    assert got == {0: "en", 1: "es"}


def test_quality_score_bounds(spark, sf_small):
    from java_mapreduce_framework_spark.sources.tables import load_table

    out = text.quality_score(load_table(spark, sf_small, "documents")).collect()
    assert all(0.0 <= r["quality"] <= 1.0 for r in out)


def test_tfidf_corpus_wide_terms_score_zero(spark):
    from java_mapreduce_framework_spark.operators.text import tfidf_top_terms

    docs = spark.createDataFrame(
        [(1, "common alpha"), (2, "common beta"), (3, "common gamma")],
        ["doc_id", "text"],
    )
    out = tfidf_top_terms(docs, k=5).collect()
    scores = {(r["doc_id"], r["word"]): r["tfidf"] for r in out}
    # 'common' appears in every doc -> idf = ln(1) = 0
    assert scores[(1, "common")] == 0.0
    assert scores[(1, "alpha")] > 0.0
