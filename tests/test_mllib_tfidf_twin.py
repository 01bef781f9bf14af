"""MLlib pipeline twin for TF-IDF: CountVectorizer + IDF over the exact
same token arrays must reproduce our hand-rolled tf * ln((1+N)/(1+df))
scores (MLlib's IDF uses the same add-one smoothing). Pins the claim that
the text pipeline composes with standard MLlib estimators.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_forecasting_spark.functions.text import tokens
from clickhouse_forecasting_spark.sources import read_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return (
        read_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 50)
        .select("doc_id", tokens(F.col("text")).alias("toks"))
        .cache()
    )


def test_mllib_pipeline_matches_manual_tfidf(spark, sf_dir, docs):
    from pyspark.ml.feature import CountVectorizer, IDF

    cv = CountVectorizer(inputCol="toks", outputCol="tf_vec", minDF=1.0)
    cv_model = cv.fit(docs)
    tf_df = cv_model.transform(docs)
    idf_model = IDF(inputCol="tf_vec", outputCol="tfidf_vec").fit(tf_df)
    out = {r.doc_id: r.tfidf_vec for r in idf_model.transform(tf_df).collect()}
    vocab = {t: i for i, t in enumerate(cv_model.vocabulary)}

    # manual twin: tf * ln((1+N)/(1+df)) per (doc, token)
    tok = docs.select("doc_id", F.explode("toks").alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dfreq = tok.groupBy("token").agg(F.count_distinct("doc_id").alias("df"))
    n_docs = docs.count()
    manual = (
        tf.join(dfreq, "token")
        .withColumn("tfidf", F.col("tf") * F.log((1.0 + n_docs) / (1.0 + F.col("df"))))
        .collect()
    )
    assert manual
    checked = 0
    for r in manual:
        vec = out[r.doc_id]
        got = vec[vocab[r.token]]
        assert got == pytest.approx(r.tfidf, abs=1e-9), (r.doc_id, r.token)
        checked += 1
    assert checked > 100  # the 50-doc slice has a real vocabulary


def test_mllib_vocab_covers_manual_tokens(spark, sf_dir, docs):
    from pyspark.ml.feature import CountVectorizer

    cv_model = CountVectorizer(inputCol="toks", outputCol="v", minDF=1.0).fit(docs)
    vocab = set(cv_model.vocabulary)
    manual_vocab = {
        r.token
        for r in docs.select(F.explode("toks").alias("token")).distinct().collect()
    }
    assert vocab == manual_vocab
