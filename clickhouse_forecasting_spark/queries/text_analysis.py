# text analysis: lang-id, quality, tokens, fingerprints
# Part of the clickhouse_forecasting_spark.queries package. Since r9
# this is a REAL importable module (r8 VERDICT task #5, incremental):
# it imports its dependencies explicitly; __init__.py merges its names
# into the shared exec namespace so later parts see them as before.

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as TX
from ..functions.text import STOPWORDS
from ..operators import ranking as RK
from .catalog_relational import _t
# --------------------------------------------------------------------------
# text analysis (extension)
# --------------------------------------------------------------------------

_TOKS_SQL = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != '')"
_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        TX.token_count(t).alias("n_tokens"),
        TX.char_count(t).alias("n_chars"),
        TX.punct_ratio(t).alias("punct_ratio"),
        TX.mean_word_length(t).alias("mean_word_len"),
        TX.stopword_ratio(t, "en").alias("stopword_ratio_en"),
    )


_TEXT_STATS_SQL = f"""
SELECT doc_id,
  len({_TOKS_SQL}) AS n_tokens,
  length(text) AS n_chars,
  (length(text) - length(regexp_replace(text, '[.,;:!?()\\[\\]{{}}"'']', '', 'g'))) / greatest(length(text), 1) AS punct_ratio,
  coalesce(list_sum(list_transform({_TOKS_SQL}, t -> length(t))), 0) / greatest(len({_TOKS_SQL}), 1) AS mean_word_len,
  len(list_filter({_TOKS_SQL}, t -> t IN ({",".join(repr(w) for w in STOPWORDS["en"])}))) / greatest(len({_TOKS_SQL}), 1) AS stopword_ratio_en
FROM documents
"""


def q_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", TX.lang_id(F.col("text")).alias("lang_pred"))


def _lang_case() -> str:
    """CASE expression for heuristic language ID over a `text` column."""
    scores = {
        lang: f"len(list_filter({_TOKS_SQL}, t -> t IN ({','.join(repr(w) for w in words)})))"
        for lang, words in STOPWORDS.items()
    }
    best = "greatest(" + ", ".join(scores.values()) + ")"
    cases = " ".join(
        f"WHEN {scores[lang]} > 0 AND {scores[lang]} = {best} THEN '{lang}'" for lang in STOPWORDS
    )
    return f"CASE {cases} ELSE 'und' END"


def _lang_sql() -> str:
    return f"SELECT doc_id, {_lang_case()} AS lang_pred FROM documents"


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", TX.quality_score(F.col("text")).alias("quality"))


_QUALITY_SQL = f"""
SELECT doc_id,
  ((CASE WHEN len({_TOKS_SQL}) BETWEEN 5 AND 5000 THEN 1.0 ELSE 0.0 END)
 + (CASE WHEN (length(text) - length(regexp_replace(text, '[.,;:!?()\\[\\]{{}}"'']', '', 'g'))) / greatest(length(text), 1) < 0.2 THEN 1.0 ELSE 0.0 END)
 + (CASE WHEN len(list_filter({_TOKS_SQL}, t -> t IN ({",".join(repr(w) for w in STOPWORDS["en"])}))) / greatest(len({_TOKS_SQL}), 1) > 0.05 THEN 1.0 ELSE 0.0 END)) / 3.0 AS quality
FROM documents
"""


def q_text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token budget vs whitespace token count per document."""
    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        TX.bpe_token_count(t).alias("n_bpe_tokens"),
        TX.token_count(t).alias("n_ws_tokens"),
    )


_BPE_SQL = f"""
SELECT doc_id,
  len(regexp_extract_all(lower(text), '{TX.BPE_SPLIT_RE.replace(chr(39), chr(39) * 2)}')) AS n_bpe_tokens,
  len({_TOKS_SQL}) AS n_ws_tokens
FROM documents
"""


def q_text_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level word count: explode tokens -> groupBy -> top-20.
    The canonical map-side-combine aggregation (partial counts per
    partition; the shuffle carries one row per distinct token). The
    top-20 is orderBy+limit — TakeOrderedAndProject, each partition
    retains 20 rows — and the rank column is a window over the already
    20-row frame, never over the full vocabulary."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(F.explode(TX.tokens(F.col("text"))).alias("token"))
    counts = tok.groupBy("token").agg(F.count("*").alias("n"))
    top = RK.top_k(counts, [F.col("n").desc(), F.col("token")], 20)
    w = Window.orderBy(F.col("n").desc(), F.col("token"))
    return top.withColumn("rank", F.row_number().over(w))


_TOP_TOKENS_SQL = f"""
WITH tok AS (SELECT unnest({_TOKS_SQL}) AS token FROM documents),
counts AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY token)
SELECT token, n, rank FROM (
  SELECT token, n, ROW_NUMBER() OVER (ORDER BY n DESC, token) AS rank FROM counts)
WHERE rank <= 20
"""


def q_text_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document TF-IDF keyword extraction (top-3 terms per doc over a
    50-doc slice). Two aggregations over one token explode — term frequency
    per (doc, token) and document frequency per token — joined and ranked
    by a per-doc window. At corpus scale the df side is the vocabulary
    (small, broadcastable) while tf shuffles with map-side combine; tfidf
    is rounded to 6dp and ranked on the ROUNDED value in both engines so
    libm ulp differences in ln() cannot flip rank order."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    tok = docs.select("doc_id", F.explode(TX.tokens(F.col("text"))).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dfreq = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf") * F.log((1.0 + F.col("n_docs")) / (1.0 + F.col("df"))), 6
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "token")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "token", "tfidf", "rank")
        .orderBy("doc_id", "rank")
    )


_TFIDF_SQL = f"""
WITH docs50 AS (SELECT doc_id, text FROM documents WHERE doc_id < 50),
tok AS (SELECT doc_id, unnest({_TOKS_SQL}) AS token FROM docs50),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token),
df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY token),
n AS (SELECT COUNT(*) AS n_docs FROM docs50),
scored AS (
  SELECT doc_id, token, ROUND(tf * ln((1.0 + n_docs) / (1.0 + df)), 6) AS tfidf
  FROM tf JOIN df USING (token) CROSS JOIN n)
SELECT doc_id, token, tfidf, rank FROM (
  SELECT doc_id, token, tfidf,
    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rank
  FROM scored)
WHERE rank <= 3 ORDER BY doc_id, rank
"""


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", TX.fingerprint(F.col("text")).alias("fp"))


_FP_SQL = f"SELECT doc_id, md5({_NORM_SQL}) AS fp FROM documents"


