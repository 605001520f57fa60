"""Text-analysis suite over the documents table (training-data pipeline ops).

Token counting, quality scoring, language ID, and winnowing fingerprints —
all JVM-side column expressions (functions/text.py), each with an exact
DuckDB twin. Ratios are rounded to 6 decimals on both sides; the underlying
arithmetic is identical IEEE double math so the rounding is stable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from levenshtein_spark.driver_queries import tbl
from levenshtein_spark.functions.text import (
    STOPWORDS,
    digit_ratio,
    lang_guess,
    mean_word_length,
    punct_ratio,
    quality_score,
    rolling_fingerprint,
    token_count,
    word_bigrams,
    word_tokens,
)


def q_text_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document token/character statistics."""
    d = tbl(spark, sf, "documents")
    return d.select(
        "doc_id",
        token_count(F.col("text")).cast("long").alias("n_tokens"),
        F.size(word_tokens(F.col("text"))).cast("long").alias("n_words"),
        F.round(punct_ratio(F.col("text")), 6).alias("punct_ratio"),
        F.round(digit_ratio(F.col("text")), 6).alias("digit_ratio"),
        F.round(mean_word_length(F.col("text")), 6).alias("mean_word_len"),
    )


def q_text_quality(spark: SparkSession, sf: str) -> DataFrame:
    """Composite [0,1] quality score (Gopher-rules family)."""
    d = tbl(spark, sf, "documents")
    return d.select("doc_id", F.round(quality_score(F.col("text")), 6).alias("quality"))


def q_text_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    """Stopword-vote language ID vs the table's labeled lang column."""
    d = tbl(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.col("lang").alias("label"),
        lang_guess(F.col("text")).alias("guess"),
    )


def q_text_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Winnowing document fingerprint: min 8-gram rolling hash."""
    d = tbl(spark, sf, "documents")
    return d.select("doc_id", rolling_fingerprint(F.col("text"), 8).alias("fingerprint"))


def _rep_stats(d: DataFrame, unit, prefix: str) -> DataFrame:
    """(doc_id, {prefix}_top_frac, {prefix}_dup_frac) from an array column.

    explode → (doc_id, unit) counts → per-doc max/total/distinct. Both
    groupBys combine map-side; nothing per-doc ever materializes as one row
    wider than three longs, so the shape survives any corpus size.
    """
    counts = (
        d.select("doc_id", F.explode(unit).alias("u"))
        .groupBy("doc_id", "u")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return counts.groupBy("doc_id").agg(
        (F.max("c").cast("double") / F.sum("c")).alias(f"{prefix}_top_frac"),
        (
            F.lit(1.0) - F.count(F.lit(1)).cast("double") / F.sum("c")
        ).alias(f"{prefix}_dup_frac"),
    )


def q_text_repetition(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-style repetition signals: most-common-word fraction, duplicate
    word fraction, and the same over word bigrams — the filters that catch
    degenerate/boilerplate text that length and stopword ratios miss."""
    d = tbl(spark, sf, "documents")
    w = _rep_stats(d, word_tokens(F.col("text")), "word")
    b = _rep_stats(d, word_bigrams(F.col("text")), "bigram")
    return (
        d.select("doc_id")
        .join(w, "doc_id", "left")
        .join(b, "doc_id", "left")
        .select(
            "doc_id",
            *[
                F.round(F.coalesce(F.col(c), F.lit(0.0)), 6).alias(c)
                for c in ["word_top_frac", "word_dup_frac", "bigram_top_frac", "bigram_dup_frac"]
            ],
        )
    )


def q_text_top_tokens(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-level token frequency: top 20 word tokens (classic wordcount)."""
    d = tbl(spark, sf, "documents")
    return (
        d.select(F.explode(word_tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), "token")
        .limit(20)
    )


_OOV_MIN_DF = 2  # a token is in-vocabulary once >= 2 distinct docs use it


def q_text_oov_rate(spark: SparkSession, sf: str) -> DataFrame:
    """Out-of-vocabulary rate against the corpus' own vocabulary — the
    C4-family gibberish/garble signal: the fraction of a document's token
    OCCURRENCES whose token appears in fewer than {_OOV_MIN_DF} distinct
    documents (hapax-in-corpus ⇒ likely noise, random ids, mangled
    encodings). All arithmetic is exact integers + one correctly-rounded
    divide per doc, so the twin hash-checks raw doubles.

    Scale shape: per-doc (token, n_occ) counts via one map-side-combining
    groupBy; the document-frequency table is a second groupBy over the
    distinct (token, doc) projection; one slim equi-join on token re-keys
    occurrences by rarity; a final groupBy restores per-doc grain. No
    payload wider than (doc_id, token, count) ever shuffles.
    """
    from levenshtein_spark.functions.text import word_tokens

    d = tbl(spark, sf, "documents")
    occ = (
        d.select("doc_id", F.explode(word_tokens(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("n_occ"))
    )
    df_tbl = occ.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    joined = occ.join(df_tbl, "tok")
    per_doc = joined.groupBy("doc_id").agg(
        F.sum("n_occ").alias("n_tokens"),
        F.sum(F.when(F.col("df") < _OOV_MIN_DF, F.col("n_occ")).otherwise(F.lit(0))).alias(
            "n_oov"
        ),
    )
    # docs with zero tokens never reach the explode; restore them with 0/0 -> NULL
    all_docs = d.select("doc_id")
    return all_docs.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce(F.col("n_oov"), F.lit(0)).cast("long").alias("n_oov"),
        F.when(
            F.coalesce(F.col("n_tokens"), F.lit(0)) > 0,
            F.col("n_oov").cast("double") / F.col("n_tokens").cast("double"),
        ).alias("oov_rate"),
    )


QUERIES = {
    "text_stats": q_text_stats,
    "text_quality": q_text_quality,
    "text_lang_id": q_text_lang_id,
    "text_fingerprint": q_text_fingerprint,
    "text_repetition": q_text_repetition,
    "text_top_tokens": q_text_top_tokens,
    "text_oov_rate": q_text_oov_rate,
}

_DD_WS = r"list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '')"
_DD_WORDS = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')"
_PUNCT = r"[!-/:-@\[-`{-~]"


def _dd_stopword_count(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter({_DD_WORDS}, t -> list_contains([{words}], t)))"


def _dd_lang_guess() -> str:
    langs = sorted(STOPWORDS)
    counts = {lang: _dd_stopword_count(lang) for lang in langs}
    best = f"greatest({', '.join(counts.values())})"
    expr = "'und'"
    for lang in reversed(langs):  # earlier langs win ties -> apply last
        expr = (
            f"CASE WHEN {counts[lang]} = {best} AND {best} > 0 "
            f"THEN '{lang}' ELSE {expr} END"
        )
    return expr


_DD_MEAN_WLEN = (
    f"(list_sum(list_transform({_DD_WS}, t -> strlen(t))) * 1.0 /"
    f" greatest(len({_DD_WS}), 1))"
)

# quality_score mirror: (length_factor + alpha + stopword + wordlen) / 4
_DD_QUALITY = f"""(
  least(strlen(text) / 500.0, 1.0)
  + (strlen(text) - strlen(regexp_replace(text, '[A-Za-z]', '', 'g'))) * 1.0
    / greatest(strlen(text), 1)
  + least(({_dd_stopword_count('en')} * 1.0 / greatest(len({_DD_WORDS}), 1)) * 5.0, 1.0)
  + (CASE WHEN {_DD_MEAN_WLEN} >= 3 AND {_DD_MEAN_WLEN} <= 10 THEN 1.0 ELSE 0.5 END)
) / 4.0"""

_DD_FP = """
list_min(list_transform(
  list_transform(range(1, greatest(len(w) - 7, 1) + 1),
                 i -> array_to_string(list_slice(w, i, i + 7), ' ')),
  g -> (('0x' || substr(md5(g), 1, 15))::BIGINT)))
"""

# word_bigrams mirror (same math as dedup.py's _DD_BIGRAMS): single-token
# docs yield the token itself; empty docs yield one '' shingle
_DD_BG = (
    "list_transform(range(1, greatest(len(w) - 1, 1) + 1), "
    "i -> array_to_string(list_slice(w, i, i + 1), '_'))"
)


def _dd_rep_cte(src: str, prefix: str) -> str:
    return f"""
{prefix}c AS (
  SELECT doc_id, u, count(*) AS c
  FROM (SELECT doc_id, unnest({src}) AS u FROM w) t GROUP BY doc_id, u
),
{prefix}s AS (
  SELECT doc_id,
         max(c) * 1.0 / sum(c) AS {prefix}_top_frac,
         1.0 - count(*) * 1.0 / sum(c) AS {prefix}_dup_frac
  FROM {prefix}c GROUP BY doc_id
)"""


_DD_REPETITION = f"""
WITH w AS (SELECT doc_id, {_DD_WORDS} AS w FROM documents),
{_dd_rep_cte("w", "word")},
{_dd_rep_cte(_DD_BG, "bigram")}
SELECT d.doc_id,
       round(coalesce(word_top_frac, 0.0), 6) AS word_top_frac,
       round(coalesce(word_dup_frac, 0.0), 6) AS word_dup_frac,
       round(coalesce(bigram_top_frac, 0.0), 6) AS bigram_top_frac,
       round(coalesce(bigram_dup_frac, 0.0), 6) AS bigram_dup_frac
FROM documents d
LEFT JOIN words USING (doc_id)
LEFT JOIN bigrams USING (doc_id)
"""

ORACLES = {
    "text_stats": f"""
SELECT doc_id,
       CAST(len({_DD_WS}) AS BIGINT) AS n_tokens,
       CAST(len({_DD_WORDS}) AS BIGINT) AS n_words,
       round((strlen(text) - strlen(regexp_replace(text, '{_PUNCT}', '', 'g'))) * 1.0
             / greatest(strlen(text), 1), 6) AS punct_ratio,
       round((strlen(text) - strlen(regexp_replace(text, '[0-9]', '', 'g'))) * 1.0
             / greatest(strlen(text), 1), 6) AS digit_ratio,
       round({_DD_MEAN_WLEN}, 6) AS mean_word_len
FROM documents
""",
    "text_quality": f"""
SELECT doc_id, round({_DD_QUALITY}, 6) AS quality FROM documents
""",
    "text_lang_id": f"""
SELECT doc_id, lang AS label, {_dd_lang_guess()} AS guess FROM documents
""",
    "text_fingerprint": f"""
SELECT doc_id, {_DD_FP} AS fingerprint
FROM (SELECT doc_id, {_DD_WORDS} AS w FROM documents) t
""",
    "text_repetition": _DD_REPETITION,
    "text_top_tokens": f"""
SELECT token, CAST(count(*) AS BIGINT) AS freq
FROM (SELECT unnest({_DD_WORDS}) AS token FROM documents) t
GROUP BY token
ORDER BY freq DESC, token
LIMIT 20
""",
    "text_oov_rate": f"""
WITH occ AS (
  SELECT doc_id, tok, count(*) AS n_occ
  FROM (SELECT doc_id, unnest({_DD_WORDS}) AS tok FROM documents) t
  GROUP BY doc_id, tok
),
dfs AS (SELECT tok, count(*) AS df FROM occ GROUP BY tok),
per_doc AS (
  SELECT o.doc_id,
         sum(o.n_occ) AS n_tokens,
         sum(CASE WHEN d.df < {_OOV_MIN_DF} THEN o.n_occ ELSE 0 END) AS n_oov
  FROM occ o JOIN dfs d USING (tok)
  GROUP BY o.doc_id
)
SELECT a.doc_id,
       CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(p.n_oov, 0) AS BIGINT) AS n_oov,
       CASE WHEN coalesce(p.n_tokens, 0) > 0
            THEN CAST(p.n_oov AS DOUBLE) / CAST(p.n_tokens AS DOUBLE) END AS oov_rate
FROM documents a LEFT JOIN per_doc p USING (doc_id)
""",
}


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction
# ---------------------------------------------------------------------------
_KW_TOP = 3
_KW_Q = 1000  # rational-idf quantization (integer weights, order-free ranking)


def q_text_keywords(spark: SparkSession, sf: str) -> DataFrame:
    """Top-{k} TF-IDF keywords per document — the classic extractive
    keyword/tag operator of a curation stack (index keys, topic hints,
    dedup explanations). Weight = tf · idf with the engine's rational idf
    ``(N - df + 0.5)/(df + 0.5)`` quantized to an integer (the dedup_tfidf
    recipe), so ranking is pure integer comparison with a deterministic
    (weight DESC, token ASC) tie order — bit-identical cross-engine, no
    float ordering anywhere.

    Scale shape: tf/df are map-side-combining aggregates; idf attaches by a
    token-keyed join; the per-document rank compiles to WindowGroupLimit
    (top-k pushed below the window sort, the sample_stratified shape).
    """
    from pyspark.sql import Window

    d = tbl(spark, sf, "documents")
    toks = d.select(
        F.col("doc_id"), F.explode(word_tokens(F.col("text"))).alias("tok")
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = d.count()
    dfs = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    idf_q = F.round(
        ((F.lit(n_docs) - F.col("df")).cast("double") + F.lit(0.5))
        * F.lit(float(_KW_Q))
        / (F.col("df").cast("double") + F.lit(0.5))
    ).cast("long")
    w = tf.join(dfs, "tok").select(
        "doc_id", "tok", (F.col("tf") * idf_q).alias("weight")
    )
    rnk = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.desc("weight"), "tok")
    )
    return (
        w.withColumn("rank", rnk)
        .where(F.col("rank") <= _KW_TOP)
        .select("doc_id", F.col("rank").cast("int").alias("rank"), "tok", "weight")
    )


QUERIES["text_keywords"] = q_text_keywords

from levenshtein_spark.oracles import dd_word_tokens as _kw_toks  # noqa: E402

ORACLES["text_keywords"] = f"""
WITH tf AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest({_kw_toks('text')}) AS tok FROM documents) t
  GROUP BY 1, 2
),
dfs AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
w AS (
  SELECT doc_id, tok,
         tf * CAST(round((CAST((SELECT n FROM n) - df AS DOUBLE) + 0.5)
                         * {float(_KW_Q)!r}
                         / (CAST(df AS DOUBLE) + 0.5)) AS BIGINT) AS weight
  FROM tf JOIN dfs USING (tok)
),
rk AS (
  SELECT doc_id, tok, weight,
         row_number() OVER (PARTITION BY doc_id ORDER BY weight DESC, tok) AS rank
  FROM w
)
SELECT doc_id, CAST(rank AS INT) AS rank, tok, weight
FROM rk WHERE rank <= {_KW_TOP}
"""
