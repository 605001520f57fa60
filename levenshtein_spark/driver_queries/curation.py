"""Corpus-curation queries over the documents table.

The operations a training-data pipeline runs after cleaning/dedup, before
writing shards:

* **sample_split** — deterministic hash-based train/val/test assignment
  (a split must be a pure function of the record id so it is stable across
  re-runs, engines, and cluster sizes — never ``rand()``);
* **pack_shards** — token-budget sequence packing over the global document
  order (distributed prefix sum, ``operators/packing.py`` — no
  single-partition window anywhere);
* **bm25_search** — corpus keyword ranking: per-document TF as a column
  expression (zero shuffle), corpus DF/avgdl as one tiny aggregate
  broadcast back. The classic quality/relevance scorer for curating a
  corpus toward a topic.

Every query has an exact DuckDB twin. The BM25 variant uses the rational
idf ``(N - df + 0.5) / (df + 0.5)`` — algebraically the argument of the
textbook ``ln``-idf, monotone in it, and (unlike ``ln``) bit-reproducible
across engines; the deviation is documented here and in the oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from levenshtein_spark.driver_queries import tbl
from levenshtein_spark.functions.hashing import hash_bucket
from levenshtein_spark.functions.text import token_count, word_tokens
from levenshtein_spark.operators.packing import pack_by_budget

_SPLITS = (("train", 80), ("val", 90))  # bucket < 80 → train, < 90 → val, else test
_SHARD_BUDGET = 2048
_BM25_TERMS = ("join", "vector", "customer")
_BM25_K1 = 1.2
_BM25_B = 0.75


def q_sample_split(spark: SparkSession, sf: str) -> DataFrame:
    """80/10/10 train/val/test assignment, a pure function of doc_id
    (functions.hashing.hash_bucket — the portable md5 family)."""
    d = tbl(spark, sf, "documents")
    bucket = hash_bucket(F.col("doc_id"))
    split = F.lit("test")
    for name, ceiling in reversed(_SPLITS):
        split = F.when(bucket < ceiling, F.lit(name)).otherwise(split)
    return d.select("doc_id", bucket.alias("bucket"), split.alias("split"))


def q_pack_shards(spark: SparkSession, sf: str) -> DataFrame:
    """Token-budget shard assignment over doc_id order (start-offset
    packing: shard = floor((cumsum - n_tokens) / budget))."""
    d = tbl(spark, sf, "documents").select(
        "doc_id", token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    packed = pack_by_budget(d, ["doc_id"], "n_tokens", _SHARD_BUDGET)
    return packed.select("doc_id", "n_tokens", F.col("shard_id").cast("long").alias("shard_id"))


def q_bm25_search(spark: SparkSession, sf: str) -> DataFrame:
    """Top-20 documents for the fixed query terms by BM25 (rational idf).

    Plan shape: per-doc TF/DL are pure column expressions over one scan;
    the corpus statistics (N, Σdl, per-term document frequency) are ONE
    1-row aggregate, broadcast back via crossJoin — no shuffle ever carries
    more than that row, and the ranking is a 20-row TakeOrdered.
    """
    d = tbl(spark, sf, "documents")
    words = word_tokens(F.col("text"))
    def tf_of(term: str):
        # NB: a two-arg lambda would be treated by F.filter as (element,
        # index) — bind the term via closure, compare against a literal
        return F.size(F.filter(words, lambda x: x == F.lit(term)))

    tf_cols = [tf_of(t).cast("long").alias(f"tf{i}") for i, t in enumerate(_BM25_TERMS)]
    tf = d.select("doc_id", F.size(words).cast("long").alias("dl"), *tf_cols)
    stats = tf.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    fat = tf.crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    norm = F.lit(1.0) - F.lit(_BM25_B) + F.lit(_BM25_B) * F.col("dl").cast("double") / avgdl
    score = F.lit(0.0)
    for i in range(len(_BM25_TERMS)):
        idf = ((F.col("n_docs") - F.col(f"df{i}")).cast("double") + F.lit(0.5)) / (
            F.col(f"df{i}").cast("double") + F.lit(0.5)
        )
        tf_i = F.col(f"tf{i}").cast("double")
        w = tf_i * F.lit(_BM25_K1 + 1.0) / (tf_i + F.lit(_BM25_K1) * norm)
        score = score + idf * w
    return (
        fat.select("doc_id", score.alias("_score"))
        .orderBy(F.col("_score").desc(), "doc_id")
        .limit(20)
        .select("doc_id", F.round("_score", 6).alias("bm25"))
    )


def q_corpus_profile(spark: SparkSession, sf: str) -> DataFrame:
    """One-row corpus scorecard: doc/token totals, vocabulary size, and
    exact length percentiles — the summary a curation run reports before
    and after each stage. Two 1-row aggregates (documents-level and the
    exploded vocabulary count) crossJoined; Spark's exact ``percentile``
    is bit-identical to DuckDB's ``quantile_cont`` (linear interpolation
    over the sorted values)."""
    d = tbl(spark, sf, "documents")
    doc_stats = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col("text")).cast("long")).alias("total_tokens"),
        F.percentile("n_chars", 0.5).alias("p50_chars"),
        F.percentile("n_chars", 0.9).alias("p90_chars"),
        F.percentile("n_chars", 0.99).alias("p99_chars"),
        F.countDistinct("lang").alias("n_langs"),
    )
    vocab = d.select(F.explode(word_tokens(F.col("text"))).alias("w")).agg(
        F.countDistinct("w").alias("vocab_size")
    )
    return doc_stats.crossJoin(F.broadcast(vocab)).select(
        "n_docs",
        "total_tokens",
        F.round(F.col("total_tokens") / F.col("n_docs"), 6).alias("avg_tokens"),
        "p50_chars",
        "p90_chars",
        "p99_chars",
        "n_langs",
        "vocab_size",
    )


QUERIES = {
    "sample_split": q_sample_split,
    "pack_shards": q_pack_shards,
    "bm25_search": q_bm25_search,
    "corpus_profile": q_corpus_profile,
}


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------
_DD_BUCKET = "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT) % 100"
_DD_WS = r"list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '')"
_DD_WORDS = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')"


def _dd_split_case() -> str:
    expr = "'test'"
    for name, ceiling in reversed(_SPLITS):
        expr = f"CASE WHEN {_DD_BUCKET} < {ceiling} THEN '{name}' ELSE {expr} END"
    return expr


def _dd_bm25() -> str:
    tf_sel = ", ".join(
        f"CAST(len(list_filter(w, x -> x = '{t}')) AS BIGINT) AS tf{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    df_sel = ", ".join(
        f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(_BM25_TERMS))
    )
    k1, k1p1, b = _BM25_K1, _BM25_K1 + 1.0, _BM25_B
    norm = f"(1.0 - {b} + {b} * CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))"
    terms = []
    for i in range(len(_BM25_TERMS)):
        idf = f"((CAST(n_docs - df{i} AS DOUBLE) + 0.5) / (CAST(df{i} AS DOUBLE) + 0.5))"
        w = f"(CAST(tf{i} AS DOUBLE) * {k1p1} / (CAST(tf{i} AS DOUBLE) + {k1} * {norm}))"
        terms.append(f"{idf} * {w}")
    # left-assoc sum starting at 0.0, mirroring the Spark column fold exactly
    score = "0.0"
    for t in terms:
        score = f"({score} + {t})"
    return f"""
WITH tf AS (
  SELECT doc_id, CAST(len(w) AS BIGINT) AS dl, {tf_sel}
  FROM (SELECT doc_id, {_DD_WORDS} AS w FROM documents) t
),
stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl, {df_sel} FROM tf)
SELECT doc_id, round(_score, 6) AS bm25
FROM (SELECT doc_id, {score} AS _score FROM tf, stats)
ORDER BY _score DESC, doc_id
LIMIT 20
"""


ORACLES = {
    "sample_split": f"""
SELECT doc_id, {_DD_BUCKET} AS bucket, {_dd_split_case()} AS split
FROM documents
""",
    "pack_shards": f"""
SELECT doc_id, n_tokens,
       CAST(floor((sum(n_tokens) OVER (ORDER BY doc_id) - n_tokens)
                  / {_SHARD_BUDGET}) AS BIGINT) AS shard_id
FROM (SELECT doc_id, CAST(len({_DD_WS}) AS BIGINT) AS n_tokens FROM documents) t
""",
    "bm25_search": _dd_bm25(),
    "corpus_profile": f"""
WITH ds AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len({_DD_WS})) AS BIGINT) AS total_tokens,
         quantile_cont(n_chars, 0.5) AS p50_chars,
         quantile_cont(n_chars, 0.9) AS p90_chars,
         quantile_cont(n_chars, 0.99) AS p99_chars,
         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
  FROM documents
),
v AS (
  SELECT CAST(count(DISTINCT w) AS BIGINT) AS vocab_size
  FROM (SELECT unnest({_DD_WORDS}) AS w FROM documents) t
)
SELECT n_docs, total_tokens,
       round(total_tokens * 1.0 / n_docs, 6) AS avg_tokens,
       p50_chars, p90_chars, p99_chars, n_langs, vocab_size
FROM ds, v
""",
}
