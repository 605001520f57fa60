"""Statistical language-model curation operators over the documents table.

The three classic model-based filters of an LLM training-data pipeline,
each trained ON the corpus itself with pure DataFrame aggregations (no
driver-side model state, no external artifacts) and scored corpus-wide:

* **text_perplexity** — CCNet-style n-gram LM perplexity filtering
  (Wenzek et al., "CCNet: Extracting High Quality Monolingual Datasets
  from Web Crawl Data", LREC 2020): a bigram model with add-one smoothing
  is estimated from the corpus' own token stream, and every document is
  scored by its average negative log-likelihood — the canonical "does this
  look like language" ranking signal.
* **quality_classifier_nb** — a multinomial Naive Bayes quality classifier
  (the fastText-classifier role in the GPT-3/PaLM data recipes) trained on
  the corpus' own weak labels (``lang = 'en'`` as the positive class) and
  scored as a per-document log-odds.
* **dsir_select** — Data Selection with Importance Resampling (Xie et al.,
  NeurIPS 2023): hashed unigram bucket models for the target (English
  docs) and raw distributions, per-document importance log-weights, and a
  deterministic Gumbel-top-k resample.

Cross-engine determinism contract (the reason every score is an integer):
each per-feature log-probability is quantized to **millinats** —
``CAST(round(1000 * ln(num/den)) AS BIGINT)`` where num/den are exact
integer counts — and per-document scores are SUMS OF THOSE INTEGERS, so
aggregation order can never perturb a result. The only cross-engine risk
is the ``ln`` itself: JVM ``Math.log`` and glibc ``log`` (DuckDB/NumPy)
may differ in the final ulp (~1e-16 relative, measured ~3.5% of count
rationals), which flips the quantization only if ``1000*ln(r)`` lies
within ~1e-13 of a half-integer boundary. ``tests/test_lm_queries.py``
asserts every distinct rational in every model sits > 1e-6 from a
boundary at test scale, making the quantization engine-independent in
practice (the same argument the repo already relies on for its
``round(x, 6)`` double outputs, here with a 7-order-of-magnitude margin).

Scale shape (shared by all three): token/bigram occurrence tables are one
map-side-combining groupBy over slim ``(doc_id, token)`` keys; model
tables are vocabulary-sized (never corpus-sized) and attach back to the
occurrence stream by token-keyed equi-join (AQE broadcasts them when they
fit); corpus scalars (vocab size, class totals, priors) travel as ONE
broadcast 1-row crossJoin. Nothing wider than ``(doc_id, token, count)``
ever shuffles, and no Python runs anywhere — the whole family is
whole-stage-codegen column arithmetic.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from levenshtein_spark.driver_queries import tbl
from levenshtein_spark.functions.hashing import hash64
from levenshtein_spark.functions.text import word_tokens
from levenshtein_spark.oracles import dd_hash64, dd_word_tokens
from levenshtein_spark.session import scoped_persist

_BOS = "^"  # word_tokens emits only [a-z0-9]+ runs, so '^' cannot collide


def _mnat_log(ratio) -> F.Column:
    """round(1000 * ln(ratio)) as BIGINT — the quantized log-prob unit."""
    return F.round(F.lit(1000.0) * F.log(ratio)).cast("long")


def _doc_token_occ(d: DataFrame) -> DataFrame:
    """(doc_id, tok, n_occ) — per-document token occurrence counts."""
    return (
        d.select("doc_id", F.explode(word_tokens(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("n_occ"))
    )


# ---------------------------------------------------------------------------
# text_perplexity — CCNet-style bigram-LM negative log-likelihood
# ---------------------------------------------------------------------------


def q_text_perplexity(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document bigram-LM average negative log-likelihood (millinats).

    Model: p(w2|w1) = (c(w1,w2) + 1) / (c(w1,·) + V) with a BOS context for
    each document's first token; V = |vocabulary| (distinct right-side
    tokens). Self-trained, so every scored bigram is in-model by
    construction — no unseen-event path. Output per doc: bigram count, the
    exact integer sum of quantized log-probs, and the rounded mean NLL
    (higher = less language-like, the CCNet tail).
    """
    d = tbl(spark, sf, "documents")
    w = word_tokens(F.col("text"))
    # bigram stream with BOS: left context = ['^'] ++ w[:-1], right = w
    left = F.when(F.size(w) > 0, F.concat(F.array(F.lit(_BOS)), F.slice(w, 1, F.size(w) - 1))).otherwise(F.array().cast("array<string>"))
    bg = d.select(
        "doc_id",
        F.explode(
            F.zip_with(left, w, lambda a, b: F.struct(a.alias("w1"), b.alias("w2")))
        ).alias("bg"),
    ).select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    occ = (
        bg.groupBy("doc_id", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .transform(scoped_persist)
    )
    c12 = occ.groupBy("w1", "w2").agg(F.sum("n_occ").alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = occ.agg(F.countDistinct("w2").alias("v"))
    model = (
        c12.join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            _mnat_log(
                (F.col("c12") + F.lit(1)).cast("double")
                / (F.col("c1") + F.col("v")).cast("double")
            ).alias("q"),
        )
    )
    per_doc = (
        occ.join(model, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.sum("n_occ").alias("n_bigrams"),
            F.sum(F.col("n_occ") * F.col("q")).alias("s"),
        )
    )
    return d.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
        F.coalesce(F.col("s"), F.lit(0)).cast("long").alias("sum_logprob_mnat"),
        F.when(
            F.coalesce(F.col("n_bigrams"), F.lit(0)) > 0,
            F.round((-F.col("s")).cast("double") / F.col("n_bigrams").cast("double"), 6),
        ).alias("avg_nll_mnat"),
    )


# ---------------------------------------------------------------------------
# quality_classifier_nb — multinomial Naive Bayes, en-vs-rest log-odds
# ---------------------------------------------------------------------------


def q_quality_classifier_nb(spark: SparkSession, sf: str) -> DataFrame:
    """Multinomial NB log-odds per document (positive class: lang='en').

    Trained corpus-wide: per-token class counts with add-one smoothing over
    the GLOBAL vocabulary V (shared by both classes, so the two likelihoods
    are comparable), Laplace priors (N_c + 1)/(N + 2). Per-token weight and
    the prior are quantized to millinats; a document's logit is the integer
    sum prior + Σ n_occ · w(tok). pred = 'en' iff logit >= 0.
    """
    d = tbl(spark, sf, "documents")
    lab = d.select("doc_id", "lang", (F.col("lang") == "en").alias("is_en"))
    occ = _doc_token_occ(d).transform(scoped_persist)
    cls = (
        occ.join(lab.select("doc_id", "is_en"), "doc_id")
        .groupBy("tok")
        .agg(
            F.sum(F.when(F.col("is_en"), F.col("n_occ")).otherwise(F.lit(0))).alias("c_en"),
            F.sum(F.when(~F.col("is_en"), F.col("n_occ")).otherwise(F.lit(0))).alias("c_ot"),
        )
        .transform(scoped_persist)
    )
    tot = cls.agg(
        F.sum("c_en").alias("t_en"),
        F.sum("c_ot").alias("t_ot"),
        F.count(F.lit(1)).alias("v"),
    )
    prior = lab.agg(
        F.sum(F.col("is_en").cast("long")).alias("n_en"),
        F.count(F.lit(1)).alias("n"),
    )
    scalars = tot.crossJoin(prior)
    weights = cls.crossJoin(F.broadcast(scalars)).select(
        "tok",
        (
            _mnat_log(
                (F.col("c_en") + F.lit(1)).cast("double")
                / (F.col("t_en") + F.col("v")).cast("double")
            )
            - _mnat_log(
                (F.col("c_ot") + F.lit(1)).cast("double")
                / (F.col("t_ot") + F.col("v")).cast("double")
            )
        ).alias("w"),
    )
    q0 = (
        _mnat_log(
            (F.col("n_en") + F.lit(1)).cast("double") / (F.col("n") + F.lit(2)).cast("double")
        )
        - _mnat_log(
            (F.col("n") - F.col("n_en") + F.lit(1)).cast("double")
            / (F.col("n") + F.lit(2)).cast("double")
        )
    ).alias("q0")
    per_doc = (
        occ.join(weights, "tok")
        .groupBy("doc_id")
        .agg(F.sum(F.col("n_occ") * F.col("w")).alias("s"))
    )
    return (
        lab.join(per_doc, "doc_id", "left")
        .crossJoin(F.broadcast(prior.select(q0)))
        .select(
            "doc_id",
            F.col("lang").alias("label"),
            (F.coalesce(F.col("s"), F.lit(0)) + F.col("q0")).cast("long").alias("logit_mnat"),
            F.when(
                F.coalesce(F.col("s"), F.lit(0)) + F.col("q0") >= 0, F.lit("en")
            ).otherwise(F.lit("other")).alias("pred"),
        )
    )


# ---------------------------------------------------------------------------
# dsir_select — hashed-ngram importance resampling (Gumbel top-k)
# ---------------------------------------------------------------------------

_DSIR_B = 256  # hashed unigram feature buckets
_DSIR_K = 100  # resample size
_DSIR_SEED = 97  # Gumbel hash marker
_P53 = 1 << 53


def q_dsir_select(spark: SparkSession, sf: str) -> DataFrame:
    """DSIR: select {_DSIR_K} documents by importance-weighted Gumbel top-k.

    Features: unigram tokens hashed into {_DSIR_B} buckets (portable md5
    family). Target distribution = English docs, raw = the whole corpus;
    bucket models use add-one smoothing. Per-doc importance log-weight
    logw = Σ_b n_b · [ln p_t(b) − ln p_s(b)] in millinats; the resample key
    adds a deterministic Gumbel draw g = −ln(−ln(u)) with u derived from a
    53-bit hash of the doc_id (exactly representable, so both engines see
    the same double). Top-k by (key DESC, doc_id) — the standard
    Gumbel-top-k equivalence to sampling without replacement ∝ exp(logw).
    """
    d = tbl(spark, sf, "documents")
    b = (
        d.select(
            "doc_id",
            (F.col("lang") == "en").alias("is_en"),
            F.explode(word_tokens(F.col("text"))).alias("tok"),
        )
        .select(
            "doc_id",
            "is_en",
            F.pmod(hash64(F.col("tok")), F.lit(_DSIR_B)).alias("bucket"),
        )
        .groupBy("doc_id", "is_en", "bucket")
        .agg(F.count(F.lit(1)).alias("n_b"))
        .transform(scoped_persist)
    )
    buckets = b.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_en"), F.col("n_b")).otherwise(F.lit(0))).alias("c_t"),
        F.sum("n_b").alias("c_s"),
    )
    tot = buckets.agg(F.sum("c_t").alias("t_t"), F.sum("c_s").alias("t_s"))
    lam = buckets.crossJoin(F.broadcast(tot)).select(
        "bucket",
        (
            _mnat_log(
                (F.col("c_t") + F.lit(1)).cast("double")
                / (F.col("t_t") + F.lit(_DSIR_B)).cast("double")
            )
            - _mnat_log(
                (F.col("c_s") + F.lit(1)).cast("double")
                / (F.col("t_s") + F.lit(_DSIR_B)).cast("double")
            )
        ).alias("lam"),
    )
    logw = (
        b.join(lam, "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("n_b") * F.col("lam")).alias("logw_mnat"))
    )
    u = (
        F.pmod(hash64(F.col("doc_id").cast("string"), seed=_DSIR_SEED), F.lit(_P53))
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(float(_P53))
    gumbel = F.round(F.lit(-1000.0) * F.log(-F.log(u))).cast("long")
    keyed = d.select("doc_id").join(logw, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("logw_mnat"), F.lit(0)).cast("long").alias("logw_mnat"),
        gumbel.alias("gumbel_mnat"),
    )
    return (
        keyed.select(
            "doc_id",
            "logw_mnat",
            "gumbel_mnat",
            (F.col("logw_mnat") + F.col("gumbel_mnat")).alias("key_mnat"),
        )
        .orderBy(F.col("key_mnat").desc(), "doc_id")
        .limit(_DSIR_K)
    )


QUERIES = {
    "text_perplexity": q_text_perplexity,
    "quality_classifier_nb": q_quality_classifier_nb,
    "dsir_select": q_dsir_select,
}

_DD_W = dd_word_tokens("text")

# millinat quantization twin
def _dd_mnat(num: str, den: str) -> str:
    return f"CAST(round(1000.0 * ln(({num}) * 1.0 / ({den}))) AS BIGINT)"


_DD_PPL = f"""
WITH wt AS (SELECT doc_id, {_DD_W} AS w FROM documents),
bg AS (
  SELECT doc_id,
         CASE WHEN i = 1 THEN '{_BOS}' ELSE w[i - 1] END AS w1,
         w[i] AS w2
  FROM (SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS i FROM wt) t
),
occ AS (SELECT doc_id, w1, w2, count(*) AS n_occ FROM bg GROUP BY 1, 2, 3),
c12 AS (SELECT w1, w2, sum(n_occ) AS c12 FROM occ GROUP BY 1, 2),
c1 AS (SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY 1),
v AS (SELECT count(DISTINCT w2) AS v FROM occ),
model AS (
  SELECT w1, w2, {_dd_mnat("c12 + 1", "c1 + (SELECT v FROM v)")} AS q
  FROM c12 JOIN c1 USING (w1)
),
per_doc AS (
  SELECT o.doc_id, sum(o.n_occ) AS n_bigrams, sum(o.n_occ * m.q) AS s
  FROM occ o JOIN model m USING (w1, w2) GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(coalesce(p.s, 0) AS BIGINT) AS sum_logprob_mnat,
       CASE WHEN coalesce(p.n_bigrams, 0) > 0
            THEN round(-p.s * 1.0 / p.n_bigrams, 6) END AS avg_nll_mnat
FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""

_DD_NB = f"""
WITH occ AS (
  SELECT doc_id, tok, count(*) AS n_occ
  FROM (SELECT doc_id, unnest({_DD_W}) AS tok FROM documents) t
  GROUP BY 1, 2
),
lab AS (SELECT doc_id, lang, lang = 'en' AS is_en FROM documents),
cls AS (
  SELECT tok,
         sum(CASE WHEN l.is_en THEN o.n_occ ELSE 0 END) AS c_en,
         sum(CASE WHEN l.is_en THEN 0 ELSE o.n_occ END) AS c_ot
  FROM occ o JOIN lab l USING (doc_id) GROUP BY tok
),
tot AS (SELECT sum(c_en) AS t_en, sum(c_ot) AS t_ot, count(*) AS v FROM cls),
prior AS (
  SELECT sum(CASE WHEN is_en THEN 1 ELSE 0 END) AS n_en, count(*) AS n FROM lab
),
wts AS (
  SELECT tok,
         {_dd_mnat("c_en + 1", "t_en + v")} - {_dd_mnat("c_ot + 1", "t_ot + v")} AS w
  FROM cls, tot
),
q0 AS (
  SELECT {_dd_mnat("n_en + 1", "n + 2")} - {_dd_mnat("n - n_en + 1", "n + 2")} AS q0
  FROM prior
),
per_doc AS (
  SELECT o.doc_id, sum(o.n_occ * w.w) AS s FROM occ o JOIN wts w USING (tok) GROUP BY 1
)
SELECT l.doc_id, l.lang AS label,
       CAST(coalesce(p.s, 0) + (SELECT q0 FROM q0) AS BIGINT) AS logit_mnat,
       CASE WHEN coalesce(p.s, 0) + (SELECT q0 FROM q0) >= 0
            THEN 'en' ELSE 'other' END AS pred
FROM lab l LEFT JOIN per_doc p USING (doc_id)
"""

_DD_DSIR = f"""
WITH b AS (
  SELECT doc_id, is_en, {dd_hash64("tok")} % {_DSIR_B} AS bucket, count(*) AS n_b
  FROM (SELECT doc_id, lang = 'en' AS is_en, unnest({_DD_W}) AS tok FROM documents) t
  GROUP BY 1, 2, 3
),
buckets AS (
  SELECT bucket,
         sum(CASE WHEN is_en THEN n_b ELSE 0 END) AS c_t,
         sum(n_b) AS c_s
  FROM b GROUP BY bucket
),
tot AS (SELECT sum(c_t) AS t_t, sum(c_s) AS t_s FROM buckets),
lam AS (
  SELECT bucket,
         {_dd_mnat(f"c_t + 1", f"t_t + {_DSIR_B}")}
         - {_dd_mnat(f"c_s + 1", f"t_s + {_DSIR_B}")} AS lam
  FROM buckets, tot
),
logw AS (
  SELECT b.doc_id, sum(b.n_b * l.lam) AS logw_mnat
  FROM b JOIN lam l USING (bucket) GROUP BY 1
),
keyed AS (
  SELECT d.doc_id,
         CAST(coalesce(w.logw_mnat, 0) AS BIGINT) AS logw_mnat,
         CAST(round(-1000.0 * ln(-ln(
           (({dd_hash64("CAST(d.doc_id AS VARCHAR)", seed=_DSIR_SEED)} % {_P53}) + 0.5)
           / {float(_P53)!r}
         ))) AS BIGINT) AS gumbel_mnat
  FROM documents d LEFT JOIN logw w USING (doc_id)
)
SELECT doc_id, logw_mnat, gumbel_mnat,
       logw_mnat + gumbel_mnat AS key_mnat
FROM keyed
ORDER BY key_mnat DESC, doc_id
LIMIT {_DSIR_K}
"""

ORACLES = {
    "text_perplexity": _DD_PPL,
    "quality_classifier_nb": _DD_NB,
    "dsir_select": _DD_DSIR,
}
