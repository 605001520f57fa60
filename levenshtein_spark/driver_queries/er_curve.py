"""Fellegi–Sunter threshold sweep — the precision/recall CURVE.

``fs_match_weights`` scores the blocked candidate universe and
``linkage_clerical_queue`` ranks the ambiguous band, but the question both
leave open is the one every FS deployment must answer: WHERE do the upper
and lower cutoffs go? (Fellegi & Sunter 1969 derive them from target error
rates — which requires exactly this sweep of error rates as a function of
the decision threshold; Newcombe's original record-linkage programs tabled
the same curve by hand.)

``fs_threshold_curve`` emits one row per DISTINCT composite weight: the
scorecard of the decision rule "link iff weight >= threshold", evaluated
against the independently-generated gold edge set (the Ed-Join lossless
generator + brute-force-verified rule of ``linkage_f1`` — NOT the
pipeline's own blocking, so blocking loss shows up honestly as a recall
ceiling). Reading the curve: the top row is the strictest operating point;
walking down trades precision for recall; the bottom row's recall is the
candidate universe's pairs-completeness — the blocking ceiling no
threshold can exceed.

Scale shape: one groupBy on the quantized weight (cardinality <= 2^F for F
binary agreement fields — 8 here, INDEPENDENT of corpus size), then a
cumulative window over those <= 2^F rows. The only corpus-sized work is
the candidate scoring itself (salted slim pairs + Arrow kernel, shared
with ``fs_match_weights``) and one broadcast-sized left join against gold.
The unpartitioned window is safe by the same cardinality argument the FS
pattern-table queries rely on (``fs_em_weights``): its input is a
model-sized aggregate, never the pair stream.

Cross-engine determinism: weights are sums of repr-injected doubles
rounded to 6 (bit-identical across engines — the ``fs_match_weights``
hash-green precedent), used only for grouping and ordering; every count is
an exact integer; the final ratios are single correctly-rounded divides.

Reference tie-in: doc/Usage.md's matching queries hard-code one cutoff per
query; this operator is the principled version of choosing that constant.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window


def q_fs_threshold_curve(spark: SparkSession, sf: str) -> DataFrame:
    from levenshtein_spark.driver_queries.er_eval import _gold_edges, q_fs_match_weights

    scored = q_fs_match_weights(spark, sf).select("id_a", "id_b", "weight")
    gold = _gold_edges(spark, sf).select(
        F.col("src").alias("id_a"), F.col("dst").alias("id_b"), F.lit(True).alias("is_gold")
    )
    lab = scored.join(gold, ["id_a", "id_b"], "left")
    grp = lab.groupBy("weight").agg(
        F.count(F.lit(1)).alias("n_w"),
        F.sum(F.when(F.col("is_gold"), 1).otherwise(0)).alias("tp_w"),
    )
    n_gold = gold.agg(F.count(F.lit(1)).alias("n_gold"))
    w = Window.orderBy(F.col("weight").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = grp.select(
        F.col("weight").alias("threshold"),
        F.sum("n_w").over(w).alias("n_pred"),
        F.sum("tp_w").over(w).alias("tp"),
    ).crossJoin(F.broadcast(n_gold))
    n_pred, tp, ng = F.col("n_pred"), F.col("tp"), F.col("n_gold")
    return cum.select(
        "threshold",
        n_pred.cast("long").alias("n_pred"),
        tp.cast("long").alias("tp"),
        (n_pred - tp).cast("long").alias("fp"),
        (ng - tp).cast("long").alias("fn"),
        ng.cast("long").alias("n_gold"),
        F.round(tp.cast("double") / n_pred, 6).alias("precision"),
        F.round(tp.cast("double") / ng, 6).alias("recall"),
        F.round(F.lit(2.0) * tp / (n_pred + ng), 6).alias("f1"),
    )


QUERIES = {"fs_threshold_curve": q_fs_threshold_curve}


def _curve_sql() -> str:
    from levenshtein_spark.driver_queries.er_eval import _GOLD_EDGES_SQL, _fs_sql

    return f"""
WITH fsq AS ({_fs_sql()}),
gold AS ({_GOLD_EDGES_SQL}),
lab AS (
  SELECT f.weight, g.src IS NOT NULL AS is_gold
  FROM fsq f LEFT JOIN gold g ON f.id_a = g.src AND f.id_b = g.dst
),
grp AS (
  SELECT weight, count(*) AS n_w,
         sum(CASE WHEN is_gold THEN 1 ELSE 0 END) AS tp_w
  FROM lab GROUP BY weight
),
ng AS (SELECT count(*) AS n_gold FROM gold),
cum AS (
  SELECT weight AS threshold,
         sum(n_w) OVER (ORDER BY weight DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_pred,
         sum(tp_w) OVER (ORDER BY weight DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp
  FROM grp
)
SELECT threshold,
       CAST(n_pred AS BIGINT) AS n_pred,
       CAST(tp AS BIGINT) AS tp,
       CAST(n_pred - tp AS BIGINT) AS fp,
       CAST(n_gold - tp AS BIGINT) AS fn,
       CAST(n_gold AS BIGINT) AS n_gold,
       round(CAST(tp AS DOUBLE) / n_pred, 6) AS "precision",
       round(CAST(tp AS DOUBLE) / n_gold, 6) AS recall,
       round(2.0 * tp / (n_pred + n_gold), 6) AS f1
FROM cum, ng
"""


ORACLES = {"fs_threshold_curve": _curve_sql()}


_SNM_CURVE_MAX = 20  # largest window the sweep evaluates


def q_blocking_window_curve(spark: SparkSession, sf: str) -> DataFrame:
    """The blocking-parameter selection curve: SNM window size → candidate
    volume vs recall, one row per window w in [2, 20].

    ``blocking_metrics_snm`` scores ONE window (the pipeline's w=10);
    the question it leaves open mirrors the FS threshold one: WHERE should
    the window size go? (Hernández & Stolfo, SIGMOD'95 §5 tune exactly
    this trade-off — window size vs accuracy vs pass count.) Sweeping gaps
    once answers it for every window simultaneously: a pair at sort-order
    gap g is a candidate for every window w > g, so the per-gap census's
    cumulative sum IS the per-window scorecard — one O(N·w_max) pair
    generation, not one per window.

    Columns per row: the window, its candidate count, gold hits (vs the
    independent Ed-Join gold edges, brute-force-verified in the twin),
    pairs completeness (recall), pairs quality (precision), and reduction
    ratio 1 − |cand| / C(N,2). Reading it: completeness climbs with w and
    saturates at the sort-key ceiling (name-typo matches whose sort keys
    diverge in the first character never enter any window — the motivation
    for multi-pass SNM, measured in ``blocking_metrics_snm_multipass``);
    reduction ratio decays linearly — the knee picks w.

    Scale shape: identical to ``snm_pairs`` (range-exchange rank + bucket
    equi-join, O(N·w_max) slim pairs), one broadcast-sized gold join, a
    ≤ w_max−1-row cumulative window — model-sized, like the FS curve.
    Determinism: counts are integers; ratios are single correctly-rounded
    divides; C(N,2) is exact in a double far below 2^53.
    """
    from levenshtein_spark.driver_queries import tbl
    from levenshtein_spark.driver_queries.er_eval import _gold_edges
    from levenshtein_spark.operators.snm import sorted_neighborhood_pairs

    c = tbl(spark, sf, "customer").select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("skey")
    )
    pairs = sorted_neighborhood_pairs(c, ["skey", "id"], window=_SNM_CURVE_MAX).select(
        F.least("id_a", "id_b").cast("long").alias("src"),
        F.greatest("id_a", "id_b").cast("long").alias("dst"),
        F.col("gap").cast("long").alias("gap"),
    )
    from levenshtein_spark.session import scoped_persist

    # persisted: gold feeds BOTH the candidate left-join and the n_gold
    # total — unpersisted, the Ed-Join gold generator would run twice
    gold = (
        _gold_edges(spark, sf)
        .withColumn("is_gold", F.lit(True))
        .transform(scoped_persist)
    )
    lab = pairs.join(gold, ["src", "dst"], "left")
    grp = lab.groupBy("gap").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum(F.when(F.col("is_gold"), 1).otherwise(0)).alias("tp_g"),
    )
    totals = gold.agg(F.count(F.lit(1)).cast("long").alias("n_gold")).crossJoin(
        c.agg(F.count(F.lit(1)).cast("long").alias("n_rec"))
    )
    w = Window.orderBy("gap").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = grp.select(
        (F.col("gap") + 1).cast("long").alias("window"),
        F.sum("n_g").over(w).alias("n_candidates"),
        F.sum("tp_g").over(w).alias("tp"),
    ).crossJoin(F.broadcast(totals))
    n_cand, tp, ng = F.col("n_candidates"), F.col("tp"), F.col("n_gold")
    npairs = F.col("n_rec").cast("double") * (F.col("n_rec").cast("double") - F.lit(1.0)) / F.lit(2.0)
    return cum.select(
        "window",
        n_cand.cast("long").alias("n_candidates"),
        tp.cast("long").alias("tp"),
        ng.alias("n_gold"),
        F.round(tp.cast("double") / ng, 6).alias("pairs_completeness"),
        F.round(tp.cast("double") / n_cand, 6).alias("pairs_quality"),
        F.round(F.lit(1.0) - n_cand.cast("double") / npairs, 6).alias("reduction_ratio"),
    )


QUERIES["blocking_window_curve"] = q_blocking_window_curve


def _window_curve_sql() -> str:
    from levenshtein_spark.driver_queries.er_eval import _GOLD_EDGES_SQL, _SNM_RANKED

    return f"""
WITH ranked AS ({_SNM_RANKED}),
pairs AS (
  SELECT least(l.id, r.id) AS src, greatest(l.id, r.id) AS dst,
         CAST(r.pos - l.pos AS BIGINT) AS gap
  FROM ranked l JOIN ranked r ON r.pos - l.pos BETWEEN 1 AND {_SNM_CURVE_MAX - 1}
),
gold AS ({_GOLD_EDGES_SQL}),
lab AS (
  SELECT p.gap, g.src IS NOT NULL AS is_gold
  FROM pairs p LEFT JOIN gold g ON p.src = g.src AND p.dst = g.dst
),
grp AS (
  SELECT gap, count(*) AS n_g,
         sum(CASE WHEN is_gold THEN 1 ELSE 0 END) AS tp_g
  FROM lab GROUP BY gap
),
totals AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM gold) AS n_gold,
         (SELECT CAST(count(*) AS BIGINT) FROM customer) AS n_rec
),
cum AS (
  SELECT CAST(gap + 1 AS BIGINT) AS "window",
         sum(n_g) OVER (ORDER BY gap
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_candidates,
         sum(tp_g) OVER (ORDER BY gap
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp
  FROM grp
)
SELECT "window",
       CAST(n_candidates AS BIGINT) AS n_candidates,
       CAST(tp AS BIGINT) AS tp,
       n_gold,
       round(CAST(tp AS DOUBLE) / n_gold, 6) AS pairs_completeness,
       round(CAST(tp AS DOUBLE) / n_candidates, 6) AS pairs_quality,
       round(1.0 - CAST(n_candidates AS DOUBLE)
             / (CAST(n_rec AS DOUBLE) * (CAST(n_rec AS DOUBLE) - 1.0) / 2.0), 6) AS reduction_ratio
FROM cum, totals
"""


ORACLES["blocking_window_curve"] = _window_curve_sql()
