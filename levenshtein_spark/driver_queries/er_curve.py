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
