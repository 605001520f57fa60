"""ER-methodology queries: sorted-neighborhood blocking, blocking-quality
metrics, and Fellegi–Sunter weighted match scoring.

These are the evaluation/decision layer of a record-linkage system — the
reference stops at distances (its host-SQL queries filter and arg-min,
doc/Usage.md:101-189), but an engine run at corpus scale needs (a) a
skew-proof second blocking family, (b) a measured answer to "how good is my
blocking?", and (c) a principled match/possible/non-match decision rule on
top of the per-field comparisons.

* ``snm_pairs`` — sliding-window candidates over the c_name sort order
  (operators/snm.py; window 10).
* ``blocking_metrics_snm`` — reduction ratio / pairs completeness / pairs
  quality of those candidates against the exact dist<=1 gold edge set (the
  customer linkage track's edge rule, whose pigeonhole blocking is lossless,
  so the gold is exact, not sampled).
* ``fs_match_weights`` — Fellegi–Sunter log-likelihood weights over (name
  within edit distance 1, same nation, same market segment) on the segment-
  blocked candidate universe; weights are constants injected identically
  into both engines (operators/scoring.py:fellegi_sunter_weight).
* ``top_k_neighbors`` — the per-record match-candidates list (every record's
  k nearest names by capped edit distance within the blocked universe) —
  the all-records shape of the reference's closest-match query
  (doc/Usage.md:178-189), where ``top_k_matches`` covers the broadcast
  few-probes shape.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from levenshtein_spark.driver_queries import tbl
from levenshtein_spark.driver_queries.linkage import (
    _CUST_EDGES,
    _CUST_PAIRS,
    _customer_scored,
)
from levenshtein_spark.functions.distance import bounded_edit_dist
from levenshtein_spark.operators.pairs import attach_pair_payload, candidate_pairs
from levenshtein_spark.operators.scoring import edges as edges_of
from levenshtein_spark.operators.scoring import fellegi_sunter_weight, fs_classify
from levenshtein_spark.operators.snm import sorted_neighborhood_pairs

_SNM_WINDOW = 10

# Fellegi–Sunter model: (field, m = P(agree | match), u = P(agree | unmatch)).
# u for the categorical fields ~ 1/cardinality (25 nations, 5 segments).
_FS_NAME = (0.95, 0.002)
_FS_NATION = (0.95, 0.04)
_FS_SEGMENT = (0.8, 0.2)
_FS_UPPER = 8.0
_FS_LOWER = 0.0


def _weights() -> dict[str, float]:
    import math

    out = {}
    for name, (m, u) in (("name", _FS_NAME), ("nation", _FS_NATION), ("seg", _FS_SEGMENT)):
        out[f"{name}_a"] = round(math.log2(m / u), 6)
        out[f"{name}_d"] = round(math.log2((1 - m) / (1 - u)), 6)
    return out


def q_snm_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Sorted-neighborhood candidates: (earlier id, later id, position gap)."""
    c = tbl(spark, sf, "customer").select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("skey")
    )
    return sorted_neighborhood_pairs(c, ["skey", "id"], window=_SNM_WINDOW).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.col("gap").cast("long").alias("gap"),
    )


def q_blocking_metrics_snm(spark: SparkSession, sf: str) -> DataFrame:
    """One-row blocking scorecard for single-pass SNM vs exact gold.

    reduction_ratio  = 1 - candidates / all_pairs
    pairs_completeness = covered_gold / gold        (blocking recall)
    pairs_quality      = covered_gold / candidates  (blocking precision)
    """
    cand = q_snm_pairs(spark, sf).select(
        F.least("id_a", "id_b").alias("src"), F.greatest("id_a", "id_b").alias("dst")
    )
    return _snm_scorecard(spark, sf, cand)


def q_blocking_metrics_snm_multipass(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-pass SNM scorecard: union of two sort orders (name, reversed
    name) — the classic mitigation for single-pass SNM's blind spot (a match
    whose sort keys diverge early sorts far apart; a second pass over a
    different key ordering catches most of them). Candidate volume ~doubles;
    pairs completeness rises much faster (measured by this query vs
    ``blocking_metrics_snm``)."""
    c = tbl(spark, sf, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("skey"),
        F.reverse(F.col("c_name")).alias("rkey"),
    )
    p1 = sorted_neighborhood_pairs(c, ["skey", "id"], window=_SNM_WINDOW)
    p2 = sorted_neighborhood_pairs(c, ["rkey", "id"], window=_SNM_WINDOW)
    cand = (
        p1.unionByName(p2)
        .select(F.least("id_a", "id_b").alias("src"), F.greatest("id_a", "id_b").alias("dst"))
        .distinct()
    )
    return _snm_scorecard(spark, sf, cand)


def _snm_scorecard(spark: SparkSession, sf: str, cand: DataFrame) -> DataFrame:
    gold = edges_of(_customer_scored(spark, sf)).select(
        F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst")
    )
    n_records = tbl(spark, sf, "customer").count()
    agg = (
        cand.withColumn("is_cand", F.lit(True))
        .join(gold.withColumn("is_gold", F.lit(True)), ["src", "dst"], "full_outer")
        .agg(
            F.count(F.lit(1)).alias("n_union"),
            F.sum(F.when(F.col("is_cand"), 1).otherwise(0)).alias("n_candidates"),
            F.sum(F.when(F.col("is_gold"), 1).otherwise(0)).alias("n_gold"),
            F.sum(F.when(F.col("is_cand") & F.col("is_gold"), 1).otherwise(0)).alias(
                "n_covered"
            ),
        )
    )
    total_pairs = n_records * (n_records - 1) // 2
    return agg.select(
        F.lit(n_records).cast("long").alias("n_records"),
        F.col("n_candidates").cast("long").alias("n_candidates"),
        F.col("n_gold").cast("long").alias("n_gold"),
        F.col("n_covered").cast("long").alias("n_covered"),
        F.round(
            F.lit(1.0) - F.col("n_candidates") / F.lit(float(total_pairs)), 6
        ).alias("reduction_ratio"),
        F.round(F.col("n_covered") / F.col("n_gold"), 6).alias("pairs_completeness"),
        F.round(F.col("n_covered") / F.col("n_candidates"), 6).alias("pairs_quality"),
    )


def q_fs_match_weights(spark: SparkSession, sf: str) -> DataFrame:
    """Fellegi–Sunter weighted scoring over the segment-blocked candidates."""
    from levenshtein_spark.driver_queries.linkage import _customer_blocks

    c = tbl(spark, sf, "customer")
    records = c.select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("seg"),
    )
    blocks = _customer_blocks(spark, sf)
    pairs = candidate_pairs(blocks, hot_threshold=500, num_salts=8).drop("n_keys")
    fat = attach_pair_payload(pairs, records, ["name", "nation", "seg"])
    name_agree = bounded_edit_dist("name_a", "name_b", 1) <= 1
    nation_agree = F.col("nation_a") == F.col("nation_b")
    seg_agree = F.col("seg_a") == F.col("seg_b")
    scored = fat.select(
        "id_a",
        "id_b",
        name_agree.alias("name_agree"),
        nation_agree.alias("nation_agree"),
        seg_agree.alias("seg_agree"),
    )
    weight = fellegi_sunter_weight(
        [
            (F.col("name_agree"), *_FS_NAME),
            (F.col("nation_agree"), *_FS_NATION),
            (F.col("seg_agree"), *_FS_SEGMENT),
        ]
    )
    return scored.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "name_agree",
        "nation_agree",
        "seg_agree",
        F.round(weight, 6).alias("weight"),
        fs_classify(weight, _FS_UPPER, _FS_LOWER).alias("match_class"),
    )


_NBR_CAP = 2
_NBR_TOP = 3


def q_top_k_neighbors(spark: SparkSession, sf: str) -> DataFrame:
    """Each record's 3 nearest neighbor names (Levenshtein <= 2) within the
    segment-blocked candidate universe.

    The scalable all-records complement to ``operators.closest.top_k_matches``
    (which broadcasts a small probe set): candidates come from the salted
    slim-pair operator, each unordered pair is scored once, then mirrored
    into both per-record adjacency directions — so the window rank sorts a
    per-record neighbor list bounded by the blocking fan-out, never a
    cross-join. Spark compiles the rank filter to WindowGroupLimit (top-k
    pushed below the sort; asserted in tests/test_plans.py).
    """
    from levenshtein_spark.driver_queries.linkage import _customer_blocks

    records = tbl(spark, sf, "customer").select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("name")
    )
    # persisted: blocks feed the pair operator four ways (census + hot split
    # + both join sides); scored feeds BOTH branches of the symmetrizing
    # union — without it the salted join and the Arrow scoring run twice
    blocks = _customer_blocks(spark, sf).persist()
    pairs = candidate_pairs(blocks, hot_threshold=500, num_salts=8).drop("n_keys")
    fat = attach_pair_payload(pairs, records, ["name"])
    scored = (
        fat.select(
            "id_a", "id_b", bounded_edit_dist("name_a", "name_b", _NBR_CAP).alias("d")
        )
        .where(F.col("d") <= _NBR_CAP)
        .persist()
    )
    sym = scored.select(
        F.col("id_a").alias("id"), F.col("id_b").alias("nbr"), "d"
    ).unionByName(scored.select(F.col("id_b").alias("id"), F.col("id_a").alias("nbr"), "d"))
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy(F.col("d").asc(), F.col("nbr").asc())
    return (
        sym.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _NBR_TOP)
        .select(
            F.col("id").cast("long").alias("id"),
            F.col("nbr").cast("long").alias("nbr"),
            F.col("d").cast("long").alias("d"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


QUERIES = {
    "snm_pairs": q_snm_pairs,
    "blocking_metrics_snm": q_blocking_metrics_snm,
    "blocking_metrics_snm_multipass": q_blocking_metrics_snm_multipass,
    "fs_match_weights": q_fs_match_weights,
    "top_k_neighbors": q_top_k_neighbors,
}


# -- DuckDB twins -------------------------------------------------------------
_SNM_RANKED = """
SELECT c_custkey AS id, row_number() OVER (ORDER BY c_name, c_custkey) - 1 AS pos
FROM customer
"""

_SNM_PAIRS = f"""
SELECT l.id AS id_a, r.id AS id_b, CAST(r.pos - l.pos AS BIGINT) AS gap
FROM ({_SNM_RANKED}) l JOIN ({_SNM_RANKED}) r
  ON r.pos - l.pos BETWEEN 1 AND {_SNM_WINDOW - 1}
"""


def _fs_sql() -> str:
    w = _weights()
    # the same double constants the Spark plan carries, repr-injected so the
    # summed doubles are bit-identical across engines
    name_t = f"CASE WHEN name_agree THEN {w['name_a']!r} ELSE {w['name_d']!r} END"
    nation_t = f"CASE WHEN nation_agree THEN {w['nation_a']!r} ELSE {w['nation_d']!r} END"
    seg_t = f"CASE WHEN seg_agree THEN {w['seg_a']!r} ELSE {w['seg_d']!r} END"
    weight = f"(({name_t}) + ({nation_t})) + ({seg_t})"
    return f"""
WITH segs AS (
  SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
         substr(c_name, 10, 3) AS s1, substr(c_name, 13, 3) AS s2,
         substr(c_name, 16, 3) AS s3
  FROM customer
),
cand AS (
  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
         a.c_name AS name_a, b.c_name AS name_b,
         a.c_nationkey AS nation_a, b.c_nationkey AS nation_b,
         a.c_mktsegment AS seg_a, b.c_mktsegment AS seg_b
  FROM segs a JOIN segs b
    ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
   AND ((a.s1 = b.s1 AND a.s2 = b.s2) OR (a.s1 = b.s1 AND a.s3 = b.s3)
        OR (a.s2 = b.s2 AND a.s3 = b.s3))
),
agreed AS (
  SELECT id_a, id_b,
         (levenshtein(name_a, name_b) <= 1) AS name_agree,
         (nation_a = nation_b) AS nation_agree,
         (seg_a = seg_b) AS seg_agree
  FROM cand
)
SELECT id_a, id_b, name_agree, nation_agree, seg_agree,
       round({weight}, 6) AS weight,
       CASE WHEN {weight} >= {_FS_UPPER!r} THEN 'match'
            WHEN {weight} < {_FS_LOWER!r} THEN 'non_match'
            ELSE 'possible' END AS match_class
FROM agreed
"""


_SNM_RANKED_REV = """
SELECT c_custkey AS id, row_number() OVER (ORDER BY reverse(c_name), c_custkey) - 1 AS pos
FROM customer
"""

_SNM_PAIRS_REV = f"""
SELECT l.id AS id_a, r.id AS id_b, CAST(r.pos - l.pos AS BIGINT) AS gap
FROM ({_SNM_RANKED_REV}) l JOIN ({_SNM_RANKED_REV}) r
  ON r.pos - l.pos BETWEEN 1 AND {_SNM_WINDOW - 1}
"""


def _scorecard_sql(cand_sql: str) -> str:
    return f"""
WITH cand AS ({cand_sql}),
gold AS (
  SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst FROM ({_CUST_EDGES})
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_records FROM customer),
covered AS (
  SELECT count(*) AS n FROM cand c JOIN gold g ON c.src = g.src AND c.dst = g.dst
),
m AS (
  SELECT CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_candidates,
         CAST((SELECT count(*) FROM gold) AS BIGINT) AS n_gold,
         CAST((SELECT n FROM covered) AS BIGINT) AS n_covered
)
SELECT n.n_records, m.n_candidates, m.n_gold, m.n_covered,
       round(1.0 - m.n_candidates / (CAST(n.n_records AS DOUBLE) * (n.n_records - 1) / 2), 6)
         AS reduction_ratio,
       round(CAST(m.n_covered AS DOUBLE) / m.n_gold, 6) AS pairs_completeness,
       round(CAST(m.n_covered AS DOUBLE) / m.n_candidates, 6) AS pairs_quality
FROM n, m
"""


# capped at {_NBR_CAP}: kept rows have true levenshtein <= cap, so the
# reference bounded convention (exceeded -> k_eff+1) never shows in the output
_TOP_K_NEIGHBORS = f"""
WITH scored AS (
  SELECT id_a, id_b, CAST(levenshtein(name_a, name_b) AS BIGINT) AS d
  FROM ({_CUST_PAIRS}) p
  WHERE levenshtein(name_a, name_b) <= {_NBR_CAP}
),
sym AS (
  SELECT id_a AS id, id_b AS nbr, d FROM scored
  UNION ALL
  SELECT id_b AS id, id_a AS nbr, d FROM scored
),
ranked AS (
  SELECT id, nbr, d, row_number() OVER (PARTITION BY id ORDER BY d, nbr) AS rank
  FROM sym
)
SELECT CAST(id AS BIGINT) AS id, CAST(nbr AS BIGINT) AS nbr, d,
       CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {_NBR_TOP}
"""

ORACLES = {
    "snm_pairs": _SNM_PAIRS,
    "blocking_metrics_snm": _scorecard_sql(
        f"SELECT least(id_a, id_b) AS src, greatest(id_a, id_b) AS dst FROM ({_SNM_PAIRS})"
    ),
    "blocking_metrics_snm_multipass": _scorecard_sql(
        f"""SELECT DISTINCT least(id_a, id_b) AS src, greatest(id_a, id_b) AS dst
FROM (SELECT id_a, id_b FROM ({_SNM_PAIRS}) UNION ALL SELECT id_a, id_b FROM ({_SNM_PAIRS_REV})) u"""
    ),
    "fs_match_weights": _fs_sql(),
    "top_k_neighbors": _TOP_K_NEIGHBORS,
}
