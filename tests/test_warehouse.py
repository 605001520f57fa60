"""Warehouse bucketed tables: round-trip + the shuffle-elimination payoff.

Bucketing is the engine's co-located-join tool: the pair stream and the
per-id record table written bucketed on the join key make payload
re-attachment (operators/pairs.attach_pair_payload) shuffle-free on the
bucketed sides — at web scale that removes the widest exchanges of the
scoring stage. The test asserts the physical plan, not just the results:
joining two bucketed tables on the bucket key must plan strictly fewer
Exchange nodes than the same join over plain parquet.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from levenshtein_spark.sources.tables import Warehouse


def _n_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")


def test_bucketed_roundtrip_and_colocated_join(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path))
    records = spark.range(0, 2000).select(
        F.col("id"), F.md5(F.col("id").cast("string")).alias("payload")
    )
    pairs = spark.range(0, 4000).select(
        (F.col("id") % 2000).alias("id"), (F.col("id") % 97).alias("other")
    )

    wh.write_bucketed(records, "t_rec_b", ["id"], num_buckets=8)
    wh.write_bucketed(pairs, "t_pair_b", ["id"], num_buckets=8)
    wh.write(records, "t_rec_p")
    wh.write(pairs, "t_pair_p")

    # round-trip: bucketed read returns exactly the written rows
    got = {(r.id, r.payload) for r in wh.read_bucketed("t_rec_b").collect()}
    exp = {(r.id, r.payload) for r in records.collect()}
    assert got == exp

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j_plain = wh.read("t_pair_p").join(wh.read("t_rec_p"), "id")
        j_bucket = wh.read_bucketed("t_pair_b").join(wh.read_bucketed("t_rec_b"), "id")
        assert j_bucket.count() == j_plain.count() == 4000
        n_plain, n_bucket = _n_exchanges(j_plain), _n_exchanges(j_bucket)
        # both sides bucketed on the join key: the join itself needs NO
        # exchange; the plain-parquet join shuffles both sides
        assert n_plain >= 2, f"control join should shuffle, saw {n_plain}"
        assert n_bucket == 0, f"bucketed join must be shuffle-free, saw {n_bucket}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))

    # bucketed aggregation on the bucket key also skips its exchange
    agg_bucket = wh.read_bucketed("t_pair_b").groupBy("id").count()
    assert _n_exchanges(agg_bucket) == 0
    assert agg_bucket.count() == 2000
