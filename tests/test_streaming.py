"""Structured Streaming operators: exact dedup + stream-static fuzzy link."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from levenshtein_spark.streaming import stream_exact_dedup, stream_fuzzy_link



# Heavy module (multi-second Spark jobs / hypothesis sweeps): excluded
# from the fast gate `pytest -m "not slow"` (README: Testing).
pytestmark = pytest.mark.slow

@pytest.fixture
def stream_dir(spark, tmp_path):
    rows = [
        (1, "2024-01-01 00:00:00", "n1", "hello world"),
        (2, "2024-01-01 00:00:10", "n1", "hello world"),   # exact dupe of 1
        (3, "2024-01-01 00:00:20", "n1", "hello wxrld"),   # near-dupe
        (4, "2024-01-01 00:00:30", "n2", "completely different"),
        (5, "2024-01-01 00:00:40", "n2", "hello world"),   # same text, other block
    ]
    df = spark.createDataFrame(rows, "id long, ts_s string, block string, content string")
    df = df.withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    src = str(tmp_path / "src")
    df.coalesce(1).write.parquet(src)
    return src


def _run_to_memory(sdf, name):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_stream_exact_dedup(spark, stream_dir):
    stream = spark.readStream.schema(
        "id long, block string, content string, ts timestamp"
    ).parquet(stream_dir)
    out = stream_exact_dedup(stream, "content", "ts")
    _run_to_memory(out, "dedup_out")
    rows = spark.sql("select * from dedup_out").collect()
    # three distinct contents -> three survivors
    assert len(rows) == 3
    assert {r.sha is not None for r in rows} == {True}


def test_stream_fuzzy_link(spark, stream_dir):
    reference = spark.createDataFrame(
        [("n1", "hello world"), ("n2", "hxllo world")],
        "block string, content string",
    ).withColumnRenamed("content", "text_ref")
    # reference uses the same column name as the stream's text col
    reference = reference.select("block", F.col("text_ref").alias("content"))

    stream = spark.readStream.schema(
        "id long, block string, content string, ts timestamp"
    ).parquet(stream_dir)
    out = stream_fuzzy_link(stream, reference, key_col="block", text_col="content", k=2)
    _run_to_memory(out, "link_out")
    got = {(r.id, r.ref_content, r.dist) for r in spark.sql("select * from link_out").collect()}
    # id 3 'hello wxrld' matches n1 reference 'hello world' at distance 1;
    # id 5 'hello world' matches n2 reference 'hxllo world' at distance 1;
    # exact-equal pairs are filtered (they are the sha short-circuit's job)
    assert got == {(3, "hello world", 1), (5, "hxllo world", 1)}


def test_stream_incremental_link(spark, tmp_path):
    """applyInPandasWithState fuzzy dedup: arrivals link to EARLIER records
    of their block, across micro-batches (maxFilesPerTrigger=1 splits the
    availableNow run into one batch per file, exercising state carry-over)."""
    from levenshtein_spark.streaming import stream_incremental_link

    src = tmp_path / "inc"
    src.mkdir()
    b1 = spark.createDataFrame(
        [(1, "n1", "hello world"), (2, "n1", "hello wxrld"), (3, "n2", "other text")],
        "id long, block string, content string",
    )
    b2 = spark.createDataFrame(
        [(4, "n1", "hello world!"), (5, "n2", "other textz")],
        "id long, block string, content string",
    )
    b1.coalesce(1).write.parquet(str(src / "f1"))
    b2.coalesce(1).write.parquet(str(src / "f2"))

    stream = (
        spark.readStream.schema("id long, block string, content string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    # state_timeout_ms=None: with a pending processing-time timer an
    # availableNow query schedules empty batches forever and never
    # terminates (this await used to burn its full 120s silently)
    out = stream_incremental_link(
        stream, key_col="block", id_col="id", text_col="content", k=2,
        state_timeout_ms=None,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("inc_link")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "availableNow run must self-terminate"
    got = {
        (r.id, r.match_id, r.dist)
        for r in spark.sql("select * from inc_link").collect()
    }
    # id2 ~ id1 (dist 1, same batch); id4 ~ id1 (1) and ~ id2 (2, across
    # batches); id5 ~ id3 (1, across batches)
    assert got == {(2, 1, 1), (4, 1, 1), (4, 2, 2), (5, 3, 1)}


def test_windowed_counts_watermark_boundary_emits_on_equality(spark, tmp_path):
    """Append-mode flush rule the streaming_windowed_counts oracle encodes:
    with availableNow, the final watermark is max(ts) - delay and a window
    whose END EQUALS the watermark IS emitted (<=, not <)."""
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 30)),   # window [00:00, 01:00)
        (2, dt.datetime(2024, 1, 1, 1, 30)),   # window [01:00, 02:00)
        (3, dt.datetime(2024, 1, 1, 2, 0)),    # max ts -> watermark 01:00
    ]
    src = str(tmp_path / "wb")
    spark.createDataFrame(rows, "event_id long, ts timestamp_ntz").coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema("event_id long, ts timestamp_ntz")
        .format("parquet").load(src)
    )
    agg = (
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .count()
    )
    q = (
        agg.select(F.date_format("w.end", "HH:mm").alias("we"), "count")
        .writeStream.format("memory").queryName("wb_sink")
        .outputMode("append").trigger(availableNow=True).start()
    )
    assert q.awaitTermination(120)
    # the [00:00,01:00) window (end == watermark) flushes; [01:00,02:00) and
    # the watermark-holding row's own window stay in state
    assert sorted(r["we"] for r in spark.table("wb_sink").collect()) == ["01:00"]


def test_stream_ingest_exactly_once_across_restarts(spark, tmp_path):
    """File-source checkpoint semantics the ingest front door relies on:
    a restart re-processes nothing, new files land incrementally."""
    from levenshtein_spark.streaming.ingest import run_ingest

    src, dest, ckpt = (str(tmp_path / d) for d in ("src", "dest", "ckpt"))
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    batch1 = [(i, f"first wave doc {i} with several words", "en", "s", 30) for i in range(8)]
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode("append").parquet(src)

    sch = spark.read.parquet(src).schema
    run_ingest(spark, src, dest, ckpt, sch, timeout_sec=120)
    assert spark.read.parquet(dest).count() == 8

    # restart with no new data: nothing re-processed, no duplicates
    run_ingest(spark, src, dest, ckpt, sch, timeout_sec=120)
    assert spark.read.parquet(dest).count() == 8

    # a new file lands: exactly its rows appended
    batch2 = [(100 + i, f"second wave doc {i}", "en", "s", 18) for i in range(3)]
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode("append").parquet(src)
    run_ingest(spark, src, dest, ckpt, sch, timeout_sec=120)
    out = spark.read.parquet(dest)
    assert out.count() == 11
    # the ingest projection landed its curation columns
    assert {"fp", "n_tokens", "quality"} <= set(out.columns)
    assert out.where("doc_id = 100").select("n_tokens").collect()[0][0] == 4
