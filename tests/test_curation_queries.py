"""Pins for the per-query curation operators that have invariants beyond
the driver's oracle parity: sliding-window chunking (coverage / overlap /
reconstruction over adversarial token counts) and the stratified sample
(exact k per stratum, determinism)."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F

from levenshtein_spark.driver_queries.curation import (
    _CHUNK_S,
    _CHUNK_W,
    _STRAT_K,
    chunk_tokens,
    q_sample_stratified,
)

SF = "/root/testdata/sf0.001"


def _mk_docs(spark, token_counts):
    rows = [
        (i, " ".join(f"t{i}x{j}" for j in range(n)))
        for i, n in enumerate(token_counts)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


# token counts straddling every boundary of the chunk formula:
# empty, single, W-1, W, W+1, exactly-two-chunks (W+S), W+S+1, long tail
_EDGE_COUNTS = [0, 1, _CHUNK_W - 1, _CHUNK_W, _CHUNK_W + 1,
                _CHUNK_W + _CHUNK_S, _CHUNK_W + _CHUNK_S + 1, 200]


def test_chunk_coverage_and_overlap(spark):
    d = _mk_docs(spark, _EDGE_COUNTS)
    out = chunk_tokens(d).orderBy("doc_id", "chunk_idx").collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, n in enumerate(_EDGE_COUNTS):
        chunks = by_doc[doc_id]
        # contiguous indices from 0
        assert [c.chunk_idx for c in chunks] == list(range(len(chunks)))
        if n <= _CHUNK_W:
            assert len(chunks) == 1 and chunks[0].n_tokens == n
        else:
            # every chunk but the last is full width
            assert all(c.n_tokens == _CHUNK_W for c in chunks[:-1])
            # the last chunk reaches exactly the end of the token stream
            last = chunks[-1]
            assert last.chunk_idx * _CHUNK_S + last.n_tokens == n
            # and is never empty (the formula never emits a chunk past the end)
            assert last.n_tokens > 0


def test_chunk_content_reconstruction(spark):
    """De-overlapping the chunks reassembles the original token stream —
    checked via md5 parity with a Python-side replica of the windows."""
    n = 200
    d = _mk_docs(spark, [n])
    toks = [f"t0x{j}" for j in range(n)]
    out = {r.chunk_idx: r.chunk_md5 for r in chunk_tokens(d).collect()}
    i = 0
    while True:
        window = toks[i * _CHUNK_S : i * _CHUNK_S + _CHUNK_W]
        expect = hashlib.md5(" ".join(window).encode()).hexdigest()
        assert out[i] == expect
        if i * _CHUNK_S + _CHUNK_W >= n:
            break
        i += 1
    assert len(out) == i + 1


def test_chunk_empty_doc_single_empty_chunk(spark):
    out = chunk_tokens(_mk_docs(spark, [0])).collect()
    assert len(out) == 1
    assert out[0].n_tokens == 0
    assert out[0].chunk_md5 == hashlib.md5(b"").hexdigest()


def test_stratified_exact_k_and_determinism(spark):
    a = q_sample_stratified(spark, SF)
    sizes = {r.lang: r.n for r in a.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    strata = {
        r.lang: r.n
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for lang, total in strata.items():
        assert sizes.get(lang, 0) == min(_STRAT_K, total)
    # pure function of the data: two runs pick identical ids
    ids = lambda df: sorted((r.lang, r.doc_id) for r in df.collect())
    assert ids(a) == ids(q_sample_stratified(spark, SF))
