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


def test_cut_spans_rebuilds_expected_text(spark, tmp_path):
    """Applying the duplicated-region cut-list: the planted cross-doc repeat
    is excised exactly (n_cut = repeat length, md5 matches the hand-built
    cleaned string); documents without a >= 16-char repeat pass through
    byte-identical."""
    from levenshtein_spark.driver_queries.curation import q_curation_cut_spans

    rep = "0123456789abcdefghij"  # 20 chars, alphabet disjoint from filler
    t0 = "x" * 12 + rep + "y" * 9
    t1 = "w" * 7 + rep + "v" * 14
    t2 = "unique document with no long repeats at all"
    rows = [(0, t0, "en", "s", len(t0)), (1, t1, "en", "s", len(t1)),
            (2, t2, "en", "s", len(t2))]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")

    got = {r.doc_id: r for r in q_curation_cut_spans(spark, str(tmp_path)).collect()}
    assert got[0].n_cut == 20 and got[1].n_cut == 20
    assert got[0].clean_md5 == hashlib.md5(("x" * 12 + "y" * 9).encode()).hexdigest()
    assert got[1].clean_md5 == hashlib.md5(("w" * 7 + "v" * 14).encode()).hexdigest()
    assert got[2].n_cut == 0
    assert got[2].clean_md5 == hashlib.md5(t2.encode()).hexdigest()


def test_hll_estimate_accuracy_and_registers(spark, tmp_path):
    """HLL sketch: on a ~3000-token vocabulary the 64-register estimate
    lands within the expected error band (std error ~ 1.04/sqrt(64) = 13%;
    assert 3 sigma), all registers fill, and a tiny vocabulary keeps most
    registers at zero — the two regimes a mergeable distinct sketch must
    separate."""
    from levenshtein_spark.driver_queries.curation import q_corpus_hll_distinct

    big = " ".join(f"tok{i}" for i in range(3000))
    rows = [(i, big, "en", "s", len(big)) for i in range(3)]  # dup docs: same distinct set
    rows += [(10 + i, "alpha beta gamma", "zh", "s", 16) for i in range(4)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")

    got = {r.lang: r for r in q_corpus_hll_distinct(spark, str(tmp_path)).collect()}
    en, zh = got["en"], got["zh"]
    assert en.n_exact == 3000  # 'tok0'..'tok2999'; duplicate docs add no new tokens
    assert en.v_zero == 0
    assert abs(en.hll_est - en.n_exact) / en.n_exact < 0.39  # 3 sigma at m=64
    assert zh.n_exact == 3
    assert zh.v_zero >= 60  # 3 distinct tokens fill at most 3 registers
