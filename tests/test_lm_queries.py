"""Pins for the LM-statistics curation family (driver_queries/lm.py).

Two layers beyond the driver's oracle parity:

* **Quantization-boundary guard** — the family's cross-engine determinism
  rests on ``round(1000 * ln(r))`` never landing within ~1e-13 of a
  half-integer (JVM Math.log and glibc log differ in the last ulp on
  ~3.5% of count rationals). This test re-derives EVERY distinct rational
  each model quantizes at sf0.01 in pure Python and asserts the margin is
  > 1e-6 — seven orders of magnitude wider than the worst cross-engine
  deviation, so the quantized integers are engine-independent.
* **Semantics** — perplexity ranks degenerate repetition below novel
  gibberish; the NB classifier separates a separable corpus; DSIR's
  resample is deterministic and upweights target-like documents.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

import duckdb
import pyspark.sql.functions as F

from levenshtein_spark.driver_queries.lm import (
    _BOS,
    _DSIR_B,
    _DSIR_K,
    _DSIR_SEED,
    _P53,
    q_dsir_select,
    q_quality_classifier_nb,
    q_text_perplexity,
)

SF = "/root/testdata/sf0.01"


def _hash64(s: str, seed: int = 0) -> int:
    payload = f"{seed}\x1f{s}" if seed else s
    return int(hashlib.md5(payload.encode()).hexdigest()[:15], 16)


def _tokens(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _docs() -> list[tuple[int, str, str]]:
    con = duckdb.connect()
    return con.execute(
        f"SELECT doc_id, text, lang FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()


def _boundary_margin(rationals) -> float:
    """min distance of 1000*ln(num/den) from the nearest .5 boundary."""
    worst = 1.0
    for num, den in rationals:
        x = 1000.0 * math.log(num / den)
        frac = abs(x) % 1.0
        worst = min(worst, abs(frac - 0.5))
    return worst


def test_quantization_boundary_guard_sf001():
    docs = _docs()
    rationals: set[tuple[int, int]] = set()

    # --- bigram LM (text_perplexity) ---
    c12: Counter = Counter()
    for _, text, _ in docs:
        toks = _tokens(text)
        for w1, w2 in zip([_BOS] + toks[:-1], toks):
            c12[(w1, w2)] += 1
    c1: Counter = Counter()
    for (w1, _), c in c12.items():
        c1[w1] += c
    vocab = len({w2 for _, w2 in c12})
    for (w1, _), c in c12.items():
        rationals.add((c + 1, c1[w1] + vocab))

    # --- NB classifier ---
    cen: Counter = Counter()
    cot: Counter = Counter()
    n_en = 0
    for _, text, lang in docs:
        tgt = cen if lang == "en" else cot
        n_en += lang == "en"
        for t in _tokens(text):
            tgt[t] += 1
    v = len(set(cen) | set(cot))
    t_en, t_ot = sum(cen.values()), sum(cot.values())
    for tok in set(cen) | set(cot):
        rationals.add((cen.get(tok, 0) + 1, t_en + v))
        rationals.add((cot.get(tok, 0) + 1, t_ot + v))
    n = len(docs)
    rationals.add((n_en + 1, n + 2))
    rationals.add((n - n_en + 1, n + 2))

    # --- DSIR buckets ---
    bt: Counter = Counter()
    bs: Counter = Counter()
    for _, text, lang in docs:
        for t in _tokens(text):
            bkt = _hash64(t) % _DSIR_B
            bs[bkt] += 1
            if lang == "en":
                bt[bkt] += 1
    tt, ts = sum(bt.values()), sum(bs.values())
    for bkt in bs:
        rationals.add((bt.get(bkt, 0) + 1, tt + _DSIR_B))
        rationals.add((bs[bkt] + 1, ts + _DSIR_B))

    assert len(rationals) > 300  # the guard actually saw all three models
    assert _boundary_margin(rationals) > 1e-6

    # Gumbel draws: -1000*ln(-ln(u)) for every doc's exact 53-bit uniform
    worst = 1.0
    for doc_id, _, _ in docs:
        u = ((_hash64(str(doc_id), _DSIR_SEED) % _P53) + 0.5) / _P53
        x = -1000.0 * math.log(-math.log(u))
        frac = abs(x) % 1.0
        worst = min(worst, abs(frac - 0.5))
    assert worst > 1e-6


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_perplexity_ranks_repetition_below_novelty(spark, tmp_path):
    # doc 0: one bigram repeated (maximally predictable); doc 1: all-novel
    # tokens (every bigram is a hapax); filler docs give the model mass.
    rows = [
        (0, "spark " * 60, "en"),
        (1, " ".join(f"z{i}q{i * 7} " for i in range(60)), "en"),
    ] + [(i, "the quick brown fox jumps over the lazy dog", "en") for i in range(2, 12)]
    sf = _write_docs(spark, tmp_path, rows)
    out = {r.doc_id: r for r in q_text_perplexity(spark, sf).collect()}
    assert out[0].n_bigrams == 60 and out[1].n_bigrams == 60
    assert out[0].avg_nll_mnat < out[1].avg_nll_mnat
    # zero-token doc row shape
    sf2 = _write_docs(spark, tmp_path / "b", rows + [(99, "!!!", "en")])
    row99 = {r.doc_id: r for r in q_text_perplexity(spark, sf2).collect()}[99]
    assert row99.n_bigrams == 0 and row99.sum_logprob_mnat == 0
    assert row99.avg_nll_mnat is None


def test_nb_separates_separable_corpus(spark, tmp_path):
    rows = [(i, "the and of to in for with language text", "en") for i in range(10)]
    rows += [(10 + i, "der und von zu im fuer mit sprache", "de") for i in range(10)]
    sf = _write_docs(spark, tmp_path, rows)
    out = q_quality_classifier_nb(spark, sf).collect()
    assert len(out) == 20
    for r in out:
        assert r.pred == ("en" if r.label == "en" else "other"), r


def _python_dsir_logw(docs) -> dict[int, int]:
    """Independent re-derivation of every doc's quantized importance weight."""
    bt: Counter = Counter()
    bs: Counter = Counter()
    per_doc: dict[int, Counter] = {}
    for doc_id, text, lang in docs:
        counts: Counter = Counter(_hash64(t) % _DSIR_B for t in _tokens(text))
        per_doc[doc_id] = counts
        for bkt, c in counts.items():
            bs[bkt] += c
            if lang == "en":
                bt[bkt] += c
    tt, ts = sum(bt.values()), sum(bs.values())
    lam = {
        bkt: round(1000.0 * math.log((bt.get(bkt, 0) + 1) / (tt + _DSIR_B)))
        - round(1000.0 * math.log((bs[bkt] + 1) / (ts + _DSIR_B)))
        for bkt in bs
    }
    return {
        doc_id: sum(n * lam[bkt] for bkt, n in counts.items())
        for doc_id, counts in per_doc.items()
    }


def test_dsir_deterministic_and_upweights_target(spark):
    a = q_dsir_select(spark, SF).collect()
    b = q_dsir_select(spark, SF).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == _DSIR_K

    docs = _docs()
    logw = _python_dsir_logw(docs)
    # Spark's quantized weights agree exactly with the Python re-derivation
    for r in a:
        assert r.logw_mnat == logw[r.doc_id], r
        assert r.key_mnat == r.logw_mnat + r.gumbel_mnat
    # importance resampling upweights target-like docs: the resample's mean
    # log-weight beats the corpus mean
    sel_mean = sum(r.logw_mnat for r in a) / len(a)
    corpus_mean = sum(logw.values()) / len(logw)
    assert sel_mean > corpus_mean
