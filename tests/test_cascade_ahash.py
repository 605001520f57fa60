"""Pins for the session-4 wave beyond oracle parity: aHash codec-path
invariants, the cascade's first-match-wins provenance, and the OOV edge
cases."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from levenshtein_spark.driver_queries.multimodal import _AH_HAM, _ahash_table, q_dedup_image_ahash
from levenshtein_spark.driver_queries.er_eval import q_linkage_rule_cascade
from levenshtein_spark.driver_queries.text import q_text_oov_rate


def test_ahash_identical_rasters_hamming_zero(spark, tmp_path):
    # raster byte = (doc_id*31 + 7i) % 256, dims from strlen(text):
    # same text AND doc_id ≡ doc_id' (mod 256) ⇒ bit-identical images
    # (31·256 ≡ 0 mod 256), which MUST surface as a hamming-0 pair.
    text = "x" * 40
    rows = [(1, text, "en", "s", 40), (257, text, "en", "s", 40), (2, "y" * 71, "en", "s", 71)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = q_dedup_image_ahash(spark, str(tmp_path)).collect()
    exact = [(r.doc_a, r.doc_b) for r in out if r.hamming == 0]
    assert (1, 257) in exact


def test_ahash_matches_pure_python(spark):
    # recompute one hash end-to-end in plain python (no codec, no Spark)
    d = spark.createDataFrame([(7, "hello world")], "doc_id long, text string")
    got = {r.id: r.ahash for r in _ahash_table(d).collect()}
    L = 11
    w, h = 4 + L % 13, 3 + (L * 5) % 7
    grays = []
    for j in range(56):
        sy, sx = ((j // 8) * h) // 7, ((j % 8) * w) // 8
        p = (sy * w + sx) * 3
        grays.append(sum((7 * 31 + 7 * (p + c)) % 256 for c in range(3)) // 3)
    total = sum(grays)
    expect = sum(1 << j for j, g in enumerate(grays) if g * 56 >= total)
    assert got[7] == expect


def test_cascade_first_match_wins(spark, tmp_path):
    # two customers who match on BOTH the identity key (same cents) and the
    # demographic key (same segment/nation/band) -> attributed to rule 1;
    # a second pair matching only the demographic key -> rule 3
    rows = [
        (1, "Customer#000000001", 0, 123.45, "AUTO"),
        (2, "Customer#000000902", 0, 123.45, "AUTO"),  # name far from #1
        (3, "Customer#000000333", 5, 777.00, "HOME"),
        (4, "Customer#000000944", 5, 778.00, "HOME"),  # same band, diff cents
    ]
    spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/customer.parquet")
    got = {(r.id_a, r.id_b): r.rule for r in q_linkage_rule_cascade(spark, str(tmp_path)).collect()}
    assert got[(1, 2)] == 1
    assert got[(3, 4)] == 3


def test_oov_rate_edges(spark, tmp_path):
    # doc 0: all tokens shared with doc 1 -> oov 0; doc 2: unique tokens ->
    # oov 1; doc 3: empty -> NULL rate, zero counts
    rows = [
        (0, "red green blue", "en", "s", 1),
        (1, "red green blue", "en", "s", 1),
        (2, "qwx zzk", "en", "s", 1),
        (3, "", "en", "s", 0),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {r.doc_id: r for r in q_text_oov_rate(spark, str(tmp_path)).collect()}
    assert got[0].oov_rate == 0.0 and got[0].n_tokens == 3
    assert got[2].oov_rate == 1.0 and got[2].n_oov == 2
    assert got[3].n_tokens == 0 and got[3].oov_rate is None
