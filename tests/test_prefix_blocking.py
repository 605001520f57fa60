"""dedup_prefix round-3 second content key (VERDICT r02 #6).

A corpus-wide shared 32-char boilerplate header used to concentrate every
long document into one L=32 block whose bipartite fan-out was real (salting
spreads, cannot shrink). These tests pin (a) losslessness vs a brute-force
containment oracle on a planted-boilerplate corpus, (b) the hot-block
census: the boilerplate block splits under the ("p2", prefix, md5(33..64))
key, bounding block sizes by CONTENT groups instead of the corpus.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from levenshtein_spark.driver_queries.dedup import (
    prefix_containment_blocks,
    prefix_containment_pairs,
)

_HEADER = "/* SPDX-License-Identifier: X */ "  # 33 chars; first 32 shared
assert len(_HEADER) >= 32


def _boiler_corpus(spark, n_long=60, n_short=6):
    """Every long doc shares the 32-char header, then diverges at 33+;
    short docs are truncations of some long docs (true containments)."""
    rows = []
    for i in range(n_long):
        body = f"unique body {i} " + " ".join(f"tok{i}_{j}" for j in range(12))
        rows.append((i, _HEADER + body))
    # planted containments: doc 100+i is a proper prefix of doc i
    for i in range(n_short):
        full = rows[i][1]
        rows.append((100 + i, full[: 40 + 7 * i]))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_prefix_containment_lossless_with_boilerplate(spark):
    d = _boiler_corpus(spark)
    got = {
        (r.doc_a, r.doc_b)
        for r in prefix_containment_pairs(d).collect()
    }
    rows = {r.doc_id: r.text for r in d.collect()}
    want = {
        (a, b)
        for a in rows
        for b in rows
        if a != b and len(rows[a]) < len(rows[b]) and rows[b].startswith(rows[a])
    }
    assert got == want and len(want) >= 6


def test_boilerplate_block_splits_under_second_key(spark):
    d = _boiler_corpus(spark, n_long=60)
    a_blocks, b_blocks = prefix_containment_blocks(d)

    # a-side: long docs must NOT pile onto the shared p1 header key; the
    # only multi-row p1 block is the SHORT (<64 char) truncations, whose
    # count bounds it by design ("prefix side bounded by the short-doc
    # count, not the corpus")
    a_census = a_blocks.groupBy("block_key").count().collect()
    p1_max = max(
        (r["count"] for r in a_census if r.block_key.startswith("p1|")), default=0
    )
    n_short_lt64 = d.where(F.length("text") < 64).count()
    assert p1_max <= n_short_lt64, (
        f"p1 hot block {p1_max} exceeds short-doc count {n_short_lt64}"
    )

    # the bipartite hot block = a-side x b-side on the same key; under the
    # p1-only r02 scheme the shared-header key held all 60 long docs on the
    # A side AND was emitted by all 60 on the B side. Now a long doc's A key
    # is p2 (header + md5 of chars 33..64), so p2 block size equals its
    # CONTENT group — here ≤ 2 (a doc plus its ≥64-char truncation, which
    # shares chars 1..64 by containment), never the corpus.
    p2 = [r for r in a_census if r.block_key.startswith("p2|")]
    assert len(p2) >= 60 and max(r["count"] for r in p2) <= 2
