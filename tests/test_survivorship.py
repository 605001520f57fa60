"""Golden-record survivorship rule pins (q_linkage_golden).

The driver hash-check proves parity with the DuckDB twin on the generated
tables, but those carry no exact-acctbal ties — the tie-break branch of the
survivorship rule (equal balance → lowest id wins) only runs here.
"""

from __future__ import annotations

from levenshtein_spark.driver_queries.linkage import q_linkage_golden


def test_golden_record_tie_breaks(spark, tmp_path):
    rows = [
        # cluster {1, 2}: dist-1 names, EQUAL balance -> lowest id survives
        (1, "Customer#000000001", 0, 100.0),
        (2, "Customer#000000002", 0, 100.0),
        # cluster {10, 11}: higher balance wins regardless of id order
        (10, "Customer#000000010", 1, 50.0),
        (11, "Customer#000000011", 1, 75.0),
        # singleton survives itself
        (20, "Customer#000000020", 2, -5.25),
    ]
    df = spark.createDataFrame(
        rows, "c_custkey long, c_name string, c_nationkey long, c_acctbal double"
    )
    sf = str(tmp_path)
    df.write.parquet(f"{sf}/customer.parquet")

    out = {r.cluster_id: r for r in q_linkage_golden(spark, sf).collect()}
    assert set(out) == {1, 10, 20}

    tie = out[1]
    assert (tie.n_members, tie.survivor_id, tie.survivor_acctbal) == (2, 1, 100.0)
    assert tie.survivor_name == "Customer#000000001"

    bal = out[10]
    assert (bal.n_members, bal.survivor_id, bal.survivor_acctbal) == (2, 11, 75.0)
    assert bal.min_acctbal == 50.0

    single = out[20]
    assert (single.n_members, single.survivor_id, single.min_acctbal) == (1, 20, -5.25)
