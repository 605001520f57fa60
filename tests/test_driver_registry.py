"""Registry integrity for the driver contract (no Spark session needed)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_collect_registry():
    from levenshtein_spark.driver_queries import collect

    queries, oracles = collect()
    assert len(queries) >= 25
    # every oracle belongs to a query; every query callable is callable
    assert set(oracles) <= set(queries)
    for fn in queries.values():
        assert callable(fn)
    # catalog coverage: one query per reference UDF family (ReadMe.md:29-38)
    for name in [
        "edit_dist", "edit_dist_t", "bounded_edit_dist", "bounded_edit_dist_t",
        "similarity_t", "min_edit_dist", "min_similarity_t",
    ]:
        assert name in queries and name in oracles, name
    # pipeline stages all present
    for name in [
        "linkage_normalize", "linkage_blocks", "linkage_pairs",
        "linkage_score", "linkage_edges", "linkage_clusters",
    ]:
        assert name in queries and name in oracles, name


def test_entry_module_contract():
    import __spark_entry__ as e

    assert callable(e.entry)
    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    for sql in o.values():
        assert isinstance(sql, str) and "SELECT" in sql.upper()
