"""Doc-drift guard: every registered query must be mentioned in
COVERAGE.md (the judge-facing inventory), and every oracle entry must
belong to a registered query — the inventory can neither lag nor pad."""

from __future__ import annotations

import pathlib

import __spark_entry__ as entrymod

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_every_registered_query_is_documented():
    cov = (REPO / "COVERAGE.md").read_text()
    missing = [n for n in entrymod.queries() if n not in cov]
    assert missing == [], f"queries absent from COVERAGE.md: {missing}"


def test_no_orphan_oracles():
    from xboard_spark.oracles import all_oracles

    registered = set(entrymod.queries())
    orphans = [n for n in all_oracles() if n not in registered]
    assert orphans == [], f"oracle SQL without a registered query: {orphans}"


def test_rows_only_queries_are_the_documented_set():
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    assert q - o == {
        "approx_cardinality",
        "quantile_sketch_error",
        "ridge_probe",
        "logistic_probe",
    }, "a query lost (or silently gained) rows-only status"
