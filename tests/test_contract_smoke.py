"""Every driver-contract query must RUN at the smallest scale factor —
a crash guard for the correctness gate (value parity vs DuckDB is the
driver's job at sf0.01; this asserts executability, non-degenerate
schemas, and that queries() and oracle_sql() stay in sync)."""

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"

NAMES = sorted(entry.queries().keys())


def test_every_query_has_an_oracle():
    from sonar_tantivy_spark.driver_queries import NO_ORACLE

    q, o = set(entry.queries()), set(entry.oracle_sql())
    # the rows-only exemption (iterative algorithms) must be EXPLICIT:
    # a query may lack an oracle only by being declared in NO_ORACLE
    assert q - o == set(NO_ORACLE), (sorted(q - o), sorted(NO_ORACLE))
    assert not o - q, sorted(o - q)  # no orphan oracles


@pytest.mark.parametrize("name", NAMES)
def test_query_runs_at_smallest_sf(spark, name):
    df = entry.queries()[name](spark, SF)
    cols = df.columns
    assert cols and len(set(cols)) == len(cols), cols  # no dup columns
    df.limit(5).collect()  # executes the plan


def test_entry_smoke(spark):
    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and df.columns
