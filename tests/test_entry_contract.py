"""Driver-contract invariants that don't need Spark: every query has
an oracle twin, names are stable, and the oracle SQL parses in DuckDB
against empty tables of the fixture schema (catches SQL typos without
the full gate)."""

import duckdb
import pytest

import __spark_entry__ as entry

TABLE_DDL = {
    "region": "r_regionkey bigint, r_name varchar, r_comment varchar",
    "nation": "n_nationkey bigint, n_name varchar, n_regionkey bigint, n_comment varchar",
    "customer": "c_custkey bigint, c_name varchar, c_nationkey bigint, c_acctbal double",
    "supplier": "s_suppkey bigint, s_name varchar, s_nationkey bigint",
    "part": "p_partkey bigint, p_name varchar",
    "orders": "o_orderkey bigint, o_custkey bigint, o_totalprice double, o_orderdate date",
    "lineitem": ("l_orderkey bigint, l_quantity double, l_extendedprice double, "
                 "l_discount double, l_tax double, l_returnflag varchar, l_linestatus varchar"),
    "events": ("event_id bigint, ts timestamp, user_id bigint, event_type varchar, "
               "value double, props varchar"),
    "documents": ("doc_id bigint, text varchar, lang varchar, "
                  "source varchar, n_chars bigint"),
    "embeddings": "vec_id bigint, embedding float[]",
}


def test_queries_and_oracles_pair_exactly():
    q = entry.queries()
    o = entry.oracle_sql()
    assert set(q) == set(o), (set(q) ^ set(o))
    assert len(q) >= 43
    for name, fn in q.items():
        assert callable(fn), name


@pytest.mark.parametrize("name", sorted(entry.oracle_sql()))
def test_oracle_sql_parses(name):
    con = duckdb.connect()
    for t, ddl in TABLE_DDL.items():
        cols = ", ".join(f"cast(null as {c.split(' ', 1)[1]}) as {c.split(' ', 1)[0]}"
                         for c in ddl.split(", "))
        con.execute(f"create view {t} as select {cols} where 1 = 0")
    sql = entry.oracle_sql()[name]
    con.sql(sql)  # prepare/bind only — runs on empty views
    con.close()


def test_all_pairs_fixture_guard_trips(spark):
    """The O(n²) fixture twins refuse unbounded inputs (VERDICT r4 §wrong)."""
    big = spark.range(entry.ALL_PAIRS_FIXTURE_CAP + 1)
    with pytest.raises(ValueError, match="fixture-only"):
        entry._assert_all_pairs_fixture(big, "test")
    # at the cap it passes silently
    entry._assert_all_pairs_fixture(spark.range(entry.ALL_PAIRS_FIXTURE_CAP), "test")
