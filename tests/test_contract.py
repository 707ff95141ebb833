"""Driver-contract smoke: entry() returns rows with a stable schema; every
queries() entry runs at sf0.001; oracle_sql() strings are valid DuckDB over
the same tables.  (The full value-equality sweep lives in
tools/check_contract.py and runs at sf0.01.)"""

import duckdb
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.limit(5).collect()
    assert df.columns
    assert len(rows) > 0


def test_all_queries_run(spark):
    for name, fn in entrymod.queries().items():
        df = fn(spark, SF)
        assert df.columns, name
        df.limit(3).collect()


def test_oracle_sql_is_valid_duckdb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    for name, sql in entrymod.oracle_sql().items():
        con.execute(sql).fetchmany(3)


def test_queries_and_oracles_share_column_names(spark):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    oracles = entrymod.oracle_sql()
    qs = entrymod.queries()
    for name, sql in oracles.items():
        scols = sorted(qs[name](spark, SF).columns)
        dcols = sorted(d[0] for d in con.execute(sql).description)
        assert scols == dcols, f"{name}: {scols} vs {dcols}"
