"""Driver-contract smoke: entry() runs, queries()/oracle_sql() keys are
consistent, and a fast subset of oracle pairs matches DuckDB locally
(the full set is exercised by scripts/check_oracle.py and the driver)."""

from __future__ import annotations

import hashlib

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
FAST_SUBSET = [
    "exact_dup_groups", "token_idf", "mutual_top1",
    "minhash_signatures", "simhash", "embedding_topk",
]


def _norm(rows, cols):
    out = sorted(
        "|".join(
            (f"{row[c]:.6f}" if isinstance(row[c], float) else str(row[c]))
            for c in sorted(cols)
        )
        for row in rows
    )
    return hashlib.md5("\n".join(out).encode()).hexdigest()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def test_keys_consistent():
    qk = set(entrymod.queries())
    ok = set(entrymod.oracle_sql())
    assert ok <= qk
    assert len(ok) >= 20


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"doc_id", "component_id"}


@pytest.mark.parametrize("name", FAST_SUBSET)
def test_oracle_subset_matches(spark, duck, name):
    sdf = entrymod.queries()[name](spark, SF_DIR)
    srows = [r.asDict() for r in sdf.collect()]
    ddf = duck.execute(entrymod.oracle_sql()[name]).fetch_df()
    drows = ddf.to_dict("records")
    assert sorted(sdf.columns) == sorted(ddf.columns)
    assert len(srows) == len(drows)
    assert _norm(srows, sdf.columns) == _norm(drows, ddf.columns)
