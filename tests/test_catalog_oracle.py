"""Local mirror of the driver's correctness gate: run every catalog query
on Spark AND its DuckDB oracle twin, compare row count, column names and
values (order-insensitive, exact — stricter than the driver's hash so
any float-order instability shows up here first)."""

from __future__ import annotations

import math

import duckdb
import pytest

from opensearch_dynamodb_etl_cdk_spark.plans.catalog import CATALOG

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=repr)


ORACLE_QUERIES = sorted(n for n, q in CATALOG.items() if q.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, q in CATALOG.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(name, spark, sf_dir, duck):
    q = CATALOG[name]
    sdf = q.fn(spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    res = duck.execute(q.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )

    s_cols, s_rows = _norm_rows(spark_cols, spark_rows)
    d_cols, d_rows = _norm_rows(duck_cols, duck_rows)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:3]}"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(name, spark, sf_dir):
    q = CATALOG[name]
    sdf = q.fn(spark, sf_dir)
    assert sdf.count() >= 0
    assert len(sdf.columns) > 0


def test_every_registered_query_is_enumerated_here():
    """Registration ↔ test-parametrization parity: every query the
    driver can sample from __spark_entry__ must appear in exactly one
    of the two parametrized suites above, so none can silently escape
    the local mirror (the driver itself samples only a 50-name subset
    per round)."""
    import __spark_entry__ as entry

    driver_names = set(entry.queries())
    assert driver_names == set(CATALOG), (
        "driver contract and CATALOG diverged: "
        f"only-driver={sorted(driver_names - set(CATALOG))[:5]} "
        f"only-catalog={sorted(set(CATALOG) - driver_names)[:5]}"
    )
    enumerated = set(ORACLE_QUERIES) | set(ROWS_ONLY_QUERIES)
    assert enumerated == set(CATALOG)
    oracle_names = set(entry.oracle_sql())
    assert oracle_names == set(ORACLE_QUERIES)
    # regression floor: the catalog must not silently shrink
    assert len(CATALOG) >= 150, len(CATALOG)
