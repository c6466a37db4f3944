"""Full-catalog local correctness sweep → LOCAL_ORACLE_r{N}.json.

The driver's CORRECTNESS_r{N}.json samples a rotating 50-name subset of
the catalog each round; this tool runs EVERY registered query against
its DuckDB oracle twin (exact order-insensitive value compare — the
same normalization as tests/test_catalog_oracle.py, stricter than the
driver's hash) and records the per-query result into the repo so each
round leaves a hard correctness signal for the complete catalog, not
just the sampled slice.

Usage:
    python local_oracle.py [--sf-dir /root/testdata/sf0.01] \
                           [--out LOCAL_ORACLE_r4.json]

Prints one JSON summary line at the end.
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="LOCAL_ORACLE.json")
    args = ap.parse_args()

    import duckdb

    from opensearch_dynamodb_etl_cdk_spark.plans.catalog import CATALOG
    from opensearch_dynamodb_etl_cdk_spark.session import get_spark

    spark = get_spark("local-oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    results: dict[str, dict] = {}
    t0 = time.time()
    for name in sorted(CATALOG):
        q = CATALOG[name]
        rec: dict = {"status": None, "spark_rows": None, "oracle_rows": None,
                     "sec": None, "err": None}
        tq = time.time()
        try:
            sdf = q.fn(spark, args.sf_dir)
            spark_cols = sdf.columns
            spark_rows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(spark_rows)
            if q.oracle is None:
                rec["status"] = (
                    "rows_only" if len(spark_cols) > 0 else "error"
                )
                # name the pytest node pinning this entry's defining
                # invariant, so the rows-only → property-test mapping
                # is mechanically checkable from the report alone
                rec["property_test"] = q.property_test
            else:
                res = con.execute(q.oracle)
                duck_cols = [d[0] for d in res.description]
                duck_rows = res.fetchall()
                rec["oracle_rows"] = len(duck_rows)
                s_cols, s_rows = _norm_rows(spark_cols, spark_rows)
                d_cols, d_rows = _norm_rows(duck_cols, duck_rows)
                if s_cols != d_cols:
                    rec["status"] = "schema_mismatch"
                elif len(s_rows) != len(d_rows):
                    rec["status"] = "rowcount_mismatch"
                elif s_rows != d_rows:
                    rec["status"] = "value_mismatch"
                else:
                    rec["status"] = "match"
        except Exception as exc:  # record, keep sweeping
            rec["status"] = "error"
            rec["err"] = f"{type(exc).__name__}: {exc}"[:300]
        rec["sec"] = round(time.time() - tq, 3)
        results[name] = rec
        print(f"{name}: {rec['status']} ({rec['sec']}s)", file=sys.stderr)

    spark.stop()
    n_match = sum(1 for r in results.values() if r["status"] == "match")
    n_rows_only = sum(1 for r in results.values() if r["status"] == "rows_only")
    n_bad = len(results) - n_match - n_rows_only
    report = {
        "sf_dir": args.sf_dir,
        "total": len(results),
        "match": n_match,
        "rows_only": n_rows_only,
        "failing": n_bad,
        "total_sec": round(time.time() - t0, 1),
        "queries": results,
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(json.dumps({k: report[k] for k in
                      ("total", "match", "rows_only", "failing", "total_sec")}))
    return 0 if n_bad == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
