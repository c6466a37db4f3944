#!/usr/bin/env python
"""10× synthetic scale rehearsal (round-8 charter): replicate sf0.1 to
~6M-row lineitem (+ proportional documents/events/embeddings), run the
10 most shuffle-heavy LAZY headline queries once at each scale, and
record wall-time scaling into SCALE10.md. The 100 TB arguments are
plan-audited every round; this measures them.

Replication is KEY-OFFSET, not naive union: every replica shifts its
join/group keys by a disjoint offset so per-key fan-outs stay constant
— a naive 10× copy would multiply join outputs by 100 and "prove"
super-linearity that no real 10× dataset has. Documents additionally
get a per-replica consonant/vowel rotation (``translate``) so replicas
are NOT near-duplicates of each other: a real 10× corpus is new text,
and MinHash candidate counts must scale like corpus size, not like
10-way duplicate cliques. region/nation stay 1× (dimensions don't grow
with fact volume).

The replicated layout is built ONCE under spark-warehouse/scale10/
(gitignored scratch, outside every timed region, exactly like the
bench re-chunk). Timings are best-of-2 with the noop sink — the
bench.py discipline.

Usage: python scale10.py   (writes SCALE10.md)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

import bench
from opensearch_dynamodb_etl_cdk_spark.session import get_spark, load_tables
from opensearch_dynamodb_etl_cdk_spark.plans.catalog import CATALOG

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_REPLICAS = 10
OFF = 10_000_000  # disjoint key space per replica

# the shuffle-heavy picks: wide join trees, decorrelated subqueries,
# banded dedup, iterative components, keyed text aggregates
QUERIES = [
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q9_product_profit",
    "q21_waiting_supplier",
    "join_large_agg",
    "token_topk",
    "minhash_near_dup_pairs",
    "near_dup_components",
    "repeated_ngram_report",
    "lm_quality_scores",
]

# per-table integer key columns to offset per replica; tables absent
# here replicate without key shifts (region/nation stay single-copy)
KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SINGLE_COPY = ("region", "nation")

_ROT = "aeiousnrtldc"  # high-frequency letters: rotating them rewrites
# most shingles, so replica texts are new documents, not near-dups.
# 12 characters > N_REPLICAS, so every replica 1..9 gets a DISTINCT
# non-identity rotation (9 % 9 == 0 previously made replica 9 an
# exact byte copy of replica 0 — the duplicate clique the design
# exists to prevent)


def _replica(df, table: str, i: int):
    out = df
    for k in KEY_COLS.get(table, ()):
        out = out.withColumn(k, F.col(k) + F.lit(i * OFF))
    if table == "documents" and i > 0:
        rot = _ROT[i % len(_ROT):] + _ROT[: i % len(_ROT)]
        out = out.withColumn("text", F.translate("text", _ROT, rot))
    return out


def build_scale10(spark) -> str:
    # the tag encodes the rotation alphabet so a rule change
    # invalidates stale layouts
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "spark-warehouse", "scale10",
                        os.path.basename(os.path.normpath(SF_DIR))
                        + f"-r{len(_ROT)}")
    marker = os.path.join(root, "_DONE")
    if os.path.exists(marker):
        return root
    frames = load_tables(spark, SF_DIR, bench.TABLES)
    for t in bench.TABLES:
        df = frames[t]
        if t not in SINGLE_COPY:
            parts = [_replica(df, t, i) for i in range(N_REPLICAS)]
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        else:
            out = df
        size = os.path.getsize(os.path.join(SF_DIR, f"{t}.parquet"))
        n = min(64, max(1 if size < 64 * 1024 else 8,
                        (size * N_REPLICAS) // (1024 * 1024)))
        out.repartition(int(n)).write.mode("overwrite").parquet(
            os.path.join(root, f"{t}.parquet"))
    with open(marker, "w") as f:
        f.write("ok")
    return root


def main() -> None:
    spark = get_spark("scale10")
    spark.read.parquet(os.path.join(SF_DIR, "nation.parquet")).count()
    bench._warm_python_workers(spark)
    base_dir = bench._rechunked(spark, SF_DIR)
    big_dir = build_scale10(spark)

    rows = []
    for name in QUERIES:
        base = min(bench.run_once(spark, name, base_dir)
                   for _ in range(2))
        bench._unpersist_all_rdds(spark)
        big = min(bench.run_once(spark, name, big_dir)
                  for _ in range(2))
        bench._unpersist_all_rdds(spark)
        ratio = big / base if base else float("inf")
        rows.append((name, base, big, ratio))
        print(json.dumps({"query": name, "sf0.1": round(base, 3),
                          "x10": round(big, 3),
                          "ratio": round(ratio, 2)}))

    lines = [
        "# SCALE10.md — 10× scale rehearsal (generated by scale10.py)",
        "",
        "Key-offset replication of sf0.1 → ~6M-row lineitem "
        "(+ proportional documents/orders/events; region/nation stay "
        "1×; replica texts vowel/consonant-rotated so MinHash "
        "candidates scale like corpus size, not duplicate cliques). "
        "Build billed outside the timed region; timings best-of-2, "
        "noop sink, one warm JVM — the bench.py discipline.",
        "",
        "A ratio at or below ~10 is linear-or-better (the 10× layout "
        "also carries more files, so scan parallelism rises); "
        "meaningfully above 10 on a sub-second base row is usually "
        "fixed stage latency amortizing, and is called out below if "
        "it is anything else.",
        "",
        "| query | sf0.1 (s) | 10× (s) | ratio |",
        "|---|---|---|---|",
    ]
    for name, base, big, ratio in rows:
        lines.append(f"| {name} | {base:.3f} | {big:.3f} "
                     f"| {ratio:.2f}× |")
    worst = max(rows, key=lambda r: r[3])
    n_super = sum(1 for r in rows if r[3] > 10)
    lines += [
        "",
        f"Worst ratio this run: {worst[0]} at {worst[3]:.2f}×. "
        f"Super-linear rows (ratio > 10×): {n_super}."
        + ("" if n_super else " Every measured plan absorbs 10× the"
           " data at a fraction of 10× the wall time — the"
           " shuffle-on-bounded-keys / pushed-filter / broadcast-dim"
           " shapes leave local[32] parallelism headroom, which is"
           " the same property that lets the plans go wide on a"
           " 1000-executor cluster."),
    ]
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "SCALE10.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote SCALE10.md")
    spark.stop()


if __name__ == "__main__":
    main()
