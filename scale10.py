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
    "repeated_ngram_report",
    "lm_quality_scores",
    # round-10: the heaviest Python-decode row (per-frame JPEG decode
    # over every document's AVI) — measures the Arrow/mapInPandas
    # codec tier's volume scaling, the shape every new ingestion
    # operator (PDF/WARC/archive/GIF-anim) shares
    "multimodal_avi_decode_stats",
    # round-12: the two heaviest round-11 codec rows (the AVI row's
    # cost class — per-pixel Python decode inside Arrow batches).
    # Both scan the FULL documents table, so replica volume scales
    # them directly; no custom slice twins needed.
    "multimodal_jpeg_cmyk_decode_stats",
    "multimodal_tiff_decode_stats",
    # round-13: the two heaviest un-rehearsed codec rows — FLAC (Rice
    # decode + CRC/MD5 verify per file) and palette-color TIFF
    # (ColorMap gather through the compression/byte-order/tile cycle).
    # Both scan the FULL documents table; replica volume scales them.
    "multimodal_flac_decode_stats",
    "multimodal_palette_tiff_decode_stats",
    # round-13 late: the extended-WAV family (IMA ADPCM block decode +
    # float/24-bit numpy paths; full-table scan, so replica volume
    # scales it directly)
    "multimodal_wav_ext_decode_stats",
]

# Ingestion-chain rows (round-11): the catalog rows probe a fixed
# doc_id < 300 slice, which replica key-offsetting would leave at
# constant volume — these twins scale the slice per replica
# (doc_id % OFF < 300 ≡ doc_id < 300 at 1×, and 300 docs PER REPLICA
# at 10×) so the many-medium-blobs shape is actually rehearsed.
# Plans are otherwise identical to the catalog rows.


def _scaled_doc_slice(spark, sf_dir):
    d = load_tables(spark, sf_dir, ["documents"])["documents"]
    return d.filter((F.col("doc_id") % OFF) < 300)


def _warc_scaled(spark, sf_dir):
    from opensearch_dynamodb_etl_cdk_spark.operators import warc as W

    d = _scaled_doc_slice(spark, sf_dir)
    return W.extract_warc_text(W.synthesize_warcs(d))


def _archived_pdf_scaled(spark, sf_dir):
    from opensearch_dynamodb_etl_cdk_spark.operators import archive as ARC
    from opensearch_dynamodb_etl_cdk_spark.operators import pdf as PDF

    d = _scaled_doc_slice(spark, sf_dir)
    pdfs = PDF.synthesize_pdfs(d)
    archives = ARC.wrap_payloads_in_archives(pdfs, "doc_{id}.pdf")
    members = ARC.extract_archive_members(archives, with_bytes=True)
    pages = PDF.extract_document_text(members.select("doc_id", "payload"))
    return pages.groupBy("doc_id").agg(
        F.count("*").alias("n_pages"),
        F.sum(F.length("text")).alias("n_chars"),
    )


def _components_scaled(spark, sf_dir):
    # the catalog row clusters a doc_id<350 slice since r13 (sweep-cost
    # containment) — this twin scales the slice per replica so the
    # iterative contraction is rehearsed at 10x edge volume
    from opensearch_dynamodb_etl_cdk_spark.operators import dedup as D
    from opensearch_dynamodb_etl_cdk_spark.operators.graph import (
        connected_components,
    )

    d = load_tables(spark, sf_dir, ["documents"])["documents"].filter(
        (F.col("doc_id") % OFF) < 350)
    pairs = D.minhash_lsh_pairs(d, num_hashes=64, bands=32, threshold=0.7)
    return connected_components(pairs.select("id_a", "id_b"))


def _wet_scaled(spark, sf_dir):
    from opensearch_dynamodb_etl_cdk_spark.operators import warc as W

    d = _scaled_doc_slice(spark, sf_dir)
    return W.extract_wet_text(W.synthesize_wets(d))


INGEST_QUERIES = [
    ("warc_text_extract", _warc_scaled),
    ("archived_pdf_corpus_stats", _archived_pdf_scaled),
    ("near_dup_components", _components_scaled),
    ("wet_text_extract", _wet_scaled),
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


# ---- Zipf-skew replica mode (round-9 charter): 100 TB corpora are
# skewed, not uniform. The skewed layout keeps the SAME volume as the
# uniform 10x layout but collapses hot keys the way production data
# does: ~40% of all replicated events/orders land on ONE user/customer
# (the hot-pk case: a window partition or groupBy key that floods a
# single reducer), and ~1% of replicated documents become one
# boilerplate near-dup clique (the hot-MinHash-bucket case: every
# banded bucket for those docs collides, quadratic verify inside).

HOT_KEY = 424_242
_HOT_TEXT = (
    "standard quarterly compliance boilerplate header repeated "
    "verbatim across departments regions and filings with shared "
    "preamble clauses identical disclosure wording and common "
    "signature blocks differing only in the trailing case number "
)


def _skew_replica(df, table: str, i: int):
    out = _replica(df, table, i)
    if i == 0:
        return out  # replica 0 stays the pristine original
    if table == "events":
        hot = F.pmod(F.xxhash64("event_id"), F.lit(10)) < 4
        out = out.withColumn(
            "user_id",
            F.when(hot, F.lit(HOT_KEY)).otherwise(F.col("user_id")))
    elif table == "orders":
        hot = F.pmod(F.xxhash64("o_orderkey"), F.lit(10)) < 4
        out = out.withColumn(
            "o_custkey",
            F.when(hot, F.lit(HOT_KEY)).otherwise(F.col("o_custkey")))
    elif table == "documents":
        hot = F.pmod(F.xxhash64("doc_id"), F.lit(100)) < 1
        out = out.withColumn(
            "text",
            F.when(hot, F.concat(F.lit(_HOT_TEXT),
                                 (F.col("doc_id") % 7).cast("string")))
            .otherwise(F.col("text")))
    return out


def _build(spark, tag: str, replica_fn) -> str:
    # the tag encodes the rotation alphabet so a rule change
    # invalidates stale layouts
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "spark-warehouse", "scale10",
                        os.path.basename(os.path.normpath(SF_DIR))
                        + f"-r{len(_ROT)}{tag}")
    marker = os.path.join(root, "_DONE")
    if os.path.exists(marker):
        return root
    frames = load_tables(spark, SF_DIR, bench.TABLES)
    for t in bench.TABLES:
        df = frames[t]
        if t not in SINGLE_COPY:
            parts = [replica_fn(df, t, i) for i in range(N_REPLICAS)]
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


def build_scale10(spark) -> str:
    return _build(spark, "", _replica)


def build_scale10_skew(spark) -> str:
    return _build(spark, "-zipf", _skew_replica)


# ---- skew rehearsal measurement: the three skew-sensitive headline
# shapes, each with a named Spark-first mitigation measured alongside.
# The window rows (row_number over the hot key) concentrate the hot
# key's entire row set in ONE task; the max_by-aggregate twin computes
# the identical result through partial aggregation (map-side combine),
# so no reducer ever sees the hot key's full set — the same fix
# operators/upsert.py::latest_by_key already applies on the CDC path.
# The MinHash mitigation is the existing max_bucket cap
# (operators/dedup.py): a boilerplate clique's buckets are dropped
# above the cap, bounding the quadratic verify.

SKEW_QUERIES = ("keyed_upsert_latest", "top_hits_per_bucket",
                "minhash_near_dup_pairs")


def _upsert_latest_agg(spark, sf_dir):
    e = load_tables(spark, sf_dir, ["events"])["events"]
    return (
        e.groupBy("user_id")
        .agg(F.max_by(F.struct("event_id", "event_type", "value"),
                      F.struct("ts", "event_id")).alias("r"))
        .select("user_id", "r.*")
    )


def _top_hits_agg(spark, sf_dir):
    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    return (
        o.groupBy("o_custkey")
        .agg(F.max_by(F.struct("o_orderkey", "o_orderdate"),
                      F.struct("o_orderdate", "o_orderkey")).alias("r"))
        .select("o_custkey", "r.*")
    )


def _minhash_capped(spark, sf_dir):
    from opensearch_dynamodb_etl_cdk_spark.operators import dedup as D

    d = load_tables(spark, sf_dir, ["documents"])["documents"]
    return D.minhash_lsh_pairs(d, num_hashes=64, bands=32, threshold=0.7,
                               max_bucket=100)


SKEW_FIXES = {
    "keyed_upsert_latest": (
        "max_by aggregate (latest_by_key shape)", _upsert_latest_agg),
    "top_hits_per_bucket": (
        "max_by aggregate (latest_by_key shape)", _top_hits_agg),
    "minhash_near_dup_pairs": (
        "max_bucket=100 clique cap (drops hot buckets)", _minhash_capped),
}


def _time_fn(spark, fn, sf_dir) -> float:
    def once():
        df = fn(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    return min(once() for _ in range(2))


def run_skew_section(spark, big_dir: str, skew_dir: str) -> list[str]:
    # fix-equivalence gate (untimed): the aggregate twin must be a
    # drop-in for the window row on the skewed layout
    win = CATALOG["keyed_upsert_latest"].fn(spark, skew_dir)
    agg = _upsert_latest_agg(spark, skew_dir)
    assert win.exceptAll(agg).count() == 0 and \
        agg.exceptAll(win).count() == 0, \
        "max_by twin diverged from the window row"
    rows = []
    for name in SKEW_QUERIES:
        uni = min(bench.run_once(spark, name, big_dir) for _ in range(2))
        bench._unpersist_all_rdds(spark)
        sk = min(bench.run_once(spark, name, skew_dir) for _ in range(2))
        bench._unpersist_all_rdds(spark)
        label, fix_fn = SKEW_FIXES[name]
        fx = _time_fn(spark, fix_fn, skew_dir)
        bench._unpersist_all_rdds(spark)
        rows.append((name, uni, sk, sk / uni if uni else float("inf"),
                     fx, label))
        print(json.dumps({"query": name, "uniform10x": round(uni, 3),
                          "zipf10x": round(sk, 3),
                          "ratio": round(sk / uni, 2),
                          "mitigated": round(fx, 3)}))
    lines = [
        "",
        "## Zipf-skew rehearsal (same 10× volume, hot keys)",
        "",
        "Skewed twin of the 10× layout: ~40% of replicated events/"
        "orders collapse onto ONE hot user/customer key (hot-pk), and "
        "~1% of replicated documents become one boilerplate near-dup "
        "clique (~450 docs, under the 1000 default max_bucket, so "
        "every one of its banded buckets collides and the quadratic "
        "verify runs in full — the worst admissible bucket). Same "
        "volume, same timing discipline; `ratio` is skewed/uniform "
        "wall time and `mitigated` is the named Spark-first fix run "
        "ON the skewed layout.",
        "",
        "| query | uniform 10× (s) | zipf 10× (s) | ratio "
        "| mitigated (s) | mitigation |",
        "|---|---|---|---|---|---|",
    ]
    for name, uni, sk, ratio, fx, label in rows:
        lines.append(f"| {name} | {uni:.3f} | {sk:.3f} | {ratio:.2f}× "
                     f"| {fx:.3f} | {label} |")
    worst = max(rows, key=lambda r: r[3])
    lines += [
        "",
        f"Worst skew ratio: {worst[0]} at {worst[3]:.2f}×. The window "
        "rows pay the hot key's single-task sort; the max_by aggregate "
        "twin (identical output, asserted above the timings) absorbs "
        "the hot key through map-side partial aggregation, and the "
        "MinHash clique is bounded by the bucket cap — the documented "
        "recall trade for boilerplate floods.",
    ]
    return lines


def main() -> None:
    spark = get_spark("scale10")
    spark.read.parquet(os.path.join(SF_DIR, "nation.parquet")).count()
    bench._warm_python_workers(spark)
    base_dir = bench._rechunked(spark, SF_DIR)
    big_dir = build_scale10(spark)
    skew_dir = build_scale10_skew(spark)

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

    for name, fn in INGEST_QUERIES:
        base = _time_fn(spark, fn, base_dir)
        bench._unpersist_all_rdds(spark)
        big = _time_fn(spark, fn, big_dir)
        bench._unpersist_all_rdds(spark)
        ratio = big / base if base else float("inf")
        label = f"{name} (scaled slice)"
        rows.append((label, base, big, ratio))
        print(json.dumps({"query": label, "sf0.1": round(base, 3),
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
        "Rows marked `(scaled slice)` are the ingestion-chain twins: "
        "the catalog rows probe a FIXED doc_id < 300 slice, which "
        "key-offset replication would hold at constant volume, so the "
        "rehearsal swaps the filter for doc_id % OFF < 300 — "
        "identical plan and work at 1×, and 300 docs per replica "
        "(3,000 total) at 10×.",
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
    lines += run_skew_section(spark, big_dir, skew_dir)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "SCALE10.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote SCALE10.md")
    spark.stop()


if __name__ == "__main__":
    main()
