"""Bucketed co-located join: same-bucketed tables must join with zero
shuffle exchanges, and results must equal the plain shuffle join."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from opensearch_dynamodb_etl_cdk_spark.sources.bucketed import (
    bucketed_join,
    materialize_bucketed,
)


def test_bucketed_join_has_no_exchange(spark, tmp_path, sf_dir):
    # (warehouse dir is a static conf — managed tables land in the
    # default ./spark-warehouse and are dropped below)
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select(F.col("l_orderkey").alias("k"), "l_quantity")
    )
    od = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(F.col("o_orderkey").alias("k"), "o_orderpriority")
    )
    materialize_bucketed(li, "li_bkt", ["k"], n_buckets=8)
    materialize_bucketed(od, "od_bkt", ["k"], n_buckets=8)
    # at bench scale the dim side fits the broadcast threshold, which
    # would mask the co-location; a real fact⋈fact join would not
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try:
        joined = bucketed_join(spark, "li_bkt", "od_bkt", ["k"])
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain(mode="formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert "SortMergeJoin" in plan

        plain = li.join(od, ["k"]).count()
        assert joined.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_bkt")
        spark.sql("DROP TABLE IF EXISTS od_bkt")
