"""Named-query catalog: every operator family from SURVEY.md §2 as a
(Spark callable, DuckDB oracle SQL) pair.

The driver contract (``/root/repo/__spark_entry__.py``) runs each Spark
callable and its oracle twin side-by-side and compares row count, schema
and an order-insensitive value hash. Rules followed here:

- Every computed column is aliased identically on both sides.
- Floating-point AGGREGATES are computed with per-row ``decimal`` casts
  and exact decimal sums, then cast back to ``double`` — decimal
  addition is associative, so Spark's partial-agg order and DuckDB's
  sequential order produce bit-identical doubles. Plain ``sum(double)``
  would be order-dependent and hash-unstable.
- Top-k queries always carry a unique-key tie-break so LIMIT is
  deterministic in both engines.
- Timestamps compare cleanly because the session TZ is pinned to UTC
  (see session.py).

Scale notes (100 TB): every query here is expressed declaratively so
Catalyst applies filter pushdown / column pruning / partial aggregation;
dimension joins are explicitly broadcast; nothing collects to the
driver. Window queries partition by high-cardinality keys (never a
global window without a partition key).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..session import load_tables


@dataclass
class CatalogQuery:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → non-SQL-expressible, driver does rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


CATALOG: dict[str, CatalogQuery] = {}


def register(name: str, oracle: str | None, doc: str = "", tags: tuple[str, ...] = ()):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        CATALOG[name] = CatalogQuery(name=name, fn=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in CATALOG.items() if q.oracle is not None}


def _t(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return load_tables(spark, sf_dir, list(names))


# Exact money arithmetic: cast each row's value to decimal before
# summing (associative → engine-order-independent), surface as double.
def dsum(col, scale: int = 2):
    return F.sum(col.cast(f"decimal(28,{scale})")).cast("double")


def davg(col, count_col="*", scale: int = 6):
    """Order-stable mean: exact decimal sum / count, divided as double."""
    return (
        F.sum(col.cast("decimal(28,6)")).cast("double") / F.count(F.lit(1))
    )


# ---------------------------------------------------------------------------
# Flagship: TPC-H Q1-style pricing summary (SURVEY §2.7 stats aggregation
# family; reference analog: OpenSearch stats/sum/avg aggs over an index,
# custom_resource.py:343-383 sinks exist to serve exactly these).
# ---------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE)        AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE)   AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) / COUNT(1)      AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / COUNT(1) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) / COUNT(1)      AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 pricing summary: multi-agg groupBy with pushed-down date filter.",
    tags=("agg", "flagship"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price, 4).alias("sum_disc_price"),
            dsum(charge, 6).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )
