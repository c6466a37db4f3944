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
from datetime import datetime

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
    # rows-only entries (oracle=None) MUST name the pytest node id of
    # the deterministic property test that pins their defining
    # invariant — local_oracle.py surfaces it per row so the mapping
    # is mechanically checkable, and refuses registration without it.
    property_test: str | None = None


CATALOG: dict[str, CatalogQuery] = {}


def register(name: str, oracle: str | None, doc: str = "",
             tags: tuple[str, ...] = (), property_test: str | None = None):
    if oracle is None and not property_test:
        raise ValueError(
            f"catalog entry {name!r} has no oracle: pass property_test="
            "'tests/<file>::<test>' naming its defining invariant test"
        )
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        CATALOG[name] = CatalogQuery(name=name, fn=fn, oracle=oracle,
                                     doc=doc, tags=tags,
                                     property_test=property_test)
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


# ---------------------------------------------------------------------------
# Search-DSL family (SURVEY §2.7): term/terms/range/bool/prefix/wildcard/
# exists/ids/match/sort+size — the OpenSearch query DSL the reference's
# indexes (custom_resource.py:343-383) exist to serve, as Spark predicates.
# All simple predicates compile to parquet-pushed filters (PushedFilters in
# .explain), so at 100 TB they scan only matching row groups.
# ---------------------------------------------------------------------------

@register(
    "term_filter",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment FROM customer
    WHERE c_mktsegment = 'BUILDING'
    """,
    doc="DSL `term` query: exact match on a keyword field.",
    tags=("dsl", "filter"),
)
def term_filter(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")["customer"]
    return c.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "terms_in_filter",
    oracle="""
    SELECT p_partkey, p_brand, p_retailprice FROM part
    WHERE p_brand IN ('Brand#1', 'Brand#7', 'Brand#13')
    """,
    doc="DSL `terms` query: membership in a value set.",
    tags=("dsl", "filter"),
)
def terms_in_filter(spark, sf_dir):
    p = _t(spark, sf_dir, "part")["part"]
    return p.filter(F.col("p_brand").isin("Brand#1", "Brand#7", "Brand#13")).select(
        "p_partkey", "p_brand", "p_retailprice"
    )


@register(
    "range_filter",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    """,
    doc="DSL `range` query on a date field (fare validity window analog, SURVEY Q2).",
    tags=("dsl", "filter"),
)
def range_filter(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")["orders"]
    return o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_orderdate", "o_totalprice")


@register(
    "bool_filter",
    oracle="""
    SELECT COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    WHERE l_returnflag = 'R' AND l_quantity BETWEEN 10 AND 20 AND NOT l_linestatus = 'O'
    """,
    doc="DSL `bool` query: must + filter + must_not composition.",
    tags=("dsl", "filter"),
)
def bool_filter(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.filter(
            (F.col("l_returnflag") == "R")
            & F.col("l_quantity").between(10, 20)
            & ~(F.col("l_linestatus") == "O")
        )
        .agg(F.count("*").alias("n"), dsum(F.col("l_quantity")).alias("sum_qty"))
    )


@register(
    "prefix_filter",
    oracle="""
    SELECT p_brand, COUNT(*) AS n FROM part
    WHERE p_name LIKE 'red %' GROUP BY p_brand
    """,
    doc="DSL `prefix` query (startswith on the SK analog) + terms agg.",
    tags=("dsl", "filter"),
)
def prefix_filter(spark, sf_dir):
    p = _t(spark, sf_dir, "part")["part"]
    return (
        p.filter(F.col("p_name").startswith("red "))
        .groupBy("p_brand")
        .agg(F.count("*").alias("n"))
    )


@register(
    "wildcard_filter",
    oracle="""
    SELECT COUNT(*) AS n FROM part WHERE p_name LIKE '%gear%'
    """,
    doc="DSL `wildcard` query: infix LIKE.",
    tags=("dsl", "filter"),
)
def wildcard_filter(spark, sf_dir):
    p = _t(spark, sf_dir, "part")["part"]
    return p.filter(F.col("p_name").like("%gear%")).agg(F.count("*").alias("n"))


@register(
    "exists_filter",
    oracle="""
    SELECT event_type, COUNT(*) AS n FROM events
    WHERE props IS NOT NULL GROUP BY event_type
    """,
    doc="DSL `exists` query: field-present predicate.",
    tags=("dsl", "filter"),
)
def exists_filter(spark, sf_dir):
    e = _t(spark, sf_dir, "events")["events"]
    return (
        e.filter(F.col("props").isNotNull())
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )


@register(
    "ids_lookup",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    WHERE o_orderkey IN (1, 7, 42, 999)
    """,
    doc="DSL `ids` query: point lookups by document id (primary key).",
    tags=("dsl", "filter"),
)
def ids_lookup(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")["orders"]
    return o.filter(F.col("o_orderkey").isin(1, 7, 42, 999)).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@register(
    "match_fulltext",
    oracle="""
    SELECT lang, COUNT(*) AS n FROM documents
    WHERE text LIKE '%spark%' GROUP BY lang
    """,
    doc="DSL `match` (unanalyzed containment; analyzed mode = tokenized inverted index, operators/search.py).",
    tags=("dsl", "fulltext"),
)
def match_fulltext(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"]
    return (
        d.filter(F.col("text").contains("spark"))
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
    )


@register(
    "match_phrase",
    oracle="""
    SELECT COUNT(*) AS n FROM documents WHERE text LIKE '%batch stream%'
    """,
    doc="DSL `match_phrase`: adjacent-token phrase containment.",
    tags=("dsl", "fulltext"),
)
def match_phrase(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"]
    return d.filter(F.col("text").contains("batch stream")).agg(
        F.count("*").alias("n")
    )


@register(
    "sort_limit_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
    doc="DSL sort+size: top-k (Spark physical plan = TakeOrderedAndProject, no full sort).",
    tags=("dsl", "topk"),
)
def sort_limit_topk(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")["orders"]
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .limit(10)
    )


@register(
    "sort_from_size_page",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10 OFFSET 20
    """,
    doc="DSL from/size pagination: offset + limit with deterministic tie-break.",
    tags=("dsl", "topk"),
)
def sort_from_size_page(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")["orders"]
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_totalprice")
        .offset(20)
        .limit(10)
    )


@register(
    "search_after_page",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_totalprice < 50000.0
       OR (o_totalprice = 50000.0 AND o_orderkey > 0)
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
    doc="DSL search_after keyset pagination (operators/search.py::"
    "execute_search): the cursor tuple compiles to a pushed-down "
    "lexicographic filter + TakeOrderedAndProject — constant work per "
    "page at any depth, unlike from/size offsets which skip-scan `from` "
    "rows on every executor.",
    tags=("dsl", "topk"),
)
def search_after_page(spark, sf_dir):
    from ..operators.search import execute_search

    o = _t(spark, sf_dir, "orders")["orders"]
    res = execute_search(
        o,
        {
            "sort": [{"o_totalprice": "desc"}, {"o_orderkey": "asc"}],
            "search_after": [50000.0, 0],
            "size": 10,
        },
    )
    return res["hits"].select("o_orderkey", "o_totalprice")


@register(
    "collapse_best_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders) t
    WHERE rn = 1
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
    doc="DSL collapse (operators/search.py::execute_search): one best "
    "hit per collapse-field value via a per-group window top-1 "
    "(partitioned by the collapse key — bounded state per group, no "
    "global window), then the request sort + size on the survivors.",
    tags=("dsl", "window", "topk"),
)
def collapse_best_per_group(spark, sf_dir):
    from ..operators.search import execute_search

    o = _t(spark, sf_dir, "orders")["orders"]
    res = execute_search(
        o,
        {
            "collapse": {"field": "o_custkey"},
            "sort": [{"o_totalprice": "desc"}, {"o_orderkey": "asc"}],
            "size": 10,
        },
    )
    return res["hits"].select("o_custkey", "o_orderkey", "o_totalprice")


# ---------------------------------------------------------------------------
# Aggregation family (SURVEY §2.7): terms / date_histogram / stats /
# cardinality / top_hits — all map-side-partial aggregations in Spark
# (partial_agg → shuffle by group key → final_agg), which is the shape
# that scales: shuffle volume is |groups|, not |rows|.
# ---------------------------------------------------------------------------

@register(
    "terms_agg",
    oracle="""
    SELECT event_type, COUNT(*) AS doc_count FROM events GROUP BY event_type
    """,
    doc="Terms aggregation: bucket counts per keyword value.",
    tags=("agg",),
)
def terms_agg(spark, sf_dir):
    e = _t(spark, sf_dir, "events")["events"]
    return e.groupBy("event_type").agg(F.count("*").alias("doc_count"))


@register(
    "significant_terms_agg",
    oracle="""
    SELECT key, doc_count, bg_count, score FROM (
      SELECT fg.key, fg.doc_count, bg.bg_count,
             ((CAST(fg.doc_count AS DOUBLE) / t.fg_total)
              - (CAST(bg.bg_count AS DOUBLE) / t.bg_total))
             * ((CAST(fg.doc_count AS DOUBLE) / t.fg_total)
                / (CAST(bg.bg_count AS DOUBLE) / t.bg_total)) AS score
      FROM (SELECT o_orderpriority AS key, COUNT(*) AS doc_count
            FROM orders WHERE o_totalprice >= 40000
            GROUP BY o_orderpriority) fg
      JOIN (SELECT o_orderpriority AS key, COUNT(*) AS bg_count
            FROM orders GROUP BY o_orderpriority) bg ON fg.key = bg.key
      CROSS JOIN (
        SELECT (SELECT COUNT(*) FROM orders WHERE o_totalprice >= 40000)
                 AS fg_total,
               (SELECT COUNT(*) FROM orders) AS bg_total) t) scored
    WHERE score > 0
    ORDER BY score DESC, key ASC LIMIT 10
    """,
    doc="significant_terms aggregation (operators/search.py::"
    "significant_terms_frame): terms over-represented in the "
    "query-filtered foreground vs the full corpus, JLH-scored. The "
    "foreground is a predicate over the same corpus, so ONE "
    "conditional-aggregation pass computes both counts: one scan, one "
    "|terms| shuffle, broadcast totals, top-k — no term join. Integer "
    "counts divide identically in both engines, so the double scores "
    "hash-match exactly.",
    tags=("agg", "dsl"),
)
def significant_terms_agg(spark, sf_dir):
    from ..operators.search import significant_terms_frame

    o = _t(spark, sf_dir, "orders")["orders"]
    return significant_terms_frame(
        F.col("o_totalprice") >= 40000, o, "o_orderpriority", size=10
    )


@register(
    "composite_agg_page",
    oracle="""
    SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           COUNT(*) AS doc_count
    FROM events
    GROUP BY 1, 2
    HAVING (event_type > 'click')
        OR (event_type = 'click'
            AND CAST(date_trunc('day', ts) AS TIMESTAMP) > TIMESTAMP '2024-01-20')
    ORDER BY event_type ASC, day ASC LIMIT 15
    """,
    doc="DSL `composite` aggregation (operators/search.py::composite_frame): "
    "paginated bucket walk over (event_type, day) resuming after the cursor "
    "('click', 2024-01-20). The after-key compiles to a lexicographic keyset "
    "predicate applied post-groupBy (|buckets| rows, not |rows|): page cost "
    "is one agg + top-k regardless of page depth — the scale-safe way to "
    "enumerate every bucket of a high-cardinality field.",
    tags=("agg", "dsl"),
)
def composite_agg_page(spark, sf_dir):
    from ..operators.search import composite_frame

    e = _t(spark, sf_dir, "events")["events"]
    return composite_frame(
        e,
        {
            "sources": [
                {"event_type": {"terms": {"field": "event_type"}}},
                {"day": {"date_histogram": {"field": "ts",
                                            "calendar_interval": "day"}}},
            ],
            "size": 15,
            "after": {"event_type": "click",
                      "day": datetime(2024, 1, 20, 0, 0, 0)},
        },
    )


@register(
    "multi_terms_agg",
    oracle="""
    SELECT lang, source, COUNT(*) AS doc_count FROM documents
    GROUP BY lang, source
    ORDER BY doc_count DESC, lang ASC, source ASC LIMIT 10
    """,
    doc="DSL `multi_terms` aggregation: top-k composite keys by doc count — "
    "one groupBy over all key fields (map-side partials, shuffle = |distinct "
    "tuples|) + TakeOrderedAndProject, same scale shape as `terms`.",
    tags=("agg", "dsl"),
)
def multi_terms_agg(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"]
    return (
        d.groupBy("lang", "source")
        .agg(F.count("*").alias("doc_count"))
        .orderBy(F.col("doc_count").desc(), F.col("lang").asc(), F.col("source").asc())
        .limit(10)
    )


@register(
    "extended_stats_agg",
    oracle="""
    SELECT event_type,
           COUNT(value) AS n, MIN(value) AS min_value, MAX(value) AS max_value,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / COUNT(value) AS avg_value,
           CAST(SUM(CAST(value * value AS DECIMAL(28,6))) AS DOUBLE) AS sum_sq,
           (CAST(SUM(CAST(value * value AS DECIMAL(28,6))) AS DOUBLE)
            - CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
              * CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / COUNT(value))
           / COUNT(value) AS variance,
           SQRT((CAST(SUM(CAST(value * value AS DECIMAL(28,6))) AS DOUBLE)
                 - CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                   * CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / COUNT(value))
                / COUNT(value)) AS std_dev
    FROM events GROUP BY event_type
    """,
    doc="DSL `extended_stats` aggregation: count/min/max/sum/avg + "
    "sum-of-squares/variance/stddev in ONE pass. Variance derives from "
    "exact decimal sums ((Σx² − (Σx)²/n)/n evaluated in double at the "
    "end), so the result is independent of partition/accumulation order "
    "— a naive double Σx² drifts with task order and would never "
    "hash-match across engines.",
    tags=("agg", "dsl"),
)
def extended_stats_agg(spark, sf_dir):
    e = _t(spark, sf_dir, "events")["events"]
    v = F.col("value")
    out = e.groupBy("event_type").agg(
        F.count(v).alias("n"),
        F.min(v).alias("min_value"),
        F.max(v).alias("max_value"),
        F.sum(v.cast("decimal(28,6)")).cast("double").alias("sum_value"),
        F.sum((v * v).cast("decimal(28,6)")).cast("double").alias("sum_sq"),
    )
    variance = (
        F.col("sum_sq") - F.col("sum_value") * F.col("sum_value") / F.col("n")
    ) / F.col("n")
    return out.select(
        "event_type", "n", "min_value", "max_value", "sum_value",
        (F.col("sum_value") / F.col("n")).alias("avg_value"),
        "sum_sq",
        variance.alias("variance"),
        F.sqrt(variance).alias("std_dev"),
    )


@register(
    "bucket_cumulative_derivative",
    oracle="""
    WITH per_day AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY CAST(ts AS DATE))
    SELECT day, sum_value,
           CAST(SUM(CAST(sum_value AS DECIMAL(28,2)))
                OVER (ORDER BY day) AS DOUBLE) AS cum_sum,
           sum_value - LAG(sum_value) OVER (ORDER BY day) AS delta
    FROM per_day
    """,
    doc="DSL pipeline aggregations `cumulative_sum` + `derivative` over a "
    "date_histogram: running total and day-over-day delta of the per-day "
    "sum. The window is unpartitioned BY DESIGN and safe at any scale: it "
    "runs over the already-reduced histogram (|buckets| = |days|, not "
    "|rows|), so a 100 TB input still feeds it only one row per day.",
    tags=("agg", "dsl", "time"),
)
def bucket_cumulative_derivative(spark, sf_dir):
    e = _t(spark, sf_dir, "events")["events"]
    per_day = e.groupBy(F.to_date("ts").alias("day")).agg(
        dsum(F.col("value")).alias("sum_value")
    )
    w = W.orderBy("day")
    return per_day.select(
        "day",
        "sum_value",
        F.sum(F.col("sum_value").cast("decimal(28,2)"))
        .over(w)
        .cast("double")
        .alias("cum_sum"),
        (F.col("sum_value") - F.lag("sum_value").over(w)).alias("delta"),
    )


@register(
    "date_range_agg",
    oracle="""
    SELECT CASE WHEN ts < TIMESTAMP '2024-01-11' THEN 'early' ELSE 'late' END
             AS key,
           COUNT(*) AS doc_count,
           CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1
    """,
    doc="DSL `date_range` aggregation: doc counts + metric per named "
    "date band. Expressed as one derived-label groupBy (single pass, "
    "map-side partials) — the executor variant in operators/search.py "
    "folds all bands into one conditional-agg row instead; both shapes "
    "scan the events exactly once.",
    tags=("agg", "dsl", "time"),
)
def date_range_agg(spark, sf_dir):
    e = _t(spark, sf_dir, "events")["events"]
    label = F.when(
        F.col("ts") < F.to_timestamp(F.lit("2024-01-11")), "early"
    ).otherwise("late")
    return e.groupBy(label.alias("key")).agg(
        F.count("*").alias("doc_count"),
        dsum(F.col("value")).alias("sum_value"),
    )


@register(
    "adjacency_matrix_agg",
    oracle="""
    SELECT 'clicks' AS key, COUNT(*) FILTER (event_type = 'click') AS doc_count
    FROM events
    UNION ALL
    SELECT 'big', COUNT(*) FILTER (value >= 90.0) FROM events
    UNION ALL
    SELECT 'clicks&big', COUNT(*) FILTER (event_type = 'click' AND value >= 90.0)
    FROM events
    """,
    doc="DSL `adjacency_matrix` aggregation: doc counts for each named "
    "filter and each pairwise intersection — k + k(k-1)/2 conditional "
    "sums over ONE scan (operators/search.py adjacency_matrix branch), "
    "never a pass per matrix cell; the single agg row unpivots to the "
    "bucket list.",
    tags=("agg", "dsl"),
)
def adjacency_matrix_agg(spark, sf_dir):
    e = _t(spark, sf_dir, "events")["events"]
    clicks = F.col("event_type") == "click"
    big = F.col("value") >= 90.0
    row = e.agg(
        F.sum(clicks.cast("long")).alias("n_clicks"),
        F.sum(big.cast("long")).alias("n_big"),
        F.sum((clicks & big).cast("long")).alias("n_both"),
    )
    return row.select(
        F.expr(
            "stack(3, 'clicks', n_clicks, 'big', n_big, 'clicks&big', n_both) "
            "AS (key, doc_count)"
        )
    )


@register(
    "moving_fn_serial_diff_agg",
    oracle="""
    WITH per_day AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY CAST(ts AS DATE))
    SELECT day, sum_value,
           CAST(SUM(CAST(sum_value AS DECIMAL(28,2)))
                OVER (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
                AS DOUBLE)
             / COUNT(sum_value)
                OVER (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
             AS moving_avg_7d,
           sum_value - LAG(sum_value, 7) OVER (ORDER BY day) AS diff_7d
    FROM per_day
    """,
    doc="DSL pipeline aggregations `moving_fn` (7-bucket unweighted "
    "average over the PRECEDING window, current bucket excluded — "
    "OpenSearch shift=0 semantics) + `serial_diff` (lag 7, the "
    "week-over-week seasonal delta) over a date_histogram. Like "
    "cumulative_sum, the unpartitioned window is safe at any scale: it "
    "runs over the reduced histogram, one row per day. Decimal-exact "
    "window sums keep the moving average bit-stable across engines.",
    tags=("agg", "dsl", "time"),
)
def moving_fn_serial_diff_agg(spark, sf_dir):
    e = _t(spark, sf_dir, "events")["events"]
    per_day = e.groupBy(F.to_date("ts").alias("day")).agg(
        dsum(F.col("value")).alias("sum_value")
    )
    wf = W.orderBy("day").rowsBetween(-7, -1)
    return per_day.select(
        "day",
        "sum_value",
        (
            F.sum(F.col("sum_value").cast("decimal(28,2)")).over(wf).cast("double")
            / F.count("sum_value").over(wf)
        ).alias("moving_avg_7d"),
        (F.col("sum_value") - F.lag("sum_value", 7).over(W.orderBy("day"))).alias(
            "diff_7d"
        ),
    )


@register(
    "bucket_script_selector_page",
    oracle="""
    WITH per_day AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS doc_count,
             CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY CAST(ts AS DATE))
    SELECT day, doc_count, sum_value,
           sum_value / doc_count AS per_event
    FROM per_day
    WHERE doc_count >= 300
    ORDER BY per_event DESC, day ASC LIMIT 7
    """,
    doc="DSL pipeline aggregations `bucket_script` (derived per-bucket "
    "metric: value per event) + `bucket_selector` (drop thin buckets) + "
    "`bucket_sort` (page the top 7 by the derived metric): the "
    "histogram reduces first, so script/filter/sort all run over "
    "|buckets| rows — HAVING + top-k in relational terms, never a "
    "second pass over the events.",
    tags=("agg", "dsl", "time"),
)
def bucket_script_selector_page(spark, sf_dir):
    e = _t(spark, sf_dir, "events")["events"]
    per_day = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").alias("doc_count"),
        dsum(F.col("value")).alias("sum_value"),
    )
    return (
        per_day.withColumn(
            "per_event", F.col("sum_value") / F.col("doc_count")
        )
        .filter(F.col("doc_count") >= 300)
        .orderBy(F.col("per_event").desc(), F.col("day").asc())
        .limit(7)
    )


@register(
    "rare_terms_agg",
    oracle="""
    SELECT user_id AS key, COUNT(*) AS doc_count FROM events
    GROUP BY user_id HAVING COUNT(*) <= 52
    ORDER BY doc_count ASC, key ASC LIMIT 100
    """,
    doc="DSL `rare_terms` aggregation: bottom-k buckets by doc count (the "
    "long tail `terms` hides; here: least-active users) — one groupBy + "
    "HAVING + ascending TakeOrderedAndProject; same map-side-partial "
    "scale shape as terms.",
    tags=("agg", "dsl"),
)
def rare_terms_agg(spark, sf_dir):
    e = _t(spark, sf_dir, "events")["events"]
    return (
        e.filter(F.col("user_id").isNotNull())
        .groupBy(F.col("user_id").alias("key"))
        .agg(F.count("*").alias("doc_count"))
        .filter(F.col("doc_count") <= 52)
        .orderBy(F.col("doc_count").asc(), F.col("key").asc())
        .limit(100)
    )


@register(
    "weighted_avg_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(28,6))) AS DOUBLE)
           / CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS weighted_avg_price
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="DSL `weighted_avg` metric: Σ(value·weight)/Σ(weight) from exact "
    "decimal sums (accumulation-order independent), grouped per return "
    "flag — one aggregation pass.",
    tags=("agg", "dsl"),
)
def weighted_avg_agg(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    v, w = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        (
            F.sum((v * w).cast("decimal(28,6)")).cast("double")
            / F.sum(w.cast("decimal(28,6)")).cast("double")
        ).alias("weighted_avg_price")
    )


@register(
    "percentile_ranks_agg",
    oracle="""
    SELECT event_type,
           100.0 * SUM(CASE WHEN value <= 25 THEN 1 ELSE 0 END) / COUNT(value) AS rank_25,
           100.0 * SUM(CASE WHEN value <= 50 THEN 1 ELSE 0 END) / COUNT(value) AS rank_50,
           100.0 * SUM(CASE WHEN value <= 75 THEN 1 ELSE 0 END) / COUNT(value) AS rank_75
    FROM events GROUP BY event_type
    """,
    doc="DSL `percentile_ranks`: %% of observed values at or below each "
    "probe, all probes in ONE conditional-agg pass (exact integer counts "
    "-> deterministic double ratios), grouped per event type.",
    tags=("agg", "dsl"),
)
def percentile_ranks_agg(spark, sf_dir):
    e = _t(spark, sf_dir, "events")["events"]
    v = F.col("value")
    return e.groupBy("event_type").agg(
        *[
            (
                F.sum(F.when(v <= t, 1).otherwise(0)) * 100.0 / F.count(v)
            ).alias(f"rank_{t}")
            for t in (25, 50, 75)
        ]
    )


@register(
    "daily_value_stats",
    oracle="""
    WITH per_day AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY CAST(ts AS DATE))
    SELECT COUNT(*) AS n_days,
           MIN(sum_value) AS min_daily, MAX(sum_value) AS max_daily,
           CAST(SUM(CAST(sum_value AS DECIMAL(28,2))) AS DOUBLE) AS total,
           CAST(SUM(CAST(sum_value AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*) AS avg_daily
    FROM per_day
    """,
    doc="DSL sibling pipeline aggs (`stats_bucket`/`avg_bucket`/...) as a "
    "distributed twin: scalar stats over a sibling date_histogram's "
    "per-bucket sums — a two-level aggregation where level 2 runs over "
    "|buckets| rows, not |rows|.",
    tags=("agg", "dsl", "time"),
)
def daily_value_stats(spark, sf_dir):
    e = _t(spark, sf_dir, "events")["events"]
    per_day = e.groupBy(F.to_date("ts").alias("day")).agg(
        dsum(F.col("value")).alias("sum_value")
    )
    return per_day.agg(
        F.count("*").alias("n_days"),
        F.min("sum_value").alias("min_daily"),
        F.max("sum_value").alias("max_daily"),
        dsum(F.col("sum_value")).alias("total"),
        (dsum(F.col("sum_value")) / F.count("*")).alias("avg_daily"),
    )


@register(
    "date_histogram_agg",
    oracle="""
    SELECT CAST(ts AS DATE) AS day, COUNT(*) AS doc_count,
           CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY CAST(ts AS DATE)
    """,
    doc="date_histogram aggregation: per-day buckets (calendar interval).",
    tags=("agg", "time"),
)
def date_histogram_agg(spark, sf_dir):
    e = _t(spark, sf_dir, "events")["events"]
    return (
        e.groupBy(F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("doc_count"), dsum(F.col("value")).alias("sum_value"))
    )


@register(
    "tumbling_window_agg",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
    doc="Tumbling 1h window agg via F.window (streaming-compatible shape, SURVEY §2.8 ST3).",
    tags=("agg", "time", "streaming"),
)
def tumbling_window_agg(spark, sf_dir):
    e = _t(spark, sf_dir, "events")["events"]
    return (
        e.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), dsum(F.col("value")).alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register(
    "stats_agg",
    oracle="""
    SELECT event_type,
           MIN(value) AS min_value, MAX(value) AS max_value,
           CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS sum_value,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / COUNT(1) AS avg_value,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
    doc="stats aggregation: min/max/sum/avg/count in one pass.",
    tags=("agg",),
)
def stats_agg(spark, sf_dir):
    e = _t(spark, sf_dir, "events")["events"]
    return e.groupBy("event_type").agg(
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        dsum(F.col("value")).alias("sum_value"),
        davg(F.col("value")).alias("avg_value"),
        F.count("*").alias("n"),
    )


@register(
    "cardinality_agg",
    oracle="""
    SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Cardinality aggregation, exact (distinct-count); approx variant below.",
    tags=("agg",),
)
def cardinality_agg(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts")
    )


@register(
    "approx_cardinality_agg",
    property_test="tests/test_plans.py::test_approx_cardinality_error_bound_and_determinism",
    oracle=None,  # HLL sketches differ across engines by design — rows-only
    doc="Cardinality aggregation, approximate: HyperLogLog++ — the 100 TB path "
    "(fixed-size sketch, no distinct shuffle). Bounded rel. error 2%.",
    tags=("agg", "approx"),
)
def approx_cardinality_agg(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("n_parts_approx")
    )


@register(
    "percentile_agg",
    oracle="""
    SELECT event_type,
           CAST(quantile_cont(value, 0.5) AS DOUBLE) AS p50,
           CAST(quantile_cont(value, 0.95) AS DOUBLE) AS p95
    FROM events GROUP BY event_type
    """,
    doc="percentiles aggregation (exact interpolated; approx_percentile is the sketch path at scale).",
    tags=("agg",),
)
def percentile_agg(spark, sf_dir):
    e = _t(spark, sf_dir, "events")["events"]
    return e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.95)").alias("p95"),
    )


@register(
    "top_hits_per_bucket",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
    doc="top_hits aggregation: latest document per bucket (window row_number).",
    tags=("agg", "window"),
)
def top_hits_per_bucket(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")["orders"]
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
    )


# ---------------------------------------------------------------------------
# DynamoDB access-pattern family (SURVEY §2.6 Q1–Q7): composite-key
# synthesis/decomposition (`concat_ws('#')` / `split`), PK point lookups,
# SK string-range queries, GSI-style re-sorts. At scale these stay
# pushdown-friendly: the composite key is derived, so filters land on the
# underlying columns before the key is built.
# ---------------------------------------------------------------------------

@register(
    "pk_point_lookup",
    oracle="""
    SELECT event_id, user_id, ts, event_type, value FROM events WHERE user_id = 42
    """,
    doc="SURVEY Q1 analog: Query PK = :val — all items under one partition key.",
    tags=("keys", "filter"),
)
def pk_point_lookup(spark, sf_dir):
    e = _t(spark, sf_dir, "events")["events"]
    return e.filter(F.col("user_id") == 42).select(
        "event_id", "user_id", "ts", "event_type", "value"
    )


@register(
    "composite_sk_range",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority || '#' || strftime(o_orderdate, '%Y-%m-%d') || '#' || o_orderstatus AS sk,
           split_part(o_orderpriority || '#' || strftime(o_orderdate, '%Y-%m-%d') || '#' || o_orderstatus, '#', 2) AS sk_date,
           split_part(o_orderpriority || '#' || strftime(o_orderdate, '%Y-%m-%d') || '#' || o_orderstatus, '#', 3) AS sk_status
    FROM orders
    WHERE o_orderpriority || '#' || strftime(o_orderdate, '%Y-%m-%d') || '#' || o_orderstatus
          BETWEEN '1-URGENT#1996-01-01' AND '1-URGENT#1996-12-31~'
    """,
    doc="SURVEY Q2 analog: overloaded composite SK (`priority#date#status`) built "
    "with concat_ws('#'), string BETWEEN range (DynamoDB SK semantics), then "
    "decomposed with split().",
    tags=("keys", "filter"),
)
def composite_sk_range(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")["orders"]
    sk = F.concat_ws(
        "#",
        F.col("o_orderpriority"),
        F.date_format("o_orderdate", "yyyy-MM-dd"),
        F.col("o_orderstatus"),
    )
    parts = F.split(F.col("sk"), "#")
    return (
        o.withColumn("sk", sk)
        .filter(F.col("sk").between("1-URGENT#1996-01-01", "1-URGENT#1996-12-31~"))
        .select(
            "o_orderkey",
            "sk",
            parts.getItem(1).alias("sk_date"),
            parts.getItem(2).alias("sk_status"),
        )
    )


@register(
    "gsi_reverse_lookup",
    oracle="""
    SELECT event_id, user_id, ts FROM events
    WHERE event_type = 'purchase'
    ORDER BY ts ASC, event_id ASC LIMIT 50
    """,
    doc="SURVEY Q4 analog: GSI reverse lookup = filter on the alternate "
    "partition key + sort on the alternate sort key. No index object needed: "
    "a GSI is a re-sort in Spark.",
    tags=("keys", "topk"),
)
def gsi_reverse_lookup(spark, sf_dir):
    e = _t(spark, sf_dir, "events")["events"]
    return (
        e.filter(F.col("event_type") == "purchase")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .select("event_id", "user_id", "ts")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Join family (SURVEY §2.9: absent in the reference, provided Spark-first).
# Dimension tables are broadcast (no shuffle of the fact side); the
# fact-fact join shuffles on the join key with AQE handling skew.
# ---------------------------------------------------------------------------

@register(
    "join_broadcast_dims",
    oracle="""
    SELECT r_name, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE) AS sum_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    doc="Star-schema rollup with explicitly broadcast dimensions: at 100 TB the "
    "fact side never shuffles for dim joins.",
    tags=("join", "agg"),
)
def join_broadcast_dims(spark, sf_dir):
    t = _t(spark, sf_dir, "customer", "nation", "region")
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            dsum(F.col("c_acctbal")).alias("sum_acctbal"),
        )
    )


@register(
    "join_fact_dim",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    doc="Fact⋈dim join + agg; Catalyst/AQE picks broadcast when the dim fits.",
    tags=("join", "agg"),
)
def join_fact_dim(spark, sf_dir):
    t = _t(spark, sf_dir, "orders", "customer")
    return (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("sum_price"),
        )
    )


@register(
    "join_large_agg",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    doc="Fact⋈fact shuffle join on the natural key; AQE skew-join splits hot "
    "keys at scale. Partial aggregation keeps shuffle volume at |groups|.",
    tags=("join", "agg"),
)
def join_large_agg(spark, sf_dir):
    t = _t(spark, sf_dir, "lineitem", "orders")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_items"), dsum(revenue, 4).alias("revenue"))
    )


@register(
    "semi_join_exists",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    """,
    doc="EXISTS as left-semi join: no row multiplication, early-out probe.",
    tags=("join",),
)
def semi_join_exists(spark, sf_dir):
    t = _t(spark, sf_dir, "customer", "orders")
    urgent = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        t["customer"]
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
    )


@register(
    "anti_join_not_exists",
    oracle="""
    SELECT COUNT(*) AS n_customers_without_orders FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    doc="NOT EXISTS as left-anti join.",
    tags=("join",),
)
def anti_join_not_exists(spark, sf_dir):
    t = _t(spark, sf_dir, "customer", "orders")
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .agg(F.count("*").alias("n_customers_without_orders"))
    )


# ---------------------------------------------------------------------------
# Set operations + multi-dimensional aggregation (SURVEY §2.9).
# ---------------------------------------------------------------------------

def _custkeys_in_year(t, year: int):
    return (
        t["orders"]
        .filter(
            (F.col("o_orderdate") >= F.lit(f"{year}-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{year + 1}-01-01").cast("timestamp"))
        )
        .select("o_custkey")
    )


_Y_SQL = (
    "SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '{y}-01-01' "
    "AND o_orderdate < TIMESTAMP '{y1}-01-01'"
)


@register(
    "set_union",
    oracle=f"""
    SELECT o_custkey FROM ({_Y_SQL.format(y=1995, y1=1996)})
    UNION
    SELECT o_custkey FROM ({_Y_SQL.format(y=1996, y1=1997)})
    """,
    doc="UNION DISTINCT of key sets (export ∪ stream analog, SURVEY ST2).",
    tags=("setop",),
)
def set_union(spark, sf_dir):
    t = _t(spark, sf_dir, "orders")
    return _custkeys_in_year(t, 1995).union(_custkeys_in_year(t, 1996)).distinct()


@register(
    "set_intersect",
    oracle=f"""
    SELECT o_custkey FROM ({_Y_SQL.format(y=1995, y1=1996)})
    INTERSECT
    SELECT o_custkey FROM ({_Y_SQL.format(y=1996, y1=1997)})
    """,
    doc="INTERSECT of key sets.",
    tags=("setop",),
)
def set_intersect(spark, sf_dir):
    t = _t(spark, sf_dir, "orders")
    return _custkeys_in_year(t, 1995).intersect(_custkeys_in_year(t, 1996))


@register(
    "set_except",
    oracle=f"""
    SELECT o_custkey FROM ({_Y_SQL.format(y=1995, y1=1996)})
    EXCEPT
    SELECT o_custkey FROM ({_Y_SQL.format(y=1996, y1=1997)})
    """,
    doc="EXCEPT of key sets.",
    tags=("setop",),
)
def set_except(spark, sf_dir):
    t = _t(spark, sf_dir, "orders")
    return _custkeys_in_year(t, 1995).subtract(_custkeys_in_year(t, 1996))


@register(
    "rollup_agg",
    oracle="""
    SELECT r_name, n_name, COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE) AS sum_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    doc="ROLLUP hierarchy totals (region → nation → grand total).",
    tags=("agg", "groupingsets"),
)
def rollup_agg(spark, sf_dir):
    t = _t(spark, sf_dir, "customer", "nation", "region")
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .rollup("r_name", "n_name")
        .agg(F.count("*").alias("n"), dsum(F.col("c_acctbal")).alias("sum_acctbal"))
    )


@register(
    "cube_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE: all grouping-set combinations in one pass (expand + partial agg).",
    tags=("agg", "groupingsets"),
)
def cube_agg(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), dsum(F.col("l_quantity")).alias("sum_qty")
    )


@register(
    "pivot_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS "O",
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS "F"
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Pivot: rows → columns on a low-cardinality key (explicit value list — "
    "never let pivot scan for distinct values at scale).",
    tags=("agg", "pivot"),
)
def pivot_agg(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(dsum(F.col("l_quantity")))
    )


# ---------------------------------------------------------------------------
# Window-function family (SURVEY §2.9; top_hits analog is above). All
# windows partition by a high-cardinality key so state per partition is
# bounded — no global windows.
# ---------------------------------------------------------------------------

@register(
    "window_rank_per_group",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice, rnk, drnk FROM (
      SELECT p_brand, p_partkey, p_retailprice,
             RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS rnk,
             DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS drnk
      FROM part
    ) WHERE rnk <= 3
    """,
    doc="rank/dense_rank per group, top-3 by price within brand.",
    tags=("window",),
)
def window_rank_per_group(spark, sf_dir):
    p = _t(spark, sf_dir, "part")["part"]
    w = W.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc())
    return (
        p.withColumn("rnk", F.rank().over(w))
        .withColumn("drnk", F.dense_rank().over(w))
        .filter(F.col("rnk") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", "rnk", "drnk")
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,2)))
                OVER (PARTITION BY l_orderkey
                      ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
    FROM lineitem
    """,
    doc="Cumulative sum per order (frame: unbounded preceding → current row). "
    "(l_orderkey, l_linenumber) is not unique in the synthetic data, so the "
    "ordering carries a full tie-break chain to stay deterministic.",
    tags=("window",),
)
def window_running_sum(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    w = (
        W.partitionBy("l_orderkey")
        .orderBy(
            "l_linenumber", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"
        )
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.sum(F.col("l_quantity").cast("decimal(28,2)"))
        .over(w)
        .cast("double")
        .alias("running_qty"),
    )


@register(
    "window_lag_delta",
    oracle="""
    SELECT event_id, user_id,
           value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
    FROM events
    """,
    doc="lag(): per-user delta between consecutive events.",
    tags=("window", "time"),
)
def window_lag_delta(spark, sf_dir):
    e = _t(spark, sf_dir, "events")["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


@register(
    "sessionization",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE OR
                  LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    )
    SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions FROM flagged
    GROUP BY user_id
    """,
    doc="Sessionization via lag+gap>30min cumulative flags (batch twin of "
    "streaming session_window).",
    tags=("window", "time", "streaming"),
)
def sessionization(spark, sf_dir):
    e = _t(spark, sf_dir, "events")["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    new_session = F.when(
        gap.isNull() | (gap > 30 * 60), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        e.withColumn("new_session", new_session)
        .groupBy("user_id")
        .agg(F.sum("new_session").cast("bigint").alias("n_sessions"))
    )


# ---------------------------------------------------------------------------
# CDC / keyed-upsert analogs (SURVEY §2.4 K1): last-write-wins materialization
# expressed over the events table so the DuckDB oracle can check it. The
# streaming implementation of the same semantics lives in streaming/pipeline.py.
# ---------------------------------------------------------------------------

@register(
    "keyed_upsert_latest",
    oracle="""
    SELECT user_id, event_id, event_type, value FROM (
      SELECT user_id, event_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    doc="K1 last-write-wins by key: the per-key latest image that the keyed "
    "upsert sink materializes (reference: document_id+action, "
    "custom_resource.py:350-351).",
    tags=("cdc", "window"),
)
def keyed_upsert_latest(spark, sf_dir):
    e = _t(spark, sf_dir, "events")["events"]
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "value")
    )


@register(
    "cdc_route_counts",
    oracle="""
    SELECT CASE event_type WHEN 'click' THEN 'fare'
                           WHEN 'view' THEN 'flight'
                           ELSE 'dropped' END AS route,
           COUNT(*) AS n
    FROM events GROUP BY 1
    """,
    doc="R1–R3 content-based routing with the silent drop made observable: "
    "events routed to two sinks, unrouted counted as 'dropped' "
    "(reference: custom_resource.py:340-342, drop is implicit).",
    tags=("cdc", "route"),
)
def cdc_route_counts(spark, sf_dir):
    e = _t(spark, sf_dir, "events")["events"]
    route = (
        F.when(F.col("event_type") == "click", "fare")
        .when(F.col("event_type") == "view", "flight")
        .otherwise("dropped")
    )
    return e.groupBy(route.alias("route")).agg(F.count("*").alias("n"))


@register(
    "json_extract_agg",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(CAST(props->>'$.k' AS BIGINT) AS DECIMAL(28,0))) AS DOUBLE) AS sum_k
    FROM events GROUP BY event_type
    """,
    doc="Semi-structured JSON payload extraction (props column; DynamoDB-JSON "
    "codec is the richer variant in functions/ddb.py).",
    tags=("json", "agg"),
)
def json_extract_agg(spark, sf_dir):
    e = _t(spark, sf_dir, "events")["events"]
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"), dsum(k, 0).alias("sum_k")
    )


@register(
    "scalar_functions",
    oracle="""
    SELECT o_orderkey,
           upper(o_orderstatus) AS status_u,
           substr(o_orderpriority, 3) AS prio_name,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(month(o_orderdate) AS BIGINT) AS mo,
           floor(o_totalprice / 1000.0 * 100) / 100 AS price_k,
           length(o_orderpriority) AS prio_len
    FROM orders WHERE o_orderkey <= 500
    """,
    doc="Scalar function library parity: string/date/math expressions "
    "(SURVEY §2.9 scalar functions row).",
    tags=("scalar",),
)
def scalar_functions(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")["orders"]
    return o.filter(F.col("o_orderkey") <= 500).select(
        "o_orderkey",
        F.upper("o_orderstatus").alias("status_u"),
        F.substring("o_orderpriority", 3, 2147483647).alias("prio_name"),
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").cast("bigint").alias("mo"),
        # floor-based truncation: round() on doubles disagrees across engines
        # at binary-representation boundaries; floor of the same double is
        # bit-deterministic in both.
        (F.floor(F.col("o_totalprice") / 1000.0 * 100) / 100).alias("price_k"),
        F.length("o_orderpriority").cast("bigint").alias("prio_len"),
    )


# Extension families (dedup / similarity / text / multimodal, then
# subqueries / funnels / cohorts / components) register themselves on
# import; kept in sibling modules to bound file size.
from . import catalog_ext  # noqa: E402,F401
from . import catalog_analytics  # noqa: E402,F401
from . import catalog_tpch  # noqa: E402,F401
from . import catalog_pipeline  # noqa: E402,F401
from . import catalog_dsl_tail  # noqa: E402,F401
from . import catalog_ppl  # noqa: E402,F401
