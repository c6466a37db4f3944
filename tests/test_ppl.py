"""PPL compiler tests: every command recomputed with plain DataFrame
ops or hand-computed closed forms over a small in-memory frame
(SURVEY §5 strategy). The sf-backed catalog entries carry the DuckDB
oracles; these tests pin the per-command semantics and the error
surface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opensearch_dynamodb_etl_cdk_spark.operators.ppl import PPLError, ppl_query
from opensearch_dynamodb_etl_cdk_spark.sources.fixture_gen import gen_corpus
from opensearch_dynamodb_etl_cdk_spark.streaming.pipeline import (
    FlightsEtlPipeline,
    PipelineConfig,
)


@pytest.fixture(scope="module")
def tables(spark):
    sales = spark.createDataFrame(
        [
            (1, "a", "red", 10.0, "2024-01-01 00:10:00"),
            (2, "a", "blue", 20.0, "2024-01-01 10:00:00"),
            (3, "b", "red", 30.0, "2024-01-02 00:00:00"),
            (4, "b", "red", 5.0, "2024-01-02 12:00:00"),
            (5, "c", None, 40.0, "2024-01-03 00:00:00"),
            (6, "a", "blue", 15.0, "2024-01-03 08:00:00"),
        ],
        "id long, grp string, color string, amount double, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp")).cache()
    dims = spark.createDataFrame(
        [("a", "alpha"), ("b", "beta")], "grp string, label string"
    )
    logs = spark.createDataFrame(
        [(1, "GET /api/a 200"), (2, "POST /api/b 500"), (3, "bad line")],
        "id long, msg string",
    )
    sales.count()
    return {"sales": sales, "dims": dims, "logs": logs}


@pytest.fixture(scope="module")
def run(tables):
    def _run(q):
        return ppl_query(q, lambda n: tables[n])
    return _run


def rows(df):
    return [tuple(r) for r in df.collect()]


def test_search_where_fields_sort_head(run, tables):
    out = run("search source=sales amount > 5 | where color = 'red' "
              "| fields id, amount | sort -amount | head 2")
    assert rows(out) == [(3, 30.0), (1, 10.0)]
    # bare `source=` and +prefix sort
    out = run("source=sales | fields id | sort +id | head 3")
    assert rows(out) == [(1,), (2,), (3,)]


def test_fields_exclude_and_eval(run):
    out = run("source=sales | eval doubled = amount * 2, tag = upper(grp) "
              "| fields - ts, color | sort id | head 1")
    r = out.collect()[0]
    assert r["doubled"] == 20.0 and r["tag"] == "A"
    assert "ts" not in out.columns and "color" not in out.columns


def test_stats_by_exact(run, tables):
    out = run("source=sales | stats count() as cnt, sum(amount) as total, "
              "avg(amount) as mean by grp | sort grp")
    assert rows(out) == [
        ("a", 3, 45.0, 15.0), ("b", 2, 35.0, 17.5), ("c", 1, 40.0, 40.0),
    ]
    # global stats (no by)
    out = run("source=sales | stats min(amount) as lo, max(amount) as hi, "
              "dc(color) as colors")
    assert rows(out) == [(5.0, 40.0, 2)]


def test_stats_variance_and_percentile(run):
    out = run("source=sales | stats var_pop(amount) as vp, "
              "stddev_samp(amount) as sd, percentile(amount, 50) as p50")
    vals = [10.0, 20.0, 30.0, 5.0, 40.0, 15.0]
    n = len(vals)
    mean = sum(vals) / n
    vp = sum((v - mean) ** 2 for v in vals) / n
    sd = (sum((v - mean) ** 2 for v in vals) / (n - 1)) ** 0.5
    r = out.collect()[0]
    assert abs(r["vp"] - vp) < 1e-9
    assert abs(r["sd"] - sd) < 1e-9
    assert r["p50"] == 17.5


def test_stats_span_buckets(run):
    out = run("source=sales | stats sum(amount) as total by span(ts, 1d) "
              "| sort ts_span")
    got = [(str(r["ts_span"]), r["total"]) for r in out.collect()]
    assert got == [
        ("2024-01-01 00:00:00", 30.0),
        ("2024-01-02 00:00:00", 35.0),
        ("2024-01-03 00:00:00", 55.0),
    ]
    # numeric span
    out = run("source=sales | stats count() as c by span(amount, 20) "
              "| sort amount_span")
    assert rows(out) == [(0.0, 3), (20.0, 2), (40.0, 1)]


def test_eventstats_appends_without_collapsing(run, tables):
    out = run("source=sales | eventstats avg(amount) as grp_mean by grp "
              "| where amount > grp_mean | sort id")
    # group means: a=15, b=17.5, c=40 → above-mean rows: id2 (20>15), id3
    assert [r["id"] for r in out.collect()] == [2, 3]
    assert out.count() == 2


def test_dedup_respects_sort_order(run):
    out = run("source=sales | sort -amount | dedup grp | sort grp")
    # highest-amount row per grp
    assert [(r["grp"], r["amount"]) for r in out.collect()] == [
        ("a", 20.0), ("b", 30.0), ("c", 40.0)]
    # dedup N keeps up to N per key; unsorted falls back to
    # deterministic whole-row order
    out = run("source=sales | dedup 2 grp")
    assert out.count() == 5  # 2+2+1
    assert rows(out) == rows(run("source=sales | dedup 2 grp"))


def test_top_and_rare(run):
    out = run("source=sales | top 1 color")
    assert rows(out) == [("red", 3)]
    out = run("source=sales | rare 1 color")
    # null group excluded? public top/rare count null as a group; ours
    # keeps whatever groupBy yields — nulls group together
    first = out.collect()[0]
    assert first["count"] == 1
    out = run("source=sales | top 1 color by grp | sort grp")
    got = [(r["grp"], r["color"], r["count"]) for r in out.collect()]
    assert got == [("a", "blue", 2), ("b", "red", 2), ("c", None, 1)]


def test_parse_named_groups(run):
    out = run(r"source=logs | parse msg '(?<verb>[A-Z]+) (?<path>\S+) "
              r"(?<status>\d+)' | where status != '' | sort id "
              r"| fields verb, path, status")
    assert rows(out) == [("GET", "/api/a", "200"), ("POST", "/api/b", "500")]


def test_fillnull_and_rename(run):
    out = run("source=sales | fillnull with 'none' in color "
              "| rename color as colour | sort id | fields colour")
    assert [r["colour"] for r in out.collect()][4] == "none"


def test_lookup_broadcast_enrich(run):
    out = run("source=sales | lookup dims grp | sort id | fields id, label")
    got = [r["label"] for r in out.collect()]
    assert got == ["alpha", "alpha", "beta", "beta", None, "alpha"]


def test_trendline_sma(run):
    out = run("source=sales | sort id | trendline sma(2, amount) as sma2 "
              "| fields id, sma2")
    got = [r["sma2"] for r in out.collect()]
    assert got[0] is None  # window not filled yet
    assert got[1:] == [15.0, 25.0, 17.5, 22.5, 27.5]
    with pytest.raises(PPLError):
        run("source=sales | trendline sma(2, amount)")  # no sort


def test_multi_source_union(run, tables):
    out = run("source=sales,sales | stats count() as c")
    assert rows(out) == [(12,)]


def test_error_surface(run):
    with pytest.raises(PPLError):
        run("from sales")  # must start with source=
    with pytest.raises(PPLError):
        run("source=sales | frobnicate x")
    with pytest.raises(PPLError):
        run("source=sales | stats amount")  # not an aggregate call
    with pytest.raises(PPLError):
        run("source=sales | stats sum(amount) by span(ts)")  # bad span
    # script-sandbox: JVM escape hatches blocked in expressions
    with pytest.raises(PermissionError):
        run("source=sales | where reflect('java.lang.System', 'exit') = 0")


def test_by_keyword_only_at_top_level(run):
    # `by` inside a quoted string must not split the stats clause
    out = run("source=logs | where msg != 'stand by me' "
              "| stats count() as c")
    assert rows(out) == [(3,)]


@pytest.fixture(scope="module")
def booted(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ppl_pipe")
    cfg = PipelineConfig(index_root=str(tmp / "i"),
                         checkpoint_root=str(tmp / "c"))
    p = FlightsEtlPipeline(spark, cfg)
    items = spark.createDataFrame(
        [(s,) for s in gen_corpus()], "item_json string"
    )
    p.bootstrap(items)
    return p


def test_pipeline_ppl_entrypoint(booted):
    """The _plugins/_ppl analog resolves index names to live views."""
    out = booted.ppl("source=fare | stats count() as n by pk | sort pk")
    assert out.count() >= 1
    direct = booted.multi_index_view("fare").groupBy("pk").count().count()
    assert out.count() == direct
    with pytest.raises(ValueError):
        booted.ppl("source=missing_index | head 1")


def test_ppl_plan_pushdown(spark, sf_dir):
    """where/fields stages reach the scan: pushed filter, pruned
    ReadSchema, TakeOrdered fusion for sort+head."""
    from opensearch_dynamodb_etl_cdk_spark.plans.catalog import CATALOG

    df = CATALOG["ppl_where_sort_head"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThan(l_quantity,45" in plan
    assert "TakeOrderedAndProject" in plan
    import re as _re

    rs = _re.search(r"ReadSchema: struct<([^>]*)>", plan).group(1)
    read_cols = {c.split(":")[0] for c in rs.split(",")}
    assert read_cols == {"l_orderkey", "l_linenumber", "l_quantity",
                         "l_returnflag"}


def test_grok_pattern_library(run):
    out = run(r"source=logs | grok msg '%{WORD:verb} %{NOTSPACE:path} "
              r"%{INT:status:int}' | where status is not null "
              r"| sort id | fields verb, path, status")
    assert rows(out) == [("GET", "/api/a", 200), ("POST", "/api/b", 500)]
    # typed cast: status is a bigint now
    assert dict(out.dtypes)["status"] == "bigint"
    with pytest.raises(PPLError):
        run("source=logs | grok msg '%{NOPE:x}'")
    with pytest.raises(PPLError):
        run("source=logs | grok msg 'no bindings here'")


def test_grok_ip_and_number(run, tables):
    df = tables["logs"].sparkSession.createDataFrame(
        [(1, "10.0.0.1 took 3.5ms"), (2, "256.1.1.1 took 7ms")],
        "id long, msg string",
    )
    out = ppl_query(
        "source=t | grok msg '%{IP:ip} took %{NUMBER:ms:float}ms' "
        "| sort id | fields ip, ms",
        lambda n: df,
    )
    got = rows(out)
    assert got[0] == ("10.0.0.1", 3.5)
    # unanchored (public grok semantics): "256.1.1.1" yields the valid
    # IPv4 substring starting one character in
    assert got[1] == ("56.1.1.1", 7.0)


def test_describe_command(run, tables):
    out = run("describe sales")
    got = {r["col_name"]: r["data_type"] for r in out.collect()}
    assert got["amount"] == "double" and got["ts"] == "timestamp"
    with pytest.raises(PPLError):
        run("describe sales | head 1")


def test_expand_and_flatten(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b"], {"x": 1, "y": "p"}),
         (2, [], {"x": 2, "y": "q"}),
         (3, None, {"x": 3, "y": "r"})],
        "id long, tags array<string>, meta struct<x:long, y:string>",
    )
    out = ppl_query("source=t | expand tags | sort id, tags",
                    lambda n: df)
    got = [(r["id"], r["tags"]) for r in out.collect()]
    # empty/null arrays keep their row with a null element
    assert got == [(1, "a"), (1, "b"), (2, None), (3, None)]
    out = ppl_query("source=t | flatten meta | where x >= 2 | sort id "
                    "| fields id, x, y", lambda n: df)
    assert rows(out) == [(2, 2, "q"), (3, 3, "r")]
    with pytest.raises(PPLError):
        ppl_query("source=t | flatten tags", lambda n: df)  # not a struct
    # expand with alias keeps the original name free
    out = ppl_query("source=t | expand tags as tag | where tag = 'a'",
                    lambda n: df)
    assert [r["id"] for r in out.collect()] == [1]


# ---------------------------------------------------------- lexer props

from hypothesis import given, settings
from hypothesis import strategies as st

from opensearch_dynamodb_etl_cdk_spark.operators.ppl import (
    _expand_grok,
    _named_groups,
    _parse_call,
    _split_top,
)

_atom = st.text(
    alphabet="abcXYZ01_ ", min_size=0, max_size=8
).map(str.strip)


@settings(max_examples=200, deadline=None)
@given(st.lists(_atom.filter(bool), min_size=1, max_size=6))
def test_split_top_round_trips_plain_parts(parts):
    # no separators/quotes/parens inside parts → split(join) == parts
    assert _split_top(",".join(parts), ",") == parts


@settings(max_examples=200, deadline=None)
@given(_atom, _atom)
def test_split_top_respects_quotes_and_parens(a, b):
    s = f"f({a}, {b}), '{a},{b}', tail"
    parts = _split_top(s, ",")
    # the quoted and parenthesized commas never split
    assert len(parts) == 3
    assert parts[0].startswith("f(") and parts[0].endswith(")")
    assert parts[1].startswith("'") and parts[1].endswith("'")
    assert parts[2] == "tail"


@settings(max_examples=200, deadline=None)
@given(st.sampled_from(["sum", "avg", "count", "span"]),
       _atom.filter(bool))
def test_parse_call_inverse(fn, arg):
    got = _parse_call(f"{fn}({arg})")
    assert got == (fn, arg)
    # trailing junk is not a bare call
    assert _parse_call(f"{fn}({arg}) + 1") is None
    # a bare identifier is not a call
    assert _parse_call(fn) is None


@settings(max_examples=100, deadline=None)
@given(st.lists(
    st.from_regex(r"[A-Za-z][A-Za-z0-9]{0,5}", fullmatch=True),
    min_size=1, max_size=4, unique=True,
))
def test_grok_named_group_indices(names):
    pattern = " ".join(f"%{{WORD:{n}}}" for n in names)
    regex, _ = _expand_grok(pattern)
    groups = _named_groups(regex)
    # every alias present, indices are 1..n in order
    assert list(groups) == names
    assert list(groups.values()) == list(range(1, len(names) + 1))


def test_grok_pattern_library_is_sane():
    """Every built-in grok primitive compiles in Python re AND contains
    no capturing groups (the expansion's alias→index mapping depends on
    that invariant)."""
    import re as _re

    from opensearch_dynamodb_etl_cdk_spark.operators.ppl import (
        _GROK_PATTERNS,
    )

    for name, pat in _GROK_PATTERNS.items():
        compiled = _re.compile(pat)
        assert compiled.groups == 0, f"{name} has capturing groups"
    # smoke-match each primitive against a representative sample
    samples = {
        "WORD": "hello", "NOTSPACE": "a/b?c=1", "INT": "-42",
        "NUMBER": "3.14", "USERNAME": "svc-user_1",
        "IP": "192.168.0.1", "UUID": "123e4567-e89b-12d3-a456-426614174000",
        "LOGLEVEL": "WARN", "TIMESTAMP_ISO8601": "2024-01-02T03:04:05Z",
        "HTTPDATE": "10/Oct/2024:13:55:36 -0700", "HOSTNAME": "a.example.com",
    }
    for name, sample in samples.items():
        assert _re.fullmatch(_GROK_PATTERNS[name], sample), name


def test_fillnull_numeric_column(run):
    """`fillnull with 0 in <double field>` must coerce the literal to
    the column type (r5 advisor: fillna silently skips type-mismatched
    subset columns, leaving the nulls in place)."""
    out = run("source=sales | eval halved = if(amount > 18.0, amount, "
              "null) | fillnull with 0 in halved | sort id "
              "| fields halved")
    got = [r["halved"] for r in out.collect()]
    assert got == [0.0, 20.0, 30.0, 0.0, 40.0, 0.0]
    # string columns keep working, and unknown fields raise
    out = run("source=sales | fillnull with 'none' in color | sort id "
              "| fields color")
    assert [r["color"] for r in out.collect()][4] == "none"
    with pytest.raises(PPLError):
        run("source=sales | fillnull with 0 in nope")


def test_join_command(run, tables):
    out = run("source=sales | join type=inner dims on grp = grp "
              "| sort id | fields id, label")
    assert [r["label"] for r in out.collect()] == [
        "alpha", "alpha", "beta", "beta", "alpha"]  # grp c drops (inner)
    out = run("source=sales | join type=left dims on grp = grp | sort id")
    assert out.count() == 6  # left keeps the c row with null label
    out = run("source=sales | join type=anti dims on grp = grp")
    assert [r["grp"] for r in out.collect()] == ["c"]
    out = run("source=sales | join type=semi dims on grp = grp")
    assert out.count() == 5 and "label" not in out.columns
    with pytest.raises(PPLError, match="join type"):
        run("source=sales | join type=cross dims on grp = grp")
    with pytest.raises(PPLError, match="join key"):
        run("source=sales | join dims on grp")


def test_join_right_key_colliding_with_left_column(run):
    # rk != lk where rk ALSO names a left column: the right copy must
    # drop (same left-wins rule as other overlaps) so later stages can
    # reference the name without an ambiguous-column error
    out = run("source=sales | join type=left dims on color = grp "
              "| sort id | fields id, grp, label")
    got = [(r["grp"], r["label"]) for r in out.collect()]
    # grp is the LEFT column, intact; no dims row keys on a color value
    assert [g for g, _ in got] == ["a", "a", "b", "b", "c", "a"]
    assert all(lbl is None for _, lbl in got)
    # a later where on the colliding name still resolves
    out = run("source=sales | join type=left dims on color = grp "
              "| where grp = 'b' | fields id")
    assert sorted(r["id"] for r in out.collect()) == [3, 4]


def test_join_full_right_only_rows_keep_colliding_key(run):
    # rk != lk collision under a FULL join: right-only rows carry
    # their key only in the right copy — it must coalesce into the
    # surviving column, not drop (else those rows lose their key)
    out = run("source=sales | join type=full dims on color = grp "
              "| fields color, grp, label")
    rows = [(r["color"], r["grp"], r["label"]) for r in out.collect()]
    # no sales.color equals a dims.grp, so dims a/b are right-only:
    # their key must survive in the unified key column (lk = color);
    # the right's colliding DATA copy of grp drops (left wins)
    assert ("a", None, "alpha") in rows and ("b", None, "beta") in rows
    assert all(c is not None for c, _g, lbl in rows if lbl is not None)


def test_join_same_right_key_in_two_pairs(spark):
    # one right key backing TWO pairs, colliding with a left column:
    # must reuse a single temp alias (a second rename would no-op and
    # the condition would reference an unresolvable column)
    left = spark.createDataFrame(
        [(1, "x", "x", "z"), (2, "x", "y", "w")],
        "id long, a string, b string, k string",
    )
    right = spark.createDataFrame([("x", 9)], "k string, n long")
    out = ppl_query(
        "source=L | join type=inner R on a = k, b = k | sort id",
        {"L": left, "R": right}.__getitem__,
    )
    rows = [tuple(r) for r in out.collect()]
    assert rows == [(1, "x", "x", "z", 9)]  # left k ('z') wins, one row


def test_join_full_multi_pair_right_key_fills_all_left_keys(spark):
    # one right key backing TWO pairs under a FULL join: a right-only
    # row must receive the coalesced key in EVERY left key column the
    # shared temp backs, not only the first pair's
    left = spark.createDataFrame(
        [(1, "x", "y", "z")], "id long, a string, b string, k string")
    right = spark.createDataFrame([("x", 9)], "k string, n long")
    out = ppl_query(
        "source=L | join type=full R on a = k, b = k",
        {"L": left, "R": right}.__getitem__,
    )
    rows = {(r["id"], r["a"], r["b"], r["k"], r["n"])
            for r in out.collect()}
    assert (1, "x", "y", "z", None) in rows  # left-only row intact
    # right-only row: BOTH a and b carry the right key (b previously
    # stayed NULL — the key silently vanished from the second pair)
    assert (None, "x", "x", None, 9) in rows


def test_appendcol_command(run):
    out = run("source=sales | appendcol [ stats avg(amount) as "
              "mean_amount ] | sort id | fields id, amount, mean_amount")
    rows = out.collect()
    assert all(r["mean_amount"] == pytest.approx(20.0) for r in rows)
    assert [r["id"] for r in rows] == [1, 2, 3, 4, 5, 6]
    with pytest.raises(PPLError, match="exactly one row"):
        run("source=sales | appendcol [ fields amount ]")
    with pytest.raises(PPLError, match="appendcol"):
        run("source=sales | appendcol stats count()")


def test_patterns_command(run):
    out = run("source=logs | patterns msg | sort id "
              "| fields msg, patterns_field")
    got = [r["patterns_field"] for r in out.collect()]
    # alphanumeric runs strip; the punctuation skeleton remains
    assert got == [" // ", " // ", " "]
    out = run("source=logs | patterns msg new_field=tpl pattern='[0-9]+'"
              " | sort id | fields tpl")
    assert out.collect()[0]["tpl"] == "GET /api/a "


def test_fieldsummary_command(run):
    out = run("source=sales | fieldsummary includefields=grp, amount")
    rows = {r["field"]: r for r in out.collect()}
    assert rows["grp"]["count"] == 6 and rows["grp"]["distinct"] == 3
    assert rows["amount"]["avg"] == pytest.approx(20.0)
    assert rows["amount"]["min"] == "5.0"
    assert rows["grp"]["nulls"] == 0 and rows["grp"]["avg"] is None
    # color has one null
    out = run("source=sales | fieldsummary includefields=color")
    assert out.collect()[0]["nulls"] == 1
    with pytest.raises(PPLError, match="unknown fields"):
        run("source=sales | fieldsummary includefields=nope")


def test_join_full_coalesces_colliding_key(run):
    out = run("source=sales | join type=full dims on grp = grp "
              "| fields grp, label")
    rows = [(r["grp"], r["label"]) for r in out.collect()]
    # right/full join keeps the key for right-only rows (none here; add
    # one by joining the other way: dims has only a,b — sales has c)
    assert all(g is not None for g, _ in rows)
    out = run("source=dims | join type=full sales on grp = grp "
              "| fields grp")
    # sales' c row survives with its key intact
    assert "c" in {r["grp"] for r in out.collect()}
    assert all(r["grp"] is not None for r in out.collect())


def test_kmeans_command(run):
    out = run("source=sales | kmeans centroids=2 fields=amount, id "
              "| fields id, ClusterID")
    rows = out.collect()
    assert len(rows) == 6 and "ClusterID" in out.columns
    assert len({r["ClusterID"] for r in rows}) <= 2
    # reproducible: deterministic init → identical assignment on rerun
    again = run("source=sales | kmeans centroids=2 fields=amount, id "
                "| fields id, ClusterID").collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    with pytest.raises(PPLError, match="kmeans"):
        run("source=sales | kmeans fields=amount")
    with pytest.raises(PPLError, match="unknown fields"):
        run("source=sales | kmeans centroids=2 fields=nope")


def test_ad_command(run, tables):
    # global (no `by`): amounts 10,20,30,5,40,15 — median 17.5,
    # MAD = median(|x-17.5|) = median(7.5,2.5,12.5,12.5,22.5,2.5) = 10
    out = run("source=sales | ad field=amount | fields id, anomaly_score,"
              " anomalous")
    got = {r["id"]: (r["anomaly_score"], r["anomalous"])
           for r in out.collect()}
    assert got[5][0] == pytest.approx(22.5 / (10.0 * 1.4826))
    assert all(not a for (_, a) in got.values())  # none exceed 3.0
    # threshold override flips the verdict
    out = run("source=sales | ad field=amount threshold=1.0")
    flagged = {r["id"] for r in out.collect() if r["anomalous"]}
    assert flagged == {5}  # only 22.5/14.826 = 1.52 exceeds 1.0
    # per-category: group b = (30, 5) → median 17.5, MAD 12.5
    out = run("source=sales | ad field=amount by grp")
    s = {r["id"]: r["anomaly_score"] for r in out.collect()}
    assert s[3] == pytest.approx(12.5 / (12.5 * 1.4826))
    # degenerate group (MAD 0): median row scores 0, others threshold+1
    out = run("source=dims | eval v = 1.0 | ad field=v by grp")
    assert all(r["anomaly_score"] == 0.0 for r in out.collect())
    with pytest.raises(PPLError, match="ad expects"):
        run("source=sales | ad amount")
    with pytest.raises(PPLError, match="unknown field"):
        run("source=sales | ad field=nope")
    with pytest.raises(PPLError, match="unknown category"):
        run("source=sales | ad field=amount by nope")


def test_ad_mode_approx_matches_exact_at_small_scale(run):
    # the sketch answers nearest-rank percentiles; at accuracy 10000 it
    # retains every value at test scale, so on ODD-sized groups (where
    # interpolation is a no-op) mode=approx coincides with mode=exact
    # bit for bit — the defining invariant the rows-only catalog row
    # ppl_ad_anomalies_approx relies on. grp b has 2 rows; exclude it.
    exact = run("source=sales | where grp != 'b' "
                "| ad field=amount by grp | sort id")
    approx = run("source=sales | where grp != 'b' "
                 "| ad field=amount by grp mode=approx | sort id")
    assert [tuple(r) for r in exact.collect()] == \
        [tuple(r) for r in approx.collect()]
    with pytest.raises(PPLError, match="ad expects"):
        run("source=sales | ad field=amount mode=guess")


def test_ad_mode_approx_plan_has_no_exact_percentile(run):
    # the scale selector's whole point: a bounded-memory sketch, never
    # a full-value-per-group percentile buffer
    plan = run("source=sales | ad field=amount by grp mode=approx") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "approx_percentile" in plan
    import re as _re

    assert not _re.search(r"(?<!approx_)percentile\(", plan)
    exact_plan = run("source=sales | ad field=amount by grp") \
        ._jdf.queryExecution().executedPlan().toString()
    assert _re.search(r"(?<!approx_)percentile\(", exact_plan)


def test_ad_by_null_category_rows_survive(run):
    # color is null for id 5: the stats re-join must be null-safe so
    # the row scores against its own (null-category) group instead of
    # silently dropping out of the output
    out = run("source=sales | ad field=amount by color")
    got = {r["id"]: r["anomaly_score"] for r in out.collect()}
    assert len(got) == 6 and 5 in got
    # the null group is the single value 40 → median 40, MAD 0,
    # degenerate rule: the median row scores 0
    assert got[5] == 0.0


def test_trendline_wma(run):
    out = run("source=sales | sort +id | trendline wma(3, amount) as w "
              "| fields id, w")
    got = {r["id"]: r["w"] for r in out.collect()}
    # ids 1..6 amounts 10,20,30,5,40,15; weights 1,2,3 (newest=3)
    assert got[1] is None and got[2] is None
    assert got[3] == pytest.approx((1 * 10 + 2 * 20 + 3 * 30) / 6.0)
    assert got[4] == pytest.approx((1 * 20 + 2 * 30 + 3 * 5) / 6.0)
    assert got[6] == pytest.approx((1 * 5 + 2 * 40 + 3 * 15) / 6.0)
    with pytest.raises(PPLError, match="trendline"):
        run("source=sales | sort +id | trendline ema(3, amount)")


def test_trendline_wma_null_window(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 30.0), (4, 40.0), (5, 50.0)],
        "id long, v double",
    )
    out = ppl_query("source=t | sort +id | trendline wma(3, v) as w",
                    lambda n: df)
    got = {r["id"]: r["w"] for r in out.collect()}
    # windows containing the NULL yield NULL (no silent misweighting);
    # the first fully-populated window is ids 3..5
    assert got[3] is None and got[4] is None
    assert got[5] == pytest.approx((30 + 2 * 40 + 3 * 50) / 6.0)


def test_explain_prefix(run):
    out = run("explain source=sales | where amount > 5 "
              "| fields id, amount | sort -amount | head 2")
    assert out.columns == ["plan"]
    plan = out.collect()[0]["plan"]
    assert "TakeOrderedAndProject" in plan  # sort+head fused to top-k
    with pytest.raises(PPLError):
        run("explain not_a_pipeline")
