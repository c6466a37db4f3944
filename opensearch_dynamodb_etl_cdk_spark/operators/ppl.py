"""PPL (Piped Processing Language) compiler → Spark DataFrame plans.

OpenSearch ships a second query language next to the DSL: PPL, a
Splunk-style pipe syntax (``search source=index | where ... | stats
... by ... | sort ... | head N``) served by the SQL/PPL plugin. A user
of the reference stack (DynamoDB → OpenSearch,
``lib/opensearch-dynamodb-etl-cdk-stack.ts``) queries the indexed data
through exactly this surface, so the engine re-expresses it Spark-first:
each pipe stage folds into ONE declarative DataFrame transformation and
the whole pipeline stays a single Catalyst plan — filters written as
``where`` stages reach the parquet scan as pushed filters, ``fields``
projections prune the read schema, and ``stats`` compiles to a regular
partial-aggregate/final-aggregate shuffle. Nothing is interpreted
row-by-row and nothing materializes between stages.

Scalar expressions use the engine's guarded Spark-SQL dialect
(:func:`..functions.scripts.safe_expr` — same sandbox as the script
query / Painless surfaces): PPL's expression grammar (``=``, ``!=``,
``and/or/not``, arithmetic, ``like``, scalar functions) is a subset of
Spark SQL's, so expressions compile directly with the JVM escape
hatches blocked.

Determinism contract (the cross-engine-testable superset of the public
semantics): ``stats`` sum/avg/var/stddev accumulate exact decimals and
surface doubles (partition-order independent — the same pattern as the
catalog's ``dsum``); ``dedup`` keeps the first row per key under the
pipeline's current ``sort`` order (falling back to a whole-row
tiebreak) where the public command keeps undefined ingestion order;
``top``/``rare`` break count ties by value ascending.

Supported commands: ``search source=``, ``where``, ``fields [+|-]``,
``eval``, ``rename``, ``stats`` (count/sum/avg/min/max/dc/
distinct_count/stddev_samp/stddev_pop/var_samp/var_pop/percentile,
``by`` fields and ``span(field, interval)`` buckets), ``eventstats``,
``sort``, ``head``, ``dedup``, ``top``, ``rare``, ``parse``, ``grok``
(built-in pattern library, ``%{PATTERN:alias[:int|:float]}``),
``expand`` (array explode), ``flatten`` (struct promotion),
``fillnull``, ``lookup`` (broadcast enrich join), ``trendline``
(``sma(N, field)``), and the ``describe <source>`` head command
(schema as rows).
"""

from __future__ import annotations

import re
from typing import Any, Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scripts import safe_expr

__all__ = ["ppl_query", "PPLError"]


class PPLError(ValueError):
    """Raised for malformed or unsupported PPL."""


# ---------------------------------------------------------------- lexing

def _split_top(s: str, sep: str) -> list[str]:
    """Split on `sep` at paren/bracket depth 0 and outside quotes."""
    parts, depth, buf, quote = [], 0, [], None
    i = 0
    while i < len(s):
        ch = s[i]
        if quote:
            buf.append(ch)
            if ch == quote and (i == 0 or s[i - 1] != "\\"):
                quote = None
        elif ch in "'\"":
            quote = ch
            buf.append(ch)
        elif ch in "([":
            depth += 1
            buf.append(ch)
        elif ch in ")]":
            depth -= 1
            buf.append(ch)
        elif ch == sep and depth == 0:
            parts.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
        i += 1
    tail = "".join(buf).strip()
    if tail or parts:
        parts.append(tail)
    return [p for p in parts if p != ""]


def _parse_call(s: str) -> tuple[str, str] | None:
    """``fn( args )`` with balanced parens → (fn, args); else None."""
    m = re.match(r"^\s*([A-Za-z_][A-Za-z0-9_]*)\s*\(", s)
    if not m:
        return None
    depth, start = 0, m.end() - 1
    for i in range(start, len(s)):
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
            if depth == 0:
                if s[i + 1:].strip():
                    return None  # trailing text → not a bare call
                return m.group(1).lower(), s[start + 1:i].strip()
    raise PPLError(f"unbalanced parentheses in {s!r}")


_SPAN_UNITS = {"s": 1, "m": 60, "h": 3600, "d": 86400, "w": 604800}


def _span_column(args: str) -> tuple[str, Column]:
    """``span(field, 1d)`` → (out_name, bucket Column).

    Time units s/m/h/d/w floor the timestamp to the interval via epoch
    arithmetic (codegen; no UDF); a bare number buckets a numeric field
    by fixed width. The bucket column is named ``<field>_span`` — a
    clean identifier (the public plugin surfaces the raw ``span(...)``
    text, which is hostile to downstream tooling)."""
    parts = _split_top(args, ",")
    if len(parts) != 2:
        raise PPLError(f"span() needs (field, interval), got {args!r}")
    field, interval = parts[0].strip(), parts[1].strip()
    m = re.match(r"^(\d+(?:\.\d+)?)([smhdw]?)$", interval)
    if not m:
        raise PPLError(f"unsupported span interval {interval!r}")
    width, unit = float(m.group(1)), m.group(2)
    name = f"{field}_span"
    if unit:
        secs = int(width * _SPAN_UNITS[unit])
        col = F.timestamp_seconds(
            (F.unix_timestamp(F.col(field)) / secs).cast("long") * secs
        )
    else:
        col = (F.floor(F.col(field) / width) * width).cast("double")
    return name, col


# ------------------------------------------------------------ aggregates

def _dsum(c: Column) -> Column:
    return F.sum(c.cast("decimal(28,6)")).cast("double")


def _agg_column(fn: str, args: str, over=None) -> Column:
    """One stats function → an aggregate Column. sum/avg/var/stddev use
    the exact-decimal accumulate pattern so results are partition-order
    independent and bit-comparable to a DuckDB oracle using the same
    casts. ``over`` (eventstats) windowizes each PRIMITIVE aggregate —
    composite forms like avg = Σ/n stay arithmetic over windowed
    primitives, which Spark accepts where `.over()` on the composite
    would not."""
    fn = fn.lower()

    def W(agg: Column) -> Column:
        return agg.over(over) if over is not None else agg

    def dsum(c: Column) -> Column:
        # window applies to the raw sum, THEN the double cast — `.over`
        # on a cast-wrapped aggregate leaves the sum un-windowed
        return W(F.sum(c.cast("decimal(28,6)"))).cast("double")

    if fn == "count":
        if not args or args == "*":
            return W(F.count(F.lit(1)))
        return W(F.count(safe_expr(args)))
    if fn in ("dc", "distinct_count"):
        if over is not None:
            return W(F.size(F.collect_set(safe_expr(args))))
        return F.count_distinct(safe_expr(args))
    c = None if not args else safe_expr(args)
    if fn == "sum":
        return dsum(c)
    if fn == "avg":
        return dsum(c) / W(F.count(c))
    if fn == "min":
        return W(F.min(c))
    if fn == "max":
        return W(F.max(c))
    if fn in ("var_samp", "var_pop", "stddev_samp", "stddev_pop"):
        # exact decimal Σx / Σx² → population/sample formula in double
        n = W(F.count(c))
        s = dsum(c)
        ss = dsum(c * c)
        denom = n if fn.endswith("_pop") else (n - F.lit(1))
        var = (ss - s * s / n) / denom
        return F.sqrt(var) if fn.startswith("stddev") else var
    if fn == "percentile":
        parts = _split_top(args, ",")
        if len(parts) != 2:
            raise PPLError("percentile needs (field, p)")
        p = float(parts[1])
        if p > 1:
            p = p / 100.0
        return W(F.percentile(safe_expr(parts[0]), F.lit(p)))
    raise PPLError(f"unsupported stats function {fn!r}")


def _parse_stats(rest: str) -> tuple[list[tuple[str, str, str]], str | None]:
    """``agg [as name], ... [by g1, span(f, 1d), ...]`` →
    ([(fn, args, out_name)], by_clause_or_None)."""
    by = None
    for m in re.finditer(r"\bby\b", rest, re.IGNORECASE):
        head = rest[:m.start()]
        # the clause separator is the first `by` at paren depth 0 and
        # outside quotes — one inside an agg expression is not it
        if (head.count("(") == head.count(")")
                and head.count("'") % 2 == 0 and head.count('"') % 2 == 0):
            rest, by = head, rest[m.end():].strip()
            break
    aggs = []
    for part in _split_top(rest, ","):
        am = re.match(r"^(.*?)(?:\s+as\s+([A-Za-z_][A-Za-z0-9_]*))?$",
                      part.strip(), re.IGNORECASE | re.DOTALL)
        expr, alias = am.group(1).strip(), am.group(2)
        call = _parse_call(expr)
        if not call:
            raise PPLError(f"stats expects aggregate calls, got {expr!r}")
        fn, args = call
        aggs.append((fn, args, alias or expr))
    return aggs, by


def _parse_by(by: str) -> tuple[list[str], list[tuple[str, Column]]]:
    """`by` clause → (plain group fields, [(span_name, span_col)])."""
    plain, spans = [], []
    for g in _split_top(by, ","):
        call = _parse_call(g)
        if call and call[0] == "span":
            spans.append(_span_column(call[1]))
        else:
            plain.append(g.strip())
    return plain, spans


# ------------------------------------------------------------- commands

def _sort_columns(spec: str) -> tuple[list[Column], list[tuple[str, bool]]]:
    cols, keys = [], []
    for part in _split_top(spec, ","):
        part = part.strip()
        asc = True
        if part.startswith("-"):
            asc, part = False, part[1:].strip()
        elif part.startswith("+"):
            part = part[1:].strip()
        low = part.lower()
        for suffix, a in ((" desc", False), (" asc", True)):
            if low.endswith(suffix):
                part, asc = part[: -len(suffix)].strip(), a
                break
        c = safe_expr(part)
        cols.append(c.asc() if asc else c.desc())
        keys.append((part, asc))
    return cols, keys


def _named_groups(pattern: str) -> dict[str, int]:
    """Map named capture groups to their 1-based group index (Java/PCRE
    ``(?<name>...)`` syntax, the form the public parse command takes)."""
    out, idx, i = {}, 0, 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "\\":
            i += 2
            continue
        if ch == "(":
            nm = re.match(r"\(\?<([A-Za-z][A-Za-z0-9]*)>", pattern[i:])
            if nm:
                idx += 1
                out[nm.group(1)] = idx
            elif not pattern.startswith("(?", i):
                idx += 1
        i += 1
    if not out:
        raise PPLError("parse pattern has no (?<name>...) capture groups")
    return out


def _unquote(s: str) -> str:
    s = s.strip()
    if len(s) >= 2 and s[0] == s[-1] and s[0] in "'\"":
        return s[1:-1]
    return s


# Built-in grok primitives (the public pattern library's common core).
# Every pattern uses NON-capturing groups only, so the expanded regex's
# capture indices map 1:1 to the %{...:name} aliases.
_GROK_PATTERNS = {
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "SPACE": r"\s*",
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "IP": r"(?:(?:25[0-5]|2[0-4]\d|[01]?\d?\d)\.){3}"
          r"(?:25[0-5]|2[0-4]\d|[01]?\d?\d)",
    "HOSTNAME": r"\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})"
                r"(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\.?\b",
    "UUID": r"[0-9a-fA-F]{8}(?:-[0-9a-fA-F]{4}){3}-[0-9a-fA-F]{12}",
    "LOGLEVEL": r"(?:TRACE|DEBUG|INFO|WARN(?:ING)?|ERROR|FATAL|"
                r"SEVERE|CRITICAL)",
    "TIMESTAMP_ISO8601": r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}"
                         r"(?::\d{2}(?:\.\d+)?)?(?:Z|[+-]\d{2}:?\d{2})?",
    "HTTPDATE": r"\d{2}/\w{3}/\d{4}:\d{2}:\d{2}:\d{2} [+-]\d{4}",
}

_GROK_REF = re.compile(
    r"%\{(\w+)(?::([A-Za-z][A-Za-z0-9]*))?(?::(int|float))?\}"
)


def _expand_grok(pattern: str) -> tuple[str, dict[str, str]]:
    """``%{PATTERN:alias[:type]}`` references → one Java regex with
    ``(?<alias>...)`` groups, plus the alias→cast map."""
    casts: dict[str, str] = {}

    def repl(m: re.Match) -> str:
        name, alias, typ = m.group(1), m.group(2), m.group(3)
        base = _GROK_PATTERNS.get(name)
        if base is None:
            raise PPLError(f"unknown grok pattern %{{{name}}}")
        if alias:
            if typ:
                casts[alias] = typ
            return f"(?<{alias}>{base})"
        return f"(?:{base})"

    regex = _GROK_REF.sub(repl, pattern)
    if not casts and "?<" not in regex:
        raise PPLError("grok pattern binds no %{PATTERN:alias} fields")
    return regex, casts


def ppl_query(
    query: str,
    resolve: Callable[[str], DataFrame],
) -> DataFrame:
    """Compile a PPL pipeline into one DataFrame plan.

    ``resolve`` maps a source name (index/table) to its DataFrame —
    the pipeline object passes its index views, the catalog passes
    parquet table loaders. Multi-source names (``source=a,b``) resolve
    each and union by name (the public multi-index search semantics).
    """
    q0 = query.strip()
    if re.match(r"^explain\s", q0, re.IGNORECASE):
        # public `explain <pipeline>`: the execution plan instead of
        # rows — here that is the Catalyst physical plan (pushdown /
        # pruning / codegen visible), the artifact a user tunes against
        # on this engine. One row, no job.
        inner = ppl_query(q0[len("explain"):].strip(), resolve)
        plan = inner._jdf.queryExecution().executedPlan().toString()
        return inner.sparkSession.createDataFrame(
            [(plan,)], "plan string"
        )
    stages = _split_top(q0, "|")
    if not stages:
        raise PPLError("empty PPL query")

    head = stages[0]
    dm = re.match(r"^describe\s+([A-Za-z0-9_.-]+)$", head.strip(),
                  re.IGNORECASE)
    if dm:
        if len(stages) > 1:
            raise PPLError("describe takes no piped commands")
        src = resolve(dm.group(1))
        rows = [(f.name, f.dataType.simpleString(), f.nullable)
                for f in src.schema.fields]
        return src.sparkSession.createDataFrame(
            rows, "col_name string, data_type string, nullable boolean"
        )
    m = re.match(r"^(?:search\s+)?source\s*=\s*([A-Za-z0-9_.,*-]+)\s*(.*)$",
                 head.strip(), re.IGNORECASE | re.DOTALL)
    if not m:
        raise PPLError(
            f"PPL must start with 'search source=<name>' or "
            f"'describe <name>', got {head!r}"
        )
    names, residual = m.group(1), m.group(2).strip()
    frames = [resolve(n.strip()) for n in names.split(",")]
    df = frames[0]
    for f in frames[1:]:
        df = df.unionByName(f, allowMissingColumns=True)
    if residual:  # search-command filter expression rides the scan
        df = df.filter(safe_expr(residual).cast("boolean"))

    sort_state: list[tuple[str, bool]] = []

    for stage in stages[1:]:
        stage = stage.strip()
        sm = re.match(r"^([A-Za-z_]+)\s*(.*)$", stage, re.DOTALL)
        if not sm:
            raise PPLError(f"unparseable stage {stage!r}")
        cmd, rest = sm.group(1).lower(), sm.group(2).strip()

        if cmd == "where":
            df = df.filter(safe_expr(rest).cast("boolean"))

        elif cmd == "fields":
            drop = rest.startswith("-")
            rest2 = rest[1:] if rest[:1] in "+-" else rest
            names_ = [f.strip() for f in _split_top(rest2, ",")]
            df = df.drop(*names_) if drop else df.select(*names_)

        elif cmd == "eval":
            for assign in _split_top(rest, ","):
                name, _, expr = assign.partition("=")
                if not expr:
                    raise PPLError(f"eval expects name = expr, got {assign!r}")
                df = df.withColumn(name.strip(), safe_expr(expr.strip()))

        elif cmd == "rename":
            for pair in _split_top(rest, ","):
                pm = re.match(r"^(\S+)\s+as\s+(\S+)$", pair.strip(),
                              re.IGNORECASE)
                if not pm:
                    raise PPLError(f"rename expects 'a as b', got {pair!r}")
                df = df.withColumnRenamed(pm.group(1), pm.group(2))

        elif cmd in ("stats", "eventstats"):
            aggs, by = _parse_stats(rest)
            plain, spans = _parse_by(by) if by else ([], [])
            for name, col in spans:
                df = df.withColumn(name, col)
            group_cols = plain + [n for n, _ in spans]
            if cmd == "stats":
                agg_cols = [_agg_column(fn, args).alias(out)
                            for fn, args, out in aggs]
                df = (df.groupBy(*group_cols).agg(*agg_cols)
                      if group_cols else df.agg(*agg_cols))
            else:
                w = (Window.partitionBy(*group_cols) if group_cols
                     else Window.partitionBy())
                for fn, args, out in aggs:
                    df = df.withColumn(out, _agg_column(fn, args, over=w))
            sort_state = []

        elif cmd == "sort":
            cols, sort_state = _sort_columns(rest)
            df = df.orderBy(*cols)

        elif cmd == "head":
            df = df.limit(int(rest) if rest else 10)

        elif cmd == "dedup":
            dm = re.match(r"^(\d+\s+)?(.*)$", rest, re.DOTALL)
            keep = int(dm.group(1)) if dm.group(1) else 1
            keys = [k.strip() for k in _split_top(dm.group(2), ",")]
            if sort_state:
                order = [
                    (F.col(k).asc() if asc else F.col(k).desc())
                    for k, asc in sort_state
                ]
            else:
                # public dedup keeps undefined ingestion order; a scan
                # has none, so keep the deterministic whole-row minimum
                order = [F.col(c).asc_nulls_last() for c in df.columns
                         if c not in keys]
            order = order or [F.lit(1).asc()]
            w = Window.partitionBy(*keys).orderBy(*order)
            df = (df.withColumn("__rn", F.row_number().over(w))
                  .filter(F.col("__rn") <= keep).drop("__rn"))

        elif cmd in ("top", "rare"):
            tm = re.match(r"^(\d+\s+)?(.*?)(?:\s+by\s+(.*))?$", rest,
                          re.IGNORECASE | re.DOTALL)
            n = int(tm.group(1)) if tm.group(1) else 10
            fields = [f.strip() for f in _split_top(tm.group(2), ",")]
            by_fields = ([b.strip() for b in _split_top(tm.group(3), ",")]
                         if tm.group(3) else [])
            counted = df.groupBy(*(by_fields + fields)).agg(
                F.count(F.lit(1)).alias("count")
            )
            cnt_order = (F.col("count").desc() if cmd == "top"
                         else F.col("count").asc())
            tiebreak = [F.col(f).asc() for f in fields]
            if by_fields:
                w = Window.partitionBy(*by_fields).orderBy(cnt_order,
                                                           *tiebreak)
                df = (counted.withColumn("__rk", F.row_number().over(w))
                      .filter(F.col("__rk") <= n).drop("__rk")
                      .orderBy(*[F.col(b).asc() for b in by_fields],
                               cnt_order, *tiebreak))
            else:
                df = counted.orderBy(cnt_order, *tiebreak).limit(n)
            sort_state = []

        elif cmd == "parse":
            pm = re.match(r"^(\S+)\s+(.+)$", rest, re.DOTALL)
            if not pm:
                raise PPLError(f"parse expects: parse <field> '<regex>'")
            field, pattern = pm.group(1), _unquote(pm.group(2))
            for name, idx in _named_groups(pattern).items():
                df = df.withColumn(
                    name, F.regexp_extract(F.col(field), pattern, idx)
                )

        elif cmd == "expand":
            em = re.match(r"^(\S+)(?:\s+as\s+(\S+))?$", rest, re.IGNORECASE)
            if not em:
                raise PPLError("expand expects: expand <field> [as alias]")
            field, alias = em.group(1), em.group(2) or em.group(1)
            others = [c for c in df.columns if c != field]
            # explode_outer: a row with an empty/null array survives
            # with a null element (the public command keeps the doc)
            df = df.select(
                *others, F.explode_outer(F.col(field)).alias(alias)
            )

        elif cmd == "flatten":
            field = rest.strip()
            if not field:
                raise PPLError("flatten expects: flatten <field>")
            dt = dict(df.dtypes).get(field)
            if dt is None or not dt.startswith("struct<"):
                raise PPLError(
                    f"flatten: {field!r} is not a struct column ({dt})"
                )
            others = [c for c in df.columns if c != field]
            df = df.select(*others, F.col(f"{field}.*"))

        elif cmd == "grok":
            gm = re.match(r"^(\S+)\s+(.+)$", rest, re.DOTALL)
            if not gm:
                raise PPLError("grok expects: grok <field> '<pattern>'")
            field, raw = gm.group(1), _unquote(gm.group(2))
            regex, casts = _expand_grok(raw)
            for name, idx in _named_groups(regex).items():
                col = F.regexp_extract(F.col(field), regex, idx)
                typ = casts.get(name)
                # try_cast: a non-matching row extracts '' — that is
                # a null typed field, not a query error (ANSI cast
                # would throw)
                if typ == "int":
                    col = col.try_cast("long")
                elif typ == "float":
                    col = col.try_cast("double")
                df = df.withColumn(name, col)

        elif cmd == "fillnull":
            fm = re.match(r"^with\s+(.+?)\s+in\s+(.+)$", rest,
                          re.IGNORECASE | re.DOTALL)
            if not fm:
                raise PPLError("fillnull expects: with <value> in f1, f2")
            value = _unquote(fm.group(1))
            names_ = [f.strip() for f in _split_top(fm.group(2), ",")]
            # coerce per column: DataFrame.fillna silently SKIPS subset
            # columns whose type doesn't match the value's Python type
            # (`with 0 in double_col` would no-op), so cast the literal
            # to each target column's own type instead
            types = dict(df.dtypes)
            for name in names_:
                if name not in types:
                    raise PPLError(f"fillnull: unknown field {name!r}")
                df = df.withColumn(
                    name,
                    F.coalesce(F.col(name),
                               F.lit(value).try_cast(types[name])),
                )

        elif cmd == "lookup":
            lm = re.match(
                r"^(\S+)\s+(\S+)(?:\s+as\s+(\S+))?$", rest, re.IGNORECASE
            )
            if not lm:
                raise PPLError("lookup expects: lookup <table> <key> [as <local>]")
            table, rkey, lkey = lm.group(1), lm.group(2), lm.group(3)
            right = resolve(table)
            lkey = lkey or rkey
            # enrichment joins broadcast the lookup side: lookup tables
            # are dimension-sized by construction, the fact side never
            # shuffles
            overlapping = [c for c in right.columns
                           if c in df.columns and c != rkey]
            right = right.drop(*overlapping)
            cond = df[lkey] == right[rkey]
            df = df.join(F.broadcast(right), cond, "left")
            if rkey != lkey or rkey in df.columns:
                df = df.drop(right[rkey])

        elif cmd == "trendline":
            tm = re.match(
                r"^(sma|wma)\s*\(\s*(\d+)\s*,\s*([^)]+)\)"
                r"(?:\s+as\s+(\w+))?$",
                rest, re.IGNORECASE,
            )
            if not tm:
                raise PPLError(
                    "trendline expects: sma(N, field) | wma(N, field) "
                    "[as alias]"
                )
            kind_ma = tm.group(1).lower()
            n, field = int(tm.group(2)), tm.group(3).strip()
            out = tm.group(4) or f"{field}_trendline"
            if not sort_state:
                raise PPLError(
                    "trendline requires an explicit preceding sort — a "
                    "moving average over undefined order is meaningless"
                )
            # an ordered moving window is inherently a global sequence;
            # pair with head/where to bound it (the public command also
            # runs on the sorted result set)
            w = (
                Window.orderBy(*[
                    (F.col(k).asc() if asc else F.col(k).desc())
                    for k, asc in sort_state
                ]).rowsBetween(-(n - 1), 0)
            )
            if kind_ma == "sma":
                ma = F.avg(F.col(field)).over(w)
            else:
                # wma: linearly-decaying weights — newest row weight n,
                # oldest weight 1, normalized by n(n+1)/2. collect_list
                # over a rows-bounded frame preserves frame order, so
                # position i (0-based, oldest first) weights i+1.
                vals = F.collect_list(F.col(field).cast("double")).over(w)
                weighted = F.aggregate(
                    F.zip_with(
                        vals,
                        F.sequence(F.lit(1), F.size(vals)),
                        lambda v, i: v * i.cast("double"),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                ma = weighted / F.lit(float(n * (n + 1) // 2))
            if kind_ma == "sma":
                gate = F.count(F.lit(1)).over(w) >= n
            else:
                # collect_list DROPS nulls: gating on row count would
                # let a null-bearing window through with shifted
                # positional weights and a stale divisor — require n
                # collected values, so such windows yield NULL (exactly
                # what a lag-based formulation propagates)
                gate = F.size(vals) >= n
            df = df.withColumn(
                out,
                F.when(gate, ma),  # null until the window fills
            )

        elif cmd == "join":
            # `join [type=inner|left|semi|anti] <table> on l = r[, ...]`
            # — the PPL 3.x join, equality-key dialect: keys name left
            # and right columns, other overlapping right columns drop
            # (the lookup rule), join type picks the Spark join. The
            # planner broadcasts a dimension-sized right side on its
            # own (AQE); no hint here because PPL joins arbitrary
            # tables, unlike lookup's by-construction-small side.
            jm = re.match(
                r"^(?:type\s*=\s*(\w+)\s+)?([A-Za-z0-9_.-]+)\s+on\s+(.+)$",
                rest, re.IGNORECASE | re.DOTALL,
            )
            if not jm:
                raise PPLError(
                    "join expects: join [type=<t>] <table> on l = r[, ...]"
                )
            jtype = (jm.group(1) or "inner").lower()
            jtype = {"semi": "left_semi", "anti": "left_anti"}.get(
                jtype, jtype)
            if jtype not in ("inner", "left", "right", "full",
                             "left_semi", "left_anti"):
                raise PPLError(f"unsupported join type {jtype!r}")
            right = resolve(jm.group(2))
            pairs = []
            for kv in _split_top(jm.group(3), ","):
                lk, _, rk = kv.partition("=")
                lk, rk = lk.strip(), rk.strip()
                if not lk or not rk:
                    raise PPLError(f"join key {kv!r} is not l = r")
                pairs.append((lk, rk))
            overlapping = [
                c for c in right.columns
                if c in df.columns and c not in {r for _, r in pairs}
            ]
            right = right.drop(*overlapping)
            # a right key rk != lk that ALSO names a left column would
            # survive the overlap drop and leave two columns named rk
            # after the join — alias it to a temp name for the join
            # condition (ONE temp per distinct rk: the same right key
            # may back several pairs), resolving the temp after the
            # join like any other overlap. Skip keys that also appear
            # as an lk==rk pair — the coalesce fold below already
            # resolves those.
            same_keys = {r for l, r in pairs if l == r}
            renamed: dict[str, str] = {}
            joined_pairs = []
            for i, (lk, rk) in enumerate(pairs):
                if rk != lk and rk in df.columns and rk not in same_keys:
                    tmp = renamed.get(rk)
                    if tmp is None:
                        tmp = f"__ppl_rk{i}"
                        right = right.withColumnRenamed(rk, tmp)
                        renamed[rk] = tmp
                    joined_pairs.append((lk, tmp))
                else:
                    joined_pairs.append((lk, rk))
            left = df
            cond = None
            for lk, rk in joined_pairs:
                p = left[lk] == right[rk]
                cond = p if cond is None else cond & p
            df = left.join(right, cond, jtype)
            if renamed and jtype not in ("left_semi", "left_anti"):
                if jtype in ("right", "full"):
                    # right-only rows carry their key ONLY in the temp
                    # copy (the left side is null there) — coalesce it
                    # into EVERY left key column the temp backs (one
                    # right key may back several pairs, e.g.
                    # `on a = k, b = k`), then drop the temps once.
                    temps = set(renamed.values())
                    for lk, tmp in joined_pairs:
                        if tmp in temps:
                            df = (
                                df.withColumn(
                                    "__ppl_jk",
                                    F.coalesce(left[lk], right[tmp]),
                                )
                                .drop(left[lk])
                                .withColumnRenamed("__ppl_jk", lk)
                            )
                    df = df.drop(*sorted(temps))
                else:
                    df = df.drop(*renamed.values())
            if jtype not in ("left_semi", "left_anti"):
                # name-colliding key columns fold to ONE: coalesce so a
                # right/full join's right-only rows keep their key (the
                # left side is null there — dropping the right copy
                # would null the key outright)
                for lk, rk in pairs:
                    if lk == rk:
                        df = (
                            df.withColumn(
                                "__ppl_jk", F.coalesce(left[lk], right[rk])
                            )
                            .drop(left[lk]).drop(right[rk])
                            .withColumnRenamed("__ppl_jk", lk)
                        )

        elif cmd == "appendcol":
            # `appendcol [ <sub-pipeline> ]`: run the bracketed pipe on
            # the SAME source and attach its columns. Documented
            # subset: the sub-pipeline must reduce to exactly one row
            # (the stats use the public command exists for) — it then
            # attaches as a broadcast constant column set; multi-row
            # positional zipping is rejected rather than approximated.
            am = re.match(r"^\[(.*)\]$", rest, re.DOTALL)
            if not am:
                raise PPLError("appendcol expects: appendcol [ <pipe> ]")
            sub_pipe = am.group(1).strip()
            if not sub_pipe:
                raise PPLError("appendcol sub-pipeline is empty")
            # the sub-search runs on the SAME source (public contract):
            # recurse through the compiler with the head's source list
            sub = ppl_query(f"source={names} | {sub_pipe}", resolve)
            if sub.count() != 1:
                raise PPLError(
                    "appendcol sub-pipeline must produce exactly one "
                    "row (use stats); positional multi-row append is "
                    "not supported"
                )
            dup = [c for c in sub.columns if c in df.columns]
            df = df.crossJoin(F.broadcast(sub.drop(*dup)))

        elif cmd == "patterns":
            # `patterns <field> [new_field=<n>] [pattern=<regex>]` —
            # log-template extraction: strip the variable parts
            # (default: alphanumeric runs), leaving the punctuation
            # skeleton that groups log lines into patterns.
            pm = re.match(
                r"^(\w+)"
                r"(?:\s+new_field\s*=\s*['\"]?([\w.]+)['\"]?)?"
                r"(?:\s+pattern\s*=\s*'([^']*)')?$",
                rest, re.IGNORECASE,
            )
            if not pm:
                raise PPLError(
                    "patterns expects: patterns <field> "
                    "[new_field=<name>] [pattern='<regex>']"
                )
            fld = pm.group(1)
            out = pm.group(2) or "patterns_field"
            pat = pm.group(3) or "[a-zA-Z0-9]+"
            df = df.withColumn(
                out, F.regexp_replace(F.col(fld), pat, "")
            )

        elif cmd == "kmeans":
            # `kmeans centroids=N [iterations=I] fields=a,b,c` — the
            # PPL ML command: cluster rows on a numeric feature vector
            # and append ClusterID. Reuses the engine's distributed
            # Lloyd trainer (operators/similarity.py — deterministic
            # hash-sample init, so assignments are reproducible).
            km = re.match(
                r"^centroids\s*=\s*(\d+)"
                r"(?:\s+iterations\s*=\s*(\d+))?"
                r"\s+fields\s*=\s*([\w.,\s]+)$",
                rest, re.IGNORECASE,
            )
            if not km:
                raise PPLError(
                    "kmeans expects: kmeans centroids=N "
                    "[iterations=I] fields=a,b,c"
                )
            from .similarity import ivf_assign, ivf_centroids

            ncent = int(km.group(1))
            iters = int(km.group(2) or 3)
            feat_fields = [f.strip() for f in km.group(3).split(",")]
            missing_f = [f for f in feat_fields if f not in df.columns]
            if missing_f:
                raise PPLError(f"kmeans: unknown fields {missing_f}")
            with_vec = df.withColumn(
                "__kmf",
                F.array(*[F.col(f).cast("double") for f in feat_fields]),
            ).withColumn("__kmid", F.monotonically_increasing_id())
            cents = ivf_centroids(
                with_vec, n_centroids=ncent, id_col="__kmid",
                vec_col="__kmf", refine_iters=iters,
            )
            df = ivf_assign(
                with_vec, cents, vec_col="__kmf",
                cluster_col="ClusterID",
            ).drop("__kmf", "__kmid")

        elif cmd == "ad":
            # `ad field=<numeric> [by <category>] [threshold=T]` — the
            # PPL anomaly-detection command. The public implementation
            # scores with a random-cut forest (per-node RNG state, not
            # reproducible across engines); this engine's deterministic
            # dialect is the robust z-score: score = |x − median| /
            # (1.4826 · MAD), anomalous when score > threshold
            # (default 3.0) — the classic consistency-scaled MAD rule.
            # Shape: per-group median and MAD are TWO percentile
            # aggregates over |rows| — exact by default, or bounded-
            # memory sketches with `mode=approx` (the 100 TB selector;
            # same plan, sketch instead of full-value buffer) — whose
            # small per-group results broadcast-join back; the frame
            # stays lazy, nothing collects at compile time.
            am = re.match(
                r"^field\s*=\s*([\w.]+)"
                r"(?:\s+by\s+([\w.]+))?"
                r"(?:\s+threshold\s*=\s*(\d+(?:\.\d+)?))?"
                r"(?:\s+mode\s*=\s*(exact|approx))?$",
                rest, re.IGNORECASE,
            )
            if not am:
                raise PPLError(
                    "ad expects: ad field=<numeric> [by <category>] "
                    "[threshold=T] [mode=exact|approx]"
                )
            vfld, cat, thr = am.group(1), am.group(2), am.group(3)
            mode = (am.group(4) or "exact").lower()
            if vfld not in df.columns:
                raise PPLError(f"ad: unknown field {vfld!r}")
            if cat is not None and cat not in df.columns:
                raise PPLError(f"ad: unknown category field {cat!r}")
            threshold = float(thr) if thr else 3.0
            x = F.col(vfld).cast("double")
            keys = [cat] if cat else []

            def _nsjoin(base, small):
                # null-safe broadcast equi-join: groupBy keeps the null
                # category as its own group, so null-category rows must
                # match that group's stats instead of silently dropping
                # out of a null-unsafe inner join
                if not keys:
                    return base.crossJoin(F.broadcast(small))
                s = small
                for k in keys:
                    s = s.withColumnRenamed(k, f"__ppl_ad_{k}")
                cond = None
                for k in keys:
                    p = base[k].eqNullSafe(s[f"__ppl_ad_{k}"])
                    cond = p if cond is None else cond & p
                return base.join(F.broadcast(s), cond).drop(
                    *[f"__ppl_ad_{k}" for k in keys]
                )

            # mode=exact (default): exact per-group percentile —
            # oracle-comparable, but buffers each group's values.
            # mode=approx: bounded-memory quantile sketch, the 100 TB
            # path — same plan shape (one hash aggregate per pass),
            # no full-value-per-group buffer. Accuracy 10000 retains
            # every value for groups under 10k, so the sketch answers
            # the exact NEAREST-RANK percentile — coinciding with
            # mode=exact wherever interpolation is a no-op (odd-sized
            # groups; property-tested).
            if mode == "approx":
                med_expr = f"approx_percentile({vfld}, 0.5, 10000)"
                mad_expr = (f"approx_percentile(abs(cast({vfld} as double)"
                            " - __med), 0.5, 10000)")
            else:
                med_expr = f"percentile({vfld}, 0.5)"
                mad_expr = (f"percentile(abs(cast({vfld} as double)"
                            " - __med), 0.5)")
            gmed = (df.groupBy(*keys) if keys else df.groupBy()).agg(
                F.expr(med_expr).alias("__med")
            )
            with_med = _nsjoin(df, gmed)
            stats = (
                with_med.groupBy(*keys) if keys else with_med.groupBy()
            ).agg(
                F.expr(mad_expr).alias("__mad"),
                # carry the per-group median through this aggregate —
                # joining gmed back separately would evaluate the
                # full-corpus median percentile a second time
                F.first("__med").alias("__med"),
            )
            joined = _nsjoin(df, stats)
            scaled = F.col("__mad") * F.lit(1.4826)
            score = F.when(
                scaled > 0, F.abs(x - F.col("__med")) / scaled
            ).otherwise(
                # degenerate group (MAD 0: >=half the values identical):
                # any deviation from the median is anomalous, score ∞
                # is unhelpful — report 0 on the median, threshold+1 off
                F.when(x == F.col("__med"), F.lit(0.0))
                .otherwise(F.lit(threshold + 1.0))
            )
            df = joined.withColumn(
                "anomaly_score", score
            ).withColumn(
                "anomalous", F.col("anomaly_score") > F.lit(threshold)
            ).drop("__med", "__mad")

        elif cmd == "fieldsummary":
            # `fieldsummary [includefields=a,b,c]` → one row per field:
            # count/distinct/min/max/avg/stddev/nulls. ONE aggregate
            # pass computes every field's metrics (conditional columns),
            # melted driver-side (field count is schema-bounded).
            fm = re.match(
                r"^(?:includefields\s*=\s*([\w.,\s]+))?$",
                rest, re.IGNORECASE,
            )
            if not fm:
                raise PPLError(
                    "fieldsummary expects: fieldsummary "
                    "[includefields=a,b,c]"
                )
            flds = (
                [f.strip() for f in fm.group(1).split(",")]
                if fm.group(1) else list(df.columns)
            )
            types = dict(df.dtypes)
            unknown = [f for f in flds if f not in types]
            if unknown:
                raise PPLError(f"fieldsummary: unknown fields {unknown}")
            aggs = []
            for i, f in enumerate(flds):
                c = F.col(f)
                numeric = types[f] in ("tinyint", "smallint", "int",
                                       "bigint", "float", "double") \
                    or types[f].startswith("decimal")
                aggs += [
                    F.count(c).alias(f"__c{i}"),
                    F.countDistinct(c).alias(f"__d{i}"),
                    F.min(c).cast("string").alias(f"__mn{i}"),
                    F.max(c).cast("string").alias(f"__mx{i}"),
                    (F.avg(c) if numeric else F.lit(None).cast("double"))
                    .alias(f"__av{i}"),
                    (F.stddev(c) if numeric
                     else F.lit(None).cast("double")).alias(f"__sd{i}"),
                    F.count(F.when(c.isNull(), 1)).alias(f"__n{i}"),
                ]
            row = df.agg(*aggs).collect()[0]
            out_rows = [
                (f, types[f], row[f"__c{i}"], row[f"__d{i}"],
                 row[f"__mn{i}"], row[f"__mx{i}"], row[f"__av{i}"],
                 row[f"__sd{i}"], row[f"__n{i}"])
                for i, f in enumerate(flds)
            ]
            df = df.sparkSession.createDataFrame(
                out_rows,
                "field string, type string, count long, distinct long, "
                "min string, max string, avg double, stddev double, "
                "nulls long",
            )

        else:
            raise PPLError(f"unsupported PPL command {cmd!r}")

    return df
