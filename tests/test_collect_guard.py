"""Static guard against unbounded driver collects (SURVEY scale
discipline): every ``.collect()`` in the interpreter's response
assembly must be provably bounded — preceded in its plan chain by an
aggregate or an explicit limit, fed by a variable whose assignment
is, or carrying an explicit ``# bounded:`` audit comment stating the
bound. The round-6 verdict hand-audited this property; this walker
freezes it, and fails on an injected naked corpus collect."""

from __future__ import annotations

import ast
import os

# Tokens that bound a chain's row count before .collect():
# aggregates reduce to one row per group of an already-bounded key
# set, limit/head/take cap explicitly, first() is one row.
BOUNDING_TOKENS = (
    ".agg(", ".limit(", ".head(", ".take(", ".first(", ".summary(",
    ".count(",
    # the row_number-top-k idiom: a per-partition rank filter caps the
    # chain at k rows per group of an already-bounded key set
    'F.col("__rn") <=',
)

PKG = os.path.join(os.path.dirname(__file__), "..",
                   "opensearch_dynamodb_etl_cdk_spark")

# modules whose .collect() sites the guard walks (the response-assembly
# and operator hot paths, plus the protocol tier — every site there is
# bounded or carries a stated '# bounded:' audit)
GUARDED = [
    os.path.join(PKG, "operators", "search.py"),
    os.path.join(PKG, "operators", "ppl.py"),
    os.path.join(PKG, "operators", "bpe.py"),
    os.path.join(PKG, "operators", "classifier.py"),
    os.path.join(PKG, "operators", "pca.py"),
    os.path.join(PKG, "operators", "ranking.py"),
    os.path.join(PKG, "operators", "sampling.py"),
    os.path.join(PKG, "operators", "similarity.py"),
    os.path.join(PKG, "operators", "hnsw.py"),
    os.path.join(PKG, "operators", "multimodal.py"),
    os.path.join(PKG, "operators", "pdf.py"),
    os.path.join(PKG, "operators", "warc.py"),
    os.path.join(PKG, "operators", "archive.py"),
    os.path.join(PKG, "plans", "catalog_dsl_tail.py"),
    os.path.join(PKG, "streaming", "pipeline.py"),
]


def find_unbounded_collects(source: str) -> list[int]:
    """Line numbers of ``.collect()`` calls not provably bounded.

    A site passes when any of:
    * its receiver chain's source contains a BOUNDING token;
    * its receiver is a name whose latest preceding assignment's
      right-hand side passes (followed up to 3 hops);
    * one of the 5 lines above the call carries ``# bounded:`` —
      the explicit audit escape hatch, which must state WHY.
    """
    tree = ast.parse(source)
    lines = source.splitlines()

    assigns: dict[str, list[tuple[int, ast.AST]]] = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign) and len(node.targets) == 1:
            t = node.targets[0]
            if isinstance(t, ast.Name):
                assigns.setdefault(t.id, []).append((node.lineno, node.value))

    def expr_bounded(expr: ast.AST, before_line: int, hops: int) -> bool:
        seg = ast.get_source_segment(source, expr) or ""
        if any(tok in seg for tok in BOUNDING_TOKENS):
            return True
        if hops > 0 and isinstance(expr, ast.Name):
            prior = [(ln, v) for (ln, v) in assigns.get(expr.id, [])
                     if ln < before_line]
            if prior:
                ln, val = max(prior, key=lambda p: p[0])
                return expr_bounded(val, ln, hops - 1)
        return False

    bad: list[int] = []
    for node in ast.walk(tree):
        if not (isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "collect"):
            continue
        if expr_bounded(node.func.value, node.lineno, hops=3):
            continue
        lo = max(0, node.lineno - 5)
        window = "\n".join(lines[lo:node.lineno])
        if "# bounded:" in window:
            continue
        bad.append(node.lineno)
    return bad


def test_guarded_modules_have_no_unbounded_collects():
    for path in GUARDED:
        with open(path) as f:
            src = f.read()
        bad = find_unbounded_collects(src)
        assert not bad, (
            f"{os.path.basename(path)} has .collect() sites with no "
            f"provable bound at lines {bad} — add an aggregate/limit "
            "or a '# bounded:' audit comment stating the bound"
        )


def test_walker_flags_injected_naked_collect():
    naked = (
        "def assemble(df):\n"
        "    rows = df.filter(df.x > 0).collect()\n"
        "    return rows\n"
    )
    assert find_unbounded_collects(naked) == [2]
    # variable indirection is followed...
    indirect = (
        "def assemble(df):\n"
        "    top = df.orderBy('x').limit(10)\n"
        "    return top.collect()\n"
    )
    assert find_unbounded_collects(indirect) == []
    # ...and an unbounded indirection still flags
    indirect_bad = (
        "def assemble(df):\n"
        "    top = df.orderBy('x')\n"
        "    return top.collect()\n"
    )
    assert find_unbounded_collects(indirect_bad) == [3]
    # the audit comment is an explicit, visible decision
    audited = (
        "def assemble(df):\n"
        "    # bounded: registry is O(10^3) by the documented cap\n"
        "    return df.collect()\n"
    )
    assert find_unbounded_collects(audited) == []
