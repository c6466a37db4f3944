"""Guarded Spark-SQL script expressions (the engine's Painless analog).

The DSL's script surfaces — the ``script`` query, ``script_fields``,
rescore ``script`` mode, and update_by_query / reindex ``set_fields`` —
accept caller strings and evaluate them as Spark SQL expressions.
OpenSearch's Painless is sandboxed; Spark SQL is not: ``reflect()`` /
``java_method()`` invoke arbitrary JVM static methods, and a search
body is exactly the component most likely to carry external input (it
can even arrive smuggled through a base64 ``wrapper`` query or a
percolate registry). Every script surface therefore routes through
:func:`safe_expr`, which rejects those escape hatches by default.

Trusted callers that genuinely need the full expression language opt in
explicitly — ``execute_search(df, body, allow_unsafe_scripts=True)`` or
the :func:`unsafe_scripts_allowed` context manager — mirroring how the
reference keeps scripting behind a cluster-level opt-in rather than on
by default.
"""

from __future__ import annotations

import contextvars
import re
from contextlib import contextmanager

from pyspark.sql import Column
from pyspark.sql import functions as F

# JVM / UDF escape hatches of the Spark SQL expression language. Matched
# as whole identifiers (case-insensitive, backtick-quoting stripped), so
# a blocked name can't hide behind quoting or capitalization; a column
# that merely *contains* one of these as a substring is unaffected.
BLOCKED_SCRIPT_FUNCTIONS = frozenset(
    {
        "reflect",
        "java_method",
        "call_udf",
        "call_function",
        "unwrap_udt",
    }
)

_IDENT = re.compile(r"`?([A-Za-z_][A-Za-z0-9_]*)`?")

_ALLOW_UNSAFE = contextvars.ContextVar("allow_unsafe_scripts", default=False)


@contextmanager
def unsafe_scripts_allowed():
    """Opt-in scope inside which ``safe_expr`` skips validation."""
    token = _ALLOW_UNSAFE.set(True)
    try:
        yield
    finally:
        _ALLOW_UNSAFE.reset(token)


def validate_script(script: str) -> str:
    """Reject scripts that reference a blocked JVM/UDF escape hatch.

    Scans every identifier in the expression (not just call positions):
    an attacker can reach a function through constructs like lambda
    bodies or EXISTS subqueries, so presence anywhere is grounds for
    rejection — the false-positive surface (a column literally named
    ``reflect``) is accepted as the cost of a sound check.
    """
    s = str(script)
    for m in _IDENT.finditer(s):
        if m.group(1).lower() in BLOCKED_SCRIPT_FUNCTIONS:
            raise PermissionError(
                f"script expression uses blocked function {m.group(1)!r} "
                "(arbitrary JVM/UDF invocation); run the search with "
                "allow_unsafe_scripts=True if the caller is trusted"
            )
    return s


def safe_expr(script) -> Column:
    """``F.expr`` with the escape-hatch guard (unless inside an
    :func:`unsafe_scripts_allowed` scope)."""
    s = str(script)
    if not _ALLOW_UNSAFE.get():
        validate_script(s)
    return F.expr(s)
