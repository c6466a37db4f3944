"""Ingest pipelines: the ``_ingest/pipeline`` processor chain as
Column-algebra document transforms.

The public ingest node runs a per-document processor list before
indexing; this engine compiles the SAME processor specs into one chain
of ``withColumn`` transforms, so a pipeline applied to a reindex or a
bulk batch is part of the ONE Catalyst plan that writes the index —
whole-stage codegen per document, no per-row interpreter, and at 100 TB
the ingest transform adds zero extra passes over the data.

Supported processors (public spec shapes): ``set`` (literal value or
``copy_from``), ``remove``, ``rename``, ``lowercase`` / ``uppercase``
/ ``trim``, ``convert`` (integer/long/float/double/string/boolean —
``try_cast``: unparseable values become null rather than failing the
batch, the public ``ignore_failure`` posture), ``gsub``, ``split``,
``join``, ``grok`` (same built-in pattern library as the PPL command),
``date`` (first-matching format wins), and ``script`` in the engine's
guarded Spark-SQL dialect writing ``target_field``.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .scripts import safe_expr

__all__ = ["apply_processors"]

_CAST = {
    "integer": "long", "long": "long", "float": "double",
    "double": "double", "string": "string", "boolean": "boolean",
}


def apply_processors(df: DataFrame, processors: list[dict]) -> DataFrame:
    """Fold a processor chain into the frame — order matters, exactly
    as the public pipeline executes the list."""
    for proc in processors:
        (kind, spec), = proc.items()
        field = spec.get("field")

        if kind == "set":
            if "copy_from" in spec:
                val = F.col(spec["copy_from"])
            else:
                val = F.lit(spec["value"])
            if spec.get("override", True) is False and field in df.columns:
                val = F.coalesce(F.col(field), val)
            df = df.withColumn(field, val)

        elif kind == "remove":
            fields = field if isinstance(field, list) else [field]
            df = df.drop(*fields)

        elif kind == "rename":
            df = df.withColumnRenamed(field, spec["target_field"])

        elif kind in ("lowercase", "uppercase", "trim"):
            fn = {"lowercase": F.lower, "uppercase": F.upper,
                  "trim": F.trim}[kind]
            df = df.withColumn(spec.get("target_field", field),
                               fn(F.col(field)))

        elif kind == "convert":
            t = _CAST.get(spec["type"])
            if t is None:
                raise ValueError(
                    f"convert: unsupported type {spec['type']!r}"
                )
            df = df.withColumn(
                spec.get("target_field", field),
                F.col(field).try_cast(t),
            )

        elif kind == "gsub":
            df = df.withColumn(
                spec.get("target_field", field),
                F.regexp_replace(F.col(field), spec["pattern"],
                                 spec["replacement"]),
            )

        elif kind == "split":
            df = df.withColumn(
                spec.get("target_field", field),
                F.split(F.col(field), spec["separator"]),
            )

        elif kind == "join":
            df = df.withColumn(
                spec.get("target_field", field),
                F.array_join(F.col(field), spec["separator"]),
            )

        elif kind == "grok":
            from ..operators.ppl import _expand_grok, _named_groups

            patterns = spec.get("patterns") or [spec["pattern"]]
            if len(patterns) != 1:
                raise ValueError(
                    "grok processor supports exactly one pattern "
                    "(first-match lists degrade to their head here)"
                )
            regex, casts = _expand_grok(patterns[0])
            for name, idx in _named_groups(regex).items():
                col = F.regexp_extract(F.col(field), regex, idx)
                typ = casts.get(name)
                if typ == "int":
                    col = col.try_cast("long")
                elif typ == "float":
                    col = col.try_cast("double")
                df = df.withColumn(name, col)

        elif kind == "date":
            formats = spec.get("formats", ["yyyy-MM-dd HH:mm:ss"])
            parsed = F.coalesce(*[
                F.try_to_timestamp(F.col(field), F.lit(f))
                for f in formats
            ])
            df = df.withColumn(
                spec.get("target_field", "@timestamp"), parsed
            )

        elif kind == "script":
            # engine dialect: a guarded Spark-SQL expression written to
            # target_field (the public Painless ctx-mutation has no
            # declarative analog; one expression per written field is
            # the compilable form)
            df = df.withColumn(
                spec["target_field"], safe_expr(spec["source"])
            )

        else:
            raise ValueError(f"unsupported ingest processor {kind!r}")
    return df
