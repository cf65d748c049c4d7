"""JVM-side literal DataFrames.

``spark.createDataFrame(rows)`` builds a Python-RDD-backed plan: any
action on it (even writing 8 rows of lineage) spawns a Python worker —
measured 3.5-4 s per tiny write on this host (worker startup under the
memcg pathology documented in BASELINE.md), which made checkpoint and
metrics appends dominate the sf0.1 build (~25 s of a 41 s wall).

``inline_table`` renders the same rows as a SQL ``VALUES`` literal —
a pure JVM LocalRelation: the identical 1-task parquet append runs in
~0.3 s, and query-side literal tables (query terms, idf maps) stop
paying the Python-worker tax per query. Values are escaped/typed
explicitly; every column is CAST to its declared type so NULLs and
empty strings can't flip the inferred schema.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def _sql_literal(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        return "'" + v.replace("\\", "\\\\").replace("'", "''") + "'"
    if isinstance(v, float):
        if math.isnan(v):
            return "CAST('NaN' AS DOUBLE)"
        if math.isinf(v):
            return f"CAST('{'-' if v < 0 else ''}Infinity' AS DOUBLE)"
        return repr(v) + "D"
    if isinstance(v, int):
        return f"{v}L"
    raise TypeError(f"unsupported literal type {type(v)!r}")


def inline_table(spark: SparkSession, rows: list[tuple], schema: str) -> DataFrame:
    """rows + 'name type, …' schema → JVM-only literal DataFrame."""
    fields = [f.strip().rsplit(" ", 1) for f in schema.split(",")]
    if not rows:
        return spark.createDataFrame([], schema)  # empty: no action follows
    vals = ", ".join(
        "(" + ", ".join(_sql_literal(v) for v in r) + ")" for r in rows
    )
    cols = ", ".join(
        f"CAST(c{i} AS {typ}) AS {name}" for i, (name, typ) in enumerate(fields)
    )
    tcols = ", ".join(f"c{i}" for i in range(len(fields)))
    return spark.sql(f"SELECT {cols} FROM (VALUES {vals}) AS t({tcols})")
