"""Local mirror of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB against the same sf dir, then compares
row count, column-name set, and order-insensitive values (columns
sorted by name, rows sorted). Exit code 1 on any mismatch.

Usage: python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from datetime import date, datetime
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (list, dict, set)):
        # The driver's canonicalizer pandas-lexsorts columns and cannot
        # hash array/map cells (`TypeError: unhashable type: 'list'` —
        # sim_pq_codes, r4). Tuple-izing here would HIDE that contract
        # violation locally, so refuse instead: gate queries must emit
        # scalar columns only.
        raise TypeError(
            f"complex-typed cell {type(v).__name__} in gate output — "
            "the driver's value-hash cannot canonicalize it; flatten "
            "the column (concat_ws or explode) in the gate wrapper"
        )
    return v


def complex_cols(schema) -> list[str]:
    """Names of output columns whose Spark type the driver cannot hash."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    return [
        f.name for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]


def _canon(rows: list[tuple], cols: list[str]):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr), [cols[i] for i in order]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from search_engine_spark.session import get_spark

    spark = get_spark("parity-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    n_run = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_run += 1
        try:
            sdf = fn(spark, sf_dir)
            bad = complex_cols(sdf.schema)
            if bad:
                failures.append((name, f"complex-typed columns {bad}"))
                print(f"FAIL {name}: complex-typed output columns {bad} "
                      "(driver canonicalizer cannot hash them)")
                continue
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows, no oracle)")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = [c for c in rel.columns]
            dtypes = [str(t) for t in rel.types]
            drows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        # Driver-hash hazard: DuckDB HUGEINT reaches pandas as float64
        # while Spark emits BIGINT — values can match here yet the
        # driver's value-hash still diverges. Treat as a failure.
        huge = [c for c, t in zip(dcols, dtypes) if "HUGEINT" in t.upper()]
        if huge:
            failures.append((name, f"HUGEINT oracle columns {huge}"))
            print(f"FAIL {name}: oracle emits HUGEINT columns {huge} "
                  "(driver reads as float64; add CAST(... AS BIGINT))")
            continue
        sc, scn = _canon(srows, scols)
        dc, dcn = _canon(drows, dcols)
        if scn != dcn:
            failures.append((name, f"schema {scn} != {dcn}"))
            print(f"FAIL {name}: schema {scn} != {dcn}")
        elif len(sc) != len(dc):
            failures.append((name, f"rowcount {len(sc)} != {len(dc)}"))
            print(f"FAIL {name}: rowcount {len(sc)} != {len(dc)}")
        elif sc != dc:
            diff = [(a, b) for a, b in zip(sc, dc) if a != b][:3]
            failures.append((name, f"values differ, first: {diff}"))
            print(f"FAIL {name}: values differ; first diffs: {diff}")
        else:
            print(f"ok   {name}: {len(sc)} rows match")
    print(f"\n{len(failures)} failures / {n_run} queries run"
          f" ({len(qs)} registered)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
