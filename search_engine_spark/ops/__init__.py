"""Training-data pipeline operators over the engine's corpus tables.

Each operator ships as a pair: a Spark DataFrame implementation (JVM-side
built-ins wherever expressible — no per-row Python) and a DuckDB "oracle
twin" SQL string with bit-identical (or 4-dp-rounded) semantics, used by
the driver's correctness gate and by tests/test_entry_parity.py.
"""
