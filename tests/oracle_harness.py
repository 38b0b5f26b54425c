"""Local replica of the driver's correctness gate: run a Spark query and
its DuckDB oracle on the same parquet tables, compare row count, column
names, and order-insensitive values.

Round-6 change: comparison is EXACT by default — floats by IEEE bit
pattern, ints distinguished from floats — because the driver's hash is
exact and dtype-sensitive (round-5 postmortem: three queries passed the
old 6-dp-rounding harness and failed the driver on ulp-level float
drift / DuckDB HUGEINT→float64 promotion). "Green locally" must imply
"green at the driver". A tolerance mode survives ONLY for explicitly
approximate assertions (recall floors etc.), never for gate queries.
"""

from __future__ import annotations

import datetime
import math
import struct

import duckdb
import numpy as np

from flink_cep_examples_spark.sources.tables import TABLE_NAMES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _norm_exact(v):
    """Driver-faithful value key: floats by bit pattern (int 5 != float
    5.0 — exactly the q12 HUGEINT miss), ints as ints, containers
    recursively."""
    if isinstance(v, float):  # np.float64 subclasses float
        if math.isnan(v):
            return ("f", b"nan")
        # +0.0 collapses -0.0 only if added; keep raw bits (driver does)
        return ("f", struct.pack("<d", v))
    if isinstance(v, bool):  # before int: bool subclasses int
        return ("b", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_norm_exact(x) for x in v)
    if isinstance(v, datetime.datetime):
        return ("t", v.isoformat())
    if isinstance(v, datetime.date):
        return ("t", v.isoformat() + "T00:00:00")
    return v


def _norm_tol(v):
    """Legacy 6-dp rounding — ONLY for tests marked approximate."""
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return round(v, 6)
    if isinstance(v, (int, np.integer)):
        return int(v)
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_norm_tol(x) for x in v)
    return v


def compare(
    spark_df, oracle_sql: str, sf_dir: str, exact: bool = True
) -> tuple[bool, str]:
    """Returns (ok, message). Columns sorted by name, rows compared as
    sorted multisets. exact=True (default, the gate contract) compares
    float bit patterns and distinguishes int from float; exact=False is
    the legacy 6-dp mode for explicitly approximate tests."""
    norm = _norm_exact if exact else _norm_tol
    con = duckdb_connection(sf_dir)
    try:
        odf = con.execute(oracle_sql).fetchdf()
    finally:
        con.close()
    srows = spark_df.collect()
    scols = sorted(spark_df.columns)
    ocols = sorted(odf.columns)
    if scols != ocols:
        return False, f"schema mismatch: spark={scols} oracle={ocols}"
    if len(srows) != len(odf):
        return False, f"row count: spark={len(srows)} oracle={len(odf)}"
    sset = sorted(tuple(norm(r[c]) for c in scols) for r in srows)
    oset = sorted(
        tuple(norm(v) for v in row)
        for row in odf[scols].itertuples(index=False, name=None)
    )
    if sset != oset:
        diffs = [(a, b) for a, b in zip(sset, oset) if a != b][:3]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, f"ok ({len(srows)} rows)"
