"""Local replica of the driver's correctness gate: run a Spark query and
its DuckDB oracle on the same parquet tables, compare row count, column
names, and order-insensitive values."""

from __future__ import annotations

import math

import duckdb

from flink_cep_examples_spark.sources.tables import TABLE_NAMES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return round(v, 6)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def compare(spark_df, oracle_sql: str, sf_dir: str) -> tuple[bool, str]:
    """Returns (ok, message). Columns sorted by name, rows compared as
    sorted multisets with float rounding."""
    con = duckdb_connection(sf_dir)
    odf = con.execute(oracle_sql).fetchdf()
    srows = spark_df.collect()
    scols = sorted(spark_df.columns)
    ocols = sorted(odf.columns)
    if scols != ocols:
        return False, f"schema mismatch: spark={scols} oracle={ocols}"
    if len(srows) != len(odf):
        return False, f"row count: spark={len(srows)} oracle={len(odf)}"
    sset = sorted(tuple(_norm(r[c]) for c in scols) for r in srows)
    oset = sorted(
        tuple(_norm(v) for v in row)
        for row in odf[scols].itertuples(index=False, name=None)
    )
    if sset != oset:
        diffs = [(a, b) for a, b in zip(sset, oset) if a != b][:3]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, f"ok ({len(srows)} rows)"
