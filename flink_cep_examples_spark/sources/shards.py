"""Training-shard sink: write a corpus as N deterministic,
size-bounded, internally-ordered parquet shards — the layout a
training job consumes (each data-loader rank streams its own shard
set; a resume re-reads byte-identical shards).

Determinism is the contract: shard membership is
``mix(id) % n_shards`` (the repo's Knuth-mixer convention — a pure row
function, independent of input partitioning, cluster size, or task
scheduling), and rows inside a shard are sorted by the id, so two runs
over the same corpus produce identical shard contents whatever the
upstream plan did. This is what makes a 100 TB dataset build
*auditable*: any shard can be re-derived and diffed independently.

Scale shape: ONE shuffle (repartition on the shard column — each task
owns whole shards), a per-partition sort (spillable, no global sort),
and ``maxRecordsPerFile`` to cap file sizes so downstream readers and
object-store listings stay balanced. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Knuth multiplicative mixer (shared convention with queries/sampling.py)
_MIX = 2654435761
_MOD = 1 << 32

SHARD_COL = "shard"


def with_shard(df: DataFrame, id_col: str, n_shards: int) -> DataFrame:
    """Append the deterministic shard assignment column."""
    return df.withColumn(
        SHARD_COL,
        (F.col(id_col) * F.lit(_MIX)) % F.lit(_MOD) % F.lit(n_shards),
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int,
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` to ``path`` as ``shard=K/`` parquet directories,
    K = mix(id) % n_shards, rows sorted by ``id_col`` within each
    shard's files."""
    out = (
        with_shard(df, id_col, n_shards)
        .repartition(n_shards, F.col(SHARD_COL))
        .sortWithinPartitions(SHARD_COL, id_col)
    )
    w = out.write.mode("overwrite").partitionBy(SHARD_COL)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)


def read_training_shards(
    spark: SparkSession, path: str, shards: list[int] | None = None
) -> DataFrame:
    """Read the shard layout back; ``shards`` restricts to a subset via
    partition pruning (a rank reads only its shards — the scan lists
    only those directories, nothing else is touched)."""
    df = spark.read.parquet(path)
    if shards is not None:
        df = df.filter(F.col(SHARD_COL).isin(shards))
    return df
