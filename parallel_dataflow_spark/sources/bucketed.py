"""Bucketed-table layout — co-located joins without a shuffle.

At 100 TB the dominant cost of a fact-fact join (orders ⋈ lineitem on
orderkey) is shuffling BOTH sides on the key. Pre-bucketing the tables
on that key at write time (Spark's bucketBy: rows are hash-partitioned
into a fixed bucket count inside each table, recorded in the catalog)
lets every later join/aggregate on the key run with ZERO exchanges —
the SortMergeJoin reads bucket i of each side directly. One write-time
shuffle is amortized over every subsequent query; this is the standard
warehouse layout for repeatedly-joined fact tables (public Spark API:
DataFrameWriter.bucketBy, SPARK-15453).

The bucket count is a layout contract: both sides must agree (or be a
multiple under spark.sql.bucketing.coalesceBucketsInJoin). Pick it so a
single bucket of the LARGER table fits an executor's memory at target
scale — e.g. 100 TB / 4096 buckets ≈ 24 GB raw ≈ a few GB columnar.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist df as a catalog table bucketed (and bucket-sorted) on
    ``key``. Sorting within buckets lets the join skip its Sort too."""
    keys = [key] if isinstance(key, str) else key
    spark = df.sparkSession
    # a managed-table location can survive a dead session while the
    # in-memory catalog entry does not — drop both or saveAsTable raises
    # LOCATION_ALREADY_EXISTS
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    # managed tables in a non-default database live under
    # warehouse/<db>.db/<table> — a bare split('.')[-1] path would miss
    # them and saveAsTable could still hit LOCATION_ALREADY_EXISTS
    parts = table.split(".")
    rel = (
        os.path.join(f"{parts[-2]}.db", parts[-1]) if len(parts) > 1 else parts[-1]
    )
    loc = os.path.join(warehouse.removeprefix("file:"), rel)
    if os.path.isdir(loc):
        shutil.rmtree(loc, ignore_errors=True)
    # one file per bucket: repartition on the same hash the bucketer
    # uses, else each write task emits a file per bucket it touches and
    # multi-file buckets make the reader discard the sortBy metadata
    # (the join would re-Sort)
    w = (
        df.repartition(buckets, *keys)
        .write.mode("overwrite")
        .bucketBy(buckets, *keys)
    )
    if sort:
        w = w.sortBy(*keys)
    w.format("parquet").saveAsTable(table)


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
