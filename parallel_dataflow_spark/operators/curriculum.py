"""Curriculum shard writer — range-partitioned, internally-sorted
training shards (easy→hard curriculum ordering; public technique:
Bengio et al. 2009 "Curriculum Learning").

A trainer consuming shards sequentially wants (a) global order by the
difficulty/quality key across shards, (b) sorted rows inside each shard,
(c) roughly equal shard sizes. `repartitionByRange` gives exactly that
at any scale: Spark samples the key distribution (driver-side reservoir
over a small sample, `spark.sql.execution.rangeExchange.sampleSizePerPartition`)
to pick split points, so shards stay balanced even under skewed score
distributions — one range shuffle, then a shard-local sort, then a
straight parquet write; nothing else touches the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parallel_dataflow_spark.functions.text import quality_score_expr


def write_curriculum_shards(
    documents: DataFrame,
    out_dir: str,
    n_shards: int = 8,
    ascending: bool = True,
) -> None:
    """Write documents as ``n_shards`` parquet shards range-partitioned
    and sorted by the house quality score (ties broken by doc_id so the
    layout is fully deterministic): shard i's every score <= shard i+1's
    (>= when descending). File names follow Spark's part-file scheme;
    global order = lexicographic file order."""
    score = F.round(quality_score_expr(F.col("text")), 6)
    d = documents.withColumn("score", score)
    keys = (
        [F.col("score").asc(), F.col("doc_id").asc()]
        if ascending
        else [F.col("score").desc(), F.col("doc_id").desc()]
    )
    (
        d.repartitionByRange(n_shards, *keys)
        .sortWithinPartitions(*keys)
        .write.mode("overwrite")
        .parquet(out_dir)
    )


def read_shard_files(spark, out_dir: str) -> list[str]:
    """The shard files in global curriculum order, listed through the
    Hadoop FileSystem API so any scheme write_curriculum_shards can write
    to (hdfs://, s3a://, file:/) lists the same way — os.listdir would
    silently limit the pair to local paths."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(out_dir)
    fs = path.getFileSystem(hconf)
    out = []
    for st in fs.listStatus(path):
        name = st.getPath().getName()
        if name.startswith("part-") and name.endswith(".parquet"):
            out.append(st.getPath().toString())
    return sorted(out)
