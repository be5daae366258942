"""Idempotent exactly-once sink (the engine's result sink, #22 in
SURVEY.md §2.1; reference emits canonical Debug text, impls/src/passes.rs:109-120).

No transactional table format is available in this sandbox (no
Delta/Iceberg jars), so exactly-once is built from two classic pieces:

1. **Idempotent epoch writes**: ``foreachBatch`` writes each micro-batch to
   ``<dir>/epoch=<batchId>/`` with overwrite. A replayed batch (after a
   checkpoint restart) rewrites the same directory with the same rows —
   a no-op. This is the documented idempotent-by-batchId pattern for
   foreachBatch sinks.
2. **Upsert-on-read**: the sink is keyed; the reader resolves each key to
   its latest epoch (row_number over key ordered by epoch desc). With
   update-mode streaming aggregation, every key's final emission is the
   complete aggregate, so last-write-wins reconstruction is exact.

``compact()`` materializes the resolved view and drops superseded epochs —
on a real cluster this is the Iceberg MERGE (documented production target);
the Sink protocol isolates that swap.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


class IdempotentKeyedSink:
    """Exactly-once keyed parquet sink for ``foreachBatch``."""

    def __init__(self, base_dir: str, key_cols: list[str]):
        self.base_dir = base_dir
        self.key_cols = list(key_cols)
        os.makedirs(base_dir, exist_ok=True)
        meta = os.path.join(base_dir, "_sink_meta.json")
        if not os.path.exists(meta):
            with open(meta, "w") as f:
                json.dump({"key_cols": self.key_cols}, f)

    # -- write side -------------------------------------------------------
    def write_batch(self, batch_df: DataFrame, batch_id: int, n_files: int = 8) -> None:
        """foreachBatch hook: idempotent per-epoch overwrite. Coalesced —
        epoch outputs are small relative to the shuffle width, and small
        files are the scale killer on object stores."""
        epoch_dir = os.path.join(self.base_dir, f"epoch={batch_id}")
        (
            batch_df.coalesce(n_files)
            .withColumn("__epoch", F.lit(batch_id))
            .write.mode("overwrite")
            .parquet(epoch_dir)
        )

    def foreach_batch(self):
        return lambda df, batch_id: self.write_batch(df, batch_id)

    # -- read side --------------------------------------------------------
    def _epoch_dirs(self) -> list[str]:
        return sorted(
            os.path.join(self.base_dir, d)
            for d in os.listdir(self.base_dir)
            if d.startswith("epoch=") and os.path.isdir(os.path.join(self.base_dir, d))
        )

    def epochs(self) -> list[int]:
        """Committed epoch ids, ascending — the sink's lineage axis."""
        return sorted(
            int(os.path.basename(d).split("=", 1)[1]) for d in self._epoch_dirs()
        )

    def read(self, spark: SparkSession, as_of_epoch: int | None = None) -> DataFrame:
        """Resolved view: latest epoch wins per key. ``as_of_epoch``
        time-travels — resolve using only epochs <= it, i.e. the exact
        table a reader saw after that micro-batch committed. Epoch dirs
        ARE the lineage (each is one micro-batch's idempotent write), so
        time-travel is a directory filter, not a format feature — the
        parquet stand-in for Iceberg snapshot reads (VERSION AS OF)."""
        dirs = self._epoch_dirs()
        if as_of_epoch is not None:
            dirs = [
                d
                for d in dirs
                if int(os.path.basename(d).split("=", 1)[1]) <= as_of_epoch
            ]
        if not dirs:
            raise FileNotFoundError(f"empty sink: {self.base_dir}")
        raw = spark.read.parquet(*dirs)
        w = Window.partitionBy(*self.key_cols).orderBy(F.desc("__epoch"))
        return (
            raw.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "__epoch")
        )

    def compact(self, spark: SparkSession) -> None:
        """Fold all epochs into epoch=0 (the MERGE stand-in)."""
        resolved = self.read(spark)
        tmp = os.path.join(self.base_dir, "_compact_tmp")
        resolved.withColumn("__epoch", F.lit(0)).write.mode("overwrite").parquet(tmp)
        for d in self._epoch_dirs():
            shutil.rmtree(d)
        os.rename(tmp, os.path.join(self.base_dir, "epoch=0"))
