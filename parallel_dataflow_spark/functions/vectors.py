"""Embedding-vector functions.

``cosine_expr``/``dot_expr`` are pure higher-order-function expressions
(JVM-side ``aggregate``/``zip_with`` — sequential left-fold, so float
summation order is deterministic and matches DuckDB's list functions).

``cosine_topk_pandas`` is the scale path: one numpy matmul per Arrow batch
against a broadcast query matrix — the brute-force ANN kernel.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_topk_pandas(
    embeddings: DataFrame,
    query_matrix: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force top-k cosine via mapInPandas: per Arrow batch compute
    the full (batch × queries) similarity matrix with one matmul, keep the
    per-partition top-k per query, then a tiny global top-k agg.

    Scale note: at 100 TB the candidate side is partitioned and only
    (num_queries × k) rows per partition cross the final shuffle —
    the partial/final shape of a distributed top-k.
    """
    spark = embeddings.sparkSession
    qm = query_matrix / np.maximum(np.linalg.norm(query_matrix, axis=1, keepdims=True), 1e-12)
    bq = spark.sparkContext.broadcast((qm.astype(np.float64), query_ids))

    def part(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qmat, qids = bq.value
        for pdf in it:
            if pdf.empty:
                continue
            mat = np.stack(pdf[vec_col].map(lambda v: np.asarray(v, dtype=np.float64)).to_list())
            mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            sims = mat @ qmat.T  # (batch, nq)
            nq = sims.shape[1]
            topn = min(k, sims.shape[0])
            idx = np.argpartition(-sims, topn - 1, axis=0)[:topn]  # (topn, nq)
            rows = {
                "query_id": np.repeat(qids, topn),
                "vec_id": pdf[id_col].to_numpy()[idx.T.ravel()],
                "cosine": np.take_along_axis(sims, idx, axis=0).T.ravel(),
            }
            yield pd.DataFrame(rows)

    partial = embeddings.mapInPandas(part, schema="query_id long, vec_id long, cosine double")
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank")
    )
