"""Similarity search over embedding columns.

Two paths (SURVEY-mandated training-pipeline operator):

- brute force: ``functions.vectors.cosine_topk_pandas`` (numpy matmul
  partial top-k per partition + global top-k) — exact, O(n·q);
- LSH-bucketed (this module): random-hyperplane sign hashes split the
  corpus into 2^bits buckets; queries probe their own bucket plus
  ``probe_hamming``-neighboring buckets; candidates are exactly reranked.
  At 10^9 vectors the bucket equi-join replaces the cross join — the
  classic recall/cost dial (bits down or probes up → recall up).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _hyperplanes(dim: int, bits: int, seed: int = 13) -> np.ndarray:
    rng = np.random.default_rng(np.random.PCG64(seed))
    return rng.standard_normal((bits, dim))


def _sign_hash_udf(planes: np.ndarray):
    @F.pandas_udf(T.IntegerType())
    def sign_hash(embs: pd.Series) -> pd.Series:
        mat = np.stack(embs.map(lambda v: np.asarray(v, dtype=np.float64)).to_list())
        bits = (mat @ planes.T) > 0  # (n, bits)
        out = np.zeros(len(embs), dtype=np.int32)
        for i in range(planes.shape[0]):
            out |= bits[:, i].astype(np.int32) << i
        return pd.Series(out)

    return sign_hash


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bits: int = 8,
    probe_hamming: int = 1,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k cosine: bucket join on sign hash (query probes its
    bucket + all buckets within ``probe_hamming`` bit flips), exact rerank
    inside candidates."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    planes = _hyperplanes(dim, bits)
    sign_hash = _sign_hash_udf(planes)

    c = corpus.withColumn("bucket", sign_hash(F.col(vec_col))).select(
        F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec"), "bucket"
    )
    q = queries.withColumn("bucket0", sign_hash(F.col(vec_col))).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), "bucket0"
    )
    # probe set: bucket0 plus single-bit flips (multi-probe LSH)
    flips = [F.col("bucket0")]
    if probe_hamming >= 1:
        flips += [F.col("bucket0").bitwiseXOR(F.lit(1 << b)) for b in range(bits)]
    q = q.withColumn("bucket", F.explode(F.array(*flips)))

    # cosine on candidates (JVM fold — deterministic order)
    dot = F.aggregate(
        F.zip_with(F.col("q_vec"), F.col("c_vec"), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    nrm = lambda col: F.sqrt(  # noqa: E731
        F.aggregate(col, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    cand = (
        q.join(c, "bucket")
        .dropDuplicates(["query_id", "c_id"])
        .select(
            "query_id",
            F.col("c_id").alias("vec_id"),
            F.round(dot / F.greatest(nrm(F.col("q_vec")) * nrm(F.col("c_vec")), F.lit(1e-12)), 4).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
