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


def _sign_buckets_udf(bits_per_table: int, tables: int, seed: int = 13):
    """array<float> embedding → array<int> of ``tables`` sign-hash buckets
    (bits_per_table planes each; bucket bit j of table t comes from plane
    t*bits_per_table + j, LSB first).

    The hyperplanes are generated INSIDE the UDF from the Arrow batch's
    vector length — deterministic per (seed, dim), identical on every
    worker and batch, and no driver-side ``.first()`` job in the hot path
    (generation is a trivial seeded standard_normal per batch).
    """
    n_planes = bits_per_table * tables

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def sign_buckets(embs: pd.Series) -> pd.Series:
        if len(embs) == 0:
            return pd.Series([], dtype=object)
        mat = np.stack(embs.map(lambda v: np.asarray(v, dtype=np.float64)).to_list())
        planes = _hyperplanes(mat.shape[1], n_planes, seed)
        bits = (mat @ planes.T) > 0  # (n, n_planes)
        out = np.zeros((len(embs), tables), dtype=np.int32)
        for t in range(tables):
            for j in range(bits_per_table):
                out[:, t] |= bits[:, t * bits_per_table + j].astype(np.int32) << j
        return pd.Series(list(out.tolist()))

    return sign_buckets


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bits: int = 4,
    probe_hamming: int = 2,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k cosine: bucket join on sign hash (query probes its
    bucket + all buckets within ``probe_hamming`` bit flips), exact rerank
    inside candidates. ``dim`` is unused (kept for API compatibility) —
    hyperplanes are derived worker-side from the batch's vector length.

    (bits, probes) is the recall/cost dial: defaults (4, ≤2) give
    recall@5 ≈ 0.92 on the weak-neighbor synthetic corpus (top-5 cosines
    only ~0.3-0.4 — see tests/test_similarity.py); corpora with real
    near-neighbors (cos ≥ 0.9) support more bits = finer buckets at the
    same recall, which is where the selectivity at 10^9 vectors comes
    from."""
    sign_hash = _sign_buckets_udf(bits_per_table=bits, tables=1)

    c = corpus.withColumn(
        "bucket", F.element_at(sign_hash(F.col(vec_col)), 1)
    ).select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec"), "bucket")
    q = queries.withColumn(
        "bucket0", F.element_at(sign_hash(F.col(vec_col)), 1)
    ).select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), "bucket0")
    # probe set: bucket0 plus all buckets within probe_hamming bit flips
    # (multi-probe LSH — one exploded row per probed bucket)
    flips = [F.col("bucket0")]
    if probe_hamming >= 1:
        flips += [F.col("bucket0").bitwiseXOR(F.lit(1 << b)) for b in range(bits)]
    if probe_hamming >= 2:
        flips += [
            F.col("bucket0").bitwiseXOR(F.lit((1 << i) | (1 << j)))
            for i in range(bits)
            for j in range(i + 1, bits)
        ]
    q = q.withColumn("bucket", F.explode(F.array_distinct(F.array(*flips))))

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


def embedding_lsh_pairs(
    embeddings: DataFrame,
    threshold: float = 0.45,
    bits_per_table: int = 3,
    tables: int = 8,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs via BANDED sign-hash LSH + exact
    cosine rerank — the 100 TB-scale dedup path (the exact label-blocked
    all-pairs query is the verification kernel, not the scale path).

    Amplification mirrors minhash banding: ``tables`` independent hash
    tables of ``bits_per_table`` hyperplane sign bits each; a pair becomes
    a candidate iff its buckets match in ANY table (equi-join on
    (table, bucket) — never a cross join), then candidates are verified
    with exact cosine ≥ threshold. Pair recall = 1-(1-p^b)^L with
    p = 1 - θ/π; at the demo operating point (t=0.45 ⇒ p≈0.65, b=3, L=8)
    recall ≈ 0.92, asserted in tests/test_similarity.py. Deterministic:
    hyperplanes are seeded, so the DuckDB oracle reproduces the bucketing
    exactly (plans/registry.py dedup_embedding_lsh).
    """
    sign_buckets = _sign_buckets_udf(bits_per_table, tables, seed)
    # r6 execution (guide §1.2 — fix the algorithm before the code): at
    # this operator's pinned operating point (2^bits buckets per table,
    # bucket population ~n/2^bits) the candidate count grows ~n²/2^bits —
    # measured at sf1.0: 203M raw / 130M distinct candidate pairs from
    # 20k vectors, and the r5 shape paid BOTH a 130M-row dropDuplicates
    # exchange and 130M interpreted-HOF cosines (244 s). Verification is
    # therefore reordered: vectors ride the (table, bucket) explode ONCE
    # (tables × vector bytes — 160 MB here, vs >3 GB of candidate keys),
    # each bucket verifies ALL its pairs with one dense numpy GEMM, and
    # only VERIFIED pairs (output-volume × ≤tables duplicates) reach the
    # dedup exchange. Verify-then-dedup instead of dedup-then-verify.
    # The keys-only band-join shape (operators/dedup.py) remains right
    # when candidates ≪ n²; at a near-quadratic operating point the
    # per-bucket GEMM is the optimal execution of the same definition.
    thr = float(threshold)

    exploded = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        F.posexplode(sign_buckets(F.col(vec_col))).alias("tbl", "bucket"),
    ).select("vid", "vec", "tbl", "bucket")

    def verify_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []}).astype(
                {"vec_a": "int64", "vec_b": "int64", "cosine": "float64"}
            )
        ids = pdf["vid"].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        mat = np.stack(
            pdf["vec"].iloc[order].map(lambda v: np.asarray(v, dtype=np.float64)).to_list()
        )
        sims = mat @ mat.T
        norms = np.sqrt(np.einsum("ij,ij->i", mat, mat))
        denom = np.maximum(norms[:, None] * norms[None, :], 1e-12)
        sims /= denom
        ia, ib = np.triu_indices(n, k=1)
        c = sims[ia, ib]
        # HALF_UP 4dp rounding (Spark's round / DuckDB's round for the
        # positive values the threshold admits)
        rounded = np.floor(c * 1e4 + 0.5) / 1e4
        keep = rounded >= thr
        return pd.DataFrame(
            {
                "vec_a": ids[ia[keep]],
                "vec_b": ids[ib[keep]],
                "cosine": rounded[keep],
            }
        )

    verified = exploded.groupBy("tbl", "bucket").applyInPandas(
        verify_bucket, schema="vec_a long, vec_b long, cosine double"
    )
    # a pair verified in several tables carries the identical cosine in
    # each — dedup runs on output-volume rows only
    return verified.dropDuplicates(["vec_a", "vec_b"]).select(
        "vec_a", "vec_b", "cosine"
    )


def _kmeans_argmin(cents: list[list[float]], emb_col: str = "emb"):
    """JVM squared-L2 argmin against broadcast centroid literals: each
    candidate is a (rounded-dist, cluster-id) struct and array_min picks
    the lexicographic minimum, so ties break on cluster id — the shared
    cross-engine determinism contract."""
    choices = []
    for c, cent in enumerate(cents):
        arr = F.array(*[F.lit(v) for v in cent])
        d = F.round(
            F.aggregate(
                F.zip_with(F.col(emb_col), arr, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
            6,
        )
        choices.append(F.struct(d.alias("d"), F.lit(c).alias("c")))
    return F.array_min(F.array(*choices))["c"].cast("int")


def _emb_frame(embeddings: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(doc_id, emb: array<double>) — spread + persisted (r6). The
    iterative trainers (kmeans_fit / pq_fit) re-scan this frame once per
    Lloyd round, plus the encode, query-collect and rerank passes; on
    single-file inputs the scan is row-group-bound (ONE task ran every
    interpreted argmin fold), and without the persist each of those ~5-8
    jobs re-decoded the parquet and re-cast the vectors. Hash-partition
    by doc_id (deterministic, no round-robin sort); 6-dp rounding in the
    trainers absorbs partition-order float noise per the shared
    determinism contract."""
    from parallel_dataflow_spark.operators.dedup import spread

    return spread(
        embeddings.select(
            F.col(id_col).alias("doc_id"),
            F.col(vec_col).cast("array<double>").alias("emb"),
        ),
        ["doc_id"],
    ).persist()


def kmeans_fit(
    emb: DataFrame, k: int, iters: int
) -> list[list[float]]:
    """Lloyd's k-means training over a (doc_id, emb: array<double>)
    frame; returns the final K x dim centroid table (the centroids the
    `iters`-th assignment would use, i.e. iters-1 mean updates).

    Centroids live driver-side as K x dim literals (bytes, not data);
    assignment is a pure JVM zip_with/aggregate squared-L2 fold against
    the broadcast literals, and each recompute is one partial-agg shuffle
    of (cluster, pos) running sums — K*dim rows cross the wire regardless
    of corpus size, so training is one map + one vocabulary-sized shuffle
    per iteration at any scale (the only driver materializations are the
    K seed vectors and the K*dim centroid table).

    Determinism contract (cross-engine, mirrored by the DuckDB oracles in
    plans/registry.py: embedding_kmeans, knn_pq_adc_top5): seeds =
    embeddings of the K smallest ids; every centroid coordinate and every
    distance is rounded to 6 decimals before use; argmin ties break on
    cluster id; empty clusters keep their previous centroid. Float32
    inputs must be widened to double by the caller so both engines fold
    identical values and the 6-dp rounding absorbs sub-1e-12
    summation-order noise.
    """
    seeds = emb.orderBy("doc_id").limit(k).collect()
    if len(seeds) < k:
        # fewer vectors than clusters would leave the empty-cluster
        # carry-over (cents[c] below) indexing past the seed list — fail
        # loudly instead of training a silently smaller codebook
        raise ValueError(
            f"kmeans_fit needs at least k={k} vectors, got {len(seeds)}"
        )
    cents: list[list[float]] = [
        [round(float(v), 6) for v in r["emb"]] for r in seeds
    ]
    for _ in range(iters - 1):
        assigned = emb.withColumn("cluster", _kmeans_argmin(cents))
        rows = (
            assigned.select("cluster", F.posexplode("emb").alias("i", "x"))
            .groupBy("cluster", "i")
            .agg(F.round(F.avg("x"), 6).alias("v"))
            .collect()
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for r in rows:
            by_cluster.setdefault(r["cluster"], {})[r["i"]] = r["v"]
        cents = [
            [m[i] for i in sorted(m)] if (m := by_cluster.get(c)) else cents[c]
            for c in range(k)
        ]
    return cents


def kmeans_assign(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means over an embedding column — the classic
    broadcast-centroid pattern (the IVF coarse quantizer's training step;
    cf. knn_cosine_ivf which probes fixed seed centroids). Training and
    the scale/determinism argument live in kmeans_fit; this wrapper runs
    the final JVM argmin assignment."""
    emb = _emb_frame(embeddings, id_col, vec_col)
    cents = kmeans_fit(emb, k, iters)
    return emb.withColumn("cluster", _kmeans_argmin(cents)).select(
        "doc_id", "cluster"
    )


def pq_fit(
    emb: DataFrame, m: int, k: int, iters: int
) -> tuple[list[list[list[float]]], int]:
    """Product-quantization codebook training (Jégou et al., "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011 — public):
    split the dim-D vector into M contiguous subspaces of D/M dims and
    run Lloyd's k-means independently in each. Returns (codebooks, dsub)
    where codebooks[s] is the K x dsub centroid table of subspace s.

    All M subspaces train in ONE pass per iteration: the M argmin
    assignments are M pure-JVM projections over the same scan, and the
    mean recompute is a single partial-agg shuffle keyed
    (subspace, cluster, coord) — M*K*dsub = D*K rows cross the wire per
    iteration regardless of corpus size. Same determinism contract as
    kmeans_fit (6-dp rounding, cluster-id tie-break, empty clusters keep
    their previous centroid), mirrored by the unrolled DuckDB oracle in
    plans/registry.py:knn_pq_adc_top5.
    """
    seeds = emb.orderBy("doc_id").limit(k).collect()
    if len(seeds) < k:
        # same guard as kmeans_fit: an undersized seed list would break
        # the books[s][c] empty-cluster carry-over (and an empty frame
        # would crash on seeds[0] below)
        raise ValueError(
            f"pq_fit needs at least k={k} vectors, got {len(seeds)}"
        )
    dim = len(seeds[0]["emb"])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books: list[list[list[float]]] = [
        [
            [round(float(v), 6) for v in r["emb"][s * dsub : (s + 1) * dsub]]
            for r in seeds
        ]
        for s in range(m)
    ]
    for _ in range(iters - 1):
        df = emb
        for s in range(m):
            df = df.withColumn(
                f"sub_{s}", F.slice("emb", s * dsub + 1, dsub)
            ).withColumn(f"code_{s}", _kmeans_argmin(books[s], f"sub_{s}"))
        codes_arr = F.array(*[F.col(f"code_{s}") for s in range(m)])
        rows = (
            df.select(codes_arr.alias("codes"), F.posexplode("emb").alias("i", "x"))
            .withColumn("s", (F.col("i") / dsub).cast("int"))
            .withColumn("cluster", F.element_at("codes", F.col("s") + 1))
            .withColumn("j", (F.col("i") % dsub).cast("int"))
            .groupBy("s", "cluster", "j")
            .agg(F.round(F.avg("x"), 6).alias("v"))
            .collect()
        )
        upd: dict[tuple[int, int], dict[int, float]] = {}
        for r in rows:
            upd.setdefault((r["s"], r["cluster"]), {})[r["j"]] = r["v"]
        books = [
            [
                [mm[j] for j in sorted(mm)]
                if (mm := upd.get((s, c)))
                else books[s][c]
                for c in range(k)
            ]
            for s in range(m)
        ]
    return books, dsub


def pq_encode(
    emb: DataFrame, books: list[list[list[float]]], dsub: int
) -> DataFrame:
    """Encode (doc_id, emb) to M small code columns — M JVM argmin
    projections over one scan; the output carries M ints per vector (the
    storage win that makes PQ the billion-scale path: 100 TB of float
    vectors compress to M bytes/vector of codes + a broadcastable
    codebook)."""
    enc = emb
    for s in range(len(books)):
        enc = enc.withColumn(
            f"sub_{s}", F.slice("emb", s * dsub + 1, dsub)
        ).withColumn(f"code_{s}", _kmeans_argmin(books[s], f"sub_{s}"))
    return enc.select("doc_id", *[f"code_{s}" for s in range(len(books))])


def pq_topk(
    embeddings: DataFrame,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    topk: int = 5,
    n_queries: int = 5,
    rerank: int | None = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance (ADC) approximate top-k with exact re-ranking
    (the standard PQ-with-refinement pipeline, Jégou et al. 2011 §V-D):
    exact query subvectors are scored against quantized database codes,
    the ADC top-``rerank`` shortlist is then re-ranked by exact squared
    L2 to produce the final top-k. Per query the M x K table of subspace
    squared-L2 distances is precomputed driver-side (M*K doubles —
    bytes) and shipped as literals in a broadcast queries frame; scoring
    each database vector is M array lookups + a sum, so no float vectors
    move in the scan phase, and the exact rerank touches only
    ``n_queries * rerank`` vectors via a broadcast shortlist join — the
    shortlist is a constant while the corpus grows (100 of 10^9 vectors
    at scale). ``rerank=None`` returns raw ADC ranks (approx_dist
    column). Deterministic under the shared 6-dp rounding contract:
    every distance is rounded before ranking, ties break on vec_id.
    Output (query_id, vec_id, dist|approx_dist, rank), self-match
    excluded.
    """
    emb = _emb_frame(embeddings, id_col, vec_col)
    books, dsub = pq_fit(emb, m, k, iters)
    codes = pq_encode(emb, books, dsub)
    qrows = emb.filter(F.col("doc_id") < n_queries).orderBy("doc_id").collect()
    qdf = _adc_query_frame(embeddings.sparkSession, qrows, books, dsub)
    terms = [
        F.element_at(F.col(f"t{s}"), F.col(f"code_{s}") + 1) for s in range(m)
    ]
    approx = F.round(sum(terms[1:], terms[0]), 6)
    scored = (
        codes.crossJoin(F.broadcast(qdf.drop("q_emb")))
        .filter(F.col("doc_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("doc_id").alias("vec_id"),
            approx.alias("approx_dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_dist").asc(), F.col("vec_id").asc()
    )
    adc_ranked = scored.withColumn("rank", F.row_number().over(w))
    if rerank is None:
        return adc_ranked.filter(F.col("rank") <= topk)
    shortlist = adc_ranked.filter(F.col("rank") <= rerank).select(
        "query_id", "vec_id"
    )
    return _exact_rerank(emb, shortlist, qdf, topk)


def _adc_query_frame(spark, qrows, books: list[list[list[float]]], dsub: int):
    """(query_id, q_emb, t0..t{M-1}) frame: per-query M x K subspace
    squared-L2 tables precomputed driver-side (M*K doubles/query) for
    broadcast ADC scoring."""
    m = len(books)
    qdata = []
    for qr in qrows:
        qv = [float(v) for v in qr["emb"]]
        tables = []
        for s in range(m):
            qsub = qv[s * dsub : (s + 1) * dsub]
            tables.append(
                [
                    round(sum((a - b) * (a - b) for a, b in zip(qsub, cent)), 6)
                    for cent in books[s]
                ]
            )
        qdata.append((int(qr["doc_id"]), qv, *tables))
    tcols = ", ".join(f"t{s} array<double>" for s in range(m))
    return spark.createDataFrame(
        qdata, schema=f"query_id bigint, q_emb array<double>, {tcols}"
    )


def _exact_rerank(emb: DataFrame, shortlist: DataFrame, qdf: DataFrame, topk: int):
    """Exact squared-L2 re-rank of a broadcast (query_id, vec_id)
    shortlist — constant work while the corpus grows."""
    exact = F.round(
        F.aggregate(
            F.zip_with(
                F.col("q_emb"), F.col("emb"), lambda x, y: (x - y) * (x - y)
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        6,
    )
    rr = (
        F.broadcast(shortlist)
        .join(emb.withColumnRenamed("doc_id", "vec_id"), "vec_id")
        .join(F.broadcast(qdf.select("query_id", "q_emb")), "query_id")
        .select("query_id", "vec_id", exact.alias("dist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("vec_id").asc()
    )
    return rr.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= topk
    )


def ivf_pq_topk(
    embeddings: DataFrame,
    kc: int = 8,
    nprobe: int = 2,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    topk: int = 5,
    n_queries: int = 5,
    rerank: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    residual: bool = False,
) -> DataFrame:
    """IVF-PQ: the composed billion-scale ANN (Jégou et al. 2011 §V —
    coarse inverted lists + product-quantized codes).

    ``residual=False``: PQ encodes raw vectors, IVF only prunes the
    candidate set (simpler variant, same pruning/compression structure).
    ``residual=True``: the paper's §V encoding — PQ quantizes the
    residual r = x − centroid(x), which concentrates codebook capacity
    on the within-cell variance and lifts recall at the same (nprobe,
    M). The ADC tables then depend on the probed cell (query residual
    q − c per probe), so the broadcast query frame carries one row per
    (query, probed cluster) — nprobe × M × K doubles, still bytes — and
    the probe join becomes a plain equi-join on the cluster id.

    Per query the ``nprobe`` nearest coarse centroids are picked
    driver-side from the K_c trained centroid literals (bytes, not
    data); scanning then touches ONLY vectors whose coarse cluster is in
    the probe set — at 10^9 vectors with K_c=4096, nprobe=64 that is
    ~1.5% of the corpus — and scores them by ADC table lookups (M ints
    per vector move, never floats), followed by the constant-size exact
    rerank. Pruning fraction ~ nprobe/K_c and compression M bytes/vector
    compose multiplicatively; both dials are recall/cost trade-offs
    gated in tests. Same 6-dp determinism contract as kmeans_fit/pq_fit
    (residuals are rounded to 6 dp on both engines), replayed end-to-end
    by the DuckDB oracles (plans/registry.py: knn_ivf_pq_top5,
    knn_ivf_pq_residual_top5)."""
    emb = _emb_frame(embeddings, id_col, vec_col)
    spark = embeddings.sparkSession
    cents = kmeans_fit(emb, kc, iters)
    assigned = emb.withColumn("cluster", _kmeans_argmin(cents))

    if residual:
        cent_lit = F.array(
            *[F.array(*[F.lit(float(v)) for v in c]) for c in cents]
        )
        res_df = assigned.withColumn(
            "emb",
            F.zip_with(
                F.col("emb"),
                F.element_at(cent_lit, F.col("cluster") + 1),
                lambda x, c: F.round(x - c, 6),
            ),
        )
        pq_input, enc = res_df.select("doc_id", "emb"), res_df
    else:
        pq_input, enc = emb, assigned
    books, dsub = pq_fit(pq_input, m, k, iters)

    for s in range(m):
        enc = enc.withColumn(
            f"sub_{s}", F.slice("emb", s * dsub + 1, dsub)
        ).withColumn(f"code_{s}", _kmeans_argmin(books[s], f"sub_{s}"))
    enc = enc.select("doc_id", "cluster", *[f"code_{s}" for s in range(m)])

    qrows = emb.filter(F.col("doc_id") < n_queries).orderBy("doc_id").collect()
    probes = []
    for qr in qrows:
        qv = [float(v) for v in qr["emb"]]
        ranked = sorted(
            (
                round(sum((a - b) * (a - b) for a, b in zip(qv, cent)), 6),
                c,
            )
            for c, cent in enumerate(cents)
        )
        probes.append((int(qr["doc_id"]), [c for _, c in ranked[:nprobe]]))

    terms = [
        F.element_at(F.col(f"t{s}"), F.col(f"code_{s}") + 1) for s in range(m)
    ]
    approx = F.round(sum(terms[1:], terms[0]), 6)

    if residual:
        # one broadcast row per (query, probed cluster): ADC tables of the
        # query RESIDUAL vs the residual codebooks; probe set expressed as
        # an equi-join on the coarse cluster id
        qdf = _adc_query_frame_residual(spark, qrows, probes, cents, books, dsub)
        scored = (
            enc.join(
                F.broadcast(qdf.drop("q_emb")),
                (F.col("cluster") == F.col("pcluster"))
                & (F.col("doc_id") != F.col("query_id")),
            )
            .select(
                "query_id",
                F.col("doc_id").alias("vec_id"),
                approx.alias("approx_dist"),
            )
        )
        rerank_qdf = qdf.select("query_id", "q_emb").dropDuplicates(["query_id"])
    else:
        qdf = _adc_query_frame(spark, qrows, books, dsub)
        pdf = spark.createDataFrame(probes, "query_id bigint, probes array<int>")
        qdf = qdf.join(pdf, "query_id")
        scored = (
            enc.join(
                F.broadcast(qdf.drop("q_emb")),
                F.array_contains(F.col("probes"), F.col("cluster"))
                & (F.col("doc_id") != F.col("query_id")),
            )
            .select(
                "query_id",
                F.col("doc_id").alias("vec_id"),
                approx.alias("approx_dist"),
            )
        )
        rerank_qdf = qdf
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_dist").asc(), F.col("vec_id").asc()
    )
    shortlist = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= rerank)
        .select("query_id", "vec_id")
    )
    return _exact_rerank(emb, shortlist, rerank_qdf, topk)


def _adc_query_frame_residual(
    spark,
    qrows,
    probes: list[tuple[int, list[int]]],
    cents: list[list[float]],
    books: list[list[list[float]]],
    dsub: int,
):
    """(query_id, pcluster, q_emb, t0..t{M-1}) frame for residual IVF-PQ:
    per probed coarse cell, the query residual q − c (6-dp rounded like
    the database residuals) is tabled against the residual codebooks —
    nprobe rows per query, M*K doubles each."""
    m = len(books)
    probe_map = dict(probes)
    qdata = []
    for qr in qrows:
        qid = int(qr["doc_id"])
        qv = [float(v) for v in qr["emb"]]
        for c in probe_map[qid]:
            qres = [round(x - cv, 6) for x, cv in zip(qv, cents[c])]
            tables = []
            for s in range(m):
                qsub = qres[s * dsub : (s + 1) * dsub]
                tables.append(
                    [
                        round(
                            sum((a - b) * (a - b) for a, b in zip(qsub, cent)), 6
                        )
                        for cent in books[s]
                    ]
                )
            qdata.append((qid, int(c), qv, *tables))
    tcols = ", ".join(f"t{s} array<double>" for s in range(m))
    return spark.createDataFrame(
        qdata,
        schema=f"query_id bigint, pcluster int, q_emb array<double>, {tcols}",
    )


def semdedup(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 3,
    tau: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication in embedding space. Cluster with k-means, then inside
    each cluster remove any item whose cosine to an *earlier* item in the
    cluster ordering is >= tau; the ordering is ascending similarity to
    the cluster centroid (ties on id), so the kept representative of each
    semantic-duplicate group is the one FARTHEST from the centroid — the
    paper's keep-low-centroid-similarity rule (S 3), which preserves the
    cluster's outer shell rather than its redundant core.

    Scale shape: the k-means step is the broadcast-centroid pattern of
    ``kmeans_fit`` (data never reaches the driver; K*dim rows shuffle per
    iteration). The only quadratic work is the within-cluster pairwise
    cosine — an equi-join on the cluster id, O(sum c_i^2) pairs, which is
    exactly the paper's device for avoiding the corpus-level O(n^2): k is
    the dial that bounds cluster size (50k clusters at LAION scale). The
    per-cluster rank window sorts one cluster per partition — bounded by
    the same dial.

    Determinism contract (mirrored by the DuckDB oracle in
    plans/registry.py:semdedup_embeddings): k-means per ``kmeans_fit``;
    all cosines rounded to 6 decimals (with a 1e-12 norm-product floor)
    BEFORE the tau comparison and the rank ordering; rank ties break on
    doc_id. Returns (doc_id, cluster, cent_cos, kept).
    """
    emb = _emb_frame(embeddings, id_col, vec_col)
    cents = kmeans_fit(emb, k, iters)

    def _dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    def _nrm(a):
        return F.sqrt(_dot(a, a))

    def _cos(a, b):
        return F.round(
            _dot(a, b) / F.greatest(_nrm(a) * _nrm(b), F.lit(1e-12)), 6
        )

    cent_arr = F.array(*[F.array(*[F.lit(v) for v in c]) for c in cents])
    assigned = (
        emb.withColumn("cluster", _kmeans_argmin(cents))
        .withColumn("cent", F.element_at(cent_arr, F.col("cluster") + 1))
        .withColumn("cent_cos", _cos(F.col("emb"), F.col("cent")))
        .drop("cent")
    )
    w = Window.partitionBy("cluster").orderBy(
        F.asc("cent_cos"), F.asc("doc_id")
    )
    ranked = assigned.withColumn("rk", F.row_number().over(w)).persist()
    lhs = ranked.select(
        "cluster",
        F.col("rk").alias("rk_a"),
        F.col("emb").alias("emb_a"),
    )
    rhs = ranked.select(
        "cluster",
        F.col("rk").alias("rk_b"),
        F.col("doc_id").alias("dup_id"),
        F.col("emb").alias("emb_b"),
    )
    removed = (
        lhs.join(rhs, "cluster")
        .filter(F.col("rk_a") < F.col("rk_b"))
        .filter(_cos(F.col("emb_a"), F.col("emb_b")) >= F.lit(tau))
        .select("dup_id")
        .distinct()
    )
    return (
        ranked.join(
            removed, ranked["doc_id"] == removed["dup_id"], "left"
        )
        .select(
            "doc_id",
            F.col("cluster").cast("int").alias("cluster"),
            "cent_cos",
            F.col("dup_id").isNull().alias("kept"),
        )
    )
