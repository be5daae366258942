"""Recall gates for the approximate similarity/dedup paths.

Both operators are APPROXIMATE by construction (LSH candidate generation)
with exact verification/rerank — precision is 1.0 by design; these tests
pin the recall floor on the deterministic test corpus (seeded hyperplanes
+ fixed data ⇒ exact recall is reproducible, asserted with headroom).
"""

import numpy as np
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def vectors():
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pandas()
    V = np.stack(t.embedding.map(lambda v: np.asarray(v, dtype=np.float64)))
    ids = t.vec_id.to_numpy()
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    return ids, Vn


def test_lsh_topk_recall_vs_exact(spark, vectors):
    """knn_cosine_ivf's lsh_topk: recall@5 >= 0.85 vs exact brute force
    (measured 0.92 at bits=4, probe<=2 on this corpus)."""
    from parallel_dataflow_spark.operators.similarity import lsh_topk
    from parallel_dataflow_spark.sources.tables import load_table

    ids, Vn = vectors
    S = Vn @ Vn.T
    qmask = ids < 5
    exact = {}
    for qi in np.where(qmask)[0]:
        cidx = np.where(~qmask)[0]
        top = cidx[np.argsort(-S[qi, cidx])[:5]]
        exact[int(ids[qi])] = {int(ids[c]) for c in top}

    e = load_table(spark, SF_DIR, "embeddings")
    from pyspark.sql import functions as F

    got = (
        lsh_topk(e.filter(F.col("vec_id") >= 5), e.filter(F.col("vec_id") < 5), k=5)
        .select("query_id", "vec_id")
        .collect()
    )
    by_q: dict[int, set] = {}
    for r in got:
        by_q.setdefault(int(r["query_id"]), set()).add(int(r["vec_id"]))
    hits = sum(len(by_q.get(q, set()) & e5) for q, e5 in exact.items())
    recall = hits / (5 * len(exact))
    assert recall >= 0.85, f"recall@5 {recall:.2f} < 0.85"


def test_embedding_lsh_pairs_recall_and_precision(spark, vectors):
    """dedup_embedding_lsh: banded sign-LSH pair recall >= 0.8 vs exact
    all-pairs at the same threshold (expected ~0.92 at b=3, L=8, t=0.45);
    precision is exactly 1.0 (every emitted pair is exact-verified)."""
    from parallel_dataflow_spark.operators.similarity import embedding_lsh_pairs
    from parallel_dataflow_spark.sources.tables import load_table

    ids, Vn = vectors
    S = Vn @ Vn.T
    iu = np.triu_indices(len(ids), k=1)
    mask = np.round(S[iu], 4) >= 0.45
    truth = {
        (int(min(ids[a], ids[b])), int(max(ids[a], ids[b])))
        for a, b in zip(iu[0][mask], iu[1][mask])
    }
    assert truth, "test corpus must contain pairs above the threshold"

    got_rows = embedding_lsh_pairs(
        load_table(spark, SF_DIR, "embeddings"), threshold=0.45
    ).collect()
    got = {(int(r["vec_a"]), int(r["vec_b"])) for r in got_rows}
    assert got <= truth, f"false positives: {got - truth}"  # precision 1.0
    recall = len(got) / len(truth)
    assert recall >= 0.8, f"pair recall {recall:.2f} < 0.8 ({len(got)}/{len(truth)})"


def test_kmeans_assign_matches_numpy_spec(spark):
    """Third opinion on the k-means determinism contract (the DuckDB CTE
    oracle is the second): an independent numpy implementation of the
    same spec — seeds = K smallest ids, 6-dp-rounded centroids and
    squared-L2 distances, argmin ties to the lowest cluster id, empty
    clusters keep their previous centroid — must reproduce the engine's
    assignment exactly."""
    from parallel_dataflow_spark.operators.similarity import kmeans_assign
    from parallel_dataflow_spark.sources.tables import load_table

    K, ITERS = 8, 3
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    ids = np.array(t["vec_id"])
    emb = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    order = np.argsort(ids, kind="stable")
    ids, emb = ids[order], emb[order]

    cent = np.round(emb[:K].copy(), 6)
    for it in range(ITERS):
        d = np.round(((emb[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2), 6)
        assign = d.argmin(axis=1)  # first occurrence = lowest cluster id
        if it < ITERS - 1:
            newc = cent.copy()
            for k in range(K):
                members = assign == k
                if members.any():
                    newc[k] = np.round(emb[members].mean(axis=0), 6)
            cent = newc
    expected = dict(zip(ids.tolist(), assign.tolist()))

    got = {
        r["doc_id"]: r["cluster"]
        for r in kmeans_assign(
            load_table(spark, SF_DIR, "embeddings"), k=K, iters=ITERS
        ).collect()
    }
    assert got == expected
    # sanity: the clustering is non-degenerate on this corpus
    assert len(set(got.values())) == K

def test_pq_topk_matches_numpy_spec_and_recall(spark):
    """Third opinion on the PQ/ADC+rerank determinism contract (the
    unrolled DuckDB oracle is the second): an independent numpy
    implementation of the spec — per-subspace seeds = K smallest ids,
    6-dp-rounded codebooks/distances/ADC sums, argmin ties to the lowest
    code, empty codes keep their previous centroid, ADC top-R shortlist
    re-ranked by exact squared L2 — must reproduce the engine's top-5
    exactly. Also pins recall@5 vs exact squared-L2 (the R dial:
    shortlist up → recall up; 0.92 measured at R=100 here)."""
    from parallel_dataflow_spark.operators.similarity import pq_topk
    from parallel_dataflow_spark.sources.tables import load_table

    M, K, ITERS = 4, 8, 2
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    ids = np.array(t["vec_id"])
    emb = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    order = np.argsort(ids, kind="stable")
    ids, emb = ids[order], emb[order]
    dsub = emb.shape[1] // M

    def sub(X, s):
        return X[:, s * dsub : (s + 1) * dsub]

    books = [np.round(sub(emb[:K], s), 6) for s in range(M)]

    def codes_of(books):
        out = np.zeros((len(emb), M), dtype=int)
        for s in range(M):
            d = np.round(
                ((sub(emb, s)[:, None, :] - books[s][None]) ** 2).sum(-1), 6
            )
            out[:, s] = d.argmin(1)
        return out

    for _ in range(ITERS - 1):
        codes = codes_of(books)
        books = [
            np.stack(
                [
                    np.round(sub(emb, s)[codes[:, s] == c].mean(0), 6)
                    if (codes[:, s] == c).any()
                    else books[s][c]
                    for c in range(K)
                ]
            )
            for s in range(M)
        ]
    codes = codes_of(books)

    R = 100
    expected = []
    exact_top = {}
    by_id = {int(ids[i]): emb[i] for i in range(len(emb))}
    for qi in range(5):
        q = emb[ids == qi][0]
        tabs = [
            np.round(((q[None, s * dsub : (s + 1) * dsub] - books[s]) ** 2).sum(-1), 6)
            for s in range(M)
        ]
        d = np.round(sum(tabs[s][codes[:, s]] for s in range(M)), 6)
        shortlist = [
            vid
            for _, vid in sorted(
                (float(d[i]), int(ids[i])) for i in range(len(emb)) if ids[i] != qi
            )[:R]
        ]
        rr = sorted(
            (round(float(((q - by_id[vid]) ** 2).sum()), 6), vid)
            for vid in shortlist
        )
        expected.extend((qi, vid, dist, r) for r, (dist, vid) in enumerate(rr[:5], 1))
        ex = np.round(((q[None] - emb) ** 2).sum(-1), 6)
        exact = sorted(
            (float(ex[i]), int(ids[i])) for i in range(len(emb)) if ids[i] != qi
        )
        exact_top[qi] = {vid for _, vid in exact[:5]}

    got = [
        (r["query_id"], r["vec_id"], r["dist"], r["rank"])
        for r in pq_topk(
            load_table(spark, SF_DIR, "embeddings"), m=M, k=K, iters=ITERS, rerank=R
        )
        .orderBy("query_id", "rank")
        .collect()
    ]
    assert got == expected

    by_q: dict[int, set] = {}
    for qid, vid, _, _ in got:
        by_q.setdefault(int(qid), set()).add(int(vid))
    hits = sum(len(by_q[q] & exact_top[q]) for q in exact_top)
    recall = hits / (5 * len(exact_top))
    assert recall >= 0.85, f"PQ+rerank recall@5 {recall:.2f} < 0.85"

def test_ivf_pq_recall_gate(spark):
    """IVF-PQ recall@5 vs exact squared-L2 (the nprobe/rerank dials at
    their entry operating point: kc=8, nprobe=2, R=50 -> 0.88 measured)."""
    from parallel_dataflow_spark.operators.similarity import ivf_pq_topk
    from parallel_dataflow_spark.sources.tables import load_table

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    ids = np.array(t["vec_id"])
    emb = np.array(t["embedding"].to_pylist(), dtype=np.float64)

    got = ivf_pq_topk(load_table(spark, SF_DIR, "embeddings")).collect()
    by_q: dict[int, set] = {}
    for r in got:
        by_q.setdefault(int(r["query_id"]), set()).add(int(r["vec_id"]))

    hits = 0
    for qi in range(5):
        q = emb[ids == qi][0]
        d = ((emb - q) ** 2).sum(1)
        exact = [int(ids[i]) for i in np.argsort(d, kind="stable") if ids[i] != qi][:5]
        hits += len(set(exact) & by_q[qi])
    recall = hits / 25
    assert recall >= 0.8, f"IVF-PQ recall@5 {recall:.2f} < 0.8"


def test_ivf_pq_residual_recall_exceeds_nonresidual_gate(spark):
    """Residual encoding (Jégou 2011 §V: PQ on r = x − centroid(x)) at the
    registry operating point (kc=8, nprobe=2, M=4, K=8, R=50, 3 iters):
    recall@5 = 0.92 measured — above the non-residual entry's 0.88 and at
    the nprobe=2 probe-set ceiling for this corpus."""
    from parallel_dataflow_spark.operators.similarity import ivf_pq_topk
    from parallel_dataflow_spark.sources.tables import load_table

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    ids = np.array(t["vec_id"])
    emb = np.array(t["embedding"].to_pylist(), dtype=np.float64)

    got = ivf_pq_topk(
        load_table(spark, SF_DIR, "embeddings"), iters=3, residual=True
    ).collect()
    by_q: dict[int, set] = {}
    for r in got:
        by_q.setdefault(int(r["query_id"]), set()).add(int(r["vec_id"]))

    hits = 0
    for qi in range(5):
        q = emb[ids == qi][0]
        d = ((emb - q) ** 2).sum(1)
        exact = [int(ids[i]) for i in np.argsort(d, kind="stable") if ids[i] != qi][:5]
        hits += len(set(exact) & by_q[qi])
    recall = hits / 25
    assert recall >= 0.9, f"residual IVF-PQ recall@5 {recall:.2f} < 0.9"


def test_ivf_pq_residual_beats_nonresidual_under_compression_stress(spark):
    """The residual advantage is visible where the ADC ordering is the
    bottleneck: shrink the rerank shortlist to 5 (no slack for ADC
    mistakes). Measured on the deterministic corpus at 3 iters:
    residual 0.40 vs non-residual 0.28 — assert the strict ordering."""
    from parallel_dataflow_spark.operators.similarity import ivf_pq_topk
    from parallel_dataflow_spark.sources.tables import load_table

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    ids = np.array(t["vec_id"])
    emb = np.array(t["embedding"].to_pylist(), dtype=np.float64)

    def recall(residual: bool) -> float:
        got = ivf_pq_topk(
            load_table(spark, SF_DIR, "embeddings"),
            iters=3,
            rerank=5,
            residual=residual,
        ).collect()
        by_q: dict[int, set] = {}
        for r in got:
            by_q.setdefault(int(r["query_id"]), set()).add(int(r["vec_id"]))
        hits = 0
        for qi in range(5):
            q = emb[ids == qi][0]
            d = ((emb - q) ** 2).sum(1)
            exact = [
                int(ids[i]) for i in np.argsort(d, kind="stable") if ids[i] != qi
            ][:5]
            hits += len(set(exact) & by_q[qi])
        return hits / 25

    r_res, r_non = recall(True), recall(False)
    assert r_res > r_non, f"residual {r_res:.2f} <= non-residual {r_non:.2f}"


def test_kmeans_and_pq_fit_reject_undersized_input(spark):
    """Fewer vectors than k must fail loudly (the empty-cluster
    carry-over would otherwise IndexError mid-training)."""
    import pytest as _pytest

    from parallel_dataflow_spark.operators.similarity import kmeans_fit, pq_fit

    emb = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0, 4.0]), (1, [2.0, 3.0, 4.0, 5.0])],
        "doc_id long, emb array<double>",
    )
    with _pytest.raises(ValueError, match="at least k=8"):
        kmeans_fit(emb, k=8, iters=2)
    with _pytest.raises(ValueError, match="at least k=4"):
        pq_fit(emb, m=2, k=4, iters=2)
    with _pytest.raises(ValueError, match="at least k=2"):
        pq_fit(emb.limit(0), m=2, k=2, iters=2)
