"""Mixture-resampling invariants + an explicit-target golden (the
uniform path is oracle-checked via resample_uniform_mix)."""

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def test_resample_explicit_target_golden(spark):
    from parallel_dataflow_spark.operators.mixing import resample_to_mix

    docs = spark.createDataFrame(
        [
            # srcA: 4 docs x 10 tokens = 40; srcB: 2 docs x 10 = 20
            *[(i, "srcA", " ".join(f"a{i}w{j}" for j in range(10))) for i in range(4)],
            *[(i + 10, "srcB", " ".join(f"b{i}w{j}" for j in range(10))) for i in range(2)],
        ],
        "doc_id long, source string, text string",
    )
    # target 50/50: srcB binds (20/0.5=40 < 40/0.5=80) -> cap=40,
    # srcB keeps rate 1.0, srcA thins to 20/40 = 0.5
    got = {
        r["source"]: r.asDict()
        for r in resample_to_mix(docs, target={"srcA": 0.5, "srcB": 0.5}).collect()
    }
    assert got["srcB"]["rate"] == 1.0
    assert got["srcB"]["docs_kept"] == 2 and got["srcB"]["tokens_kept"] == 20
    assert got["srcA"]["rate"] == pytest.approx(0.5, abs=1e-9)
    # hash thinning is exact-rate only in expectation; never upsampled
    assert got["srcA"]["docs_kept"] <= 4
    assert abs(got["srcA"]["achieved_share"] + got["srcB"]["achieved_share"] - 1.0) < 1e-9


def test_resample_uniform_invariants(spark):
    from parallel_dataflow_spark.operators.mixing import resample_to_mix
    from parallel_dataflow_spark.sources.tables import load_table

    rows = resample_to_mix(load_table(spark, SF_DIR, "documents")).collect()
    assert len(rows) == 20
    # exactly the binding (min-token) sources keep rate 1; nothing upsamples
    min_total = min(r["tokens_total"] for r in rows)
    for r in rows:
        assert 0.0 < r["rate"] <= 1.0
        assert (r["rate"] == 1.0) == (r["tokens_total"] == min_total)
        assert r["tokens_kept"] <= r["tokens_total"]
    # the rates target uniform EXPECTED token share: rate*tokens_total is
    # (up to the 1e-9 rate rounding) the same for every source. Realized
    # shares at 25 docs/source carry Bernoulli noise, so assert on the
    # expectation, not the sample.
    expected_kept = [r["rate"] * r["tokens_total"] for r in rows]
    assert max(expected_kept) - min(expected_kept) < 1e-2
    # realized shares still sum to 1
    assert abs(sum(r["achieved_share"] for r in rows) - 1.0) < 1e-4


def test_split_leakage_safe_invariants(spark):
    """No near-dup pair straddles splits (the whole point), fractions
    near 80/10/10, assignment purely cluster-determined."""
    from parallel_dataflow_spark.operators import dedup as dd
    from parallel_dataflow_spark.plans.registry import split_leakage_safe
    from parallel_dataflow_spark.sources.tables import load_table

    rows = split_leakage_safe(spark, SF_DIR).collect()
    split_of = {r["doc_id"]: r["split"] for r in rows}
    cluster_of = {r["doc_id"]: r["cluster_id"] for r in rows}
    assert len(rows) == 500

    pairs = dd.jaccard_pairs_lsh(
        load_table(spark, SF_DIR, "documents"), threshold=0.5
    ).collect()
    assert pairs, "corpus must have near-dup pairs for this to mean anything"
    for p in pairs:
        assert split_of[p["doc_a"]] == split_of[p["doc_b"]]
        assert cluster_of[p["doc_a"]] == cluster_of[p["doc_b"]]

    # same cluster -> same split, and fractions are hash-plausible
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_cluster.values())
    n = len(rows)
    frac_train = sum(1 for r in rows if r["split"] == "train") / n
    assert 0.7 < frac_train < 0.9


def test_resample_target_validation(spark):
    """An explicit target that omits an observed source (or carries a
    non-positive share) must raise instead of silently dropping every
    document of the unlisted source."""
    from parallel_dataflow_spark.operators.mixing import resample_to_mix

    docs = spark.createDataFrame(
        [(0, "srcA", "a b c"), (1, "srcB", "d e f")],
        "doc_id long, source string, text string",
    )
    with pytest.raises(ValueError, match="missing shares.*srcB"):
        resample_to_mix(docs, target={"srcA": 1.0}).collect()
    with pytest.raises(ValueError, match="shares must be > 0"):
        resample_to_mix(docs, target={"srcA": 0.5, "srcB": 0.0}).collect()
