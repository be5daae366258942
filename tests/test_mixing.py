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
