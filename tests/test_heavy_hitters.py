"""Misra-Gries heavy hitters: the bounded-memory candidate stage must be a
superset of the true heavy hitters on ANY partitioning (that is the whole
correctness argument for the exact two-phase plan), the end-to-end result
must equal the brute-force groupBy answer, and the candidate volume must
stay bounded by K per partition.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from parallel_dataflow_spark.operators.heavy_hitters import (
    _mg_capacity,
    heavy_hitters_exact,
    mg_candidates,
)

THETA = 0.01


def _zipf_rows(seed: int, n_rows: int, vocab: int, arr_len: int):
    """Deterministic zipf-ish arrays: a heavy head + a long tail."""
    rng = np.random.default_rng(seed)
    p = 1.0 / np.arange(1, vocab + 1)
    p /= p.sum()
    rows = []
    for i in range(n_rows):
        ks = rng.choice(vocab, size=arr_len, p=p)
        rows.append((i, [f"k{k}" for k in ks]))
    return rows


def _exact_hh(rows, theta):
    from collections import Counter

    c = Counter(x for _, arr in rows for x in arr)
    total = sum(c.values())
    return {k: v for k, v in c.items() if v >= theta * total}, total


@pytest.fixture(scope="module")
def skewed(spark):
    rows = _zipf_rows(seed=7, n_rows=400, vocab=800, arr_len=60)
    df = spark.createDataFrame(rows, "id long, keys array<string>").repartition(7)
    return rows, df


def test_mg_candidates_superset_and_bounded(spark, skewed):
    rows, df = skewed
    truth, _ = _exact_hh(rows, THETA)
    cand = {r.key for r in mg_candidates(df, "keys", THETA).collect()}
    assert set(truth) <= cand, f"missed heavy hitters: {set(truth) - cand}"
    # <= K keys per partition survive the summary
    assert len(cand) <= _mg_capacity(THETA) * 7


def test_heavy_hitters_exact_matches_bruteforce(spark, skewed):
    rows, df = skewed
    truth, total = _exact_hh(rows, THETA)
    got = {r.key: (r.cnt, r.share) for r in
           heavy_hitters_exact(df, "keys", THETA).collect()}
    assert set(got) == set(truth)
    for k, cnt in truth.items():
        assert got[k][0] == cnt
        assert got[k][1] == round(cnt / total, 6)


def test_partitioning_invariance(spark, skewed):
    """The reference's determinism-under-parallelism property: 1 partition
    and 16 partitions must produce identical heavy-hitter sets even though
    the candidate summaries differ."""
    rows, df = skewed
    a = sorted(map(tuple, heavy_hitters_exact(df.coalesce(1), "keys", THETA).collect()))
    b = sorted(
        map(tuple, heavy_hitters_exact(df.repartition(16), "keys", THETA).collect())
    )
    assert a == b


def test_empty_and_null_arrays(spark):
    df = spark.createDataFrame(
        [(1, ["a", "a", "a"]), (2, []), (3, None)], "id long, keys array<string>"
    )
    got = {r.key: r.cnt for r in heavy_hitters_exact(df, "keys", 0.5).collect()}
    assert got == {"a": 3}


def test_mg_fold_property_no_false_negatives():
    """Property (hypothesis): for ANY batching of ANY key stream, every key
    with total count > n/(K+1) survives the batched MG fold, and the
    summary never exceeds K keys — the two halves of the classic MG bound
    that the exact-recount stage's correctness rests on."""
    hypothesis = pytest.importorskip("hypothesis")
    from hypothesis import given, settings, strategies as st
    import pandas as pd
    from collections import Counter

    from parallel_dataflow_spark.operators.heavy_hitters import mg_fold

    keys = st.integers(min_value=0, max_value=30).map(lambda i: f"k{i}")
    batch = st.lists(st.lists(keys, max_size=8), max_size=6)  # rows of arrays

    @given(batches=st.lists(batch, max_size=5), k=st.integers(2, 12))
    @settings(max_examples=150, deadline=None)
    def prop(batches, k):
        acc = mg_fold((pd.Series(b, dtype=object) for b in batches), k)
        survivors = set() if acc is None else set(acc.index)
        assert len(survivors) <= k
        truth = Counter(x for b in batches for arr in b for x in arr)
        n = sum(truth.values())
        for key, cnt in truth.items():
            if cnt > n / (k + 1):
                assert key in survivors, (key, cnt, n, k)

    prop()


def test_recount_join_is_broadcast(spark, skewed):
    """Plan shape: the exact recount joins the exploded keys against a
    BROADCAST of the candidate set — the long tail dies map-side, never
    entering the final aggregation shuffle."""
    _, df = skewed
    plan = heavy_hitters_exact(df, "keys", THETA)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
