"""Executable plan-property gates: the 100x-scale claims PLANS.md makes
in prose, pinned as assertions on the physical plan string so a
refactor that silently de-optimizes a flagship plan (drops a pushdown,
loses a broadcast hint, reintroduces a row-at-a-time Python UDF or a
cartesian product) fails CI instead of surviving until a bench run.

These assert plan SHAPE, not timings: presence/absence of physical
operators is stable across hosts and data scale, so the gates are
deterministic. AQE rewrites happen at execution; the pinned markers
(broadcast hints, WindowGroupLimit, scan pushdown, Arrow-vs-row Python)
all appear in the initial executed plan, so no query is executed here —
every test is a pure plan build.
"""

import re

import pytest

from parallel_dataflow_spark.plans.registry import QUERIES

SF = "/root/testdata/sf0.001"


def plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# Representative, cheap-to-build entries across the operator families.
# Excluded: the dataflow/fixpoint and CEP entries (they run driver-side
# fixpoint loops at build time) and the ANN entries that train codebooks
# at build time (knn_ivf_pq_top5 has its own dedicated gate below).
SWEEP = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q6_forecast_revenue",
    "semi_join_big_spenders",
    "topk_orders_per_customer",
    "running_total_per_customer",
    "events_tumbling_10m",
    "events_stream_join_10m",
    "text_stats",
    "quality_scores",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "heavy_hitter_bigrams_mg",
    "decontaminate_ngram",
    "pack_sequences_greedy",
    "tokenize_documents",
    "lang_id_vote",
    "fingerprint_winnow",
    "dedup_embedding_lsh",
    "split_leakage_safe",
]


@pytest.fixture(scope="module")
def plans(spark):
    # Cold-cache requirement: earlier suite modules execute the graded
    # queries in-process (oracle parity) and leave their persisted
    # frames cached; a cache hit on a sub-plan here nests extra
    # InMemoryRelation prints, each re-printing the expression chain the
    # reinlining gate counts textually. Clearing first makes the plan
    # strings identical to a standalone run, which is what the pinned
    # bounds were calibrated against.
    spark.catalog.clearCache()
    return {name: plan(QUERIES[name](spark, SF)) for name in SWEEP}


def test_no_row_at_a_time_python_udf(plans):
    """The repo-wide zero-per-row-Python contract, as a gate: any Python
    in a hot path must be Arrow-batched (ArrowEvalPython / *InPandas
    nodes), never the row-pickling BatchEvalPython."""
    offenders = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert offenders == [], offenders


def test_no_cartesian_products(plans):
    """No graded sweep entry may plan a CartesianProduct — the only
    all-pairs shapes allowed in the repo are banded/bucketed equi-joins
    and broadcast nested loops against constant-size frames."""
    offenders = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert offenders == [], offenders


def test_q6_scan_prunes_columns_and_pushes_filters(plans):
    """q6's parquet scan must read exactly the 4 needed lineitem columns
    (of 16) and carry the shipdate/discount/quantity predicates down to
    the scan — the pushdown-and-prune contract at the 100 TB scan."""
    m = re.search(r"FileScan parquet \[([^\]]*)\][^\n]*", plans["q6_forecast_revenue"])
    assert m, plans["q6_forecast_revenue"]
    cols = {c.split("#")[0] for c in m.group(1).split(",")}
    assert cols == {"l_quantity", "l_extendedprice", "l_discount", "l_shipdate"}, cols
    scan_line = m.group(0)
    assert "DataFilters: [" in scan_line and "l_shipdate" in scan_line.split("DataFilters:")[1]


def test_small_dimension_joins_broadcast(spark, plans):
    """q5's region/nation/supplier dims and the semi-join's filtered
    customer side must plan as BroadcastHashJoin — a shuffle join on a
    25-row dim at 100 TB is the classic self-inflicted bottleneck."""
    assert "BroadcastHashJoin" in plan(QUERIES["q5_region_revenue"](spark, SF))
    assert "BroadcastHashJoin" in plans["semi_join_big_spenders"]


def test_topk_plans_partial_window_group_limit(plans):
    """Per-key top-k must plan WindowGroupLimit (map-side partial top-k
    before the rank exchange), not a full sort of every group."""
    assert "WindowGroupLimit" in plans["topk_orders_per_customer"]


def test_heavy_hitter_tail_dies_in_broadcast_probe(plans):
    """The MG recount joins the unbounded bigram stream against the
    <=1/theta candidate set: that join must be broadcast so the tail is
    filtered map-side and never shuffles."""
    assert "BroadcastHashJoin" in plans["heavy_hitter_bigrams_mg"]


def test_decontaminate_benchmark_grams_broadcast(plans):
    """Decontamination probes corpus n-grams against the (small)
    benchmark gram set — must broadcast, so the corpus-side tail dies at
    the probe instead of shuffling the full n-gram stream."""
    assert "BroadcastHashJoin" in plans["decontaminate_ngram"]


def test_no_expression_reinlining_into_lambdas(plans):
    """r6 regression gate: Catalyst re-inlines a non-cheap words/grams
    expression into every element_at/slice of a HOF lambda (and a
    Generate inlines its operand through child projections) unless the
    hot paths materialize the array in its own multi-referenced
    projection / persist it. The buggy plans carried 10-15 textual
    copies of the split chain, each re-evaluated PER ELEMENT at runtime
    (O(words²) per doc — 6-140 s regressions at sf1.0). Healthy plans
    show the chain once per branch plus once per InMemoryRelation
    print."""
    bounds = {
        "dedup_minhash_lsh": 5,
        "dedup_ngram_jaccard": 5,
        "heavy_hitter_bigrams_mg": 4,
        "decontaminate_ngram": 4,
        "tokenize_documents": 2,
    }
    for name, bound in bounds.items():
        n = plans[name].count("split(")
        assert n <= bound, (name, n)


def test_winnow_is_scan_side_zero_exchanges(plans):
    """r6: winnowing computes the sliding min on the per-row gram array
    and per-doc distinctness before the explode — the whole operator
    must plan with ZERO exchanges and exactly one md5 transform (the r5
    form was a corpus×positions explode + two analytic windows + global
    distinct)."""
    p = plans["fingerprint_winnow"]
    assert "ENSURE_REQUIREMENTS" not in p, p
    assert p.count("md5(") == 1, p.count("md5(")


def test_shuffle_hash_joins_share_partitioning(plans, spark):
    """r6: q3/topk/stream-join use shuffle-hash joins whose output
    partitioning is REUSED by the downstream window/aggregate — exactly
    the join's two exchanges, no third exchange for the rank/groupBy."""
    for name in (
        "q3_top_orders",
        "topk_orders_per_customer",
        "events_stream_join_10m",
    ):
        p = plans[name]
        assert "ShuffledHashJoin" in p, name
        assert p.count("ENSURE_REQUIREMENTS") == 2, (
            name,
            p.count("ENSURE_REQUIREMENTS"),
        )
    # session agg reuses the explicit user repartition: no ENSURE
    # exchange anywhere in the plan
    psess = plan(QUERIES["events_session_5m"](spark, SF))
    assert "ENSURE_REQUIREMENTS" not in psess
    assert "REPARTITION_BY_NUM" in psess


def test_simhash_pair_dedup_is_predicate_not_shuffle(plans):
    """r6: simhash dedups pairs with the first-matching-chunk codegen
    predicate — the plan must contain NO aggregate-based dropDuplicates
    exchange between the self-join and the output (at sf1.0 that
    exchange carried 141M pair rows)."""
    assert "ENSURE_REQUIREMENTS" not in plans["dedup_simhash"], plans[
        "dedup_simhash"
    ]


def test_ivf_pq_plans_broadcast_and_partial_topk(spark):
    """The composed ANN's scan-side plan: shortlist + ADC tables arrive
    via broadcast, and the per-query candidate ranking is a
    WindowGroupLimit partial top-k, never a global sort."""
    p = plan(QUERIES["knn_ivf_pq_top5"](spark, SF))
    assert "BroadcastHashJoin" in p
    assert "WindowGroupLimit" in p
    assert "BatchEvalPython" not in p
    assert "CartesianProduct" not in p
