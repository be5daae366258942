"""Sketch aggregates vs exact values, within the sketches' error bounds.

approx_count_distinct (HyperLogLog++, rsd=1%) and percentile_approx
(accuracy=10000) have no cross-engine bit-replayable oracle — the honest
check is the exact answer ± the configured bound.
"""

from pyspark.sql import functions as F

from parallel_dataflow_spark.plans.registry import EXTRA_QUERIES
from parallel_dataflow_spark.sources.tables import load_table
from tests.conftest import SF_SMALL


def test_sketch_matches_exact_within_bounds(spark):
    got = {
        r["event_type"]: r
        for r in EXTRA_QUERIES["sketch_events_stats"](spark, SF_SMALL).collect()
    }
    e = load_table(spark, SF_SMALL, "events")
    exact = {
        r["event_type"]: r
        for r in e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("median"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for et, g in got.items():
        x = exact[et]
        assert g["n_events"] == x["n"]
        # HLL++ rsd=1%: allow 5 sigma
        assert abs(g["approx_users"] - x["users"]) <= max(1, 0.05 * x["users"])
        # percentile_approx with accuracy=10000 on ~200 rows/group is
        # exact up to interpolation: exact percentile() interpolates
        # between the two middle values, the sketch returns a REAL datum —
        # allow the gap between adjacent order statistics
        vals = sorted(
            v[0] for v in e.filter(F.col("event_type") == et).select("value").collect()
        )
        import bisect

        i = bisect.bisect_left(vals, g["approx_median"])
        assert 0 <= i <= len(vals)
        lo, hi = vals[max(0, len(vals) // 2 - 2)], vals[min(len(vals) - 1, len(vals) // 2 + 2)]
        assert lo <= g["approx_median"] <= hi or abs(g["approx_median"] - x["median"]) < 1e-6
