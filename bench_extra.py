"""Round-6 optimization measurement harness (guide §1).

Separate from the FROZEN bench.py: isolates individual queries with both
the frozen methodology (``.count()``, what the driver times) and the
noop sink (``df.write.format("noop")`` — computes every column, guide
§1.4), captures ``.explain("formatted")`` per query into plans/r06/, and
labels jobs so the timeline is attributable.

Usage:
  python bench_extra.py                      # headline set, count-timing
  python bench_extra.py --queries a,b,c      # subset
  python bench_extra.py --noop               # also noop-sink timing
  python bench_extra.py --explain SUFFIX     # dump plans/r06/<q>_SUFFIX.txt
  python bench_extra.py --trials N           # default 3 (median)
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py ...
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "topk_orders_per_customer",
    "events_tumbling_10m",
    "events_session_5m",
    "events_stream_join_10m",
    "dedup_exact",
    "dedup_minhash_lsh",
    "knn_cosine_bruteforce_pandas",
    "tokenize_documents",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=None)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--explain", default=None, metavar="SUFFIX")
    args = ap.parse_args()

    from parallel_dataflow_spark.plans.registry import EXTRA_QUERIES, QUERIES
    from parallel_dataflow_spark.session import get_spark, stop_spark

    queries = {**EXTRA_QUERIES, **QUERIES}
    names = args.queries.split(",") if args.queries else HEADLINE

    spark = get_spark("bench_extra", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    # same untimed warmup as the frozen bench
    queries["tokenize_documents"](spark, SF_DIR).count()
    spark.range(0, 1_000_000, 1, CPUS).selectExpr("sum(id)").collect()

    if args.explain:
        os.makedirs(os.path.join(REPO, "plans", "r06"), exist_ok=True)
        for name in names:
            df = queries[name](spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(REPO, "plans", "r06", f"{name}_{args.explain}.txt")
            with open(path, "w") as f:
                f.write(txt)
            print(f"wrote {path}")
            spark.catalog.clearCache()

    results: dict[str, dict] = {}
    trials: dict[str, list[float]] = {n: [] for n in names}
    noop_trials: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(args.trials):
        for name in names:
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"count:{name}")
            t0 = time.time()
            queries[name](spark, SF_DIR).count()
            trials[name].append(round(time.time() - t0, 3))
            if args.noop:
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(f"noop:{name}")
                t0 = time.time()
                queries[name](spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                noop_trials[name].append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    for name in names:
        results[name] = {
            "count_median": round(statistics.median(trials[name]), 3),
            "count_trials": trials[name],
        }
        if args.noop:
            results[name]["noop_median"] = round(
                statistics.median(noop_trials[name]), 3
            )
            results[name]["noop_trials"] = noop_trials[name]
    stop_spark()
    total = round(sum(r["count_median"] for r in results.values()), 3)
    print(json.dumps({"sf_dir": SF_DIR, "total_count_median": total,
                      "queries": results}, indent=1))


if __name__ == "__main__":
    main()
