"""Deterministic-sketch invariants (operators/sketches.py).

The oracle-parity (hash-exact vs DuckDB) check for sketch_hll_users /
sketch_cms_tokens lives in tests/test_extra_queries.py with the rest of
the extra tier; this file proves the sketch-theoretic properties the
oracle cannot: estimator error bounds at a cardinality the test tables
don't reach, register mergeability (the streaming/tree-reduce property),
CMS one-sidedness, and partitioning invariance of the whole pipeline.
"""

from pyspark.sql import functions as F

from parallel_dataflow_spark.operators import sketches as sk


def _ids(spark, n, parts=8, prefix="u"):
    return spark.range(n).repartition(parts).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("item"),
        (F.col("id") % 4).cast("string").alias("grp"),
    )


def test_hll_error_bound_raw_branch(spark):
    """50k distinct items per group: well past the 2.5m linear-counting
    cutoff (m=4096), so this exercises the raw alpha·m²/Z estimator. HLL
    standard error is 1.04/sqrt(m) ≈ 1.63%; assert 4 sigma."""
    df = _ids(spark, 200_000)  # 4 groups x 50k distinct
    est = {
        r["grp"]: r["hll_estimate"]
        for r in sk.hll_estimate(
            sk.hll_registers(df, ["grp"], "item"), ["grp"]
        ).collect()
    }
    assert set(est) == {"0", "1", "2", "3"}
    for grp, e in est.items():
        assert abs(e - 50_000) <= 4 * 0.0163 * 50_000, (grp, e)


def test_hll_linear_counting_small_cardinality(spark):
    """15 distinct items: the linear-counting branch m·ln(m/V) is nearly
    exact at tiny cardinalities (no register collisions expected)."""
    df = spark.createDataFrame([(f"user{i}",) for i in range(15)] * 7, ["item"])
    df = df.withColumn("grp", F.lit("g"))
    row = sk.hll_estimate(sk.hll_registers(df, ["grp"], "item"), ["grp"]).collect()[0]
    assert row["registers_used"] == 15  # no bucket collisions at n<<sqrt(m)
    assert abs(row["hll_estimate"] - 15) < 0.5


def test_hll_registers_merge_like_streaming_state(spark):
    """Registers are mergeable by groupBy-max: sketching two disjoint
    halves and max-merging the register tables equals sketching the
    union — the exact property the streaming running-max sink relies on
    (and why HLL state is tree-reducible on a 1000-executor cluster)."""
    df = _ids(spark, 20_000)
    a = df.filter(F.col("item").substr(2, 20).cast("long") % 2 == 0)
    b = df.filter(F.col("item").substr(2, 20).cast("long") % 2 == 1)
    merged = (
        sk.hll_registers(a, ["grp"], "item")
        .unionAll(sk.hll_registers(b, ["grp"], "item"))
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    whole = sk.hll_registers(df, ["grp"], "item")
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_hll_partitioning_invariance(spark):
    """Identical estimates from 1 and 16 input partitions: the BIGINT
    register fold is order-independent by construction."""
    rows = [(f"x{i % 997}", "g") for i in range(5_000)]
    one = spark.createDataFrame(rows, ["item", "grp"]).coalesce(1)
    many = spark.createDataFrame(rows, ["item", "grp"]).repartition(16)
    r1 = sk.hll_estimate(sk.hll_registers(one, ["grp"], "item"), ["grp"]).collect()[0]
    r16 = sk.hll_estimate(sk.hll_registers(many, ["grp"], "item"), ["grp"]).collect()[0]
    assert r1 == r16
    assert abs(r1["hll_estimate"] - 997) <= 4 * 0.0163 * 997


def test_cms_one_sided_and_bounded(spark):
    """CMS never underestimates; overestimate is bounded by the sketch
    guarantee eps·N (eps = e/width) with overwhelming probability at
    depth 4 — and deterministically reproducible here."""
    rows = [(f"tok{i % 50}",) for i in range(10_000)] + [("rare",)] * 3
    df = spark.createDataFrame(rows, ["word"]).repartition(8)
    cms = sk.cms_update(df, "word")
    n_total = 10_003
    exact = {r["word"]: r["c"] for r in df.groupBy("word").agg(F.count("*").alias("c")).collect()}
    probes = spark.createDataFrame(
        [("tok0",), ("tok49",), ("rare",), ("never-seen",)], ["word"]
    )
    est = {r["word"]: r["cms_estimate"] for r in sk.cms_lookup(cms, probes, "word").collect()}
    eps_n = (2.718281828 / sk.CMS_WIDTH) * n_total
    for w in ("tok0", "tok49", "rare"):
        assert est[w] >= exact[w], w
        assert est[w] <= exact[w] + eps_n, w
    assert 0 <= est["never-seen"] <= eps_n


def test_cms_merge_by_cell_sum(spark):
    """CMS tables from disjoint halves merge by cell-wise sum into the
    whole-input table — the linearity that makes CMS streaming state."""
    rows = [(f"w{i % 31}",) for i in range(2_000)]
    df = spark.createDataFrame(rows, ["word"])
    half1 = sk.cms_update(spark.createDataFrame(rows[:1_000], ["word"]), "word")
    half2 = sk.cms_update(spark.createDataFrame(rows[1_000:], ["word"]), "word")
    merged = (
        half1.unionAll(half2).groupBy("cell").agg(F.sum("cnt").alias("cnt"))
    )
    whole = sk.cms_update(df, "word")
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_histogram_quantiles_within_grid_error(spark):
    """Fixed-grid quantile estimates sit within one bucket width
    (range/256) BELOW the true order statistic (lower-edge convention),
    and the whole sketch is partition-count-invariant."""
    from pyspark.sql import functions as F

    rows = [(("g",) + (float(((i * 2654435761) % 10_000)) / 10.0,)) for i in range(20_000)]
    df = spark.createDataFrame(rows, ["grp", "v"]).repartition(8)
    out = sk.histogram_quantiles(df, ["grp"], "v").collect()[0]
    vals = sorted(r[1] for r in rows)
    width = (vals[-1] - vals[0]) / sk.HIST_BUCKETS
    import math

    for q in (0.5, 0.9, 0.99):
        true = vals[math.ceil(q * len(vals)) - 1]
        est = out[f"p{int(q * 100)}_est"]
        assert true - width <= est <= true, (q, est, true)

    one = sk.histogram_quantiles(df.coalesce(1), ["grp"], "v").collect()[0]
    assert one == out
