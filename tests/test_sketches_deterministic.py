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


def test_bloom_no_false_negatives(spark):
    """One-sidedness: EVERY inserted item must probe member=True — the
    property that lets the Bloom gate pre-filter a decontamination join
    without losing a single true contamination hit."""
    items = spark.createDataFrame(
        [(f"gram {i} x",) for i in range(3_000)], ["gram"]
    ).repartition(8)
    bloom = sk.bloom_build(items, "gram")
    probed = sk.bloom_probe(bloom, items, ["gram"], "gram")
    assert probed.filter(~F.col("bloom_member")).count() == 0


def test_bloom_fpr_within_design_bound(spark):
    """Measured false-positive rate on disjoint probes stays within 3x of
    the analytic (1 - e^{-kn/m})^k — deterministic here, but the bound is
    what the design promises at any n."""
    n = 3_000
    items = spark.createDataFrame([(f"in-{i}",) for i in range(n)], ["gram"])
    bloom = sk.bloom_build(items, "gram")
    probes = spark.createDataFrame(
        [(f"out-{i}",) for i in range(20_000)], ["gram"]
    )
    fp = sk.bloom_probe(bloom, probes, ["gram"], "gram").filter(
        F.col("bloom_member")
    ).count()
    import math

    analytic = (1.0 - math.exp(-sk.BLOOM_K * n / sk.BLOOM_BITS)) ** sk.BLOOM_K
    assert fp / 20_000 <= 3 * analytic, (fp, analytic)


def test_bloom_merge_and_partitioning_invariance(spark):
    """bit_or folds make the filter (a) mergeable — building over two
    disjoint halves and bit_or-merging the word tables equals building
    over the union (the streaming-state / tree-reduce property) — and
    (b) byte-identical at 1 vs 16 input partitions."""
    rows = [(f"g{i}",) for i in range(2_000)]
    whole = sk.bloom_build(spark.createDataFrame(rows, ["gram"]).coalesce(1), "gram")
    many = sk.bloom_build(spark.createDataFrame(rows, ["gram"]).repartition(16), "gram")
    assert whole.exceptAll(many).count() == 0
    assert many.exceptAll(whole).count() == 0
    merged = (
        sk.bloom_build(spark.createDataFrame(rows[:1_000], ["gram"]), "gram")
        .unionAll(sk.bloom_build(spark.createDataFrame(rows[1_000:], ["gram"]), "gram"))
        .groupBy("word")
        .agg(F.bit_or("bits").alias("bits"))
    )
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_kmv_distinct_exact_when_unsaturated(spark):
    """n < K: the sketch holds every distinct hash, so the estimate is
    exactly n (the saturation branch is a plain count)."""
    df = spark.createDataFrame(
        [(f"v{i % 100}", "g") for i in range(5_000)], ["item", "grp"]
    ).repartition(8)
    row = sk.kmv_distinct(sk.kmv_sketch(df, ["grp"], "item"), ["grp"]).collect()[0]
    assert row["sketch_size"] == 100
    assert row["kmv_estimate"] == 100.0


def test_kmv_distinct_error_bound_saturated(spark):
    """50k distinct >> K=256: the (K-1)·2^60/h_K estimator has relative
    standard error ~1/sqrt(K-2) ≈ 6.3%; assert 4 sigma."""
    df = _ids(spark, 200_000)  # 4 groups x 50k distinct
    est = {
        r["grp"]: r["kmv_estimate"]
        for r in sk.kmv_distinct(sk.kmv_sketch(df, ["grp"], "item"), ["grp"]).collect()
    }
    for grp, e in est.items():
        assert abs(e - 50_000) <= 4 * 50_000 / (sk.KMV_K - 2) ** 0.5, (grp, e)


def test_kmv_sketch_merge_by_union_rerank(spark):
    """Bottom-K of a union equals bottom-K of the concatenated per-half
    sketches — KMV's mergeability (what makes the sketch tree-reducible
    and its streaming state bounded)."""
    from pyspark.sql import Window

    df = _ids(spark, 20_000)
    a = df.filter(F.col("item").substr(2, 20).cast("long") % 2 == 0)
    b = df.filter(F.col("item").substr(2, 20).cast("long") % 2 == 1)
    win = Window.partitionBy("grp").orderBy("h")
    merged = (
        sk.kmv_sketch(a, ["grp"], "item").select("grp", "h")
        .unionAll(sk.kmv_sketch(b, ["grp"], "item").select("grp", "h"))
        .withColumn("rk", F.row_number().over(win))
        .filter(F.col("rk") <= sk.KMV_K)
    )
    whole = sk.kmv_sketch(df, ["grp"], "item")
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_kmv_pair_jaccard_known_overlap(spark):
    """Constructed 50% overlap (A = 0..5999, B = 3000..8999 → J = 1/3):
    the unioned-sketch estimator lands within 4·sqrt(J(1-J)/K) — and the
    whole pipeline is partition-count-invariant."""
    rows = [(f"x{i}", "A") for i in range(6_000)] + [
        (f"x{i}", "B") for i in range(3_000, 9_000)
    ]
    df = spark.createDataFrame(rows, ["item", "src"])
    out16 = sk.kmv_pair_jaccard(
        sk.kmv_sketch(df.repartition(16), ["src"], "item"), "src"
    ).collect()
    out1 = sk.kmv_pair_jaccard(
        sk.kmv_sketch(df.coalesce(1), ["src"], "item"), "src"
    ).collect()
    assert out16 == out1
    (row,) = out16
    true_j = 3_000 / 9_000
    sigma = (true_j * (1 - true_j) / sk.KMV_K) ** 0.5
    assert abs(row["jaccard_est"] - true_j) <= 4 * sigma, row


def test_bloom_semi_join_exact_and_pruning(spark):
    """bloom_semi_join == plain semi-join (one-sidedness: no key is ever
    falsely dropped), and the literal-baked membership filter prunes the
    fact side BEFORE the join: with 10k fact keys and a 100-key dim, the
    bloom-positive survivor count must sit near matches + FPR*misses,
    i.e. well under the fact row count."""
    fact = spark.range(10_000).select(
        F.concat(F.lit("k"), (F.col("id") % 2_000).cast("string")).alias("key"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(100).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("key")
    )
    got = sk.bloom_semi_join(fact, dim, "key")
    want = fact.join(dim, "key", "semi")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0

    words = sk.bloom_collect(sk.bloom_build(dim.select(F.col("key").alias("_k")), "_k"))
    member = sk.bloom_member_expr(words)
    survivors = fact.filter(member(F.col("key"))).count()
    # 500 true-positive rows (100 of 2000 key values x 5 rows each);
    # allow generous FPR slack on the 9500 misses before calling the
    # pruning broken.
    assert survivors >= 500
    assert survivors <= 500 + 0.05 * 9_500, survivors
