"""Deterministic, oracle-replayable sketches: HyperLogLog (cardinality),
Count-Min (frequency), Bloom (membership), KMV bottom-k (distinct +
set-overlap), and fixed-grid histograms (quantiles).

Sketches are the 100 TB answer for cardinality/frequency questions: a
fixed-size mergeable summary (KBs per group) replaces exact distinct's
per-key shuffle state that grows with the key universe. Spark's built-in
``approx_count_distinct`` is the production fast path (HLL++, JVM
intrinsics) but its register layout is engine-private, so it can only be
tolerance-tested (see ``sketch_events_stats``). The variants here trade a
slower hash (md5) for a sketch whose every register is REPLAYABLE by a
DuckDB oracle — the same design as md5_60bit elsewhere in the repo: a
verification-grade twin of the production operator.

Determinism contract (the repo-wide rules applied to sketches):
- register values are integers derived from md5 (cross-engine identical);
- register folds use exact BIGINT arithmetic (``1 << (49 - rho)`` sums,
  CMS integer counts) — fold-order-independent, so any partitioning /
  batching / replay produces byte-identical sketches;
- the only doubles are the final estimator arithmetic (IEEE mult/div on
  exact integers — deterministic) and one ``ln`` in the linear-counting
  branch (same 1-ulp-class precedent as ``bigram_logprob_docs``),
  rounded to 4 dp on both engines.

Scale shape (audited via .explain at sf0.01):
- hll_registers: ONE partial-agg shuffle whose output is register-bounded
  (≤ groups × 2^p rows) — the map side folds each partition's rows into
  at most 2^p registers before anything crosses the wire;
- hll_estimate: arithmetic over the register table only (group-bounded);
- cms_update: ONE partial-agg shuffle bounded by depth × width cells,
  independent of both corpus size and vocabulary size (the whole point:
  an unbounded token universe folds into a constant-size table);
- cms_lookup: broadcast of the constant-size cell table onto a constant
  probe list — no data-volume work at all.

Streaming: the register table is the streaming state. ``max(rho)`` is
monotone, so update-mode running emissions through a latest-wins keyed
sink converge to the exact batch registers under any replay — the same
argument as the running-totals quota sink (streaming/jobs.py). State per
window is ≤ 2^p rows REGARDLESS of how many distinct keys the window saw,
vs exact distinct-count state that grows with cardinality; this is why a
sketch, not dropDuplicates, is the 10^12-sequence cardinality design.

Reference parity: the reference engine has no sketch operator; this tier
extends SURVEY.md §2's "beyond the reference" pipeline ops (cf. the
Misra-Gries pairing: operators/heavy_hitters.py is frequency-by-exactness,
cms_update is frequency-by-bounded-memory).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from parallel_dataflow_spark.functions.text import md5_60bit

# Register-count exponent: m = 2^p registers. p=12 → 4096 registers,
# ~1.04/sqrt(m) ≈ 1.6% relative error — the HLL standard-error law.
HLL_P = 12
HLL_M = 1 << HLL_P
# Flajolet et al. 2007 bias constant alpha_m for m ≥ 128.
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
# md5_60bit yields 60 hash bits: p for the bucket, 48 for the rho pattern.
_RHO_BITS = 60 - HLL_P
_RHO_MAX = _RHO_BITS + 1  # rho when the remaining bits are all zero
# Single shared estimator numerator alpha·m²·2^49, precomputed once in
# Python and embedded verbatim in BOTH engines' plans so neither engine's
# constant folding can associate the product differently.
HLL_EST_NUM = HLL_ALPHA * float(HLL_M) * float(HLL_M) * float(1 << _RHO_MAX)


def hll_rho(item: Column) -> tuple[Column, Column]:
    """(bucket, rho) for one item: bucket = low p bits of the 60-bit md5
    hash, rho = 1 + leading zeros of the remaining 48 bits. Leading zeros
    via ``length(bin(w))`` — ``bin`` drops leading zeros identically on
    Spark and DuckDB, so rho = 49 - length(bin(w)) (w=0 → 49)."""
    h = md5_60bit(item)
    bucket = F.pmod(h, F.lit(HLL_M)).cast("int")
    w = F.shiftright(h, HLL_P)
    rho = F.when(w == 0, F.lit(_RHO_MAX)).otherwise(
        F.lit(_RHO_MAX) - F.length(F.bin(w))
    )
    return bucket, rho.cast("int")


def hll_registers(
    df: DataFrame, key_cols: list[str], item_col: str
) -> DataFrame:
    """Mergeable HLL register table: (key..., bucket, rho=max rho seen).

    The ONLY data-volume operation: one hash-agg shuffle whose map side
    folds every partition into ≤ 2^p registers per key before the
    exchange. Register tables from disjoint inputs merge by groupBy-max —
    the property that makes HLL state both streamable and tree-reducible.
    """
    bucket, rho = hll_rho(F.col(item_col))
    return (
        df.select(*key_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*key_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(registers: DataFrame, key_cols: list[str]) -> DataFrame:
    """Finalize register tables into cardinality estimates.

    Exact-integer register fold: each register contributes
    ``1 << (49 - rho)`` (rho ≤ 49 → ≥ 1, exact in BIGINT); the m - nz
    unobserved registers contribute ``1 << 49`` each. The fold-order-
    independent BIGINT sum S' relates to the classic harmonic sum by
    Z = S' / 2^49, so E_raw = alpha · m² · 2^49 / S'. Linear-counting
    correction (Flajolet small-range regime): when E_raw ≤ 2.5m and
    empty registers exist, E = m · ln(m / V)."""
    per_key = registers.groupBy(*key_cols).agg(
        F.count("*").alias("registers_used"),
        F.sum(F.expr(f"shiftleft(1L, {_RHO_MAX} - rho)")).alias("register_sum"),
    )
    s_total = (
        F.col("register_sum")
        + (F.lit(HLL_M) - F.col("registers_used")) * F.lit(1 << _RHO_MAX)
    )
    e_raw = F.lit(HLL_EST_NUM) / s_total.cast("double")
    zeros = F.lit(HLL_M) - F.col("registers_used")
    estimate = F.when(
        (e_raw <= F.lit(2.5 * HLL_M)) & (zeros > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros.cast("double")),
    ).otherwise(e_raw)
    return per_key.select(
        *key_cols,
        "registers_used",
        "register_sum",
        F.round(estimate, 4).alias("hll_estimate"),
    )


def hll_sql(item_expr: str) -> dict[str, str]:
    """DuckDB SQL fragments replaying hll_rho exactly (same md5 slice,
    same shift/mod, same bin-length rho). Returned as {bucket, rho}
    expressions over ``item_expr`` for composition into oracle CTEs."""
    h = f"CAST(concat('0x', substr(md5({item_expr}), 1, 15)) AS BIGINT)"
    return {
        "bucket": f"(({h}) % {HLL_M})",
        "rho": (
            f"(CASE WHEN (({h}) >> {HLL_P}) = 0 THEN {_RHO_MAX} "
            f"ELSE {_RHO_MAX} - length(bin(({h}) >> {HLL_P})) END)"
        ),
    }


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 1024


def cms_cells(item: Column) -> Column:
    """Array of CMS (row, col) cell ids for one item: row i hashes
    ``'cms<i>:' || item`` with md5_60bit mod width — depth independent
    hash functions from salted md5, replayable cross-engine. Encoded as
    row * width + col so one explode yields flat cell ids."""
    return F.array(
        *[
            (
                F.lit(i * CMS_WIDTH)
                + F.pmod(
                    md5_60bit(F.concat(F.lit(f"cms{i}:"), item)),
                    F.lit(CMS_WIDTH),
                )
            ).cast("int")
            for i in range(CMS_DEPTH)
        ]
    )


def cms_update(df: DataFrame, item_col: str) -> DataFrame:
    """Fold a stream of items into the constant-size CMS cell table
    (cell, cnt). One partial-agg shuffle; output ≤ depth × width rows no
    matter the corpus or vocabulary size."""
    return (
        df.select(F.explode(cms_cells(F.col(item_col))).alias("cell"))
        .groupBy("cell")
        .agg(F.count("*").alias("cnt"))
    )


def cms_lookup(cms: DataFrame, probes: DataFrame, probe_col: str) -> DataFrame:
    """Point-estimate each probe item: min over the depth rows of its
    cell counts (missing cell → 0). The cell table is constant-size, so
    this is a broadcast join against the probe list — zero data-volume
    work."""
    cells = probes.select(
        probe_col, F.posexplode(cms_cells(F.col(probe_col))).alias("row", "cell")
    )
    return (
        cells.join(F.broadcast(cms), "cell", "left")
        .fillna(0, subset=["cnt"])
        .groupBy(probe_col)
        .agg(F.min("cnt").cast("long").alias("cms_estimate"))
    )


def cms_cell_sql(item_expr: str, row: int) -> str:
    """DuckDB expression for the CMS cell id of row ``row`` — replays
    cms_cells exactly."""
    h = (
        f"CAST(concat('0x', substr(md5(concat('cms{row}:', {item_expr})), 1, 15))"
        " AS BIGINT)"
    )
    return f"({row * CMS_WIDTH} + (({h}) % {CMS_WIDTH}))"


# ---------------------------------------------------------------------------
# Bloom filter (Bloom 1970) — membership, the fourth sketch family member
# ---------------------------------------------------------------------------

# k independent salted-md5 hash functions over m = WORDS × 60 bits. 60 bits
# per BIGINT word keeps every mask = 1 << b strictly positive on both
# engines (the md5_60bit convention); the filter is a ≤ WORDS-row
# (word, bits) table folded with bit_or — fold-order-independent, so any
# partitioning / batching / replay produces byte-identical words, and two
# filters over disjoint inputs merge by groupBy-bit_or (streamable /
# tree-reducible, same argument as the HLL register max-fold).
BLOOM_K = 4
BLOOM_WORDS = 512
BLOOM_BITS_PER_WORD = 60
BLOOM_BITS = BLOOM_WORDS * BLOOM_BITS_PER_WORD


def bloom_positions(item: Column) -> Column:
    """Array of the K global bit positions for one item: position i hashes
    ``'bloom<i>:' || item`` with md5_60bit mod m — depth independent hash
    functions from salted md5, replayable cross-engine (cf. cms_cells)."""
    return F.array(
        *[
            F.pmod(
                md5_60bit(F.concat(F.lit(f"bloom{i}:"), item)),
                F.lit(BLOOM_BITS),
            )
            for i in range(BLOOM_K)
        ]
    )


def _bloom_word_mask(pos_col: str) -> tuple[Column, Column]:
    word = F.expr(f"CAST({pos_col} DIV {BLOOM_BITS_PER_WORD} AS INT)")
    mask = F.expr(
        f"shiftleft(1L, CAST(pmod({pos_col}, {BLOOM_BITS_PER_WORD}) AS INT))"
    )
    return word, mask


def bloom_build(df: DataFrame, item_col: str) -> DataFrame:
    """Fold a corpus of items into the constant-size Bloom table
    (word, bits). ONE partial-agg shuffle; output ≤ WORDS rows no matter
    the input size — the membership sibling of cms_update."""
    pos = df.select(
        F.explode(bloom_positions(F.col(item_col))).alias("_bloom_pos")
    )
    word, mask = _bloom_word_mask("_bloom_pos")
    return (
        pos.select(word.alias("word"), mask.alias("mask"))
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_probe(
    bloom: DataFrame, probes: DataFrame, key_cols: list[str], item_col: str
) -> DataFrame:
    """Membership-test each probe row: member iff ALL K of its bits are
    set. The filter table is constant-size, so this is a broadcast join —
    the probe stream never shuffles on data volume (the gate shape that
    replaces the broadcast-set decontamination join when the reference
    set outgrows a broadcast list: the filter stays ≤ WORDS rows at ANY
    reference-set cardinality, trading a bounded false-positive rate).
    One-sided: no false negatives, ever."""
    pos = probes.select(
        *key_cols, F.explode(bloom_positions(F.col(item_col))).alias("_bloom_pos")
    )
    word, mask = _bloom_word_mask("_bloom_pos")
    cells = pos.select(*key_cols, word.alias("word"), mask.alias("mask"))
    return (
        cells.join(F.broadcast(bloom), "word", "left")
        .fillna(0, subset=["bits"])
        .groupBy(*key_cols)
        .agg(
            F.min(
                (F.col("bits").bitwiseAND(F.col("mask")) == F.col("mask")).cast("int")
            ).cast("boolean").alias("bloom_member")
        )
    )


def bloom_collect(bloom: DataFrame) -> list[int]:
    """Materialize the ≤ WORDS-row filter table as a dense BLOOM_WORDS
    list — bounded by construction, so this is the one collect() a Bloom
    plan is allowed: it turns the filter into a plan LITERAL."""
    words = [0] * BLOOM_WORDS
    for r in bloom.collect():
        words[int(r["word"])] = int(r["bits"])
    return words


def bloom_member_expr(words: list[int]):
    """Scan-side membership test against a collected filter: returns a
    function Column -> Column usable anywhere an expression is (plain
    filters, higher-order-function lambdas in streaming plans). The
    filter is a BLOOM_WORDS-element array LITERAL and the bit masks a
    60-element literal lookup (F.shiftleft needs a literal shift amount,
    so masks are pre-tabulated) — zero exchanges, zero Python, no
    broadcast join in the test itself."""
    words_lit = F.array(*[F.lit(int(w)) for w in words])
    masks_lit = F.array(*[F.lit(1 << b) for b in range(BLOOM_BITS_PER_WORD)])

    def member(item: Column) -> Column:
        cond = F.lit(True)
        for i in range(BLOOM_K):
            pos = F.pmod(
                md5_60bit(F.concat(F.lit(f"bloom{i}:"), item)), F.lit(BLOOM_BITS)
            )
            word = F.floor(pos / F.lit(BLOOM_BITS_PER_WORD)).cast("int")
            mask = F.element_at(
                masks_lit, F.pmod(pos, F.lit(BLOOM_BITS_PER_WORD)).cast("int") + 1
            )
            cond = cond & (
                F.element_at(words_lit, word + 1).bitwiseAND(mask) == mask
            )
        return cond

    return member


def bloom_semi_join(big: DataFrame, small: DataFrame, key: str) -> DataFrame:
    """EXACT semi-join with Bloom pre-pruning: fold the small side's keys
    into the filter, drop big-side rows at the SCAN (before any
    exchange), then exact-verify the bloom-positive survivors with the
    real semi-join. One-sidedness makes the result exactly equal to a
    plain semi-join — no key is ever falsely dropped; false positives
    only bound the wasted shuffle volume (~FPR × non-matching rows).

    At 100 TB this is the difference between shuffling the full fact
    table and shuffling matches + FPR·misses when the dim side is too
    big to broadcast but its KEY SET still fits a constant-size filter.
    Spark's AQE runtime bloom filter plays this trick automatically for
    some plans; this variant is explicit, deterministic (salted md5),
    and — because the exact join has the last word — oracle-checkable
    against a plain EXISTS."""
    keys = small.select(F.col(key).cast("string").alias("_k"))
    words = bloom_collect(bloom_build(keys, "_k"))
    member = bloom_member_expr(words)
    pruned = big.filter(member(F.col(key).cast("string")))
    return pruned.join(small.select(key).dropDuplicates([key]), key, "semi")


def bloom_cell_sql(item_expr: str, i: int) -> dict[str, str]:
    """DuckDB {word, mask} expressions replaying hash i of bloom_positions
    exactly."""
    h = (
        f"CAST(concat('0x', substr(md5(concat('bloom{i}:', {item_expr})), 1, 15))"
        " AS BIGINT)"
    )
    p = f"(({h}) % {BLOOM_BITS})"
    return {
        "word": f"CAST(({p}) // {BLOOM_BITS_PER_WORD} AS INTEGER)",
        "mask": f"(1::BIGINT << CAST(({p}) % {BLOOM_BITS_PER_WORD} AS INTEGER))",
    }


# ---------------------------------------------------------------------------
# KMV bottom-k sketch (Bar-Yossef et al. 2002 / Beyer et al. 2007)
# ---------------------------------------------------------------------------

KMV_K = 256
# Distinct-count estimator numerator (K-1)·2^60, precomputed in Python and
# embedded verbatim in both engines (the HLL_EST_NUM convention).
KMV_EST_NUM = float(KMV_K - 1) * float(1 << 60)


def kmv_sketch(df: DataFrame, key_cols: list[str], item_col: str) -> DataFrame:
    """Per-key bottom-K distinct md5_60bit hashes: (key..., h, rk).

    Two map-side-collapsing exchanges: a distinct on (key, h) — partial
    dedup before the wire — then the per-key row_number window, whose
    WindowGroupLimit pushdown caps every map partition's contribution at
    K rows before the exchange. The sketch is ≤ K rows per key REGARDLESS
    of corpus size, and merges by union + re-rank (bottom-K of a union is
    the bottom-K of the concatenated sketches) — the mergeability that
    makes KMV state streamable and tree-reducible."""
    h = md5_60bit(F.col(item_col))
    distinct = df.select(*key_cols, h.alias("h")).dropDuplicates([*key_cols, "h"])
    win = Window.partitionBy(*key_cols).orderBy("h")
    return (
        distinct.withColumn("rk", F.row_number().over(win))
        .filter(F.col("rk") <= KMV_K)
    )


def kmv_distinct(sketch: DataFrame, key_cols: list[str]) -> DataFrame:
    """Distinct-count estimate per key from its bottom-K sketch: exact
    when the sketch is unsaturated (n < K ⇒ every distinct hash is
    present), else the KMV estimator (K-1)·2^60 / h_(K) — the k-th
    smallest hash locates the density of distinct values on the hash
    line. All inputs exact BIGINTs; the one division is IEEE double on
    identical operands — deterministic cross-engine."""
    per_key = sketch.groupBy(*key_cols).agg(
        F.count("*").alias("sketch_size"),
        F.max("h").alias("h_k"),
    )
    est = F.when(
        F.col("sketch_size") < KMV_K, F.col("sketch_size").cast("double")
    ).otherwise(F.lit(KMV_EST_NUM) / F.col("h_k").cast("double"))
    return per_key.select(
        *key_cols, "sketch_size", F.round(est, 4).alias("kmv_estimate")
    )


def kmv_pair_jaccard(
    sketch: DataFrame, key_col: str, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Pairwise Jaccard estimates between every two keys from their
    bottom-K sketches: J(A,B) ≈ |bottom-K(A ∪ B) ∩ A ∩ B| / |bottom-K(A ∪ B)|
    (Beyer et al. 2007's unioned-sketch estimator). Everything here runs
    on sketch rows only — ≤ K per key — so the pair enumeration, the
    union re-rank, and the intersection count are constant-size work per
    key pair no matter the corpus size; only kmv_sketch touches data.
    The sketch is persisted (it is ≤ K rows per key — trivially
    memory-bounded) because its lineage is referenced three times (key
    enumeration + both pair sides); without it each reference would
    recompute the corpus-scale gram scan (the dedup.py signature-persist
    convention). With ``group_cols`` the pair enumeration and estimator
    run independently within each group (e.g. per event-time window for
    the streaming KMV sink)."""
    g = list(group_cols)
    s = sketch.select(*g, F.col(key_col).alias("_src"), "h").persist()
    keys = s.select(*g, F.col("_src").alias("s1")).distinct()
    if g:
        pairs = keys.join(
            keys.select(*g, F.col("s1").alias("s2")), g
        ).filter(F.col("s1") < F.col("s2"))
    else:
        pairs = keys.crossJoin(
            keys.select(F.col("s1").alias("s2"))
        ).filter(F.col("s1") < F.col("s2"))
    sp, pp = s.alias("sk"), F.broadcast(pairs).alias("pr")
    cond = (F.col("sk._src") == F.col("pr.s1")) | (
        F.col("sk._src") == F.col("pr.s2")
    )
    for c in g:
        cond = cond & (F.col(f"sk.{c}") == F.col(f"pr.{c}"))
    m = sp.join(pp, cond).select(
        *[F.col(f"pr.{c}").alias(c) for c in g],
        F.col("pr.s1").alias("s1"),
        F.col("pr.s2").alias("s2"),
        F.col("sk._src").alias("_src"),
        F.col("sk.h").alias("h"),
    )
    grp = m.groupBy(*g, "s1", "s2", "h").agg(
        F.max((F.col("_src") == F.col("s1")).cast("int")).alias("in1"),
        F.max((F.col("_src") == F.col("s2")).cast("int")).alias("in2"),
    )
    win = Window.partitionBy(*g, "s1", "s2").orderBy("h")
    ranked = grp.withColumn("rk", F.row_number().over(win)).filter(
        F.col("rk") <= KMV_K
    )
    return ranked.groupBy(*g, "s1", "s2").agg(
        F.count("*").alias("union_k"),
        F.sum(F.col("in1") * F.col("in2")).cast("long").alias("kmv_inter"),
        F.round(
            F.sum(F.col("in1") * F.col("in2")).cast("double")
            / F.count("*").cast("double"),
            4,
        ).alias("jaccard_est"),
    )


# ---------------------------------------------------------------------------
# Fixed-grid histogram quantiles
# ---------------------------------------------------------------------------

HIST_BUCKETS = 256


def histogram_quantiles(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Deterministic quantile estimates from a fixed-grid histogram — the
    third sketch family member (HLL = cardinality, CMS = frequency,
    histogram = quantiles), and the oracle-replayable twin of
    percentile_approx's engine-private t-digest.

    Two corpus passes, both collapsing map-side: (1) per-key min/max
    (exact), (2) per-(key, bucket) counts with bucket = least(B-1,
    floor((v - min) / w)), w = (max - min)/B. Every arithmetic step is
    IEEE double ops on identical inputs — deterministic cross-engine —
    and counts are exact integers, so the whole histogram replays
    hash-exact. The estimate for quantile q is the LOWER EDGE of the
    first bucket whose cumulative count reaches ceil(q*n): one-sided
    within range/B of the true order statistic. The cumulative window
    runs over the bucket-bounded histogram (≤ B rows per key), never the
    data."""
    mm = df.groupBy(*key_cols).agg(
        F.min(value_col).alias("vmin"),
        F.max(value_col).alias("vmax"),
        F.count(value_col).alias("n"),
    )
    w_expr = (F.col("vmax") - F.col("vmin")) / F.lit(float(HIST_BUCKETS))
    bucket = F.when(F.col("vmax") == F.col("vmin"), F.lit(0)).otherwise(
        F.least(
            F.lit(HIST_BUCKETS - 1),
            F.floor((F.col(value_col) - F.col("vmin")) / w_expr).cast("int"),
        )
    )
    hist = (
        df.join(F.broadcast(mm), key_cols)
        .select(*key_cols, "vmin", "vmax", "n", bucket.alias("b"))
        .groupBy(*key_cols, "vmin", "vmax", "n", "b")
        .agg(F.count("*").alias("c"))
    )
    win = (
        Window.partitionBy(*key_cols)
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.withColumn("cum", F.sum("c").over(win))
    aggs = [F.max("n").alias("n")]
    for q in quantiles:
        name = f"p{int(round(q * 100))}_est"
        target = F.ceil(F.lit(q) * F.col("n").cast("double"))
        qb = F.min(F.when(F.col("cum") >= target, F.col("b")))
        aggs.append(
            F.round(
                F.max("vmin")
                + qb.cast("double")
                * (F.max("vmax") - F.max("vmin"))
                / F.lit(float(HIST_BUCKETS)),
                6,
            ).alias(name)
        )
    return cum.groupBy(*key_cols).agg(*aggs)
