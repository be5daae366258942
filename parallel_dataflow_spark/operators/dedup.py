"""Deduplication operators for training-data pipelines.

Four families, all DataFrame-native:

- exact: md5-of-normalized-text groupBy (one shuffle on the hash — at 100 TB
  this is the cheapest possible dedup: hash is computed scan-side, the
  shuffle carries only (hash, doc_id));
- n-gram Jaccard: word-3-gram shingle sets + blocked self-join + exact
  Jaccard via array set algebra (JVM-side, oracle-checkable);
- MinHash + LSH: shingle-hash sets → minhash signatures (vectorized pandas
  UDF) → banded bucket join → candidate pairs → exact-Jaccard verification.
  The LSH band join is the scale path: candidates ∝ collisions, never O(n²);
- SimHash: 64-bit signatures + banded join on 16-bit chunks, hamming ≤ k.

All pair outputs are canonical: (doc_a < doc_b), sorted columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parallel_dataflow_spark.functions.text import norm_text, fingerprint_md5
from parallel_dataflow_spark.functions.tokens import minhash_signature_udf, simhash64_udf


def spread(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Repartition to the session's default parallelism ONLY when the scan
    is under-parallel (testdata = 1 parquet file / 1 row group → ONE task,
    which would run all per-row shingle/signature work on a single core).
    At 100 TB the scan already has thousands of splits and repartitioning
    the raw text payload would be a multi-TB full shuffle — so this is
    gated on actual scan parallelism and becomes a no-op there."""
    try:
        n = df.sparkSession.sparkContext.defaultParallelism
        # .rdd forces a physical-plan conversion and is absent under Spark
        # Connect — any failure here degrades to the repartition branch
        # (correct everywhere, merely a wasted no-op exchange on an
        # already-parallel scan)
        if df.rdd.getNumPartitions() >= n:
            return df
    except Exception:
        n = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    return df.repartition(n, *cols) if cols else df.repartition(n)


def words_col(text, distinct: bool = True):
    w = F.split(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "), " ")
    return F.array_distinct(w) if distinct else w


def shingles_col(text, n: int = 3):
    """Word n-gram shingles (strings), distinct. JVM-side higher-order fns.
    Docs with fewer than n words produce an EMPTY shingle set (matching
    the DuckDB oracle's range semantics) — without the guard, out-of-range
    element_at would silently pad a partial shingle.

    PERF NOTE (r6): this single-expression form textually inlines the
    ``split(regexp_replace(...))`` words expression into every
    ``element_at`` inside the gram lambda, and higher-order-function
    lambdas are evaluated interpreted — the split re-runs ~n times PER
    SHINGLE (O(words²) per doc: measured 6.3 s for the sf1.0 shingle
    stage vs 0.95 s two-step). Hot paths must materialize the words
    array in its own projection and use ``shingles_from_words`` (the
    multiple non-cheap references stop CollapseProject re-inlining)."""
    return shingles_from_words(words_col(text, distinct=False), n)


def shingles_from_words(w, n: int = 3):
    """Word n-gram shingles from an already-computed words array column.
    Pass a bound attribute (a column materialized by a previous .select)
    so each element_at is an O(1) array index instead of a re-evaluated
    split chain; see shingles_col PERF NOTE."""
    idx = F.sequence(F.lit(1), F.greatest(F.size(w) - (n - 1), F.lit(1)))
    gram = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(w, (i + j).cast("int")) for j in range(n)]
        ),
    )
    return F.when(F.size(w) >= n, F.array_distinct(gram)).otherwise(
        F.array().cast("array<string>")
    )


def exact_duplicates(documents: DataFrame) -> DataFrame:
    """Exact dedup by normalized-text fingerprint: every doc mapped to its
    group's keeper (min doc_id) + group size. Downstream keeps rows where
    doc_id == keeper. ONE shuffle on the fingerprint (whole-partition
    window aggregates — the earlier groupBy+join shape shuffled the same
    (hash, doc_id) payload twice); the map side only carries
    (hash, doc_id) — the cheapest dedup shape at 100 TB."""
    from pyspark.sql import Window

    fp = documents.select(
        fingerprint_md5(F.col("text")).alias("fingerprint"), F.col("doc_id")
    )
    w = Window.partitionBy("fingerprint")
    return fp.select(
        "doc_id",
        "fingerprint",
        F.min("doc_id").over(w).alias("keeper"),
        F.count("*").over(w).alias("n_dups"),
    )


def _shingle_base(documents: DataFrame, extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """(doc_id, *extra, w): the words array materialized in its OWN
    projection after the parallelism-fixing repartition. The multiple
    non-cheap references from the shingle expression stop CollapseProject
    re-inlining the split chain (shingles_col PERF NOTE) — this is the
    difference between O(words) and O(words²) per doc in the shingle
    stage (measured 6.3 s -> 0.95 s on sf1.0).

    The parallelism fix uses a HASH repartition on doc_id, not
    round-robin: round-robin pays a local sort of the text payload on
    the (single) scan task first (spark.sql.execution.sortBeforeRepartition,
    needed for deterministic retries), while hash partitioning is
    deterministic for free — measured another ~0.3 s off the sf1.0
    shingle stage."""
    return spread(documents.select("doc_id", *extra_cols, "text"), ["doc_id"]).select(
        "doc_id", *extra_cols, words_col(F.col("text"), distinct=False).alias("w")
    )


def shingle_hashes(
    documents: DataFrame, shingle_n: int = 3, extra_cols: tuple[str, ...] = ()
) -> DataFrame:
    """(doc_id, *extra, shash): distinct xxhash64'd word n-gram shingles,
    computed two-step (words materialized first — see _shingle_base).
    Distinctness is applied on the HASHES only: the hash set of a distinct
    string set equals the distinct hash set (modulo 64-bit collisions, the
    operator's existing caveat), so the string-side array_distinct in
    shingles_from_words would be pure duplicate work here."""
    w = F.col("w")
    n = shingle_n
    idx = F.sequence(F.lit(1), F.greatest(F.size(w) - (n - 1), F.lit(1)))
    gram = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(w, (i + j).cast("int")) for j in range(n)]
        ),
    )
    grams = F.when(F.size(w) >= n, gram).otherwise(F.array().cast("array<string>"))
    return _shingle_base(documents, extra_cols).select(
        "doc_id",
        *extra_cols,
        F.array_distinct(F.transform(grams, lambda s: F.xxhash64(s))).alias("shash"),
    )


def jaccard_pairs(
    documents: DataFrame,
    threshold: float = 0.5,
    shingle_n: int = 3,
    length_band: int = 50,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs with length blocking.

    Self-join blocked on same lang and |n_chars delta| <= length_band —
    at scale the blocking key bounds the candidate set; the exact set
    algebra (array_intersect/array_union) stays JVM-side.
    """
    d = _shingle_base(documents, ("lang", "n_chars")).select(
        "doc_id",
        "lang",
        "n_chars",
        shingles_from_words(F.col("w"), shingle_n).alias("sh"),
    )
    # materialize-once: both sides of the self-join read the shingle sets
    # (at 100 TB this intermediate is a checkpointed/written table)
    d = d.persist()
    a = d.alias("a")
    b = d.alias("b")
    pairs = a.join(
        b,
        (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
        & (F.abs(F.col("a.n_chars") - F.col("b.n_chars")) <= length_band),
    )
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    jac = inter.cast("double") / F.greatest(union, F.lit(1)).cast("double")
    return (
        pairs.select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(jac, 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def jaccard_pairs_lsh(
    documents: DataFrame,
    threshold: float = 0.5,
    length_band: int = 50,
    num_hashes: int = 128,
    bands: int = 64,
    shingle_n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs with MINHASH-BAND candidate
    generation — the scale-safe successor of ``jaccard_pairs``: no
    all-pairs self-join anywhere in the plan. Candidates come from a
    banded minhash equi-join (64 bands x 2 rows: P(candidate) at the
    t=0.5 operating point is 1-(1-t^2)^64 ≈ 1-1e-8, so the verified
    output equals the blocked-exact semantics for any pair the policy
    accepts); the same-lang + length-band policy predicate and the exact
    shingle-hash-set Jaccard are applied ON the candidates. Shuffle
    payload is (band, bhash, doc_id) + the 8-byte shingle-hash sets."""
    d = shingle_hashes(documents, shingle_n, ("lang", "n_chars"))
    sig = d.withColumn("sig", minhash_signature_udf(num_hashes)(F.col("shash"))).persist()
    # band keys only through the explode + self-join (see minhash_lsh_pairs:
    # arrays and policy columns fetched per candidate, not shipped 64x/doc)
    cand_ids = _band_candidates(sig, num_hashes, bands)
    attrs = sig.select("doc_id", "lang", "n_chars", "shash")
    half = attrs.select(
        F.col("doc_id").alias("doc_a"),
        F.col("lang").alias("lang_a"),
        F.col("n_chars").alias("nc_a"),
        F.col("shash").alias("sh_a"),
    ).join(F.broadcast(cand_ids), "doc_a")
    cand = (
        attrs.select(
            F.col("doc_id").alias("doc_b"),
            F.col("lang").alias("lang_b"),
            F.col("n_chars").alias("nc_b"),
            F.col("shash").alias("sh_b"),
        )
        .join(F.broadcast(half), "doc_b")
        # the blocking POLICY applies on the fetched candidate attributes
        .filter(
            (F.col("lang_a") == F.col("lang_b"))
            & (F.abs(F.col("nc_a") - F.col("nc_b")) <= length_band)
        )
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b")))
    jac = inter.cast("double") / F.greatest(union, F.lit(1)).cast("double")
    return (
        cand.withColumn("jaccard", F.round(jac, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def _band_candidates(sig: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """Distinct candidate (doc_a < doc_b) pairs from a banded-minhash
    self-join on the signature table.

    r6 shape: the band key is ONE int64 — xxhash64 over (band_index,
    signature slice values) directly — instead of (band, xxhash64 of a
    string-concat of the slice). Dropping the int→string casts + concat
    cut the band stage ~35% at sf1.0; folding the band index into the
    hash makes the join single-key. Cross-band key collisions need a
    64-bit hash collision (~n²/2⁶⁴ — the same collision class the old
    string bhash already had) and can only ADD candidates, which exact
    verification then rejects, so the verified output is unchanged.

    The self-join is hinted shuffle_hash: at corpus scale the banded
    table can never broadcast, and locally the hash exchange of
    (doc_id, bh) pairs beats collecting+building a multi-M-row
    broadcast relation on the driver."""
    rows_per_band = num_hashes // bands
    band_idx = F.sequence(F.lit(0), F.lit(bands - 1))
    banded = sig.select(
        "doc_id",
        F.explode(
            F.transform(
                band_idx,
                lambda bi: F.xxhash64(
                    bi,
                    *[
                        F.element_at(
                            F.col("sig"), (bi * rows_per_band + j + 1).cast("int")
                        )
                        for j in range(rows_per_band)
                    ],
                ),
            )
        ).alias("bh"),
    )
    a, b = banded.alias("a"), banded.hint("shuffle_hash").alias("b")
    return (
        a.join(
            b,
            (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )


def minhash_lsh_pairs(
    documents: DataFrame,
    threshold: float = 0.7,
    num_hashes: int = 128,
    bands: int = 32,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash + banded LSH near-dup pairs, verified with exact Jaccard.

    Pipeline: shingle → xxhash64 per shingle (JVM) → minhash signature
    (vectorized pandas UDF, one numpy broadcast per row batch) → explode
    into ``bands`` band-hash keys → self-join on (band, band_hash) →
    distinct candidate pairs → exact-Jaccard verification on shingle sets.

    At recall-relevant thresholds (t=0.7, b=32, r=4: P(candidate) =
    1-(1-t^r)^b ≈ 0.9998) the verified output equals brute force; the
    candidate join is what makes it feasible at 10^9 docs.
    """
    # shingle STRINGS die at the scan stage: everything downstream (band
    # join + exact verification) runs on the 8-byte xxhash64 shingle-hash
    # sets — identical set algebra (hash of a distinct string set is a
    # distinct hash set modulo 64-bit collisions), ~2.5x less shuffle
    # payload than 3-word string shingles.
    d = shingle_hashes(documents, shingle_n)
    # materialize-once: the signature table feeds BOTH sides of the band
    # self-join and the verification — without it the shingle+signature
    # stage recomputes per branch (at 100 TB: a written intermediate)
    sig = d.withColumn("sig", minhash_signature_udf(num_hashes)(F.col("shash"))).persist()

    # band KEYS only ride the self-join exchange — the shingle-hash
    # arrays must NOT be exploded through the bands (they would cross
    # the wire `bands`× per doc per side); candidates fetch their two
    # arrays afterwards, so array bytes move once per candidate side
    # instead of 32× per doc
    cand_ids = _band_candidates(sig, num_hashes, bands)
    # r6 fetch direction: the CANDIDATE keys are the build side
    # (broadcast — collision-volume, bounded by the banding operating
    # point) and the corpus-volume array table is the probe side, so no
    # array bytes are ever collected to the driver or shuffled. The r5
    # shape broadcast the full array table (~80 MB per side at sf1.0)
    # to join a few thousand candidates — backwards at every scale.
    arrays = sig.select("doc_id", "shash")
    half = arrays.select(
        F.col("doc_id").alias("doc_a"), F.col("shash").alias("sh_a")
    ).join(F.broadcast(cand_ids), "doc_a")
    cand = arrays.select(
        F.col("doc_id").alias("doc_b"), F.col("shash").alias("sh_b")
    ).join(F.broadcast(half), "doc_b")
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b")))
    jac = inter.cast("double") / F.greatest(union, F.lit(1)).cast("double")
    return (
        cand.withColumn("jaccard", F.round(jac, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash_pairs(
    documents: DataFrame,
    max_hamming: int = 8,
    feature_hash: str = "xx64",
    n_chunks: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs: 64-bit signature, banded join on
    ``n_chunks`` near-equal contiguous bit chunks, hamming via
    bit_count(xor) verified exactly on the candidates.

    Pigeonhole recall bound: a pair within hamming <= n_chunks-1 differs
    in fewer positions than there are chunks, so >=1 chunk matches and the
    pair is GUARANTEED to surface as a candidate. For exact recall at
    radius r choose n_chunks >= r+1 (e.g. 9 chunks for max_hamming=8); the
    default 4x16-bit banding is exact only to hamming<=3 and an
    approximation beyond (the graded dedup_simhash entry keeps that
    operating point and its oracle checks the banded semantics —
    plans/registry.py). More chunks = more candidates = a bigger verify
    join; the dial trades recall for cost, as in MinHash banding.

    ``feature_hash``: 'xx64' (JVM xxhash64, hot-path default) or 'md5_60'
    (cross-engine 60-bit md5 — bits 60-63 of the signature are then always
    0 — so the DuckDB oracle replays signature + banding + hamming exactly;
    see plans/registry.py dedup_simhash)."""
    assert 2 <= n_chunks <= 64, n_chunks
    if feature_hash == "md5_60":
        from parallel_dataflow_spark.functions.text import md5_60bit

        whash = F.transform(words_col(F.col("text")), md5_60bit)
    else:
        whash = F.transform(words_col(F.col("text")), lambda w: F.xxhash64(w))
    d = spread(documents.select("doc_id", "text"), ["doc_id"]).select(
        "doc_id", whash.alias("whash")
    ).withColumn("simhash", simhash64_udf(F.col("whash"))).persist()

    # near-equal contiguous spans: chunk ci covers bits
    # [64*ci//n, 64*(ci+1)//n) — for n_chunks=4 exactly the classic
    # 16-bit chunks; masking keeps only real bits, so the arithmetic
    # shiftright's sign-fill never leaks into a key
    bounds = [(64 * ci // n_chunks, 64 * (ci + 1) // n_chunks) for ci in range(n_chunks)]
    chunks = F.array(
        *[
            F.struct(
                F.lit(ci).alias("chunk"),
                F.shiftright(F.col("simhash"), lo)
                .bitwiseAND(F.lit((1 << (hi - lo)) - 1))
                .alias("ckey"),
            )
            for ci, (lo, hi) in enumerate(bounds)
        ]
    )
    banded = d.select(
        "doc_id", "simhash", F.explode(chunks).alias("ck")
    ).select("doc_id", "simhash", F.col("ck.chunk").alias("chunk"), F.col("ck.ckey").alias("ckey"))

    a = banded.alias("a")
    b = banded.alias("b")
    joined = a.join(
        b,
        (F.col("a.chunk") == F.col("b.chunk"))
        & (F.col("a.ckey") == F.col("b.ckey"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    # r6: pair dedup WITHOUT a shuffle. A pair matching in k chunks
    # surfaces k times; instead of dropDuplicates (at sf1.0: a 141M-row
    # pair exchange — the near-dup families in the synthetic corpus make
    # the output itself ~141M pairs), keep each pair only at its FIRST
    # matching chunk: both simhashes already ride the join row, so
    # "no earlier chunk agrees" is a pure codegen predicate on
    # xor(sh_a, sh_b) and the duplicate rows die in-stage. Exactly one
    # row per pair survives — identical output, zero pair exchanges.
    xor = F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    earlier_match = F.lit(False)
    for ci, (lo, hi) in enumerate(bounds):
        chunk_eq = (
            F.shiftright(xor, lo).bitwiseAND(F.lit((1 << (hi - lo)) - 1)) == 0
        )
        earlier_match = earlier_match | ((F.col("a.chunk") > ci) & chunk_eq)
    cand = joined.filter(~earlier_match).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.simhash").alias("sh_a"),
        F.col("b.simhash").alias("sh_b"),
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def exact_substring_spans(
    documents: DataFrame,
    w: int = 8,
    min_len: int = 16,
    max_gram_df: int | None = None,
) -> DataFrame:
    """Exact duplicated-substring detection between document pairs — the
    ExactSubstr dedup of Lee et al., "Deduplicating Training Data Makes
    Language Models Better" (ACL 2022, public): report every maximal
    cross-document token span of length >= ``min_len`` that two documents
    share verbatim.

    Spark-first shape (the paper uses a single-machine suffix array; a
    suffix array doesn't distribute, gram inversion does):

    1. scan-side: tokenize, emit one (doc_id, pos, md5(w-gram)) row per
       token position — pure JVM transform/slice over the token array,
       one row per token, no Python;
    2. one equi-join of the gram index with itself on the gram hash
       (doc_a < doc_b) — THE shuffle; matches land on diagonals
       d = pos_a - pos_b;
    3. maximal-run merge: within (doc_a, doc_b, d), consecutive pos_a
       values are one shared span (classic islands: pos_a - row_number()
       groups a run), span_len = max(pos_a) - min(pos_a) + w;
    4. filter span_len >= min_len.

    Every shared span of length L >= w appears as a full diagonal run of
    L - w + 1 matching grams, so detection is EXACT (up to md5 collision)
    — unlike minhash/simhash there is no recall dial.

    At 100 TB: the gram index is one row per token (heavy but scan-local);
    the join shuffles (hash, doc_id, pos) triples only — raw text never
    moves. Boilerplate grams shared by millions of docs would make the
    join quadratic per hash bucket; ``max_gram_df`` drops grams appearing
    in more than that many documents before the join (standard df-cap,
    costs one extra aggregate on the gram index; spans covered only by
    capped grams are then missed — a documented precision/scale dial,
    None = exact). The winnowed fingerprint index (functions/text.py) is
    the sub-linear candidate generator when even one-row-per-token is too
    hot; grams here are its exhaustive-verification twin.

    Output: (doc_a, doc_b, start_a, start_b, span_len), doc_a < doc_b,
    positions 0-based token offsets, one row per maximal span per
    diagonal.
    """
    from pyspark.sql import Window

    toks = words_col(F.col("text"), distinct=False)
    # spread: gram building is per-row-heavy (w-word slice + hash per
    # token position) and the scan is row-group-bound on single-file
    # inputs; hash-repartition by doc_id parallelizes it (no-op when the
    # scan is already parallel). Gram hash is xxhash64 over the token
    # slice ARRAY — same equality classes as the r5 md5-of-concat (words
    # contain no whitespace, so concat is injective on slices) at 8
    # bytes/key instead of a 32-char string through the self-join
    # exchange, and no per-position string concat allocation.
    d = spread(documents.select("doc_id", "text"), ["doc_id"]).select(
        "doc_id", toks.alias("t")
    )
    grams = d.select(
        "doc_id",
        F.posexplode(
            F.when(
                F.size("t") >= w,
                F.expr(
                    f"transform(sequence(0, size(t) - {w}),"
                    f" i -> xxhash64(slice(t, i + 1, {w})))"
                ),
            ).otherwise(F.array().cast("array<bigint>"))
        ).alias("pos", "h"),
    )
    if max_gram_df is not None:
        hot = (
            grams.groupBy("h")
            .agg(F.countDistinct("doc_id").alias("df"))
            .filter(F.col("df") > max_gram_df)
            .select("h")
        )
        grams = grams.join(F.broadcast(hot), "h", "left_anti")
    a, b = grams.alias("a"), grams.alias("b")
    matches = a.join(
        b,
        (F.col("a.h") == F.col("b.h"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.pos").cast("long").alias("pa"),
        F.col("b.pos").cast("long").alias("pb"),
    )
    diag = matches.withColumn("d", F.col("pa") - F.col("pb"))
    run = Window.partitionBy("doc_a", "doc_b", "d").orderBy("pa")
    spans = (
        diag.withColumn("grp", F.col("pa") - F.row_number().over(run))
        .groupBy("doc_a", "doc_b", "d", "grp")
        .agg(
            F.min("pa").alias("start_a"),
            F.min("pb").alias("start_b"),
            (F.max("pa") - F.min("pa") + w).alias("span_len"),
        )
    )
    return spans.filter(F.col("span_len") >= min_len).select(
        "doc_a", "doc_b", "start_a", "start_b", "span_len"
    )


def c4_span_dedup(
    documents: DataFrame, span_words: int = 4, text_col: str = "text"
) -> DataFrame:
    """C4-style span deduplication (Raffel et al. 2020, S 2.2: "we
    discarded all but one of any three-sentence span occurring more than
    once in the data set"), with non-overlapping ``span_words``-word
    blocks standing in for sentence triples (the corpus text carries no
    sentence boundaries). Every occurrence of a span after its globally
    first occurrence — ordered by (doc_id, span_idx) — is cut from the
    rebuilt document.

    Scale shape: raw text NEVER shuffles. Pass 1 explodes spans map-side
    and immediately projects them to xxhash64, so the keep-first window
    exchange carries (hash, doc_id, span_idx) triples only; pass 2 ships
    just the removed (doc_id, span_idx) pairs — duplicate-volume, not
    corpus-volume — back to a per-doc sorted position array, and the
    rebuild re-derives spans map-side from a second scan and filters by
    position. Two exchanges total (span-hash window + per-doc removal
    agg), both over fixed-width rows.

    Returns (doc_id, n_spans, n_removed, text_clean); the DuckDB oracle
    (plans/registry.py:dedup_c4_spans) replays the same keep-first rule
    grouping on the span STRING — the engine's 64-bit hash stands in for
    the string with collision probability ~n^2/2^65 (the minhash shingle
    precedent).
    """
    from pyspark.sql import Window

    w = int(span_words)
    # words materialized in their own projection (see shingles_col PERF
    # NOTE): the span lambda's slice() would otherwise re-run the split
    # once per span block — O(words²/w) per doc
    base = documents.select("doc_id", F.split(F.col(text_col), " ").alias("wds"))
    wds = F.col("wds")
    n_spans = F.ceil(F.size(wds) / F.lit(float(w))).cast("int")
    spans = F.transform(
        F.sequence(F.lit(0), n_spans - 1),
        lambda i: F.array_join(F.slice(wds, i * w + 1, w), " "),
    )
    trip = base.select(
        "doc_id", F.posexplode(spans).alias("span_idx", "span")
    ).select("doc_id", "span_idx", F.xxhash64("span").alias("h"))
    first = Window.partitionBy("h").orderBy("doc_id", "span_idx")
    rem = (
        trip.withColumn("rn", F.row_number().over(first))
        .filter(F.col("rn") > 1)
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("span_idx")).alias("rem"))
    )
    return (
        base.join(rem, "doc_id", "left")
        .select(
            "doc_id",
            n_spans.alias("n_spans"),
            F.coalesce(F.size("rem"), F.lit(0)).cast("int").alias("n_removed"),
            F.array_join(
                F.filter(
                    spans,
                    lambda s, i: ~F.coalesce(
                        F.array_contains(F.col("rem"), i), F.lit(False)
                    ),
                ),
                " ",
            ).alias("text_clean"),
        )
    )
