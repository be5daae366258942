"""Pure-Python goldens for the not-SQL-expressible dedup paths.

dedup_simhash is a rows-only contract entry (DuckDB has no xxhash64), so
its semantics are pinned here instead: an independent numpy
reimplementation of the bit-vote signature and of the banded candidate
rule, fed with the SAME word hashes Spark computed (the only
non-reimplementable piece is xxhash64 itself)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def _golden_simhash(word_hashes: list[int]) -> int:
    """Independent simhash: per bit b, vote +1 if bit set else -1 over all
    feature hashes; bit b of the signature = (vote > 0)."""
    sig = 0
    h = np.asarray(word_hashes, dtype=np.int64).astype(np.uint64)
    if h.size == 0:
        return 0
    for b in range(64):
        votes = int(((h >> np.uint64(b)) & np.uint64(1)).sum())
        if 2 * votes - len(word_hashes) > 0:
            sig |= 1 << b
    return sig - (1 << 64) if sig >= (1 << 63) else sig  # as signed i64


def test_simhash_signature_matches_golden(spark):
    from parallel_dataflow_spark.functions.tokens import simhash64_udf
    from parallel_dataflow_spark.operators.dedup import words_col
    from parallel_dataflow_spark.sources.tables import load_table

    d = (
        load_table(spark, SF_DIR, "documents")
        .limit(60)
        .select(
            "doc_id",
            F.transform(words_col(F.col("text")), lambda w: F.xxhash64(w)).alias("whash"),
        )
        .withColumn("simhash", simhash64_udf(F.col("whash")))
    )
    rows = d.collect()
    assert len(rows) == 60
    for r in rows:
        assert int(r["simhash"]) == _golden_simhash(list(r["whash"])), r["doc_id"]


def test_simhash_pairs_match_banded_golden(spark):
    """The pair set = pairs sharing >=1 of the four 16-bit chunks AND
    hamming <= max_hamming — replicated independently in numpy."""
    from parallel_dataflow_spark.operators.dedup import simhash_pairs, words_col
    from parallel_dataflow_spark.functions.tokens import simhash64_udf
    from parallel_dataflow_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents").limit(120)
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_pairs(docs, max_hamming=8).collect()
    }

    sigs = {
        r["doc_id"]: np.uint64(np.int64(r["simhash"]))
        for r in docs.select(
            "doc_id",
            simhash64_udf(
                F.transform(words_col(F.col("text")), lambda w: F.xxhash64(w))
            ).alias("simhash"),
        ).collect()
    }
    want = set()
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            x = int(sigs[a] ^ sigs[b])
            ham = bin(x).count("1")
            shares_chunk = any(
                ((int(sigs[a]) >> (16 * c)) & 0xFFFF) == ((int(sigs[b]) >> (16 * c)) & 0xFFFF)
                for c in range(4)
            )
            if ham <= 8 and shares_chunk:
                lo, hi = sorted([a, b])
                want.add((lo, hi, ham))
    assert got == want and len(want) > 0


def test_simhash_nine_chunks_exact_at_hamming8(spark):
    """Pigeonhole: with n_chunks=9 a pair within hamming<=8 differs in
    fewer positions than there are chunks, so banding has EXACT recall at
    radius 8 — the candidate set must equal the unbanded all-pairs set
    (no `shares_chunk` term in the golden, unlike the 4-chunk test)."""
    from parallel_dataflow_spark.operators.dedup import simhash_pairs, words_col
    from parallel_dataflow_spark.functions.tokens import simhash64_udf
    from parallel_dataflow_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents").limit(120)
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_pairs(docs, max_hamming=8, n_chunks=9).collect()
    }

    sigs = {
        r["doc_id"]: int(np.uint64(np.int64(r["simhash"])))
        for r in docs.select(
            "doc_id",
            simhash64_udf(
                F.transform(words_col(F.col("text")), lambda w: F.xxhash64(w))
            ).alias("simhash"),
        ).collect()
    }
    want = set()
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ham = bin(sigs[a] ^ sigs[b]).count("1")
            if ham <= 8:
                lo, hi = sorted([a, b])
                want.add((lo, hi, ham))
    assert got == want and len(want) > 0


def test_spread_noop_on_parallel_scan(spark, tmp_path):
    """spread()'s scale branch: on a scan that already has >= default
    parallelism splits it must return the input UNCHANGED (no Exchange) —
    at 100 TB repartitioning raw text would be a multi-TB full shuffle.
    In-sandbox testdata is single-row-group, so this needs a multi-file
    fixture to exercise the no-op branch at all."""
    from parallel_dataflow_spark.operators.dedup import spread
    from parallel_dataflow_spark.sources.sequences import write_sequence_table

    src = str(tmp_path / "wide")
    write_sequence_table(spark, src, 4000, seed=11, n_files=32)
    df = spark.read.parquet(src)
    n = spark.sparkContext.defaultParallelism
    assert df.rdd.getNumPartitions() >= n, "fixture not parallel enough"
    out = spread(df)
    assert out is df  # identity, not merely equivalent
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()

    # and the under-parallel branch still repartitions to n
    narrow = df.coalesce(1)
    assert spread(narrow).rdd.getNumPartitions() == n


def test_frame_sample_plumbing(spark):
    """frame_sample: one row per sampled frame; deterministic fake decode
    (ffmpeg absent); row count = Σ ceil(n_frames / every_n)."""
    from parallel_dataflow_spark.operators.multimodal import (
        _fake_frame_features,
        frame_sample,
    )
    from parallel_dataflow_spark.sources.tables import load_table

    d = (
        load_table(spark, SF_DIR, "documents")
        .limit(25)
        .select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"), "text")
    )
    rows = frame_sample(d.select("doc_id", "payload"), every_n=10).collect()
    src = {r["doc_id"]: r["text"].encode() for r in d.collect()}
    want_n = sum(len(range(0, 1 + len(p) // 256, 10)) for p in src.values())
    assert len(rows) == want_n
    for r in rows[:20]:
        luma, ph = _fake_frame_features(src[r["doc_id"]], r["frame_idx"])
        assert (round(r["mean_luma"], 6), r["phash16"]) == (luma, ph)


def test_jaccard_lsh_equals_all_pairs_kernel(spark):
    """jaccard_pairs_lsh (banded minhash candidates + policy filter +
    exact verify — no O(n²) join) must equal the blocked all-pairs
    verification kernel jaccard_pairs on the same corpus: the LSH
    candidate stage at (b=64, r=2) has ~1e-8 miss probability at the
    t=0.5 operating point and the accepted pairs sit at jaccard ≥0.88."""
    from parallel_dataflow_spark.operators.dedup import jaccard_pairs, jaccard_pairs_lsh
    from parallel_dataflow_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    got = sorted(tuple(r) for r in jaccard_pairs_lsh(docs, threshold=0.5).collect())
    want = sorted(tuple(r) for r in jaccard_pairs(docs, threshold=0.5).collect())
    assert len(want) > 0
    assert got == want


def test_exact_substring_spans_golden(spark):
    """Hand-crafted corpus pinning the ExactSubstr semantics: maximal-run
    merge (one row per maximal span, never its sub-spans), the min_len
    boundary (a 15-token share at min_len=16 is silent; 16 reports),
    multi-diagonal repeats, and the df-cap dial."""
    from parallel_dataflow_spark.operators.dedup import exact_substring_spans

    def words(prefix, n):
        return " ".join(f"{prefix}{i}" for i in range(n))

    shared = words("s", 20)          # 20-token exact span
    short = words("x", 15)           # below min_len=16
    boiler = words("b", 16)          # boilerplate shared by 3 docs
    docs = [
        (0, shared + " " + words("a", 5)),
        (1, words("c", 3) + " " + shared),
        (2, short + " " + words("d", 9)),
        (3, words("e", 9) + " " + short),
        (4, boiler), (5, boiler), (6, boiler),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    got = {
        (r.doc_a, r.doc_b, r.start_a, r.start_b, r.span_len)
        for r in exact_substring_spans(df, w=8, min_len=16).collect()
    }
    assert (0, 1, 0, 3, 20) in got            # maximal, offsets right
    assert not any(r[:2] == (2, 3) for r in got)   # 15 < min_len
    # one maximal span per pair — no sub-span rows for (0,1)
    assert sum(1 for r in got if r[:2] == (0, 1)) == 1
    # boilerplate trio: all three pairs, full 16 tokens
    for pair in [(4, 5), (4, 6), (5, 6)]:
        assert (*pair, 0, 0, 16) in got
    assert len(got) == 4

    # df-cap: grams in >2 docs dropped -> boilerplate trio vanishes,
    # the 2-doc span survives
    capped = {
        (r.doc_a, r.doc_b)
        for r in exact_substring_spans(df, w=8, min_len=16, max_gram_df=2).collect()
    }
    assert capped == {(0, 1)}
