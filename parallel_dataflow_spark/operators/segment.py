"""Deterministic Viterbi word segmentation — the unigram-LM tokenizer
SHAPE (SentencePiece's decode step) with integer-exact scores, beyond
the pair-merge BPE family (operators/bpe.py).

The DP is the real deliverable: best[i] = max over piece lengths l of
best[i-l] + score(word[i-l+1 .. i]), computed ENTIRELY in Catalyst
expressions — the vocabulary is bounded, so it collects to a map
LITERAL and the 12-step unrolled recurrence is a chain of
greatest()/CASE columns with zero Python and zero joins in the scoring
path. A DuckDB oracle replays the identical unrolled DP with scalar
subqueries, pinning the full segmentation string, not just the score.

Scores are integer-exact on purpose: a real unigram LM scores pieces
with float log-probs, where a 1-ulp cross-engine difference can flip a
discrete argmax (unlike the rounded AGGREGATES elsewhere in the repo,
a DP path choice cannot absorb ulp noise). The stand-in objective —
score(piece) = (8·len + floor(log2 cnt))·1000 + md5(piece) mod 997,
with floor(log2) = length(bin(cnt)) − 1, exact on both engines —
keeps the longest-frequent-piece preference of the LM objective and
makes every path sum exact; swap real log-probs in at deployment and
the plan shape is unchanged. The md5 term de-ties piece scores; path
ties (different paths, equal sums) resolve by CASE order, mirrored
l-ascending in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from parallel_dataflow_spark.functions.text import md5_60bit

PIECE_LENS = (1, 2, 3, 4)
L_MAX = 12          # segment words up to this many chars (fixture max: 8)
VOCAB_CAP = 256     # pieces kept per length, ranked (cnt desc, piece asc)
MISS = -(10**15)    # score for a substring absent from the vocab


def _words_col():
    return F.explode(
        F.split(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "), " ")
    )


def piece_vocab(documents: DataFrame) -> DataFrame:
    """(piece, cnt, score_micro): all corpus substrings of lengths 1-4,
    counted over word OCCURRENCES (not distinct words), filtered to
    cnt >= 2 for multi-char pieces (single chars always kept so every
    word stays segmentable), capped at VOCAB_CAP per length. One
    corpus-volume explode+count; everything after is vocab-bounded."""
    w = documents.select(_words_col().alias("word"))

    def _subs_of_len(l: int):
        # single-arg lambda on purpose: a two-parameter lambda (e.g.
        # ``lambda i, l=l``) makes F.transform pass the ARRAY INDEX as
        # the second argument, silently clobbering the default
        return lambda i: F.col("word").substr(i.cast("int"), F.lit(l))

    per_len = [
        F.when(
            F.length("word") >= l,
            F.transform(
                F.sequence(F.lit(1), F.length("word") - (l - 1)), _subs_of_len(l)
            ),
        ).otherwise(F.array().cast("array<string>"))
        for l in PIECE_LENS
    ]
    subs = F.flatten(F.array(*per_len))
    pieces = (
        w.select(F.explode(subs).alias("piece"))
        .groupBy("piece")
        .agg(F.count("*").cast("long").alias("cnt"))
        .filter((F.length("piece") == 1) | (F.col("cnt") >= 2))
    )
    rk = Window.partitionBy(F.length("piece")).orderBy(
        F.desc("cnt"), F.asc("piece")
    )
    kept = pieces.withColumn("rk", F.row_number().over(rk)).filter(
        F.col("rk") <= VOCAB_CAP
    )
    # bits-style objective: maximize sum over pieces of
    # (floor(log2 cnt) − 32)·1000 + tie-hash. The −32 constant exceeds
    # any floor(log2 cnt), so every piece costs strictly negative and
    # FEWER pieces always beat more (a naive +len·weight term would
    # telescope: sum of piece lengths is the word length, a constant);
    # among equal-piece-count paths, higher-frequency pieces win —
    # the unigram-LM preference in exact integers.
    score = (
        (F.length(F.bin(F.col("cnt"))) - F.lit(1) - F.lit(32)) * F.lit(1000)
        + F.pmod(md5_60bit(F.col("piece")), F.lit(997))
    )
    return kept.select("piece", "cnt", score.cast("long").alias("score_micro"))


def segment_words(documents: DataFrame) -> DataFrame:
    """(word, best_micro, seg) for every distinct corpus word of length
    <= L_MAX: the max-score piece decomposition under piece_vocab.

    The vocab collects to a map literal (bounded by construction), so
    the unrolled DP is pure whole-stage-codegen expression work on the
    DISTINCT-word table — corpus volume touches only the vocab count
    and the word dedup."""
    vocab = {
        r["piece"]: int(r["score_micro"]) for r in piece_vocab(documents).collect()
    }
    flat: list = []
    for k, v in sorted(vocab.items()):
        flat += [F.lit(k), F.lit(v)]
    # empty-corpus guard (r6, ADVICE): create_map() with zero args raises
    # at plan build; a typed empty map keeps the DP well-formed (every
    # piece scores MISS) and the empty corpus yields an empty result
    m = (
        F.create_map(*flat)
        if flat
        else F.map_from_arrays(
            F.array().cast("array<string>"), F.array().cast("array<bigint>")
        )
    )

    words = (
        documents.select(_words_col().alias("word"))
        .distinct()
        .filter(F.length("word") <= L_MAX)
    )

    best = {0: F.lit(0).cast("long")}
    seg = {0: F.lit("")}
    df = words
    for i in range(1, L_MAX + 1):
        cands = []
        for l in PIECE_LENS:
            if l > i:
                continue
            piece = F.substring(F.col("word"), i - l + 1, l)
            s = F.coalesce(m[piece].cast("long"), F.lit(MISS))
            cands.append((l, piece, best[i - l] + s))
        b = F.greatest(*[c for _, _, c in cands]) if len(cands) > 1 else cands[0][2]
        df = df.withColumn(f"b{i}", b)
        expr = None
        for l, piece, cand in cands:  # l ascending — the tie-break order
            branch = F.concat(seg[i - l], F.lit("|"), piece)
            cond = F.col(f"b{i}") == cand
            expr = F.when(cond, branch) if expr is None else expr.when(cond, branch)
        df = df.withColumn(f"s{i}", expr)
        best[i] = F.col(f"b{i}")
        seg[i] = F.col(f"s{i}")

    bests = F.array(*[F.col(f"b{i}") for i in range(1, L_MAX + 1)])
    segs = F.array(*[F.col(f"s{i}") for i in range(1, L_MAX + 1)])
    return df.select(
        "word",
        F.element_at(bests, F.length("word").cast("int")).alias("best_micro"),
        F.expr(
            f"substring(element_at({'array(' + ', '.join('s' + str(i) for i in range(1, L_MAX + 1)) + ')'}, cast(length(word) as int)), 2)"
        ).alias("seg"),
    )
