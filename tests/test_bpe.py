"""Distributed BPE (operators/bpe.py): third-opinion differential against
an independent sequential reference implementation (textbook greedy
left-to-right merges over a word-frequency dict), plus the OOV fallback.
The DuckDB window-alternation oracle twin runs in test_extra_queries."""

from collections import Counter

from pyspark.sql import functions as F

from parallel_dataflow_spark.operators.bpe import bpe_encode, bpe_train


def _reference_bpe(word_counts: dict[str, int], n_merges: int):
    """Sequential textbook BPE: count adjacent pairs, merge the most
    frequent (ties: lexicographic smallest), apply greedily left to
    right, repeat."""
    vocab = {w: list(w) for w in word_counts}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for w, syms in vocab.items():
            c = word_counts[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        (l, r), _ = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, l + r))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


CORPUS = [
    # crafted so same-symbol runs exercise the overlap rule ("aaaa"),
    # and merge chains build multi-char symbols
    (0, "srcA", "low low low lower lowest aaaa aaaa aa"),
    (1, "srcA", "new newer newest low lower aaaa"),
    (2, "srcB", "wide wider widest new newer aaaaa"),
    (3, "srcB", "aaa widest widest lowest new new new"),
]


def test_bpe_train_matches_sequential_reference(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, source string, text string")
    got_merges, syms = bpe_train(df, n_merges=10)

    counts = Counter()
    for _, _, text in CORPUS:
        counts.update(text.split())
    want_merges, want_vocab = _reference_bpe(dict(counts), 10)

    assert got_merges == want_merges
    got_vocab = {
        r["word"]: list(r["syms"]) for r in syms.select("word", "syms").collect()
    }
    syms.unpersist()
    assert got_vocab == want_vocab
    # the overlap rule really fired: the corpus makes (a, a) a merge, and
    # the odd run "aaaaa" must split greedy left-to-right (aa aa a — the
    # shape a naive string-replace twin gets wrong)
    assert ("a", "a") in {(m[1], m[2]) for m in want_merges}
    assert got_vocab["aaaaa"] == want_vocab["aaaaa"]
    assert len(got_vocab["aaaaa"]) == 3  # [aa, aa, a] (or further-merged odd split)


def test_bpe_encode_oov_falls_back_to_chars(spark):
    train = spark.createDataFrame(
        [(0, "s", "ab ab ab cd")], "doc_id long, source string, text string"
    )
    _, syms = bpe_train(train, n_merges=2)
    target = spark.createDataFrame(
        [(1, "s", "ab zq")], "doc_id long, source string, text string"
    )
    enc = {
        r["word"]: list(r["syms"])
        for r in bpe_encode(target, syms).collect()
    }
    syms.unpersist()
    assert enc["ab"] == ["ab"]        # in-vocab: merged symbol
    assert enc["zq"] == ["z", "q"]    # OOV: character fallback
