"""Token-array functions.

Two tiers, per the engine's UDF policy (SURVEY.md §2.2 "UDF surface"):

1. JVM-side column expressions (codegen'd, zero Python) for anything
   expressible with builtin ``pyspark.sql.functions`` — e.g. the hash
   tokenizer, token counts, array set algebra.
2. Arrow-vectorized pandas UDFs (numpy over contiguous batches) for genuine
   array-numeric work — minhash signatures, simhash, top-token. Never
   row-at-a-time Python (north rule: zero per-row Python).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

VOCAB = 50257

# 64-bit mersenne-ish prime field for minhash permutations
_MERSENNE = (1 << 61) - 1
_MAX_HASH = (1 << 32) - 1


def tokenize_text(text: Column, vocab: int = VOCAB) -> Column:
    """Deterministic whitespace+hash tokenizer, fully JVM-side.

    ``lower(text)`` → split on whitespace → xxhash64 each word → pmod vocab.
    Stays inside WholeStageCodegen; the BPE-ish stand-in for a real
    tokenizer (the corpus is pre-tokenized in production; this exists so
    the testdata ``documents.text`` column can feed the token pipeline).
    """
    words = F.split(F.lower(F.trim(text)), r"\s+")
    return F.transform(words, lambda w: F.pmod(F.xxhash64(w), F.lit(vocab)).cast("int"))


def tokenize_text_md5(text: Column, vocab: int = VOCAB) -> Column:
    """Oracle-checkable twin of ``tokenize_text``: word ids from the
    cross-engine 60-bit md5 hash (functions.text.md5_60bit) instead of
    xxhash64, so a DuckDB oracle reproduces the token stream exactly.
    Same JVM-only shape; xxhash64 stays the hot-path default."""
    from parallel_dataflow_spark.functions.text import md5_60bit

    words = F.split(F.lower(F.trim(text)), r"\s+")
    return F.transform(words, lambda w: (md5_60bit(w) % vocab).cast("int"))


@F.pandas_udf(T.IntegerType())
def top_token_udf(tokens: pd.Series) -> pd.Series:
    """Most frequent token id per row (ties → smallest id). Vectorized:
    one np.bincount per row over an Arrow-backed int32 array."""
    out = np.empty(len(tokens), dtype=np.int32)
    for i, arr in enumerate(tokens):
        a = np.asarray(arr, dtype=np.int64)
        if a.size == 0:
            out[i] = -1
        else:
            counts = np.bincount(a)
            out[i] = int(counts.argmax())
    return pd.Series(out)


def token_histogram_agg(tokens_col: str, vocab: int = VOCAB):
    """Grouped-agg pandas UDF: merge token arrays of a group into a
    (token, count) histogram truncated to top-32 — the 'meet = set union
    with multiplicity' shape (reference meet: passes/src/reaching_defs.rs:33-36)."""

    @F.pandas_udf(T.ArrayType(T.StructType([
        T.StructField("token", T.IntegerType()),
        T.StructField("count", T.LongType()),
    ])))
    def _agg(tokens: pd.Series) -> list:
        if len(tokens) == 0:
            return []
        flat = np.concatenate([np.asarray(a, dtype=np.int64) for a in tokens]) if len(tokens) else np.array([], dtype=np.int64)
        if flat.size == 0:
            return []
        counts = np.bincount(flat, minlength=0)
        nz = np.nonzero(counts)[0]
        order = np.lexsort((nz, -counts[nz]))[:32]
        return [{"token": int(nz[j]), "count": int(counts[nz[j]])} for j in order]

    return _agg(tokens_col)


def _minhash_params(num_hashes: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    # a ∈ [1, 2^31), b ∈ [0, p): a*x fits uint64 for x < 2^32 (see UDF)
    rng = np.random.default_rng(np.random.PCG64(seed))
    a = rng.integers(1, 1 << 31, size=num_hashes, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_hashes, dtype=np.uint64)
    return a, b


def minhash_signature_udf(num_hashes: int = 128, seed: int = 7):
    """Returns a pandas UDF: array<long> shingle-hash set → minhash signature
    array<int> of length ``num_hashes``.

    A true (a*x + b) mod p universal family, overflow-free in uint64:
    the 64-bit shingle hash is first reduced to the 32-bit domain
    (x &= 2^32-1 — collisions within a doc's shingle set are ~n²/2^33,
    negligible), then a < 2^31 keeps a*x < 2^63 and b < p = 2^61-1 keeps
    a*x + b < 2^64. Vectorized: one (n_shingles × num_hashes) numpy
    broadcast per row.
    """
    a, b = _minhash_params(num_hashes, seed)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def _minhash(shingles: pd.Series) -> pd.Series:
        out = []
        for arr in shingles:
            x = np.asarray(arr, dtype=np.int64).astype(np.uint64) & np.uint64(_MAX_HASH)
            if x.size == 0:
                out.append(np.full(num_hashes, _MAX_HASH, dtype=np.uint64))
                continue
            hv = (x[:, None] * a[None, :] + b[None, :]) % np.uint64(_MERSENNE) % np.uint64(_MAX_HASH)
            out.append(hv.min(axis=0))
        return pd.Series(
            [v.astype(np.int64).astype("int32", casting="unsafe").tolist() for v in out]
        )

    return _minhash


@F.pandas_udf(T.LongType())
def simhash64_udf(hashes: pd.Series) -> pd.Series:
    """SimHash over an array<long> of 64-bit feature hashes per row.

    Classic Charikar simhash: sum +1/-1 per bit position weighted by
    feature presence; sign → bit. Vectorized via numpy bit unpacking.
    """
    out = np.zeros(len(hashes), dtype=np.uint64)
    for i, arr in enumerate(hashes):
        h = np.asarray(arr, dtype=np.uint64)
        if h.size == 0:
            out[i] = 0
            continue
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int32)
        score = (2 * bits - 1).sum(axis=0)
        sim = np.uint64(0)
        for bit in np.nonzero(score > 0)[0]:
            sim |= np.uint64(1) << np.uint64(bit)
        out[i] = sim
    return pd.Series(out.astype(np.int64))


def hamming64_expr(a: Column, b: Column) -> Column:
    """JVM-side hamming distance between two int64 simhashes (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))
