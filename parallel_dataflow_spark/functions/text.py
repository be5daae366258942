"""Text-analysis column expressions — all JVM-side builtins.

Every function here is a pure Catalyst expression (codegen, pushdown-safe)
with an exact ANSI-SQL twin used by the DuckDB oracle, so each is
oracle-checkable. Heuristics are deliberately simple + deterministic:
lang-id by stopword votes, quality by length/punct/stopword ratios,
fingerprint by md5 of normalized text (the rolling-hash stand-in).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny stopword lists for the lang-id vote (en/de/fr) — heuristic, not a model
EN_STOPS = ("the", "and", "of", "to", "in")
DE_STOPS = ("der", "die", "und", "das", "ist")
FR_STOPS = ("le", "la", "et", "les", "des")


def norm_text(text: Column) -> Column:
    """lower + collapse whitespace — canonical form for fingerprints."""
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def fingerprint_md5(text: Column) -> Column:
    return F.md5(norm_text(text))


def md5_60bit(col: Column) -> Column:
    """60-bit non-negative integer hash from the first 15 hex chars of
    md5 — the cross-engine hash used wherever a signature must be
    oracle-replayable (DuckDB twin: ``CAST(concat('0x', substr(md5(x),
    1, 15)) AS BIGINT)``). 15 hex chars = 60 bits keeps the value inside
    a signed int64 on both engines. Hot production paths keep xxhash64
    (cheaper, JVM-intrinsic); md5_60bit is the verification-grade variant."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


MD5_60_SQL = "CAST(concat('0x', substr(md5({x}), 1, 15)) AS BIGINT)"


def kgram_hashes(text: Column, k: int = 8) -> Column:
    """Rolling k-char-gram md5 hashes of the normalized text (empty array
    when shorter than k). md5 hex so a DuckDB oracle computes identical
    values."""
    t = norm_text(text)
    n = F.length(t)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1))),
            lambda i: F.md5(t.substr(i, F.lit(k))),
        ),
    ).otherwise(F.array().cast("array<string>"))


def winnow_fingerprints_df(df, text_col: str = "text", k: int = 8, w: int = 4):
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken) as a
    DataFrame op: rolling k-char-gram md5 hashes → sliding min per window
    of w grams → distinct per doc. Returns (doc_id, fingerprint) rows.

    r6 shape — fully scan-side, ZERO exchanges: the sliding-window min is
    computed on the per-row gram ARRAY (w-way least() over materialized
    array elements, O(1) each), and per-doc distinctness is array_distinct
    before the explode — which IS the output contract (fingerprints are
    distinct per (doc_id, fingerprint)), so no global distinct shuffle is
    needed. The r5 form exploded every gram position and ran two analytic
    windows over it: at sf1.0 that was a ~50M-row exchange + sort
    (measured 32 s); this form is 1.5 s of embarrassingly parallel
    per-row compute — at 100 TB it rides the scan like every other
    filter.

    Two CollapseProject traps avoided by materializing intermediates in
    their own projections (multiple non-cheap references pin the
    boundary): the normalized text (else the regexp chain re-runs per
    gram position) and the gram array (else each of the w least() slots
    re-runs the md5 transform)."""
    from parallel_dataflow_spark.operators.dedup import spread  # lazy: avoids import cycle

    nt = spread(df.select("doc_id", text_col), ["doc_id"]).select(
        "doc_id", norm_text(F.col(text_col)).alias("nt")
    )
    n = F.length(F.col("nt"))
    grams_expr = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1))),
            lambda i: F.md5(F.col("nt").substr(i, F.lit(k))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = nt.select("doc_id", grams_expr.alias("grams"))
    ga = F.col("grams")
    m = F.size(ga)
    mins = F.when(
        m >= w,
        F.transform(
            # window start positions 1..m-w+1 (1-based): full windows only
            F.sequence(F.lit(1), F.greatest(m - (w - 1), F.lit(1))),
            lambda i: F.least(
                *[F.element_at(ga, (i + j).cast("int")) for j in range(w)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return g.select(
        "doc_id", F.explode(F.array_distinct(mins)).alias("fingerprint")
    )


def word_count_expr(text: Column) -> Column:
    return F.size(F.split(F.trim(text), r"\s+"))


def punct_ratio_expr(text: Column) -> Column:
    """fraction of chars that are ASCII punctuation (rounded 4dp)."""
    punct = F.length(F.regexp_replace(text, r"[^.,;:!?'\"()\[\]-]", ""))
    return F.round(punct / F.greatest(F.length(text), F.lit(1)), 4)


def _stop_hits(text_lower: Column, stops: tuple[str, ...]) -> Column:
    """count of stopword occurrences as whole words (space-padded trick:
    identical semantics in Spark and DuckDB regexp engines avoided by using
    plain substring counting on ' word ' in ' text ')."""
    padded = F.concat(F.lit(" "), F.regexp_replace(text_lower, r"\s+", " "), F.lit(" "))
    total = F.lit(0)
    for w in stops:
        needle = f" {w} "
        total = total + (F.length(padded) - F.length(F.replace(padded, F.lit(needle)))) / len(needle)
    return total.cast("int")


def stopword_hits_expr(text: Column, lang: str = "en") -> Column:
    stops = {"en": EN_STOPS, "de": DE_STOPS, "fr": FR_STOPS}[lang]
    return _stop_hits(F.lower(text), stops)


def lang_vote_expr(text: Column) -> Column:
    """argmax of stopword hits over {en, de, fr}; ties break en > de > fr."""
    lo = F.lower(text)
    en, de, fr = (_stop_hits(lo, s) for s in (EN_STOPS, DE_STOPS, FR_STOPS))
    return (
        F.when((en >= de) & (en >= fr), F.lit("en"))
        .when(de >= fr, F.lit("de"))
        .otherwise(F.lit("fr"))
    )


def quality_score_expr(text: Column) -> Column:
    """[0,1] quality heuristic: longer docs, moderate punctuation, some
    stopwords → higher. score = min(1, n_words/200)*0.5
    + min(1, stop_hits/10)*0.3 + (1 - min(1, punct_ratio*10))*0.2, 4dp."""
    n_words = word_count_expr(text).cast("double")
    stops = stopword_hits_expr(text).cast("double")
    punct = punct_ratio_expr(text)
    score = (
        F.least(n_words / 200.0, F.lit(1.0)) * 0.5
        + F.least(stops / 10.0, F.lit(1.0)) * 0.3
        + (F.lit(1.0) - F.least(punct * 10.0, F.lit(1.0))) * 0.2
    )
    return F.round(score, 4)


# --- PII detection / redaction -------------------------------------------
# Patterns restricted to constructs where Java regex (Spark) and RE2
# (DuckDB) agree — greedy character classes, no backreferences, no
# lookaround — so a DuckDB twin can replay redaction byte-for-byte.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d[\d\-]{7,14}\d", "<PHONE>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
)


def pii_counts_expr(text: Column) -> dict[str, Column]:
    """Per-category PII occurrence counts (JVM regexp_count)."""
    return {
        f"n_{name}": F.regexp_count(text, F.lit(pat)).cast("long")
        for name, pat, _ in PII_PATTERNS
    }


def pii_redact_expr(text: Column) -> Column:
    """Replace every PII match with its typed placeholder. Applied in
    PII_PATTERNS order (email before ipv4 etc.) — the order is part of
    the contract since a phone-like substring inside an already-redacted
    email can no longer match. Pure Catalyst chain: scan-side, codegen,
    no Python; at 100 TB this is a free rider on whatever scan already
    reads the text column."""
    out = text
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out
