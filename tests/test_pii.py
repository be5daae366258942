import duckdb
import pytest


DOCS = [
    (0, "contact Jane.Doe+spam@example-mail.org or call +1-650-555-0199 now"),
    (1, "server at 10.0.0.1 and 192.168.255.12, ssn 123-45-6789 leaked"),
    (2, "clean text with no pii at all"),
    (3, "two mails a@b.io c.d@e.co and ip 8.8.8.8"),
]


def test_pii_redaction_matches_duckdb_twin(spark):
    """Cross-engine golden: Spark's regexp_count/regexp_replace chain and
    a DuckDB RE2 replay must agree on counts AND on the redacted bytes
    (patterns are restricted to the Java-regex ∩ RE2 dialect)."""
    from parallel_dataflow_spark.functions.text import (
        PII_PATTERNS,
        pii_counts_expr,
        pii_redact_expr,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    counts = pii_counts_expr(F.col("text"))
    got = {
        r["doc_id"]: r.asDict()
        for r in df.select(
            "doc_id",
            *[c.alias(n) for n, c in counts.items()],
            pii_redact_expr(F.col("text")).alias("redacted"),
        ).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", DOCS)
    cnt_cols = ", ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    red = "text"
    for _, pat, repl in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    want = {
        r[0]: dict(zip(["doc_id"] + [f"n_{n}" for n, _, _ in PII_PATTERNS] + ["redacted"], r))
        for r in con.execute(
            f"SELECT doc_id, {cnt_cols}, {red} AS redacted FROM docs"
        ).fetchall()
    }
    assert got == want

    # spot-pin the semantics, not just cross-engine agreement
    assert got[0]["n_email"] == 1 and got[0]["n_phone"] == 1
    assert got[1]["n_ipv4"] == 2 and got[1]["n_ssn"] == 1
    assert got[2]["redacted"] == "clean text with no pii at all"
    assert got[3]["redacted"] == "two mails <EMAIL> <EMAIL> and ip <IP>"
    assert "<PHONE>" in got[0]["redacted"] and "<SSN>" in got[1]["redacted"]
