"""Smoke tests for the driver contract surface."""

import __spark_entry__ as drv


def test_entry_runs(spark):
    df = drv.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {
        "source",
        "lang",
        "n_docs",
        "total_tokens",
        "avg_tokens",
        "n_distinct_top",
    }


def test_contract_shape():
    qs = drv.queries()
    oracles = drv.oracle_sql()
    assert len(qs) >= 20
    assert set(oracles) <= set(qs)
    # most entries should be oracle-checked
    assert len(oracles) >= 15
