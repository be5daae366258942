"""Iceberg exactly-once sink: SQL generation + gating (the runtime jars
are absent in this sandbox, so the end-to-end test auto-skips here and
runs on a full cluster image — same gating pattern as the TWS transport
in test_stateful_tws.py)."""

import pytest

from parallel_dataflow_spark.streaming.iceberg_sink import (
    IcebergMergeSink,
    iceberg_available,
)


def test_merge_sql_shape():
    sink = IcebergMergeSink("lake.results", ["doc_id", "window_start"])
    sql = sink.merge_sql("__ice_batch_7", ["n_seqs", "total_tokens"])
    assert sql == (
        "MERGE INTO lake.results t USING __ice_batch_7 s "
        "ON t.doc_id = s.doc_id AND t.window_start = s.window_start "
        "WHEN MATCHED THEN UPDATE SET t.n_seqs = s.n_seqs, "
        "t.total_tokens = s.total_tokens "
        "WHEN NOT MATCHED THEN INSERT "
        "(doc_id, window_start, n_seqs, total_tokens) "
        "VALUES (s.doc_id, s.window_start, s.n_seqs, s.total_tokens)"
    )


def test_ddl_and_ledger_shape():
    sink = IcebergMergeSink("lake.results", ["doc_id"])
    assert (
        sink.create_ddl("doc_id STRING, n BIGINT", partition_by="bucket(64, doc_id)")
        == "CREATE TABLE IF NOT EXISTS lake.results (doc_id STRING, n BIGINT) "
        "USING iceberg PARTITIONED BY (bucket(64, doc_id))"
    )
    assert sink.ledger_ddl() == (
        "CREATE TABLE IF NOT EXISTS lake.results_epochs (batch_id BIGINT) "
        "USING iceberg"
    )
    assert sink.already_committed_sql(12) == (
        "SELECT 1 FROM lake.results_epochs WHERE batch_id = 12"
    )
    assert sink.commit_ledger_sql(12) == "INSERT INTO lake.results_epochs VALUES (12)"


def test_identifier_guard():
    with pytest.raises(AssertionError):
        IcebergMergeSink("lake.results; DROP TABLE x", ["doc_id"])
    with pytest.raises(AssertionError):
        IcebergMergeSink("lake.results", ["doc_id, 1=1"])


def test_replay_is_noop_via_ledger(monkeypatch):
    """The foreachBatch hook must consult the ledger BEFORE merging —
    checked against a recording fake (no Iceberg runtime needed)."""

    class FakeSpark:
        def __init__(self, committed):
            self.committed = committed
            self.sqls = []

        def sql(self, s):
            self.sqls.append(s)

            class R:
                def __init__(self, n):
                    self._n = n

                def limit(self, _):
                    return self

                def count(self):
                    return self._n

            return R(1 if ("WHERE batch_id" in s and self.committed) else 0)

        class catalog:  # noqa: N801
            @staticmethod
            def dropTempView(_):
                pass

    class FakeDF:
        columns = ["doc_id", "n_seqs"]

        def __init__(self, spark):
            self.sparkSession = spark

        def createOrReplaceTempView(self, _):
            pass

    sink = IcebergMergeSink("lake.results", ["doc_id"])
    fresh = FakeSpark(committed=False)
    sink.write_batch(FakeDF(fresh), 5)
    assert any(s.startswith("MERGE INTO") for s in fresh.sqls)
    assert any(s.startswith("INSERT INTO lake.results_epochs") for s in fresh.sqls)

    replay = FakeSpark(committed=True)
    sink.write_batch(FakeDF(replay), 5)
    assert not any(s.startswith("MERGE") for s in replay.sqls)  # no-op


def test_iceberg_gating(spark):
    assert iceberg_available(spark) is False  # no jars in this image


def test_iceberg_end_to_end(spark, tmp_path):
    """On an image with iceberg-spark-runtime + a hadoop catalog: MERGE
    upserts per batch, ledger makes replays no-ops. Skips where the jars
    are absent (this sandbox)."""
    if not iceberg_available(spark):
        pytest.skip("Iceberg runtime jars absent in sandbox; runs on cluster image")
    spark.conf.set("spark.sql.catalog.lake", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.lake.type", "hadoop")
    spark.conf.set("spark.sql.catalog.lake.warehouse", str(tmp_path / "wh"))
    sink = IcebergMergeSink("lake.db.results", ["doc_id"])
    spark.sql(sink.create_ddl("doc_id STRING, n_seqs BIGINT"))
    spark.sql(sink.ledger_ddl())
    b = spark.createDataFrame([("d1", 1), ("d2", 2)], "doc_id string, n_seqs long")
    sink.write_batch(b, 0)
    sink.write_batch(b, 0)  # replay: ledger short-circuits
    b2 = spark.createDataFrame([("d1", 5)], "doc_id string, n_seqs long")
    sink.write_batch(b2, 1)  # upsert
    got = {r["doc_id"]: r["n_seqs"] for r in sink.read(spark).collect()}
    assert got == {"d1": 5, "d2": 2}
