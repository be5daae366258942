"""Curriculum shard writer: global range order across shards, sorted
rows within each shard, lossless coverage, deterministic layout."""

import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.01"


def test_curriculum_shards_ordered_and_lossless(spark, tmp_path):
    from parallel_dataflow_spark.operators.curriculum import (
        read_shard_files,
        write_curriculum_shards,
    )
    from parallel_dataflow_spark.sources.tables import load_table

    out = str(tmp_path / "shards")
    docs = load_table(spark, SF_DIR, "documents")
    write_curriculum_shards(docs, out, n_shards=8)

    files = read_shard_files(spark, out)
    assert len(files) == 8

    all_ids = []
    prev_max = None
    for f in files:
        t = pq.read_table(f, columns=["doc_id", "score"]).to_pylist()
        assert t, "no empty shards on this corpus"
        keys = [(r["score"], r["doc_id"]) for r in t]
        assert keys == sorted(keys), f"shard {f} not internally sorted"
        if prev_max is not None:
            assert keys[0] >= prev_max, "shard ranges must not interleave"
        prev_max = keys[-1]
        all_ids.extend(r["doc_id"] for r in t)

    assert sorted(all_ids) == sorted(
        r["doc_id"] for r in docs.select("doc_id").collect()
    )

    # deterministic layout: a rewrite produces byte-identical shard keys
    out2 = str(tmp_path / "shards2")
    write_curriculum_shards(docs, out2, n_shards=8)
    for f1, f2 in zip(files, read_shard_files(spark, out2)):
        a = pq.read_table(f1, columns=["doc_id"]).to_pylist()
        b = pq.read_table(f2, columns=["doc_id"]).to_pylist()
        assert a == b
