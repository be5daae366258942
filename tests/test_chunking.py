"""chunk_fixed_blocks invariants (beyond the DuckDB oracle parity in
tests/test_extra_queries.py): conservation, exact fill, boundary flags,
and partitioning invariance of the closed-form prefix-sum derivation."""

from pyspark.sql import functions as F

from parallel_dataflow_spark.operators.packing import chunk_fixed_blocks


def _base(spark, parts=1):
    rows = [
        (i, "s" + str(i % 2), 10 + (i * 37) % 300)  # lengths 10..309
        for i in range(200)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, source string, n_tok long"
    ).repartition(parts)


def test_chunks_conserve_tokens_and_fill_exactly(spark):
    base = _base(spark)
    L = 128
    out = chunk_fixed_blocks(base, block=L).collect()
    total = {r["source"]: r["t"] for r in base.groupBy("source").agg(F.sum("n_tok").alias("t")).collect()}
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    for src, blocks in by_src.items():
        blocks.sort(key=lambda r: r["block_id"])
        # contiguous block ids from 0
        assert [b["block_id"] for b in blocks] == list(range(len(blocks)))
        # every block except the last holds exactly L tokens; sum conserves
        assert all(b["n_tokens"] == L for b in blocks[:-1])
        assert sum(b["n_tokens"] for b in blocks) == total[src]
        assert blocks[-1]["n_tokens"] == ((total[src] - 1) % L) + 1
        # a block whose first doc started earlier must be flagged
        for b in blocks:
            assert isinstance(b["boundary_doc"], bool)
        # first block can never start mid-document
        assert blocks[0]["boundary_doc"] is False


def test_chunks_partitioning_invariant(spark):
    a = chunk_fixed_blocks(_base(spark, parts=1), block=96)
    b = chunk_fixed_blocks(_base(spark, parts=16), block=96)
    ca = sorted(tuple(r) for r in a.collect())
    cb = sorted(tuple(r) for r in b.collect())
    assert ca == cb


def test_chunk_slices_cover_straddling_doc(spark):
    """A document longer than the block size spans ceil(n/L)+-1 blocks and
    is the sole contributor to its interior blocks."""
    rows = [(0, "s", 50), (1, "s", 500), (2, "s", 30)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tok long")
    out = {r["block_id"]: r for r in chunk_fixed_blocks(df, block=128).collect()}
    # stream = 580 tokens -> blocks 0..4
    assert set(out) == {0, 1, 2, 3, 4}
    assert out[0]["n_slices"] == 2 and out[0]["boundary_doc"] is False
    for b in (1, 2, 3):
        assert out[b]["n_slices"] == 1
        assert out[b]["first_doc"] == 1 and out[b]["boundary_doc"] is True
    assert out[4]["n_slices"] == 2 and out[4]["n_tokens"] == 580 - 4 * 128
