"""Greedy sequence packing: the per-group fold must be deterministic
under any input partitioning, and a doc longer than the capacity gets an
overfilled bin of its own without derailing subsequent bins."""

from parallel_dataflow_spark.operators.packing import pack_greedy


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_pack_overlong_doc_and_boundaries(spark):
    rows = [
        ("s1", 1, 60), ("s1", 2, 60), ("s1", 3, 9),   # 60+60 > 128? no: 120+9=129>128
        ("s1", 4, 200),                                 # overlong: own bin
        ("s1", 5, 128),                                 # exact fit after overlong
        ("s2", 10, 128), ("s2", 11, 1),
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tok long")
    got = {(r.source, r.doc_id): (r.bin_id, r.bin_fill)
           for r in pack_greedy(df, capacity=128).collect()}
    assert got[("s1", 1)] == (0, 60)
    assert got[("s1", 2)] == (0, 120)
    assert got[("s1", 3)] == (1, 9)       # 120+9 > 128 -> new bin
    assert got[("s1", 4)] == (2, 200)     # overlong doc, own overfilled bin
    assert got[("s1", 5)] == (3, 128)     # fold continues cleanly
    assert got[("s2", 10)] == (0, 128)
    assert got[("s2", 11)] == (1, 1)      # 128+1 > 128 -> new bin


def test_pack_partitioning_invariance(spark):
    rows = [(f"s{i % 5}", i, 10 + (i * 37) % 90) for i in range(200)]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tok long")
    a = _rows(pack_greedy(df.coalesce(1), capacity=128))
    b = _rows(pack_greedy(df.repartition(16), capacity=128))
    assert a == b
