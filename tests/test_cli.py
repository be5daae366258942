"""CLI smoke tests (SURVEY.md §2.1 #25 — the reference CLI is
impls/src/bin/main.rs). Each subcommand is driven through main(argv) in
this process (the shared test SparkSession is reused via get_spark)."""

import json

import pytest

from parallel_dataflow_spark.cli import main


def test_dataflow_fixtures_stdout(spark, capsys):
    rc = main(["dataflow", "--pass", "rd", "--executor", "seq"])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("[")]
    assert len(lines) > 10
    row = json.loads(lines[0])
    assert len(row) == 4  # func_id, block_id, in_val, out_val


def test_dataflow_bril_stdin_raw(spark, capsys, monkeypatch):
    """Reference input mode: Bril text on stdin + -r two-line ns output
    (loadtime then runtime — utils/src/dataflow_executor.rs:10-13)."""
    import io

    text = open("/root/reference/core/gcd.bril").read()
    monkeypatch.setattr("sys.stdin", io.StringIO(text))
    rc = main(["dataflow", "--pass", "live-vars", "--executor", "seq",
               "--input", "-", "--raw"])
    assert rc == 0
    out = [l for l in capsys.readouterr().out.splitlines() if l.strip().isdigit()]
    assert len(out) == 2  # loadtime ns, runtime ns
    assert int(out[0]) > 0 and int(out[1]) > 0


def test_dataflow_mixed_executor_alias(spark, capsys):
    rc = main(["dataflow", "--pass", "reaching-defs", "--executor", "mixed-20",
               "--input", "/root/reference/core/gcd.bril"])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("[")]
    assert len(lines) == 9  # gcd has 9 blocks


def test_query_subcommand(spark, capsys):
    rc = main(["query", "--name", "q6_forecast_revenue",
               "--sf-dir", "/root/testdata/sf0.001", "--limit", "5"])
    assert rc == 0
    assert capsys.readouterr().out.strip()


def test_stream_subcommand(spark, tmp_path, capsys):
    from parallel_dataflow_spark.sources.sequences import write_sequence_table

    src = str(tmp_path / "src")
    work = str(tmp_path / "work")
    write_sequence_table(spark, src, 2000, seed=3, n_files=4)
    rc = main(["stream", "--job", "tumbling", "--input", src, "--work", work])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] > 0


def test_cli_query_list(capsys):
    """`query --list` enumerates both tiers without a Spark session."""
    import json as _json

    from parallel_dataflow_spark.cli import main

    assert main(["query", "--list"]) == 0
    lines = [
        _json.loads(l) for l in capsys.readouterr().out.splitlines() if l.strip()
    ]
    from parallel_dataflow_spark.plans import registry

    drv = [r for r in lines if r["tier"] == "driver"]
    extra = [r for r in lines if r["tier"] == "extra"]
    # the graded window is capped at exactly 50; the extra tier tracks the
    # registry so the listing can't rot as pytest-oracle entries are added
    assert len(drv) == 50
    assert len(extra) == len(registry.EXTRA_QUERIES)
    assert all(r["check"] == "oracle" for r in drv)  # round-3: all 50 oracled
