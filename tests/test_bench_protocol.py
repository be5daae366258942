"""Unit tests for bench.py's host-noise annotation protocol (pure python,
no Spark). The depletion annotation is the round-4 answer to this VM's
silent frequency capping: a steal-CLEAN 4N run whose wall approaches the
N arm's clean-median wall is physically impossible under real 4x
parallelism, so it is flagged host_depleted and preferred-out of the
median-of-clean estimator (never silently averaged — every trial plus
its flags lands in bench_detail.json). Mirrors the reference's multi-
iteration central-tendency protocol (impls/src/bin/perf.rs:23-24) under
hostile host conditions."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench


def _trial(elapsed, polluted=False, **kw):
    return {"elapsed_sec": elapsed, "polluted": polluted, **kw}


def test_slow_clean_4n_run_is_flagged():
    trials = {
        bench.LEVEL_N: [_trial(10.0), _trial(11.0), _trial(10.5)],
        # 9.0 s at 4N vs ~10.5 s at N => host was capped, not scaling
        bench.LEVEL_4N: [_trial(3.0), _trial(9.0), _trial(3.2)],
    }
    bench.annotate_depletion(trials)
    flags = [t["host_depleted"] for t in trials[bench.LEVEL_4N]]
    assert flags == [False, True, False]
    assert all(not t["host_depleted"] for t in trials[bench.LEVEL_N])


def test_polluted_runs_are_never_double_flagged():
    # steal-polluted runs are already excluded by the steal gate; the
    # depletion flag covers only the zero-steal capping mode
    trials = {
        bench.LEVEL_N: [_trial(10.0)],
        bench.LEVEL_4N: [_trial(9.5, polluted=True), _trial(2.9)],
    }
    bench.annotate_depletion(trials)
    assert trials[bench.LEVEL_4N][0]["host_depleted"] is False
    assert trials[bench.LEVEL_4N][1]["host_depleted"] is False


def test_threshold_uses_clean_n_median_only():
    # one polluted N outlier (30 s) must not stretch the N median and
    # mask a depleted 4N run
    trials = {
        bench.LEVEL_N: [_trial(30.0, polluted=True), _trial(10.0), _trial(10.2)],
        bench.LEVEL_4N: [_trial(8.0)],
    }
    bench.annotate_depletion(trials)
    assert trials[bench.LEVEL_4N][0]["host_depleted"] is True


def test_reannotation_is_idempotent_and_recomputed():
    # retry loops call annotate after every extra pair: a later, faster N
    # sample can newly expose a 4N run as depleted
    trials = {
        bench.LEVEL_N: [_trial(40.0)],
        bench.LEVEL_4N: [_trial(9.0)],
    }
    bench.annotate_depletion(trials)
    assert trials[bench.LEVEL_4N][0]["host_depleted"] is False
    trials[bench.LEVEL_N].append(_trial(10.0))
    trials[bench.LEVEL_N].append(_trial(10.5))
    bench.annotate_depletion(trials)
    assert trials[bench.LEVEL_4N][0]["host_depleted"] is True


def test_empty_arms_are_safe():
    trials = {bench.LEVEL_N: [], bench.LEVEL_4N: [_trial(5.0)]}
    bench.annotate_depletion(trials)
    assert trials[bench.LEVEL_4N][0]["host_depleted"] is False


def test_warm_spread_ignores_jit_cold():
    # a typical clean query: first trial ~2.4x steady (JIT cold), warm
    # trials tight — must NOT trigger extra passes
    assert not bench.warm_spread_unstable([1.287, 0.553, 0.538], ratio=2.0)


def test_warm_spread_catches_burst_capped_query():
    # the measured dedup_minhash_lsh shape: warm trials 8.8 s vs 2.9 s at
    # zero steal — burst-cap window, more samples needed
    assert bench.warm_spread_unstable([7.051, 8.759, 2.899], ratio=2.0)


def test_warm_spread_needs_two_warm_samples():
    assert not bench.warm_spread_unstable([5.0, 1.0], ratio=2.0)
    assert not bench.warm_spread_unstable([5.0], ratio=2.0)
    assert not bench.warm_spread_unstable([], ratio=2.0)
