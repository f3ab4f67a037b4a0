"""bench.py self-defense: a degraded tunnel capture must be detected and
either recovered from (a later stable stream wins) or flagged.

Round-3 regression being guarded: BENCH_r03 recorded 62 pairs/s from a
stream whose single-shot latency (1200 ms) was physically inconsistent
with its own pipelined batch time (128 ms) under a ~25 ms-RTT tunnel —
and shipped it silently. The reference's harness is synchronize-fenced and
repeatable (reference benchmark.py:151-164); ours must be at least as
self-consistent.
"""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _stream_stable, select_stream  # noqa: E402


def test_healthy_stream_is_stable():
    # 40 ms pipelined, 65 ms single-shot (RTT overhead): healthy
    assert _stream_stable(65.0, 40.0)


def test_r03_failure_mode_is_flagged():
    # the exact r03 capture shape: 1200 ms single-shot vs 128 ms pipelined
    assert not _stream_stable(1200.0, 128.0)


def test_nonfinite_and_degenerate_streams_are_unstable():
    assert not _stream_stable(float("nan"), 40.0)
    assert not _stream_stable(65.0, float("inf"))
    assert not _stream_stable(65.0, 0.0)


def test_recovery_degraded_then_stable_stream():
    streams = [(False, 1200.0, 128.0),   # degraded first capture
               (True, 65.0, 40.0)]       # re-run recovered
    stability, latency, pipelined = select_stream(streams)
    assert stability == "ok"
    assert pipelined == 40.0 and latency == 65.0


def test_all_degraded_reports_least_bad_and_flags():
    streams = [(False, 1200.0, 128.0), (False, 900.0, 110.0),
               (False, 1500.0, 140.0)]
    stability, latency, pipelined = select_stream(streams)
    assert stability == "degraded"
    assert pipelined == 110.0   # least-bad capture, not the first


def test_best_stable_stream_wins():
    streams = [(True, 70.0, 45.0), (True, 64.0, 40.0)]
    stability, _, pipelined = select_stream(streams)
    assert stability == "ok" and pipelined == 40.0
