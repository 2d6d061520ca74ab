"""Session memo semantics: per-key build gates (a cache HIT never waits
behind another artifact's slow build), same-key racers build once, and
the staging area's stale-session sweep."""

from __future__ import annotations

import os
import threading
import time

from realtime_olap_spark import memo


def _clear():
    memo.clear()


def test_hit_does_not_block_behind_other_build(spark):
    """Thread A builds a slow artifact; thread B reads an already-cached
    key concurrently and must return long before A finishes (the r7
    review finding: a single global lock held across builds serialized
    every planner thread behind any artifact build)."""
    _clear()
    sf = "memo-test"
    memo.session_memo(spark, sf, "fast", lambda: 42)

    t_b = {}

    def slow_build():
        time.sleep(3.0)
        return "slow"

    def reader():
        s = time.perf_counter()
        assert memo.session_memo(spark, sf, "fast", lambda: -1) == 42
        t_b["sec"] = time.perf_counter() - s

    a = threading.Thread(
        target=lambda: memo.session_memo(spark, sf, "slow", slow_build))
    a.start()
    time.sleep(0.3)  # ensure A is inside its build
    b = threading.Thread(target=reader)
    b.start()
    b.join(10)
    a.join(10)
    assert t_b["sec"] < 1.5, f"cache hit blocked {t_b['sec']:.1f}s"
    _clear()


def test_same_key_racers_build_once(spark):
    _clear()
    calls = []

    def build():
        calls.append(1)
        time.sleep(0.5)
        return len(calls)

    out = []
    ts = [threading.Thread(
        target=lambda: out.append(
            memo.session_memo(spark, "memo-test", "one", build)))
        for _ in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(10)
    assert out == [1, 1, 1, 1]
    assert len(calls) == 1
    _clear()


def test_stage_cleanup_sweeps_stale_sessions(tmp_path):
    """Directories of DEAD sessions (mtime older than a day) are swept
    at first staging; younger siblings — possibly a live concurrent
    session — are never touched."""
    from realtime_olap_spark.catalog import _register_stage_cleanup

    root = str(tmp_path / "segroot")
    os.makedirs(f"{root}/stale-app")
    os.makedirs(f"{root}/fresh-app")
    os.makedirs(f"{root}/own-app")
    old = time.time() - 2 * 24 * 3600
    os.utime(f"{root}/stale-app", (old, old))
    _register_stage_cleanup(root, f"{root}/own-app")
    assert not os.path.exists(f"{root}/stale-app")
    assert os.path.exists(f"{root}/fresh-app")
    assert os.path.exists(f"{root}/own-app")
