"""Unit tests for the worker-side protocol guards (workerpatch.py).

These run in the pytest (driver-like) process, so they install the
patches explicitly and restore the pristine functions afterwards —
the package-import path must NOT have installed anything here."""

import gc
import importlib
import sys


def test_not_in_worker_means_no_import_side_effect():
    from qsketch.spark.workerpatch import _STATE_ATTR, _in_pyspark_worker

    assert not _in_pyspark_worker()
    # qsketch.spark is imported by other tests; the lazy hook must not
    # have patched the interpreter in this (non-worker) process
    assert not getattr(importlib.invalidate_caches, _STATE_ATTR, False)
    assert not getattr(gc.collect, _STATE_ATTR, False)


def test_guarded_invalidate_skips_until_path_changes(monkeypatch):
    from qsketch.spark import workerpatch

    real_inv, real_gc = importlib.invalidate_caches, gc.collect
    calls = []
    monkeypatch.setattr(importlib, "invalidate_caches",
                        lambda: calls.append(1))
    try:
        workerpatch.install()
        guarded = importlib.invalidate_caches
        assert getattr(guarded, workerpatch._STATE_ATTR, False)
        workerpatch.install()  # idempotent: same object stays installed
        assert importlib.invalidate_caches is guarded

        guarded()
        assert len(calls) == 1  # first call always delegates
        guarded()
        guarded()
        assert len(calls) == 1  # unchanged sys.path: skipped
        sys.path.append("/tmp/qsketch-wp-test-nonexistent")
        try:
            guarded()
            assert len(calls) == 2  # path change detected
            guarded()
            assert len(calls) == 2
        finally:
            sys.path.remove("/tmp/qsketch-wp-test-nonexistent")
        guarded()
        assert len(calls) == 3  # removal is a change too
    finally:
        importlib.invalidate_caches = real_inv
        gc.collect = real_gc


def test_gc_throttle_only_affects_pyspark_daemon_callers():
    from qsketch.spark import workerpatch

    real_inv, real_gc = importlib.invalidate_caches, gc.collect
    try:
        workerpatch.install()
        assert getattr(gc.collect, workerpatch._STATE_ATTR, False)
        # non-daemon caller: full collection goes straight through
        assert isinstance(gc.collect(), int)
        assert isinstance(gc.collect(0), int)

        # craft a caller whose code object claims to live in pyspark's
        # daemon.py (zip layout), like the reuse loop does
        src = "def fake_daemon_loop():\n    import gc\n    return [gc.collect() for _ in range(3)]\n"
        code = compile(src, "/opt/spark/python/lib/pyspark.zip/pyspark/daemon.py", "exec")
        ns = {}
        exec(code, ns)
        out = ns["fake_daemon_loop"]()
        # throttled calls still return ints (gen-1 results); no crash
        assert all(isinstance(x, int) for x in out)

        # a USER module merely named daemon.py is NOT throttled: the
        # suffix match is package-qualified
        code2 = compile(src, "/home/user/myapp/daemon.py", "exec")
        ns2 = {}
        exec(code2, ns2)
        assert all(isinstance(x, int) for x in ns2["fake_daemon_loop"]())
    finally:
        importlib.invalidate_caches = real_inv
        gc.collect = real_gc


def test_gc_throttle_env_opt_out(monkeypatch):
    """QSKETCH_GC_THROTTLE=0 must leave gc.collect untouched so
    cycle-heavy non-qsketch workloads sharing the session can opt out
    of deferred full collections."""
    from qsketch.spark import workerpatch

    real_inv, real_gc = importlib.invalidate_caches, gc.collect
    try:
        monkeypatch.setenv("QSKETCH_GC_THROTTLE", "0")
        workerpatch.install()
        assert gc.collect is real_gc  # not wrapped
    finally:
        importlib.invalidate_caches = real_inv
        gc.collect = real_gc


def test_gc_throttle_pending_threshold_forces_full(monkeypatch):
    """Within the 10 s window, crossing the gen-1-cycles-since-full
    threshold (gc.get_count()[2]) must still trigger a real full
    collection (the deferral is bounded by promotion pressure, not
    only wall time)."""
    from qsketch.spark import workerpatch

    state = {"last_full": 100.0}
    # inside the window, low pressure: deferred (gen-1 path)
    assert not workerpatch._due_for_full(state, 105.0, gen1_cycles=10)
    # inside the window, pressure crossed: full collection anyway
    monkeypatch.setattr(workerpatch, "_GC_FULL_PENDING_THRESHOLD", 1000)
    assert workerpatch._due_for_full(state, 105.0, gen1_cycles=1000)
    # window expired: full collection regardless of pressure
    assert workerpatch._due_for_full(state, 111.0, gen1_cycles=0)
