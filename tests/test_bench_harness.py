"""bench.py fault isolation: one raising query must cost one number,
never the round's whole bench artifact (round-8 regression: the driver's
bench died at q159 on a transient worker-spawn failure and shipped zero
timings)."""

from __future__ import annotations

import bench


class _FakeWriteChain:
    def format(self, *_a, **_k):
        return self

    def mode(self, *_a, **_k):
        return self

    def save(self, *_a, **_k):
        return None


class _FakeDF:
    @property
    def write(self):
        return _FakeWriteChain()


def test_run_query_timed_success():
    elapsed, err = bench.run_query_timed(lambda s, d: _FakeDF(), None, "x")
    assert err is None
    assert elapsed is not None and elapsed >= 0


def test_run_query_timed_persistent_failure_is_contained():
    def boom(_s, _d):
        raise RuntimeError("Python worker failed to connect back")

    elapsed, err = bench.run_query_timed(boom, None, "x", retries=1)
    assert elapsed is None
    assert "Python worker failed to connect back" in err


def test_run_query_timed_retries_transient_flake():
    calls = {"n": 0}

    def flaky(_s, _d):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient")
        return _FakeDF()

    elapsed, err = bench.run_query_timed(flaky, None, "x", retries=1)
    assert err is None and elapsed is not None
    assert calls["n"] == 2


def test_loop_shape_survives_raising_query():
    # replay main()'s loop body over a registry where one query always
    # raises: the other queries still produce timings and the failure is
    # recorded, i.e. the JSON summary would still be emitted
    queries = {
        "q01_ok": lambda s, d: _FakeDF(),
        "q02_broken": lambda s, d: (_ for _ in ()).throw(ValueError("boom")),
        "q03_ok": lambda s, d: _FakeDF(),
    }
    timings, errors = {}, {}
    for _ in range(2):
        for name, fn in sorted(queries.items()):
            elapsed, err = bench.run_query_timed(fn, None, "x", retries=0)
            if elapsed is not None:
                if name not in timings or elapsed < timings[name]:
                    timings[name] = elapsed
                errors.pop(name, None)
            elif name not in timings:
                errors[name] = err or "unknown"
    assert set(timings) == {"q01_ok", "q03_ok"}
    assert set(errors) == {"q02_broken"}


def test_drain_retries_transient_worker_spawn_failure(monkeypatch):
    from geomesa_cassandra_tools_spark.streaming import windows

    calls = {"n": 0}

    def fake_once(*a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError(
                "[STREAM_FAILED] ... Python worker failed to connect back."
            )
        return "sink_table_2"

    monkeypatch.setattr(windows, "_drain_once", fake_once)
    monkeypatch.setattr("time.sleep", lambda _s: None)
    assert windows._drain(None, "q", "append", 5, 8) == "sink_table_2"
    assert calls["n"] == 2


def test_drain_does_not_retry_real_failures(monkeypatch):
    from geomesa_cassandra_tools_spark.streaming import windows

    calls = {"n": 0}

    def fake_once(*a, **k):
        calls["n"] += 1
        raise ValueError("schema mismatch")

    monkeypatch.setattr(windows, "_drain_once", fake_once)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        windows._drain(None, "q", "append", 5, 8)
    assert calls["n"] == 1
