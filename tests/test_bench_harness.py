"""bench.py hardening contract (VERDICT r3 #1): backend-init retry,
cumulative-JSON emission with error fields, and the result-file artifact.
Two driver rounds were lost to a bench that died before printing one JSON
line; these tests pin the machinery that makes that impossible."""

import json

import jax

import bench


def test_acquire_backend_retries_transient_unavailable(monkeypatch):
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    calls = {"n": 0}
    real = jax.default_backend

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("UNAVAILABLE: TPU backend setup/compile "
                               "error (Unavailable)")
        return real()

    monkeypatch.setattr(jax, "default_backend", flaky)
    assert bench._acquire_backend() == "cpu"  # conftest forces CPU
    assert calls["n"] == 3


def test_acquire_backend_gives_up_after_budget(monkeypatch):
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    # elapsed clock far past the retry budget -> first failure re-raises
    monkeypatch.setattr(bench, "_elapsed", lambda: 1e9)

    def dead():
        raise RuntimeError("UNAVAILABLE: tunnel down")

    monkeypatch.setattr(jax, "default_backend", dead)
    try:
        bench._acquire_backend()
        raise AssertionError("expected the backend error to propagate")
    except RuntimeError as e:
        assert "UNAVAILABLE" in str(e)


def test_emit_always_json_with_error_and_result_file(tmp_path, monkeypatch,
                                                     capsys):
    path = tmp_path / "res.json"
    monkeypatch.setenv("BENCH_RESULT_FILE", str(path))
    out = bench._emit({"encode": 2.0}, error="phase dit: boom")
    line = capsys.readouterr().out.strip().splitlines()[-1]
    parsed = json.loads(line)
    assert parsed["partial"] is True
    assert parsed["phases_measured"] == ["encode"]
    assert parsed["error"] == "phase dit: boom"
    assert json.loads(path.read_text()) == parsed
    assert out["encode_s"] == 2.0


def test_emit_empty_times_is_parseable(tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("BENCH_RESULT_FILE", str(tmp_path / "r.json"))
    bench._emit({}, error="RuntimeError('UNAVAILABLE')")
    parsed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert parsed["value"] == 0.0 and parsed["vs_baseline"] is None
    assert parsed["partial"] is True and parsed["phases_measured"] == []
