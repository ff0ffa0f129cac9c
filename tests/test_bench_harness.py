"""bench.py hardening contract (VERDICT r3 #1): backend-init retry,
cumulative-JSON emission with error fields, and the result-file artifact.
Two driver rounds were lost to a bench that died before printing one JSON
line; these tests pin the machinery that makes that impossible."""

import json

import jax

import bench


def test_acquire_backend_retries_transient_unavailable(monkeypatch):
    from seedvr2_tpu.utils import backend as backend_mod

    monkeypatch.setattr(backend_mod.time, "sleep", lambda s: None)
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
    from seedvr2_tpu.utils import backend as backend_mod

    monkeypatch.setattr(backend_mod.time, "sleep", lambda s: None)
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


def test_emit_promotes_gated_w8a8_e2e_headline(tmp_path, monkeypatch,
                                               capsys):
    monkeypatch.setenv("BENCH_RESULT_FILE", str(tmp_path / "r.json"))
    times = {"encode": 5.0, "dit": 2.5, "decode": 12.5, "dit_w8a8": 2.0}
    out = bench._emit(times)
    capsys.readouterr()
    # bf16 e2e = 5/20 = 0.25; w8a8 e2e = 5/19.5 > 0.25 -> promoted
    assert out["serving"] == "w8a8 DiT + bf16 VAE"
    assert out["value"] == round(5 / 19.5, 4)
    assert out["e2e_bf16_frames_per_s"] == 0.25
    assert out["vs_baseline"] == round(5 / 19.5 / 0.25, 3)
    # slower w8a8 lane must NOT displace the bf16 headline
    out2 = bench._emit({**times, "dit_w8a8": 3.0})
    capsys.readouterr()
    assert "serving" not in out2 and out2["value"] == 0.25


def test_emit_empty_times_is_parseable(tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("BENCH_RESULT_FILE", str(tmp_path / "r.json"))
    bench._emit({}, error="RuntimeError('UNAVAILABLE')")
    parsed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert parsed["value"] == 0.0 and parsed["vs_baseline"] is None
    assert parsed["partial"] is True and parsed["phases_measured"] == []


def test_by_block_init_rejects_nonuniform_3b_stack():
    """3B blocks vary by index (mm vid/txt split, vid-only tail) — the
    num_layers=1 template of _init_quantized_by_block would silently
    build the wrong tree, so it must refuse dit_3b configs."""
    import pytest

    from seedvr2_tpu.core.configs import small_test_config

    cfg = small_test_config(family="dit_3b", num_layers=3)
    with pytest.raises(ValueError, match="uniform"):
        bench._init_quantized_by_block(
            jax.random.PRNGKey(0), cfg, lambda tree: tree)


def test_by_block_init_matches_whole_tree_for_7b():
    """For the uniform 7B stack, by-block init must produce the exact
    structure (treedef + leaf shapes/dtypes) of whole-tree quantization,
    or nadit_forward KeyErrors at serve time."""
    import jax.numpy as jnp

    from seedvr2_tpu.core.configs import small_test_config
    from seedvr2_tpu.models.dit.nadit import init_dit_params
    from seedvr2_tpu.ops.int8_matmul import quantize_dit_params_w8a8

    cfg = small_test_config(family="dit_7b", num_layers=3)
    key = jax.random.PRNGKey(0)
    by_block = bench._init_quantized_by_block(key, cfg,
                                              quantize_dit_params_w8a8)
    whole = quantize_dit_params_w8a8(init_dit_params(key, cfg,
                                                     dtype=jnp.bfloat16))
    ts_a = jax.tree.structure(by_block)
    ts_b = jax.tree.structure(whole)
    assert ts_a == ts_b
    for a, b in zip(jax.tree.leaves(by_block), jax.tree.leaves(whole)):
        assert a.shape == b.shape and a.dtype == b.dtype


def test_failed_lane_emits_error_field(monkeypatch, capsys):
    """A crashed OPTIONAL lane must be distinguishable (error field) from a
    lane skipped for budget — the same observability contract core phases
    have."""
    monkeypatch.setattr(bench, "CORE", [])
    monkeypatch.setattr(bench, "_lanes", lambda: ["boom_lane"])
    monkeypatch.setitem(bench._EST_LANE_S, "boom_lane", 0.0)
    monkeypatch.setitem(
        bench.PHASES, "boom_lane",
        lambda p: (_ for _ in ()).throw(RuntimeError("lane died")))
    bench._run_phases({})
    line = capsys.readouterr().out.strip().splitlines()[-1]
    parsed = json.loads(line)
    assert "lane boom_lane" in parsed.get("error", "")
    # partial refers to CORE phases only — a dead optional lane must not
    # invalidate the headline (here CORE=[] is trivially complete)
    assert parsed["partial"] is False
