"""Memory-aware auto tile planning (utils/memplan, --vae_*_tile_size auto).

The reference has no counterpart (the user hand-picks tile sizes from
README VRAM tables; attn_video_vae.py:1294+ takes them verbatim) — these
tests pin the planner's contract: compile-only probes, fewest-tiles
grid under the budget, persistent probe cache, and the runner wiring.
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from seedvr2_tpu.core.configs import VAEConfig
from seedvr2_tpu.models.vae.pipeline_vae import (VideoVAE, _plan_grid,
                                                 init_vae_params)
from seedvr2_tpu.utils import memplan

CFG = VAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                latent_channels=4, norm_num_groups=4)


@pytest.fixture()
def tiny_vae():
    return VideoVAE(init_vae_params(jax.random.PRNGKey(0), CFG,
                                    dtype=jnp.float32), CFG,
                    dtype=jnp.float32)


@pytest.fixture(autouse=True)
def _isolated_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("SEEDVR2_MEMPROBE_CACHE",
                       str(tmp_path / "memprobe.json"))
    memplan.reset_cache_for_tests()
    yield
    memplan.reset_cache_for_tests()


def test_probe_tile_bytes_real_and_cached(tiny_vae, tmp_path):
    """The probe returns a real compile-time byte count and persists it
    (second call = pure cache hit, no compile)."""
    n = memplan.probe_tile_bytes(tiny_vae, "decode", 1, 2, 8, 12)
    # must at least hold the params + the output tile
    out_bytes = 1 * 5 * 64 * 96 * 3 * 4
    assert n > out_bytes
    data = json.loads((tmp_path / "memprobe.json").read_text())
    assert list(data.values()) == [n]

    class _Shim:  # same signature, untraceable params: a compile would
        cfg = tiny_vae.cfg  # crash, so success proves the cache hit
        dtype = tiny_vae.dtype
        params = object()

    assert memplan.probe_tile_bytes(_Shim(), "decode", 1, 2, 8, 12) == n

    m = memplan.probe_tile_bytes(tiny_vae, "encode", 1, 5, 8, 12)
    assert m > 0 and len(json.loads(
        (tmp_path / "memprobe.json").read_text())) == 2


def test_plan_auto_tile_ladder(tiny_vae, monkeypatch):
    """Fake area-proportional cost model: a huge budget serves untiled,
    a middling one the largest fitting cap, a tiny one the smallest rung
    (leaving runtime OOM-shrink as the backstop)."""
    per_lat = 4000  # fake bytes per latent pixel of tile area

    def fake_probe(vae, kind, batch, frames, th, tw):
        return per_lat * th * tw

    monkeypatch.setattr(memplan, "probe_tile_bytes", fake_probe)
    monkeypatch.setattr(memplan, "_SAFETY_BYTES", 0)
    h, w = 270, 480  # 4K latent
    frames_px = 5

    # a huge budget at 4K serves the top rung (untiled is excluded there
    # by the giant-image heuristic); a small image goes untiled
    assert memplan.plan_auto_tile(tiny_vae, "decode", (h, w), 1, frames_px,
                                  (64, 64), 10 ** 15) == (1536, 1536)
    assert memplan.plan_auto_tile(tiny_vae, "decode", (100, 150), 1,
                                  frames_px, (64, 64), 10 ** 15) is None

    # budget that fits the 1152-cap grid but not the 1280 one (1152 and
    # 1088 plan the SAME 2x4 grid at this overlap — the dedupe keeps the
    # first, larger cap)
    def total_for(cap):
        lt = cap // 8
        ys, th, xs, tw = _plan_grid(h, w, lt * lt, 8, 8)
        return fake_probe(None, "decode", 1, 2, th, tw) + \
            memplan._overhead_bytes("decode", 1, frames_px, h, w,
                                    len(ys) * len(xs), th, tw, 2, 8,
                                    CFG.latent_channels, jnp.float32)

    budget = (total_for(1152) + total_for(1280)) // 2
    assert total_for(1152) < budget < total_for(1280)
    got = memplan.plan_auto_tile(tiny_vae, "decode", (h, w), 1, frames_px,
                                 (64, 64), budget)
    assert got == (1152, 1152)

    smallest = memplan.plan_auto_tile(tiny_vae, "decode", (h, w), 1,
                                      frames_px, (64, 64), 1)
    assert smallest == (memplan.DECODE_LADDER[-1],) * 2


def test_plan_skips_untiled_probe_for_giant_images(tiny_vae, monkeypatch):
    """At 4K the untiled decode is hopeless — the planner must not spend
    a giant compile probing it (candidates start at the ladder)."""
    probed = []

    def fake_probe(vae, kind, batch, frames, th, tw):
        probed.append((th, tw))
        return 10 ** 18  # nothing fits

    monkeypatch.setattr(memplan, "probe_tile_bytes", fake_probe)
    memplan.plan_auto_tile(tiny_vae, "decode", (270, 480), 1, 5, (64, 64),
                           10 ** 12)
    assert (270, 480) not in probed  # whole image never probed
    assert probed  # but the ladder was


def _auto_runner(**kw):
    from seedvr2_tpu.core.configs import DiTConfig, RunnerConfig
    from seedvr2_tpu.core.runner import VideoDiffusionRunner
    from seedvr2_tpu.models.dit.nadit import init_dit_params

    dit_cfg = DiTConfig(
        family="dit_3b", vid_in_channels=9, vid_out_channels=4, vid_dim=24,
        txt_in_dim=16, heads=2, head_dim=12, expand_ratio=4,
        patch_size=(1, 2, 2), num_layers=2, mm_layers=1, mlp_type="swiglu",
        window=(2, 2, 2), rope_type="mmrope3d", rope_dim=12,
        vid_out_norm=True)
    key = jax.random.PRNGKey(0)
    vae = VideoVAE(init_vae_params(key, CFG, dtype=jnp.float32), CFG,
                   dtype=jnp.float32)
    return VideoDiffusionRunner(
        init_dit_params(key, dit_cfg, dtype=jnp.float32), dit_cfg, vae,
        RunnerConfig(dit=dit_cfg, vae=CFG), compute_dtype=jnp.float32,
        **kw)


def test_runner_auto_decode_resolves_and_runs(monkeypatch):
    """decode_tile_size='auto' end-to-end on the runner: a constrained
    budget resolves to a tiled plan (and decodes == the same fixed-tile
    decode), an unconstrained one to untiled."""
    monkeypatch.setattr(memplan, "DECODE_LADDER", (96,))
    runner = _auto_runner(decode_tiled=True, decode_tile_size="auto",
                          decode_tile_overlap=(16, 16))
    z = jnp.asarray(np.random.default_rng(3).standard_normal(
        (2, 24, 32, CFG.latent_channels)), jnp.float32)

    monkeypatch.setattr(runner, "_auto_tile_budget", lambda: 1000)
    out = runner.vae_decode([z])[0]
    assert out.shape == (5, 192, 256, 3)
    tiled_plan = runner._auto_tile_cache[("decode", tuple(z.shape))]
    assert tiled_plan == (True, (96, 96))
    assert len(runner.vae.last_decode_tiles) > 1  # grid actually tiled

    fixed = _auto_runner(decode_tiled=True, decode_tile_size=(96, 96),
                         decode_tile_overlap=(16, 16))
    ref = fixed.vae_decode([z])[0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_runner_auto_decode_unconstrained_goes_untiled(monkeypatch):
    """With the real ladder and a huge budget, a small image resolves to
    untiled and matches the plain decode."""
    z = jnp.asarray(np.random.default_rng(3).standard_normal(
        (2, 24, 32, CFG.latent_channels)), jnp.float32)
    big = _auto_runner(decode_tiled=True, decode_tile_size="auto",
                       decode_tile_overlap=(16, 16))
    monkeypatch.setattr(big, "_auto_tile_budget", lambda: 10 ** 15)
    out2 = big.vae_decode([z])[0]
    assert big._auto_tile_cache[("decode", tuple(z.shape))][0] is False
    untiled = _auto_runner().vae_decode([z])[0]
    np.testing.assert_allclose(np.asarray(out2), np.asarray(untiled),
                               rtol=1e-5, atol=1e-5)


def test_runner_auto_encode_resolves(monkeypatch):
    monkeypatch.setattr(memplan, "ENCODE_LADDER", (96,))
    runner = _auto_runner(encode_tiled=True, encode_tile_size="auto",
                          encode_tile_overlap=(16, 16))
    x = jnp.asarray(np.random.default_rng(4).uniform(
        -1, 1, (5, 128, 160, 3)), jnp.float32)
    monkeypatch.setattr(runner, "_auto_tile_budget", lambda: 1000)
    lat = runner.vae_encode([x])[0]
    assert lat.shape == (2, 16, 20, CFG.latent_channels)
    assert runner._auto_tile_cache[("encode", tuple(x.shape))] == \
        (True, (96, 96))
    assert len(runner.vae.last_encode_tiles) > 1

    fixed = _auto_runner(encode_tiled=True, encode_tile_size=(96, 96),
                         encode_tile_overlap=(16, 16))
    ref = fixed.vae_encode([x])[0]
    np.testing.assert_allclose(np.asarray(lat), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_cpu_backend_without_budget_falls_back():
    """No HBM limit (CPU default path): auto keeps the fixed 1024 default
    and the configured tiled flag."""
    runner = _auto_runner(decode_tiled=False, decode_tile_size="auto")
    z = jnp.asarray(np.random.default_rng(5).standard_normal(
        (2, 6, 8, CFG.latent_channels)), jnp.float32)
    out = runner.vae_decode([z])[0]
    assert out.shape == (5, 48, 64, 3)
    assert runner._auto_tile_cache[("decode", tuple(z.shape))] == \
        (False, (1024, 1024))


def test_cli_parses_auto_tile_size(monkeypatch):
    import inference_cli

    monkeypatch.setattr(
        "sys.argv",
        ["inference_cli.py", "in.png", "--vae_decode_tile_size", "auto",
         "--vae_encode_tile_size", "640"])
    args = inference_cli.parse_arguments()
    assert args.vae_decode_tile_size == "auto"
    assert args.vae_encode_tile_size == 640


def test_runner_oom_retry_shrinks_auto_plan(monkeypatch):
    """The OOM-shrink retry backstops the planner: when the runtime
    rejects the auto-chosen tile anyway (probe optimism, fragmentation),
    the runner shrinks x0.7/side and self-heals for later calls."""
    monkeypatch.setattr(memplan, "DECODE_LADDER", (384,))
    runner = _auto_runner(decode_tiled=True, decode_tile_size="auto",
                          decode_tile_overlap=(16, 16))
    monkeypatch.setattr(runner, "_auto_tile_budget", lambda: 1000)
    z = jnp.asarray(np.random.default_rng(6).standard_normal(
        (2, 24, 32, CFG.latent_channels)), jnp.float32)

    real_decode = runner.vae.decode
    calls = []

    def flaky_decode(b, tiled=False, tile_size=(512, 512), **kw):
        calls.append((tiled, tile_size))
        if tiled and min(tile_size) > 256:  # 256 = the shrink floor
            raise RuntimeError("RESOURCE_EXHAUSTED: out of memory")
        return real_decode(b, tiled=tiled, tile_size=tile_size, **kw)

    monkeypatch.setattr(runner.vae, "decode", flaky_decode)
    out = runner.vae_decode([z])[0]
    assert out.shape == (5, 192, 256, 3)
    assert calls[0] == (True, (384, 384))  # auto plan tried first
    assert calls[-1] == (True, (256, 256))  # shrunk to the floor
    # the shrink self-heals into the per-shape plan (the 'auto' config
    # itself stays, so other shapes still get their own probes)
    assert runner.decode_tile_size == "auto"
    assert runner._auto_tile_cache[("decode", tuple(z.shape))] == \
        (True, (256, 256))

    # later waves/calls of the same shape serve the healed size directly:
    # the failing 384 plan must not be replayed
    n_calls = len(calls)
    out2 = runner.vae_decode([z + 1])[0]
    assert out2.shape == (5, 192, 256, 3)
    assert calls[n_calls:] == [(True, (256, 256))]


def test_plan_auto_tile_broken_probes_fall_back_to_default(tiny_vae,
                                                           monkeypatch):
    """Probe FAILURE (memory_analysis unsupported, compile error) is not
    a nothing-fits verdict: the planner serves the fixed 1024px default,
    not the smallest rung's massively redundant grid."""
    def broken(*a, **k):
        raise RuntimeError("memory_analysis unsupported here")

    monkeypatch.setattr(memplan, "probe_tile_bytes", broken)
    got = memplan.plan_auto_tile(tiny_vae, "decode", (270, 480), 1, 5,
                                 (64, 64), 10 ** 12)
    assert got == (1024, 1024)


def test_runner_auto_resolves_per_shape(monkeypatch):
    """Mixed-shape calls plan each shape independently (chunked videos
    produce a shorter final batch)."""
    monkeypatch.setattr(memplan, "DECODE_LADDER", (96,))
    runner = _auto_runner(decode_tiled=True, decode_tile_size="auto",
                          decode_tile_overlap=(16, 16))
    monkeypatch.setattr(runner, "_auto_tile_budget", lambda: 1000)
    rng = np.random.default_rng(8)
    za = jnp.asarray(rng.standard_normal((2, 24, 32, CFG.latent_channels)),
                     jnp.float32)
    zb = jnp.asarray(rng.standard_normal((1, 24, 32, CFG.latent_channels)),
                     jnp.float32)
    outs = runner.vae_decode([za, zb])
    assert outs[0].shape == (5, 192, 256, 3)
    assert outs[1].shape == (1, 192, 256, 3)
    assert ("decode", tuple(za.shape)) in runner._auto_tile_cache
    assert ("decode", tuple(zb.shape)) in runner._auto_tile_cache


def test_streaming_keep_plan_uses_full_bytes_under_tp(tiny_checkpoints=None):
    """Block streaming replicates across the mesh (tp does not compose
    with it), so once it engages under tensor_parallel the keep plan must
    budget FULL bytes — identical to the single-chip plan."""
    from seedvr2_tpu.core import model_manager as mm
    from seedvr2_tpu.models.dit.nadit import init_dit_params
    from seedvr2_tpu.core.configs import DiTConfig
    from seedvr2_tpu.utils.debug import NULL_DEBUG

    cfg = DiTConfig(
        family="dit_3b", vid_in_channels=9, vid_out_channels=4, vid_dim=32,
        txt_in_dim=16, heads=2, head_dim=16, expand_ratio=4,
        patch_size=(1, 2, 2), num_layers=4, mm_layers=1, mlp_type="swiglu",
        window=(2, 2, 2), rope_type="mmrope3d", rope_dim=16,
        vid_out_norm=True)
    params = init_dit_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    # a limit tiny enough that even the tp=2 slice engages streaming
    limit = int(mm._per_chip_dit_bytes(params, 2) / mm._AUTO_SWAP_FRACTION
                * 0.8)
    import unittest.mock as mock

    with mock.patch.object(mm, "_hbm_bytes_limit", lambda: limit):
        keep1 = mm._plan_block_streaming(params, cfg, 0, NULL_DEBUG,
                                         shard_ways=1)
        keep2 = mm._plan_block_streaming(params, cfg, 0, NULL_DEBUG,
                                         shard_ways=2)
    assert keep1 is not None and keep2 is not None
    assert keep1 == keep2  # replicated serving -> identical keep plan
