"""Component tests: streamed (BlockSwap-equivalent) forward, NaDiTUpscaler
variant, ComfyUI node contract, mesh-sharded inference."""

import importlib

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from seedvr2_tpu.core.configs import DiTConfig
from seedvr2_tpu.core.loader import torch_module_to_params
from seedvr2_tpu.models.dit.nadit import (build_dit_plan, init_dit_params,
                                          nadit_forward)

from .oracle_ref import load_reference_src


def _tiny_cfg():
    return DiTConfig(
        family="dit_3b", vid_in_channels=9, vid_out_channels=4, vid_dim=24,
        txt_in_dim=16, heads=2, head_dim=12, patch_size=(1, 2, 2),
        num_layers=2, mm_layers=1, mlp_type="swiglu", window=(2, 2, 2),
        rope_type="mmrope3d", rope_dim=12, vid_out_norm=True)


def test_streamed_nadit_matches_regular():
    from seedvr2_tpu.ops.offload import StreamedNaDiT

    cfg = _tiny_cfg()
    params = init_dit_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    T, H, W, L = 3, 8, 8, 5
    plan = build_dit_plan(cfg, (T, H, W), L)
    rng = np.random.default_rng(0)
    vid = jnp.asarray(rng.standard_normal((1, T, H, W, 9)), jnp.float32)
    txt = jnp.asarray(rng.standard_normal((1, L, 16)), jnp.float32)
    t = jnp.asarray([500.0])

    regular = nadit_forward(params, cfg, vid, txt, t, plan)
    streamed = StreamedNaDiT(params, cfg, keep_blocks=1)(vid, txt, t, plan)
    np.testing.assert_allclose(np.asarray(streamed), np.asarray(regular),
                               rtol=1e-5, atol=1e-5)


def test_runner_streamed_blockswap_matches_regular():
    """A runner built with streamed_dit (the product BlockSwap path wired by
    configure_runner when blocks_to_swap > 0 or weights exceed HBM) must
    reproduce the regular runner's denoise output and record swap stalls."""
    from seedvr2_tpu.core.configs import RunnerConfig, VAEConfig
    from seedvr2_tpu.core.runner import VideoDiffusionRunner
    from seedvr2_tpu.ops.offload import StreamedNaDiT

    cfg = _tiny_cfg()
    params = init_dit_params(jax.random.PRNGKey(5), cfg, dtype=jnp.float32)
    rcfg = RunnerConfig(dit=cfg, vae=VAEConfig())
    regular = VideoDiffusionRunner(params, cfg, None, rcfg,
                                   compute_dtype=jnp.float32)
    streamed = VideoDiffusionRunner(
        None, cfg, None, rcfg, compute_dtype=jnp.float32,
        streamed_dit=StreamedNaDiT(params, cfg, keep_blocks=1))

    rng = np.random.default_rng(5)
    noises = [jnp.asarray(rng.standard_normal((2, 4, 4, 4)), jnp.float32)]
    conds = [regular.get_condition(n, n) for n in noises]
    txt = [np.asarray(rng.standard_normal((5, 16)), np.float32)]

    ref = regular.inference(noises, conds, txt, txt, cfg_scale=1.0, steps=1)
    out = streamed.inference(noises, conds, txt, txt, cfg_scale=1.0, steps=1)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                               rtol=1e-5, atol=1e-5)
    stats = streamed.streamed_dit.stats.summary()
    assert stats["block_swaps"] == 1  # 2 layers, 1 resident
    assert stats["block_bytes"] > 0


def test_streamed_blockswap_on_mesh_matches_regular():
    """BlockSwap composes with multi-chip: a streamed runner with an
    attached mesh (blocks replicated, dp-sharded batches) must equal the
    single-device regular runner (VERDICT r2 item 8)."""
    from jax.sharding import Mesh
    from seedvr2_tpu.core.configs import RunnerConfig, VAEConfig
    from seedvr2_tpu.core.runner import VideoDiffusionRunner
    from seedvr2_tpu.ops.offload import StreamedNaDiT

    cfg = _tiny_cfg()
    params = init_dit_params(jax.random.PRNGKey(6), cfg, dtype=jnp.float32)
    rcfg = RunnerConfig(dit=cfg, vae=VAEConfig())
    regular = VideoDiffusionRunner(params, cfg, None, rcfg,
                                   compute_dtype=jnp.float32)
    streamed = VideoDiffusionRunner(
        None, cfg, None, rcfg, compute_dtype=jnp.float32,
        streamed_dit=StreamedNaDiT(params, cfg, keep_blocks=1))
    mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(2, 1, 1),
                ("dp", "fsdp", "tp"))
    streamed.attach_mesh(mesh)
    assert streamed.streamed_dit.mesh is mesh

    rng = np.random.default_rng(7)
    noises = [jnp.asarray(rng.standard_normal((2, 4, 4, 4)), jnp.float32)
              for _ in range(2)]  # b=2 shards over dp=2
    conds = [regular.get_condition(n, n) for n in noises]
    txt = [np.asarray(rng.standard_normal((5, 16)), np.float32)]

    ref = regular.inference(noises, conds, txt, txt, cfg_scale=1.0, steps=1)
    out = streamed.inference(noises, conds, txt, txt, cfg_scale=1.0, steps=1)
    for o, r in zip(out, ref):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=1e-5, atol=1e-5)


def test_runner_phase_offload_roundtrip():
    """Per-phase DiT offload (set_phase_offload/release_dit): inference
    auto-restores the weights from the retained host tree and reproduces
    the always-resident result."""
    from seedvr2_tpu.core.configs import RunnerConfig, VAEConfig
    from seedvr2_tpu.core.runner import VideoDiffusionRunner

    cfg = _tiny_cfg()
    params = init_dit_params(jax.random.PRNGKey(6), cfg, dtype=jnp.float32)
    rcfg = RunnerConfig(dit=cfg, vae=VAEConfig())
    regular = VideoDiffusionRunner(params, cfg, None, rcfg,
                                   compute_dtype=jnp.float32)
    offl = VideoDiffusionRunner(None, cfg, None, rcfg,
                                compute_dtype=jnp.float32)
    offl.set_phase_offload(jax.tree.map(np.asarray, params))

    rng = np.random.default_rng(6)
    noises = [jnp.asarray(rng.standard_normal((2, 4, 4, 4)), jnp.float32)]
    conds = [regular.get_condition(n, n) for n in noises]
    txt = [np.asarray(rng.standard_normal((5, 16)), np.float32)]

    ref = regular.inference(noises, conds, txt, txt, cfg_scale=1.0, steps=1)
    out = offl.inference(noises, conds, txt, txt, cfg_scale=1.0, steps=1)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                               rtol=1e-6, atol=1e-6)
    assert offl.dit_params is not None
    offl.release_dit()
    assert offl.dit_params is None
    out2 = offl.inference(noises, conds, txt, txt, cfg_scale=1.0, steps=1)
    np.testing.assert_allclose(np.asarray(out2[0]), np.asarray(ref[0]),
                               rtol=1e-6, atol=1e-6)


def test_nadit_upscaler_variant():
    """NaDiTUpscaler: emb += emb_scale(downscale). The reference class is
    not directly runnable as an oracle (dit_7b/nadit.py:290 references an
    undefined `attention_mode` — latent upstream bug; the class is never
    instantiated in the reference repo), so we verify our variant
    structurally: the downscale embedding exists and shifts the output."""
    cfg = DiTConfig(
        family="dit_7b", vid_in_channels=9, vid_out_channels=4, vid_dim=24,
        txt_in_dim=16, heads=2, head_dim=12, patch_size=(1, 2, 2),
        num_layers=2, mm_layers=0, mlp_type="normal", window=(2, 2, 2),
        rope_type="rope3d_window", rope_dim=6, vid_out_norm=False,
        upscaler=True)
    params = init_dit_params(jax.random.PRNGKey(2), cfg, dtype=jnp.float32)
    assert "emb_scale" in params

    T, H, W, L = 3, 8, 6, 5
    plan = build_dit_plan(cfg, (T, H, W), L)
    rng = np.random.default_rng(6)
    vid = jnp.asarray(rng.standard_normal((1, T, H, W, 9)), jnp.float32)
    txt = jnp.asarray(rng.standard_normal((1, L, 16)), jnp.float32)
    t = jnp.asarray([700.0])

    out2 = nadit_forward(params, cfg, vid, txt, t, plan,
                         downscale=jnp.asarray([2.0]))
    out4 = nadit_forward(params, cfg, vid, txt, t, plan,
                         downscale=jnp.asarray([4.0]))
    assert np.abs(np.asarray(out2) - np.asarray(out4)).max() > 1e-5


def test_node_config_contract():
    from seedvr2_tpu.interfaces import (SeedVR2LoadDiTModel,
                                        SeedVR2LoadVAEModel,
                                        SeedVR2TorchCompileSettings)

    dit = SeedVR2LoadDiTModel.execute(model="m.safetensors", device="tpu:0",
                                      offload_device="cpu", cache_model=True,
                                      blocks_to_swap=4)
    assert set(dit) >= {"model", "device", "offload_device", "cache_model",
                        "blocks_to_swap", "swap_io_components",
                        "attention_mode", "torch_compile_args"}
    vae = SeedVR2LoadVAEModel.execute(model="v.safetensors",
                                      encode_tiled=True)
    assert set(vae) >= {"model", "encode_tiled", "encode_tile_size",
                        "decode_tiled", "decode_tile_size", "tile_debug"}
    tc = SeedVR2TorchCompileSettings.execute()
    assert set(tc) == {"backend", "mode", "fullgraph", "dynamic",
                       "dynamo_cache_size_limit", "dynamo_recompile_limit"}
    # tile size 0 (or "auto") = memory-probed auto plan; ints pass through
    from seedvr2_tpu.interfaces.nodes import _node_tile

    assert _node_tile(0) == "auto" and _node_tile("auto") == "auto"
    assert _node_tile(512) == (512, 512)
    with pytest.raises(ValueError):
        SeedVR2LoadDiTModel.execute(blocks_to_swap=2, offload_device="none")


def test_mesh_dp_inference_matches_single_device():
    """Batch sharded over dp on the 8-device CPU mesh must reproduce the
    single-device result (replaces the reference's per-GPU fan-out)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from seedvr2_tpu.parallel.mesh import make_mesh, shard_params

    cfg = _tiny_cfg()
    params = init_dit_params(jax.random.PRNGKey(1), cfg, dtype=jnp.float32)
    T, H, W, L = 1, 6, 6, 5
    plan = build_dit_plan(cfg, (T, H, W), L)
    rng = np.random.default_rng(1)
    vid = jnp.asarray(rng.standard_normal((8, T, H, W, 9)), jnp.float32)
    txt = jnp.asarray(rng.standard_normal((8, L, 16)), jnp.float32)
    t = jnp.full((8,), 500.0, jnp.float32)

    single = np.asarray(nadit_forward(params, cfg, vid, txt, t, plan))

    mesh = make_mesh(8, axis_names=("dp",))
    with mesh:
        sp = shard_params(mesh, params)
        vid_s = jax.device_put(vid, NamedSharding(mesh, P("dp")))
        txt_s = jax.device_put(txt, NamedSharding(mesh, P("dp")))
        t_s = jax.device_put(t, NamedSharding(mesh, P("dp")))
        fn = jax.jit(lambda p, v, x, tt: nadit_forward(p, cfg, v, x, tt, plan))
        sharded = np.asarray(fn(sp, vid_s, txt_s, t_s))

    np.testing.assert_allclose(sharded, single, rtol=1e-4, atol=1e-4)


def test_runner_dp_mesh_batched_inference():
    """attach_mesh + batched inference over dp must equal single-device."""
    from seedvr2_tpu.core.configs import RunnerConfig, VAEConfig
    from seedvr2_tpu.core.runner import VideoDiffusionRunner
    from seedvr2_tpu.parallel.mesh import make_mesh

    cfg = _tiny_cfg()
    params = init_dit_params(jax.random.PRNGKey(3), cfg, dtype=jnp.float32)
    runner = VideoDiffusionRunner(
        params, cfg, None, RunnerConfig(dit=cfg, vae=VAEConfig()),
        compute_dtype=jnp.float32)

    rng = np.random.default_rng(3)
    noises = [jnp.asarray(rng.standard_normal((2, 4, 4, 4)), jnp.float32)
              for _ in range(8)]
    conds = [runner.get_condition(n, n) for n in noises]
    txt = [np.asarray(rng.standard_normal((5, 16)), np.float32)]

    single = runner.inference(noises, conds, txt, txt, cfg_scale=1.0, steps=1)

    runner.attach_mesh(make_mesh(8, axis_names=("dp",)))
    sharded = runner.inference(noises, conds, txt, txt, cfg_scale=1.0, steps=1)

    for s, r in zip(sharded, single):
        np.testing.assert_allclose(np.asarray(s), np.asarray(r),
                                   rtol=1e-4, atol=1e-5)


def test_train_state_checkpoint_roundtrip(tmp_path):
    """orbax save/restore of the sharded training state."""
    from seedvr2_tpu.models.dit.nadit import build_dit_plan
    from seedvr2_tpu.parallel.mesh import make_mesh
    from seedvr2_tpu.parallel.train import (make_train_step,
                                            restore_train_state,
                                            save_train_state)

    cfg = _tiny_cfg()
    plan = build_dit_plan(cfg, (1, 4, 4), 5)
    mesh = make_mesh(8)
    params = init_dit_params(jax.random.PRNGKey(4), cfg, dtype=jnp.float32)
    with mesh:
        init_state, _ = make_train_step(cfg, plan, mesh)
        state = init_state(params)

    path = str(tmp_path / "ckpt")
    save_train_state(state, path)
    restored = restore_train_state(path, state)
    orig = jax.tree.leaves(state.params)
    back = jax.tree.leaves(restored.params)
    for a, b in zip(orig, back):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(state.step)


def test_yaml_config_ingestion():
    """Parse the actual reference YAMLs (OmegaConf format w/ eval resolver)."""
    from seedvr2_tpu.core.config_yaml import (dit_config_from_yaml,
                                              vae_config_from_yaml)

    cfg3 = dit_config_from_yaml("/root/reference/configs_3b/main.yaml")
    assert (cfg3.vid_dim, cfg3.heads, cfg3.num_layers) == (2560, 20, 32)
    assert cfg3.mlp_type == "swiglu" and cfg3.mm_layers == 10
    assert cfg3.window == (4, 3, 3) and cfg3.vid_out_norm

    cfg7 = dit_config_from_yaml("/root/reference/configs_7b/main.yaml")
    assert (cfg7.vid_dim, cfg7.heads, cfg7.num_layers) == (3072, 24, 36)
    assert cfg7.mlp_type == "normal" and not cfg7.vid_out_norm

    vae = vae_config_from_yaml(
        "/root/reference/src/models/video_vae_v3/s8_c16_t4_inflation_sd3.yaml")
    assert vae.block_out_channels == (128, 256, 512, 512)
    assert vae.latent_channels == 16


def test_find_model_path(tmp_path, monkeypatch):
    """utils/constants.py model-path resolution (reference constants.py):
    env search path, case-insensitive filename match, miss -> None."""
    from seedvr2_tpu.utils.constants import candidate_model_dirs, find_model_path

    d1 = tmp_path / "a"
    d1.mkdir()
    (d1 / "MyModel.safetensors").write_bytes(b"x")
    monkeypatch.setenv("SEEDVR2_MODEL_PATHS", str(d1))
    assert find_model_path("mymodel.safetensors") == str(d1 / "MyModel.safetensors")
    assert find_model_path("missing.safetensors", str(tmp_path)) is None
    dirs = candidate_model_dirs(str(tmp_path))
    assert str(d1) in dirs and str(tmp_path) in dirs


def test_workflow_file_execution(monkeypatch, tmp_path):
    """interfaces/workflow.py runs the node graph from JSON (the standalone
    equivalent of the reference's example ComfyUI workflows)."""
    import numpy as np

    from seedvr2_tpu.interfaces import nodes, workflow

    calls = {}

    def fake_upscale(cls=None, **kw):
        calls.update(kw)
        return kw["image"] * 2

    monkeypatch.setattr(nodes.SeedVR2VideoUpscaler, "execute",
                        classmethod(lambda cls, **kw: fake_upscale(**kw)))
    img = np.ones((2, 8, 8, 3), np.float32)
    out = workflow.run_workflow_file(
        "examples/workflows/simple_image.json", {"image": img})
    assert np.allclose(out["up"], img * 2)
    assert calls["dit"]["model"].endswith("3b_fp16.safetensors")
    assert calls["vae"]["model"]  # vae loader dict threaded through
    assert calls["resolution"] == 1080

    # all shipped workflows parse and resolve node types
    import glob
    import json as _json

    for p in glob.glob("examples/workflows/*.json"):
        wf = _json.load(open(p))
        for n in wf["nodes"]:
            workflow._node_class(n["type"])


def test_attention_mode_dispatch(monkeypatch):
    """--attention_mode xla must bypass the flash kernel at trace time."""
    import jax.numpy as jnp
    import numpy as np

    from seedvr2_tpu.ops import attention as attn_mod

    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((2, 16, 2, 128)), jnp.float32)
    called = {"flash": False}

    monkeypatch.setattr(attn_mod, "_flash_available", lambda: True)

    def fake_flash(*a, **k):
        called["flash"] = True
        return q

    import seedvr2_tpu.ops.flash_attention as fa
    monkeypatch.setattr(fa, "flash_attention", fake_flash)
    monkeypatch.setattr(fa, "flash_supported", lambda *a: True)

    try:
        attn_mod.set_attention_mode("sdpa")  # reference alias for xla
        out = attn_mod.attention(q, q, q)
        assert not called["flash"]
        attn_mod.set_attention_mode("flash")
        out2 = attn_mod.attention(q, q, q)
        assert called["flash"]
    finally:
        attn_mod.set_attention_mode("flash")
    np.testing.assert_allclose(np.asarray(out2), np.asarray(q))
    assert out.shape == q.shape
