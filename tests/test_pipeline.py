"""Unit tests for pipeline batch math + a tiny end-to-end 4-phase run."""

import numpy as np
import pytest

import jax.numpy as jnp

from seedvr2_tpu.core import pipeline
from seedvr2_tpu.core.configs import DiTConfig, RunnerConfig, VAEConfig
from seedvr2_tpu.utils import transforms


def test_pad_4n1_mirror():
    video = np.arange(3)[:, None, None, None] * np.ones((1, 1, 1), np.float32)
    out = pipeline.pad_video_temporal(video)  # 3 -> 5
    assert out.shape[0] == 5
    np.testing.assert_array_equal(out[:, 0, 0, 0], [0, 1, 2, 1, 0])


def test_pad_prepend_mirror():
    video = np.arange(3)[:, None, None, None] * np.ones((1, 1, 1), np.float32)
    out = pipeline.pad_video_temporal(video, count=2, prepend=True)
    np.testing.assert_array_equal(out[:, 0, 0, 0], [2, 1, 0, 1, 2])


def test_pad_longer_than_video():
    video = np.arange(2)[:, None, None, None] * np.ones((1, 1, 1), np.float32)
    out = pipeline.pad_video_temporal(video, count=4)  # repeat + reverse
    assert out.shape[0] == 6
    # reference semantics: video + reversed tail (frames 1..) + repeated last
    np.testing.assert_array_equal(out[:, 0, 0, 0], [0, 1, 1, 1, 1, 1])


def test_batch_indices_with_overlap():
    batches, ov = pipeline.batch_indices(10, 5, 2)
    assert ov == 2
    assert batches == [(0, 5), (3, 8), (6, 10)]
    # total written = 5 + 3 + 2 = 10
    written = batches[0][1] + sum(e - s - ov for s, e in batches[1:])
    assert written == 10


def test_batch_indices_overlap_reset():
    batches, ov = pipeline.batch_indices(10, 3, 5)  # step <= 0 -> reset
    assert ov == 0
    assert batches == [(0, 3), (3, 6), (6, 9), (9, 10)]


def test_blend_overlapping_endpoints():
    overlap = 5
    prev = np.ones((overlap, 2, 2, 3), np.float32)
    cur = np.zeros((overlap, 2, 2, 3), np.float32)
    out = pipeline.blend_overlapping_frames(prev, cur, overlap)
    assert out[0, 0, 0, 0] == pytest.approx(1.0)   # pure prev at start
    assert out[-1, 0, 0, 0] == pytest.approx(0.0)  # pure cur at end
    assert np.all(np.diff(out[:, 0, 0, 0]) <= 1e-6)  # monotone fade


def test_side_resize_dims():
    # short side -> 32, long side int-scaled
    assert transforms.side_resize_dims(24, 20, 32) == (38, 32)
    assert transforms.side_resize_dims(20, 24, 32) == (32, 38)
    # max_size cap
    nh, nw = transforms.side_resize_dims(100, 50, 80, max_size=100)
    assert max(nh, nw) <= 100


def test_optimal_batch_params():
    p = pipeline.calculate_optimal_batch_params(23, 5, 0)
    assert p["best_batch"] == 21  # largest 4n+1 <= 23


def _make_tiny_runner():
    import jax

    from seedvr2_tpu.core.runner import VideoDiffusionRunner
    from seedvr2_tpu.models.dit.nadit import init_dit_params
    from seedvr2_tpu.models.vae.pipeline_vae import VideoVAE, init_vae_params

    vae_cfg = VAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                        latent_channels=4, norm_num_groups=4)
    dit_cfg = DiTConfig(
        family="dit_3b", vid_in_channels=9, vid_out_channels=4, vid_dim=24,
        txt_in_dim=16, heads=2, head_dim=12, expand_ratio=4,
        patch_size=(1, 2, 2), num_layers=2, mm_layers=1, mlp_type="swiglu",
        window=(2, 2, 2), rope_type="mmrope3d", rope_dim=12,
        vid_out_norm=True)
    key = jax.random.PRNGKey(0)
    vae = VideoVAE(init_vae_params(key, vae_cfg, dtype=jnp.float32), vae_cfg,
                   dtype=jnp.float32)
    dit_params = init_dit_params(key, dit_cfg, dtype=jnp.float32)
    return VideoDiffusionRunner(
        dit_params, dit_cfg, vae,
        RunnerConfig(dit=dit_cfg, vae=vae_cfg),
        compute_dtype=jnp.float32)


@pytest.fixture(scope="module")
def tiny_runner():
    return _make_tiny_runner()


def test_pipeline_end_to_end(tiny_runner):
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 1, (7, 24, 20, 3)).astype(np.float32)

    ctx = pipeline.setup_generation_context()
    ctx = pipeline.encode_all_batches(
        tiny_runner, ctx, images, batch_size=5, temporal_overlap=2,
        resolution=32, color_correction="wavelet", seed=1)
    assert len(ctx["all_latents"]) == 2
    # latent: 48x32 padded input -> 6x4 latent, 5 frames -> 2 latent frames
    assert ctx["all_latents"][0].shape == (2, 6, 4, 4)

    ctx["text_embeds"] = {
        "pos": rng.standard_normal((7, 16)).astype(np.float32),
        "neg": rng.standard_normal((9, 16)).astype(np.float32),
    }
    ctx = pipeline.upscale_all_batches(tiny_runner, ctx, seed=1)
    assert len(ctx["all_upscaled_latents"]) == 2

    ctx = pipeline.decode_all_batches(tiny_runner, ctx)
    true_h, true_w = ctx["true_target_dims"]
    assert ctx["final_video"].shape == (7, true_h, true_w, 3)

    ctx = pipeline.postprocess_all_batches(ctx, color_correction="wavelet")
    final = ctx["final_video"]
    assert final.shape == (7, true_h, true_w, 3)
    assert final.min() >= 0.0 and final.max() <= 1.0
    assert np.std(final) > 1e-4  # not degenerate


def test_pipeline_rgba_alpha_path(tiny_runner):
    rng = np.random.default_rng(1)
    rgb = rng.uniform(0, 1, (3, 24, 20, 3)).astype(np.float32)
    alpha = (rng.uniform(0, 1, (3, 24, 20, 1)) > 0.5).astype(np.float32)
    images = np.concatenate([rgb, alpha], axis=-1)

    ctx = pipeline.setup_generation_context()
    ctx = pipeline.encode_all_batches(
        tiny_runner, ctx, images, batch_size=5, resolution=32,
        color_correction="none", seed=1)
    ctx["text_embeds"] = {
        "pos": rng.standard_normal((7, 16)).astype(np.float32),
        "neg": rng.standard_normal((9, 16)).astype(np.float32),
    }
    ctx = pipeline.upscale_all_batches(tiny_runner, ctx, seed=1)
    ctx = pipeline.decode_all_batches(tiny_runner, ctx)
    ctx = pipeline.postprocess_all_batches(ctx, color_correction="none")
    final = ctx["final_video"]
    assert final.shape[-1] == 4
    alpha_out = final[..., 3]
    assert alpha_out.min() >= 0.0 and alpha_out.max() <= 1.0


def test_resize_matches_torch_antialiased_bicubic():
    """Matrix bicubic resize vs torch F.interpolate(antialias=True) — the
    exact op the reference applies through torchvision SideResize."""
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (40, 56, 3)).astype(np.float32) / 255.0
    for (nh, nw) in [(96, 128), (20, 30)]:  # upscale + downscale
        t = torch.from_numpy(img.transpose(2, 0, 1))[None]
        ref = F.interpolate(t, size=(nh, nw), mode="bicubic",
                            antialias=True)[0].numpy().transpose(1, 2, 0)
        mine = np.asarray(transforms.resize_video(
            jnp.asarray(img[None]), nh, nw))[0]
        np.testing.assert_allclose(mine, ref, rtol=1e-4, atol=1e-5)


def test_phase2_mesh_dp_stacks_batches(tiny_runner):
    """Phase 2 over an 8-device CPU mesh must (a) stack same-shape temporal
    batches into per-call batch > 1 sharded over 'dp' and (b) produce the
    same latents as the sequential single-device path (VERDICT r1 item 5;
    replaces the reference's frame-parallel fan-out,
    inference_cli.py:1048-1214)."""
    import jax

    from seedvr2_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(3)
    # 13 frames / batch 5 -> batches of 5,5,3: two same-shape + one tail
    images = rng.uniform(0, 1, (13, 24, 20, 3)).astype(np.float32)
    embeds = {
        "pos": rng.standard_normal((7, 16)).astype(np.float32),
        "neg": rng.standard_normal((9, 16)).astype(np.float32),
    }

    def run(runner):
        ctx = pipeline.setup_generation_context()
        ctx = pipeline.encode_all_batches(
            runner, ctx, images, batch_size=5, resolution=32,
            color_correction="none", seed=3)
        ctx["text_embeds"] = dict(embeds)
        runner.last_batch_sizes = []
        ctx = pipeline.upscale_all_batches(runner, ctx, seed=3)
        return ctx["all_upscaled_latents"], list(runner.last_batch_sizes)

    seq_lat, seq_batches = run(tiny_runner)
    assert all(b == 1 for b in seq_batches)

    mesh_runner = _make_tiny_runner()
    mesh_runner.attach_mesh(
        make_mesh(len(jax.devices()), axis_names=("dp",)))
    dp_lat, dp_batches = run(mesh_runner)

    assert len(dp_lat) == len(seq_lat) == 3
    assert max(dp_batches) > 1  # stacked, not one-at-a-time
    assert all(b % 8 == 0 for b in dp_batches)  # dp-divisible (padded tail)
    for a, b in zip(seq_lat, dp_lat):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=2e-5)


def test_full_pipeline_mesh_matches_sequential(tiny_runner):
    """All 4 phases over an 8-device dp mesh (phase-1/3 temporal VAE waves +
    phase-2 DiT stacking) must reproduce the sequential output."""
    import jax

    from seedvr2_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(8)
    images = rng.uniform(0, 1, (13, 24, 20, 3)).astype(np.float32)
    embeds = {
        "pos": rng.standard_normal((7, 16)).astype(np.float32),
        "neg": rng.standard_normal((9, 16)).astype(np.float32),
    }

    def run(runner):
        ctx = pipeline.setup_generation_context()
        ctx = pipeline.encode_all_batches(
            runner, ctx, images, batch_size=5, temporal_overlap=2,
            resolution=32, color_correction="none", seed=8)
        ctx["text_embeds"] = dict(embeds)
        ctx = pipeline.upscale_all_batches(runner, ctx, seed=8)
        ctx = pipeline.decode_all_batches(runner, ctx)
        ctx = pipeline.postprocess_all_batches(ctx, color_correction="none")
        return ctx["final_video"]

    seq = run(tiny_runner)
    mesh_runner = _make_tiny_runner()
    mesh_runner.attach_mesh(make_mesh(len(jax.devices()),
                                      axis_names=("dp",)))
    par = run(mesh_runner)
    assert par.shape == seq.shape
    np.testing.assert_allclose(par, seq, rtol=1e-5, atol=3e-5)

    # dp x tp composed: the DiT tp-shards while the VAE waves shard their
    # batch axis over BOTH axes (tp chips must not idle through the VAE
    # phases — core/runner._batched_waves)
    tp_runner = _make_tiny_runner()
    tp_runner.attach_mesh(make_mesh(len(jax.devices()),
                                    axis_names=("dp", "tp"),
                                    shape=(len(jax.devices()) // 2, 2)))
    assert tp_runner.tp_specs is not None
    par_tp = run(tp_runner)
    assert par_tp.shape == seq.shape
    np.testing.assert_allclose(par_tp, seq, rtol=1e-5, atol=3e-5)


def test_pipeline_determinism(tiny_runner):
    """Same seed -> bit-identical output (reference reseeds per batch so
    every run/batch sees the same RNG stream; we mirror with fixed keys)."""
    rng = np.random.default_rng(9)
    images = rng.uniform(0, 1, (5, 24, 20, 3)).astype(np.float32)
    outs = []
    for _ in range(2):
        ctx = pipeline.setup_generation_context()
        ctx = pipeline.encode_all_batches(
            tiny_runner, ctx, images, batch_size=5, resolution=32,
            color_correction="none", seed=7)
        ctx["text_embeds"] = {
            "pos": np.ones((7, 16), np.float32) * 0.1,
            "neg": np.ones((9, 16), np.float32) * 0.1,
        }
        ctx = pipeline.upscale_all_batches(tiny_runner, ctx, seed=7)
        ctx = pipeline.decode_all_batches(tiny_runner, ctx)
        ctx = pipeline.postprocess_all_batches(ctx, color_correction="none")
        outs.append(ctx["final_video"])
    np.testing.assert_array_equal(outs[0], outs[1])
