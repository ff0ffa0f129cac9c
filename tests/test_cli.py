"""CLI integration tests: tiny models, real video/image files, streaming
chunks with overlap blending."""

import importlib
import os

import numpy as np
import pytest

import jax.numpy as jnp

cv2 = pytest.importorskip("cv2")

import inference_cli  # noqa: E402
from seedvr2_tpu.core.configs import DiTConfig, RunnerConfig, VAEConfig
from seedvr2_tpu.utils import video_io


@pytest.fixture(scope="module")
def tiny_runner():
    import jax

    from seedvr2_tpu.core.runner import VideoDiffusionRunner
    from seedvr2_tpu.models.dit.nadit import init_dit_params
    from seedvr2_tpu.models.vae.pipeline_vae import VideoVAE, init_vae_params

    vae_cfg = VAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                        latent_channels=4, norm_num_groups=4)
    dit_cfg = DiTConfig(
        family="dit_3b", vid_in_channels=9, vid_out_channels=4, vid_dim=24,
        txt_in_dim=16, heads=2, head_dim=12, patch_size=(1, 2, 2),
        num_layers=2, mm_layers=1, mlp_type="swiglu", window=(2, 2, 2),
        rope_type="mmrope3d", rope_dim=12, vid_out_norm=True)
    key = jax.random.PRNGKey(0)
    vae = VideoVAE(init_vae_params(key, vae_cfg, dtype=jnp.float32), vae_cfg,
                   dtype=jnp.float32)
    return VideoDiffusionRunner(
        init_dit_params(key, dit_cfg, dtype=jnp.float32), dit_cfg, vae,
        RunnerConfig(dit=dit_cfg, vae=vae_cfg), compute_dtype=jnp.float32)


@pytest.fixture()
def patched_cli(monkeypatch, tiny_runner):
    rng = np.random.default_rng(0)
    embeds = {"pos": rng.standard_normal((7, 16)).astype(np.float32),
              "neg": rng.standard_normal((9, 16)).astype(np.float32)}
    monkeypatch.setattr(inference_cli, "make_runner",
                        lambda args, debug: tiny_runner)
    monkeypatch.setattr(
        inference_cli, "load_text_embeddings",
        lambda dirs, debug=None, txt_dim=None, allow_zero=False: embeds)
    return inference_cli


def _write_video(path, frames):
    h, w = frames.shape[1:3]
    writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                             10.0, (w, h))
    for f in frames:
        writer.write(cv2.cvtColor((f * 255).astype(np.uint8),
                                  cv2.COLOR_RGB2BGR))
    writer.release()


def _args(inp, out, **kw):
    import sys

    argv = ["prog", str(inp), "--output", str(out), "--resolution", "32",
            "--batch_size", "5", "--color_correction", "wavelet"]
    for k, v in kw.items():
        argv.append(f"--{k}")
        if v is not True:
            argv.append(str(v))
    old = sys.argv
    sys.argv = argv
    try:
        return inference_cli.parse_arguments()
    finally:
        sys.argv = old


def test_cli_image(tmp_path, patched_cli):
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (20, 24, 3)).astype(np.float32)
    in_path = tmp_path / "in.png"
    video_io.write_image(str(in_path), img)

    out_path = tmp_path / "out.png"
    args = _args(in_path, out_path)
    from seedvr2_tpu.utils.debug import Debug

    patched_cli.process_image(args, Debug())
    assert out_path.exists()
    back = video_io.read_image(str(out_path))[0]
    th, tw = args.resolution, None
    assert min(back.shape[0], back.shape[1]) >= 32


def test_cli_video_chunked(tmp_path, patched_cli):
    rng = np.random.default_rng(2)
    frames = rng.uniform(0, 1, (12, 20, 24, 3)).astype(np.float32)
    in_path = tmp_path / "in.mp4"
    _write_video(in_path, frames)

    out_path = tmp_path / "out.mp4"
    args = _args(in_path, out_path, chunk_size=7, temporal_overlap=2)
    from seedvr2_tpu.utils.debug import Debug

    patched_cli.process_video(args, Debug())
    assert out_path.exists()
    reader = video_io.VideoReader(str(out_path))
    assert reader.total == 12  # overlap frames deduplicated across chunks
    reader.close()


def test_detect_input_type(tmp_path):
    assert video_io.detect_input_type(str(tmp_path)) == "directory"
    p = tmp_path / "x.mp4"
    p.touch()
    assert video_io.detect_input_type(str(p)) == "video"
    q = tmp_path / "x.png"
    q.touch()
    assert video_io.detect_input_type(str(q)) == "image"


def test_cli_directory_input(tmp_path, patched_cli):
    rng = np.random.default_rng(3)
    d = tmp_path / "frames"
    d.mkdir()
    for i in range(3):
        video_io.write_image(str(d / f"f_{i:03d}.png"),
                             rng.uniform(0, 1, (20, 24, 3)).astype(np.float32))
    out_path = tmp_path / "out.mp4"
    args = _args(d, out_path)
    from seedvr2_tpu.utils.debug import Debug

    patched_cli.process_directory(args, Debug())
    assert out_path.exists()
    reader = video_io.VideoReader(str(out_path))
    assert reader.total == 3
    reader.close()


def test_cli_video_png_output(tmp_path, patched_cli):
    rng = np.random.default_rng(4)
    frames = rng.uniform(0, 1, (3, 20, 24, 3)).astype(np.float32)
    in_path = tmp_path / "in.mp4"
    _write_video(in_path, frames)
    out_path = tmp_path / "out.png"
    args = _args(in_path, out_path, output_format="png")
    from seedvr2_tpu.utils.debug import Debug

    patched_cli.process_video(args, Debug())
    pngs = sorted(tmp_path.glob("out_*.png"))
    assert len(pngs) == 3


def test_chunked_equals_unchunked_on_batch_boundaries(tmp_path, patched_cli):
    """SURVEY §4 streaming equivalence. Exact equality holds when chunk
    boundaries align with DiT batch boundaries (then each batch sees
    identical 4n+1 padding in both runs); mid-batch chunk cuts legitimately
    differ (the reference's streaming is approximate there too, blended at
    seams). Frames go through process_frames directly — mp4 round-trips
    quantize to uint8 and would mask real differences."""
    from seedvr2_tpu.utils.debug import Debug

    rng = np.random.default_rng(3)
    frames = rng.uniform(0, 1, (12, 20, 24, 3)).astype(np.float32)

    args = _args("x.mp4", "y.mp4")
    debug = Debug()
    runner = patched_cli.make_runner(args, debug)
    full = patched_cli.process_frames(runner, frames, args, debug)

    # batch_size=5 -> batches [0:5][5:10][10:12]; chunks cut at 5/10
    parts = [patched_cli.process_frames(runner, frames[a:b], args, debug)
             for a, b in ((0, 5), (5, 10), (10, 12))]
    np.testing.assert_allclose(np.concatenate(parts), full,
                               rtol=1e-4, atol=1e-4)


def test_preset_throughput_bundle(tmp_path):
    """--preset throughput applies the accuracy-gated serving bundle, but
    explicit flags always win over the preset."""
    inp, out = tmp_path / "x.png", tmp_path / "y.png"
    video_io.write_image(str(inp),
                         np.zeros((8, 8, 3), np.float32))
    a = _args(inp, out, preset="throughput")
    assert a.quant == "w8a8"
    assert a.vae_decode_tiled and a.vae_encode_tiled
    assert a.vae_decode_tile_size == 1088
    assert a.vae_decode_tile_overlap == 48  # r5f: 11.02 s vs 13.63 @64
    assert a.vae_encode_tile_overlap == 32  # r5f: 4.640 s vs 4.705 @64
    assert a.tile_mode == "uniform"
    # explicit flag beats the preset
    b = _args(inp, out, preset="throughput", quant="q8",
              vae_decode_tile_size=512)
    assert b.quant == "q8" and b.vae_decode_tile_size == 512
    assert b.vae_decode_tiled  # rest of the bundle still applies
    # no preset: reference-parity defaults untouched
    c = _args(inp, out)
    assert c.quant == "none" and not c.vae_decode_tiled
    assert c.vae_decode_tile_overlap == 128


def test_device_flag(tmp_path):
    """--device pins the jax platform; default stays auto (no pinning)."""
    inp, out = tmp_path / "x.png", tmp_path / "y.png"
    video_io.write_image(str(inp), np.zeros((8, 8, 3), np.float32))
    a = _args(inp, out)
    assert a.device == "auto"
    b = _args(inp, out, device="cpu")
    assert b.device == "cpu"
    import pytest as _pytest
    with _pytest.raises(SystemExit):
        _args(inp, out, device="cuda")


def test_doctor_report(tmp_path, capsys):
    """--doctor prints the health sections and returns 0 when the backend
    computes (CPU here); the probe runs under a watchdog so a dead TPU
    tunnel yields exit 3 instead of a hang (utils/doctor.py)."""
    from seedvr2_tpu.utils.doctor import run_doctor

    rc = run_doctor(model_dir=str(tmp_path))
    out = capsys.readouterr().out
    assert rc == 0
    for needle in ("seedvr2 doctor", "persistent jit cache",
                   "memory-probe cache", "model search dirs",
                   "backend OK: cpu"):
        assert needle in out, needle
