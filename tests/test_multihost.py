"""Multi-host frame fan-out: range math, segment join, 2-host CLI drive
(reference fan-out semantics: inference_cli.py:1048-1214)."""

import sys

import numpy as np
import pytest

from seedvr2_tpu.parallel import multihost

from .test_integration_cli import tiny_checkpoints  # noqa: F401 (fixture)


def test_frame_ranges_math():
    # even split, overlap extends every non-last range
    assert multihost.frame_ranges(10, 2, 2) == [(0, 7), (5, 10)]
    assert multihost.frame_ranges(10, 3, 0) == [(0, 4), (4, 7), (7, 10)]
    # non-overlapped coverage is a partition of [0, total)
    for total, n, ov in [(23, 4, 3), (5, 5, 1), (7, 2, 0), (100, 8, 4)]:
        ranges = multihost.frame_ranges(total, n, ov)
        core_end = 0
        for i, (s, e) in enumerate(ranges):
            assert s == core_end
            core = e - (ov if i < n - 1 else 0)
            core = min(core, total)
            assert core > s or total < n
            core_end = core
        assert core_end == total


def test_join_segments_blend(tmp_path):
    out = str(tmp_path / "video.mp4")
    a = np.ones((7, 4, 4, 3), np.float32)
    b = np.zeros((5, 4, 4, 3), np.float32)
    multihost.save_segment(out, 0, a)
    multihost.save_segment(out, 1, b)
    video = multihost.join_segments(out, 2, 2)
    # 7 + 5 - 2 overlap = 10 frames; seam fades 1 -> 0
    assert video.shape == (10, 4, 4, 3)
    assert video[4, 0, 0, 0] == pytest.approx(1.0)
    assert video[5, 0, 0, 0] == pytest.approx(1.0)   # blend start: pure prev
    assert video[6, 0, 0, 0] == pytest.approx(0.0)   # blend end: pure next
    assert video[7, 0, 0, 0] == pytest.approx(0.0)

    with pytest.raises(FileNotFoundError):
        multihost.join_segments(out, 3, 2)


def test_segments_stored_fp16(tmp_path):
    """Segments persist as fp16 (half the shared-filesystem bytes); the
    join returns float32 and round-trips [0,1] frames losslessly at 8-bit
    output precision."""
    out = str(tmp_path / "v.mp4")
    frames = np.random.default_rng(0).uniform(0, 1, (4, 6, 6, 3))
    path = multihost.save_segment(out, 0, frames.astype(np.float32))
    stored = np.load(path)
    assert stored.dtype == np.float16
    video = multihost.join_segments(out, 1, 0)
    assert video.dtype == np.float32
    # fp16 has ~1e-3 resolution on [0,1] — far below the 1/255 quantization
    # of the final 8-bit video
    assert np.abs(video - frames).max() < 1.0 / 1024


def test_streamed_join_matches_batch(tmp_path):
    """iter_joined_segments (the CLI's streamed writer path) must emit
    exactly the assembled video, one bounded chunk per segment."""
    out = str(tmp_path / "v.mp4")
    rng = np.random.default_rng(1)
    lens = [9, 8, 6]
    for i, n in enumerate(lens):
        multihost.save_segment(
            out, i, rng.uniform(0, 1, (n, 4, 4, 3)).astype(np.float32))
    overlap = 3
    whole = multihost.join_segments(out, 3, overlap)
    chunks = list(multihost.iter_joined_segments(out, 3, overlap))
    # bounded memory: one chunk per segment, none larger than a segment
    assert len(chunks) == 3
    assert all(c.shape[0] <= max(lens) for c in chunks)
    np.testing.assert_array_equal(np.concatenate(chunks, axis=0), whole)
    assert whole.shape[0] == sum(lens) - (len(lens) - 1) * overlap


def test_cli_two_host_fanout(tiny_checkpoints, tmp_path,  # noqa: F811
                             monkeypatch):
    """Drive the CLI as 2 'hosts' + join on a 12-frame clip: every segment
    written, final mp4 has all 12 frames."""
    import cv2

    import inference_cli
    from seedvr2_tpu.utils import video_io

    rng = np.random.default_rng(31)
    in_path = str(tmp_path / "in.mp4")
    w = cv2.VideoWriter(in_path, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                        (20, 24))
    for _ in range(12):
        w.write((rng.uniform(0, 1, (24, 20, 3)) * 255).astype(np.uint8))
    w.release()

    out_path = str(tmp_path / "out.mp4")
    base = ["inference_cli.py", in_path, "--output", out_path,
            "--model_dir", str(tiny_checkpoints),
            "--dit_model", "tiny_3b_fp32.safetensors",
            "--vae_model", "tiny_vae_fp32.safetensors",
            "--resolution", "32", "--color_correction", "none",
            "--batch_size", "5", "--num_hosts", "2",
            "--temporal_overlap", "2"]
    for idx in ("0", "1"):
        monkeypatch.setattr(sys, "argv", base + ["--host_index", idx])
        inference_cli.main()
        assert (tmp_path / f"out.part{idx}.npy").exists()
    seg0 = np.load(tmp_path / "out.part0.npy")
    seg1 = np.load(tmp_path / "out.part1.npy")
    assert seg0.shape[0] == 8 and seg1.shape[0] == 6  # 6+2 overlap, 6

    monkeypatch.setattr(sys, "argv", base + ["--join_parts"])
    inference_cli.main()
    reader = video_io.VideoReader(out_path)
    assert reader.total == 12
    frames = reader.read_frames(12)
    reader.close()
    assert frames.shape[0] == 12 and np.isfinite(frames).all()
