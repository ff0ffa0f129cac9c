"""Parity harness tests: embedding converter, PSNR scoring, CLI
--parity_check / --convert_embeddings (BASELINE config #1 machinery,
reference embeds consumed at src/core/generation_utils.py:512-553)."""

import json
import os
import sys

import numpy as np
import pytest
import torch

from seedvr2_tpu.utils import parity

from .test_integration_cli import tiny_checkpoints  # noqa: F401 (fixture)


def test_psnr_basics():
    a = np.zeros((4, 4, 3), np.float32)
    assert parity.psnr(a, a) == float("inf")
    b = a + 0.1
    assert parity.psnr(a, b) == pytest.approx(20.0, abs=1e-6)  # mse=0.01


def test_convert_embedding_file(tmp_path):
    t = torch.randn(1, 7, 16)  # reference saves (1, L, D)
    src = tmp_path / "pos_emb.pt"
    torch.save(t, src)
    dst = tmp_path / "pos_emb.npy"
    arr = parity.convert_embedding_file(str(src), str(dst))
    assert arr.shape == (7, 16)
    np.testing.assert_allclose(np.load(dst), t[0].numpy(), rtol=1e-6)

    dst2 = tmp_path / "pos_emb.safetensors"
    parity.convert_embedding_file(str(src), str(dst2))
    from seedvr2_tpu.utils.text_embeds import _load_one

    np.testing.assert_allclose(_load_one(str(dst2)), t[0].numpy(), rtol=1e-6)


def test_cli_convert_embeddings(tmp_path, monkeypatch):
    import inference_cli

    src = tmp_path / "src"
    dst = tmp_path / "dst"
    src.mkdir()
    torch.save(torch.randn(1, 5, 8), src / "pos_emb.pt")
    torch.save(torch.randn(1, 6, 8), src / "neg_emb.pt")
    monkeypatch.setattr(sys, "argv", [
        "inference_cli.py", "--convert_embeddings", str(src), str(dst)])
    inference_cli.main()
    assert (dst / "pos_emb.npy").exists() and (dst / "neg_emb.npy").exists()
    assert np.load(dst / "pos_emb.npy").shape == (5, 8)


def test_cli_parity_check_roundtrip(tiny_checkpoints, tmp_path,  # noqa: F811
                                    monkeypatch, capsys):
    """Run the CLI once, capture its output as the 'reference', run again
    with --parity_check: PSNR must be near-lossless (same pipeline, PNG
    8-bit quantization is the only difference)."""
    import inference_cli
    from seedvr2_tpu.utils import video_io

    rng = np.random.default_rng(21)
    img = (rng.uniform(0, 1, (24, 20, 3)) * 255).astype(np.uint8)
    in_path = tmp_path / "in.png"
    try:
        import cv2

        cv2.imwrite(str(in_path), img[:, :, ::-1])
    except ImportError:
        from PIL import Image

        Image.fromarray(img).save(str(in_path))

    base_argv = ["inference_cli.py", str(in_path),
                 "--model_dir", str(tiny_checkpoints),
                 "--dit_model", "tiny_3b_fp32.safetensors",
                 "--vae_model", "tiny_vae_fp32.safetensors",
                 "--resolution", "32", "--color_correction", "none",
                 "--batch_size", "1"]

    out1 = tmp_path / "first.png"
    monkeypatch.setattr(sys, "argv", base_argv + ["--output", str(out1)])
    inference_cli.main()
    capture = tmp_path / "capture.npy"
    np.save(capture, video_io.read_image(str(out1)))

    out2 = tmp_path / "second.png"
    monkeypatch.setattr(sys, "argv", base_argv + [
        "--output", str(out2), "--parity_check",
        "--parity_ref", str(capture), "--parity_min_psnr", "40"])
    capsys.readouterr()
    inference_cli.main()  # must not sys.exit(1)
    lines = [ln for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("{")]
    report = json.loads(lines[-1])
    assert report["parity"] == "ok" and report["passed"] is True
    assert report["psnr_db"] == "inf" or report["psnr_db"] > 40


def test_compare_shape_mismatch(tmp_path):
    cap = tmp_path / "c.npy"
    np.save(cap, np.zeros((1, 4, 4, 3), np.float32))
    rep = parity.compare_to_capture(np.zeros((1, 8, 8, 3), np.float32),
                                    str(cap))
    assert rep["parity"] == "shape_mismatch"
