"""Packaged published text embeddings (VERDICT r4 item 4).

The reference requires the user to drop pos_emb.pt/neg_emb.pt next to the
weights (src/core/generation_utils.py:512-553); this package ships bit-exact
bf16 safetensors conversions under assets/ so a default published-model run
always gets real conditioning, and refuses to run unconditioned otherwise.
"""

import os

import numpy as np
import pytest

from seedvr2_tpu.utils import text_embeds as te


def test_packaged_assets_exist_with_published_shapes():
    for kind, rows in (("pos", te.POS_LEN), ("neg", te.NEG_LEN)):
        p = os.path.join(te.ASSETS_DIR, f"{kind}_emb.safetensors")
        assert os.path.isfile(p), f"missing packaged asset {p}"
        emb = te._load_one(p)
        assert emb.shape == (rows, te.TXT_DIM)
        assert emb.dtype == np.float32  # loader upcasts bf16 -> fp32
        # Real conditioning, not zeros/garbage: published embeddings are
        # unit-scale activations.
        assert 0.01 < float(np.abs(emb).mean()) < 10.0
        assert np.isfinite(emb).all()


def test_packaged_assets_are_bf16_bitexact_storage():
    from safetensors.torch import load_file
    import torch

    d = load_file(os.path.join(te.ASSETS_DIR, "pos_emb.safetensors"))
    t = next(iter(d.values()))
    assert t.dtype == torch.bfloat16
    assert tuple(t.shape) == (te.POS_LEN, te.TXT_DIM)


def test_default_load_serves_packaged_assets(tmp_path):
    out = te.load_text_embeddings([str(tmp_path)])
    assert out["pos"].shape == (te.POS_LEN, te.TXT_DIM)
    assert out["neg"].shape == (te.NEG_LEN, te.TXT_DIM)
    assert float(np.abs(out["pos"]).mean()) > 0.01  # real, not zeros


def test_user_dir_wins_over_packaged(tmp_path):
    mine = np.full((3, te.TXT_DIM), 7.0, np.float32)
    np.save(tmp_path / "pos_emb.npy", mine)
    out = te.load_text_embeddings([str(tmp_path)])
    np.testing.assert_array_equal(out["pos"], mine)
    # neg still falls through to the packaged asset
    assert out["neg"].shape == (te.NEG_LEN, te.TXT_DIM)


def test_published_width_without_embeddings_is_a_hard_error(
        tmp_path, monkeypatch):
    monkeypatch.setattr(te, "ASSETS_DIR", str(tmp_path / "nope"))
    with pytest.raises(FileNotFoundError, match="allow_zero_embeddings"):
        te.load_text_embeddings([str(tmp_path)])
    out = te.load_text_embeddings([str(tmp_path)], allow_zero=True)
    assert not out["pos"].any()


def test_custom_width_model_skips_packaged_and_zero_falls_back(tmp_path):
    # Config-sniffed tiny checkpoints (txt_in_dim != 5120): the packaged
    # 5120-wide assets must be skipped, zeros warn instead of raising.
    out = te.load_text_embeddings([str(tmp_path)], txt_dim=8)
    assert out["pos"].shape == (te.POS_LEN, 8)
    assert not out["pos"].any()


def test_user_file_with_wrong_width_still_raises(tmp_path):
    np.save(tmp_path / "pos_emb.npy", np.zeros((3, 16), np.float32))
    with pytest.raises(ValueError, match="txt_in_dim"):
        te.load_text_embeddings([str(tmp_path)], txt_dim=8)
