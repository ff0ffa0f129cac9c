"""Published-checkpoint load contracts, exercised on fixtures that replicate
the real files' exact key layouts (VERDICT r4 item 5).

The 11 published checkpoints (reference src/utils/model_registry.py:34-57)
arrive in three layouts our loader must honor without the real multi-GB
files present:

  1. GGUF with every tensor prefixed `model.diffusion_model.` and >2D
     tensors flattened to <=4 gguf dims with the true torch shape recorded
     as `comfy.gguf.orig_shape.<name>` metadata — the contract the
     reference implements in _load_gguf_state / _get_tensor_logical_shape
     (src/core/model_loader.py:160-241).
  2. Mixed-dtype safetensors (`seedvr2_ema_7b_fp8_e4m3fn_mixed_block35_fp16`):
     most tensors fp8_e4m3fn, a few blocks fp16 — per-tensor dtypes, no
     sidecar metadata.
  3. `model.`-prefixed VAE safetensors (handled by load_vae_checkpoint's
     key fixups).
"""

import struct

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from seedvr2_tpu.ops import gguf as g
from seedvr2_tpu.ops.gguf import load_gguf_state_dict, read_gguf

# ------------------------------------------------------------- GGUF writer

_KV_STR, _KV_ARR, _KV_I32, _KV_U32 = 8, 9, 5, 4


def _w_str(f, s: str):
    b = s.encode()
    f.write(struct.pack("<Q", len(b)) + b)


def _write_gguf(path, tensors, orig_shapes=None, alignment=32):
    """tensors: list of (name, gguf_dims innermost-first, ttype, raw bytes).
    orig_shapes: {name: torch_shape tuple} -> comfy.gguf.orig_shape metadata
    (ARRAY of INT32, torch order — the layout the reference decodes at
    model_loader.py:232-241)."""
    orig_shapes = orig_shapes or {}
    kvs = [("general.alignment", _KV_U32, alignment)]
    for name, shape in orig_shapes.items():
        kvs.append((f"comfy.gguf.orig_shape.{name}", _KV_ARR, shape))
    with open(path, "wb") as f:
        f.write(b"GGUF")
        f.write(struct.pack("<I", 3))
        f.write(struct.pack("<Q", len(tensors)))
        f.write(struct.pack("<Q", len(kvs)))
        for key, vtype, val in kvs:
            _w_str(f, key)
            f.write(struct.pack("<I", vtype))
            if vtype == _KV_U32:
                f.write(struct.pack("<I", val))
            else:  # array of int32
                f.write(struct.pack("<I", _KV_I32))
                f.write(struct.pack("<Q", len(val)))
                for v in val:
                    f.write(struct.pack("<i", v))
        offset = 0
        for name, dims, ttype, raw in tensors:
            _w_str(f, name)
            f.write(struct.pack("<I", len(dims)))
            f.write(struct.pack(f"<{len(dims)}Q", *dims))
            f.write(struct.pack("<I", ttype))
            f.write(struct.pack("<Q", offset))
            offset += len(raw)
            offset += (alignment - offset % alignment) % alignment
        pos = f.tell()
        f.write(b"\0" * ((alignment - pos % alignment) % alignment))
        for _, _, _, raw in tensors:
            f.write(raw)
            f.write(b"\0" * ((alignment - len(raw) % alignment) % alignment))


def _q8_0_bytes(w: np.ndarray):
    """Quantize a 2D float (out, in) tensor to Q8_0 raw block bytes."""
    out_d, in_d = w.shape
    assert in_d % 32 == 0
    gq = w.reshape(out_d * in_d // 32, 32).astype(np.float32)
    scales = np.abs(gq).max(axis=1) / 127.0
    inv = np.where(scales > 0, 1.0 / np.where(scales == 0, 1, scales), 0.0)
    q = np.clip(np.round(gq * inv[:, None]), -127, 127).astype(np.int8)
    blocks = np.empty((gq.shape[0], 34), np.uint8)
    scales16 = scales.astype(np.float16)  # stored (and served) as fp16
    blocks[:, :2] = scales16[:, None].view(np.uint8)
    blocks[:, 2:] = q.view(np.uint8)
    deq = (scales16.astype(np.float32)[:, None] * q).reshape(out_d, in_d)
    return blocks.tobytes(), deq


# ------------------------------------------------------ GGUF layout tests


def test_gguf_model_diffusion_model_prefix_stripped(tmp_path):
    w = np.arange(8, dtype=np.float32).reshape(2, 4)
    raw = w.astype(np.float16).tobytes()
    p = str(tmp_path / "prefixed.gguf")
    _write_gguf(p, [
        ("model.diffusion_model.blocks.0.attn.proj_out.vid.weight",
         (4, 2), g.F16, raw),
        ("first_stage_model.decoder.junk", (4, 2), g.F16, raw),
    ])
    state = load_gguf_state_dict(p)
    assert set(state) == {"blocks.0.attn.proj_out.vid.weight"}
    np.testing.assert_allclose(
        state["blocks.0.attn.proj_out.vid.weight"], w)


def test_gguf_unprefixed_checkpoint_loads_as_is(tmp_path):
    w = np.ones((2, 4), np.float32)
    p = str(tmp_path / "plain.gguf")
    _write_gguf(p, [("vid_in.proj.weight", (4, 2), g.F16,
                     w.astype(np.float16).tobytes())])
    state = load_gguf_state_dict(p)
    assert set(state) == {"vid_in.proj.weight"}


def test_gguf_orig_shape_recovers_5d_conv(tmp_path):
    """A flattened-to-2D F16 tensor with comfy.gguf.orig_shape metadata
    comes back in its true 5D torch shape."""
    rng = np.random.default_rng(3)
    w5 = rng.standard_normal((4, 3, 1, 2, 2)).astype(np.float32)
    flat = w5.reshape(4, 12)  # writer flattens trailing dims
    p = str(tmp_path / "conv.gguf")
    name = "model.diffusion_model.vid_in.proj.weight"
    _write_gguf(p, [(name, (12, 4), g.F16,
                     flat.astype(np.float16).tobytes())],
                orig_shapes={name: w5.shape})
    state = load_gguf_state_dict(p)
    got = state["vid_in.proj.weight"]
    assert got.shape == w5.shape
    np.testing.assert_allclose(got, w5.astype(np.float16).astype(np.float32))


def test_gguf_orig_shape_mismatch_raises(tmp_path):
    p = str(tmp_path / "bad.gguf")
    name = "model.diffusion_model.w"
    _write_gguf(p, [(name, (4, 2), g.F16, np.zeros(8, np.float16).tobytes())],
                orig_shapes={name: (3, 3)})
    with pytest.raises(ValueError, match="orig_shape"):
        load_gguf_state_dict(p)


def test_gguf_q8_keep_with_2d_orig_shape_serves_quantized(tmp_path):
    rng = np.random.default_rng(5)
    w = rng.standard_normal((8, 64)).astype(np.float32)
    raw, deq = _q8_0_bytes(w)
    name = "model.diffusion_model.blocks.0.mlp.vid.proj_in.weight"
    p = str(tmp_path / "q8.gguf")
    _write_gguf(p, [(name, (64, 8), g.Q8_0, raw)],
                orig_shapes={name: (8, 64)})
    state = load_gguf_state_dict(p, keep_q8=True)
    node = state["blocks.0.mlp.vid.proj_in.weight"]
    assert set(node) == {"q8", "scales"}
    assert node["q8"].shape == (64, 8)          # (in, out) kernel layout
    assert node["scales"].shape == (2, 8)       # (in/32, out)
    recon = (node["q8"].astype(np.float32)
             * np.repeat(node["scales"], 32, axis=0))
    np.testing.assert_allclose(recon, deq.T, rtol=1e-6)


def test_gguf_q8_with_non2d_orig_shape_dequantizes_dense(tmp_path):
    """A quantized tensor whose LOGICAL shape is 5D cannot serve through the
    2D fused kernel: it must come back dense in its true shape."""
    rng = np.random.default_rng(6)
    w5 = rng.standard_normal((4, 2, 1, 2, 4)).astype(np.float32)
    raw, deq = _q8_0_bytes(w5.reshape(2, 32))
    name = "model.diffusion_model.some.conv.weight"
    p = str(tmp_path / "q8conv.gguf")
    _write_gguf(p, [(name, (32, 2), g.Q8_0, raw)],
                orig_shapes={name: w5.shape})
    state = load_gguf_state_dict(p, keep_q8=True)
    got = state["some.conv.weight"]
    assert isinstance(got, np.ndarray) and got.shape == w5.shape
    np.testing.assert_allclose(got, deq.reshape(w5.shape), rtol=1e-6)


def test_read_gguf_keeps_raw_names_and_meta(tmp_path):
    """read_gguf itself is layout-agnostic (raw names, metadata exposed);
    the prefix contract lives in load_gguf_state_dict only."""
    name = "model.diffusion_model.x"
    p = str(tmp_path / "raw.gguf")
    _write_gguf(p, [(name, (4,), g.F32,
                     np.arange(4, np.float32).tobytes() if False else
                     np.arange(4, dtype=np.float32).tobytes())])
    tensors, qtypes, meta = read_gguf(p)
    assert name in tensors and qtypes[name] == g.F32
    assert meta["general.alignment"] == 32


# ------------------------------------------- mixed fp8/fp16 safetensors


def test_mixed_fp8_fp16_dit_checkpoint_loads_and_sniffs(tmp_path):
    """Replicates seedvr2_ema_7b_fp8_e4m3fn_mixed_block35_fp16's layout:
    per-tensor dtypes, most weights fp8_e4m3fn, the last block (and norm-ish
    tensors) fp16. The loader must upcast fp8 per tensor and sniff the
    architecture off the mixed file."""
    import torch
    from safetensors.torch import save_file

    from seedvr2_tpu.core.export import to_torch_state_dict
    from seedvr2_tpu.core.model_manager import load_dit_checkpoint
    from seedvr2_tpu.models.dit.nadit import init_dit_params

    from .test_integration_cli import _tiny_dit_cfg

    cfg = _tiny_dit_cfg("dit_7b")
    params = init_dit_params(jax.random.PRNGKey(2), cfg, dtype=jnp.float32)
    state = to_torch_state_dict(params, dtype=np.float32)
    last = f"blocks.{cfg.num_layers - 1}."
    mixed = {}
    for k, v in state.items():
        t = torch.from_numpy(np.asarray(v))
        if k.startswith(last) or v.ndim < 2:
            mixed[k] = t.to(torch.float16)
        else:
            mixed[k] = t.to(torch.float8_e4m3fn)
    p = str(tmp_path / "tiny_7b_fp8_mixed.safetensors")
    save_file(mixed, p)

    loaded, sniffed = load_dit_checkpoint(p, dtype=jnp.float32)
    for f in ("vid_dim", "heads", "head_dim", "num_layers", "mlp_type",
              "txt_in_dim"):
        assert getattr(sniffed, f) == getattr(cfg, f), f
    # fp8 tensors upcast with fp8 rounding; fp16 block is fp16-exact
    w_last = np.asarray(loaded["blocks"][cfg.num_layers - 1]
                        ["attn"]["proj_qkv"]["vid"]["w"])
    ref_last = np.asarray(params["blocks"][cfg.num_layers - 1]
                          ["attn"]["proj_qkv"]["vid"]["w"])
    np.testing.assert_allclose(w_last, ref_last.astype(np.float16), atol=0)
    w0 = np.asarray(loaded["blocks"][0]["attn"]["proj_qkv"]["vid"]["w"])
    ref0 = np.asarray(params["blocks"][0]["attn"]["proj_qkv"]["vid"]["w"])
    fp8_ref = torch.from_numpy(ref0).to(torch.float8_e4m3fn).float().numpy()
    np.testing.assert_allclose(w0, fp8_ref, atol=0)


# ------------------------------------------------ model.-prefixed VAE


def test_model_prefixed_vae_safetensors(tmp_path):
    from safetensors.numpy import save_file

    from seedvr2_tpu.core.export import to_torch_state_dict
    from seedvr2_tpu.core.model_manager import load_vae_checkpoint
    from seedvr2_tpu.models.vae.pipeline_vae import init_vae_params

    from .test_integration_cli import _tiny_vae_cfg

    cfg = _tiny_vae_cfg()
    params = init_vae_params(jax.random.PRNGKey(4), cfg, dtype=jnp.float32)
    state = to_torch_state_dict(params, dtype=np.float32)
    prefixed = {f"model.{k}": v for k, v in state.items()}
    p = str(tmp_path / "vae_prefixed.safetensors")
    save_file(prefixed, p)
    loaded, sniffed = load_vae_checkpoint(p, jnp.float32)
    assert sniffed.block_out_channels == cfg.block_out_channels
    ref_leaves = jax.tree.leaves(params)
    got_leaves = jax.tree.leaves(loaded)
    assert len(ref_leaves) == len(got_leaves)
    for a, b in zip(ref_leaves, got_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
