"""GGUF block-dequantizer parity vs the reference (torch) implementations.

The reference gates its dequantizers behind the `gguf` pip package; we inject
a minimal stand-in (enum ids + block sizes) to activate them, then compare on
random blocks with well-formed fp16 scale fields.
"""

import sys
import types

import numpy as np
import pytest
import torch

from seedvr2_tpu.ops import gguf as my

from .oracle_ref import load_reference_src


def _install_gguf_stub():
    if "gguf" in sys.modules:
        return sys.modules["gguf"]
    mod = types.ModuleType("gguf")

    class GGMLQuantizationType:
        F32, F16 = 0, 1
        Q4_0, Q4_1, Q5_0, Q5_1, Q8_0, Q8_1 = 2, 3, 6, 7, 8, 9
        Q2_K, Q3_K, Q4_K, Q5_K, Q6_K, Q8_K = 10, 11, 12, 13, 14, 15
        BF16 = 30

    mod.GGMLQuantizationType = GGMLQuantizationType
    mod.GGML_QUANT_SIZES = {
        t: (elems, size) for t, (size, elems) in my.BLOCK_SIZES.items()
    }
    sys.modules["gguf"] = mod
    return mod


@pytest.fixture(scope="module")
def ref_dequant():
    _install_gguf_stub()
    load_reference_src()
    import importlib

    # force re-import with the stub present
    for name in list(sys.modules):
        if name.endswith("gguf_dequant") or name.endswith("compatibility"):
            del sys.modules[name]
    mod = importlib.import_module("refsrc.optimization.gguf_dequant")
    assert mod.dequantize_functions, "gguf stub did not activate reference"
    return mod


# offsets of fp16 scale fields per type: list of byte offsets
_F16_FIELDS = {
    my.Q8_0: [0], my.Q4_0: [0], my.Q4_1: [0, 2], my.Q5_0: [0],
    my.Q5_1: [0, 2], my.Q4_K: [0, 2], my.Q5_K: [0, 2],
    my.Q6_K: [208], my.Q2_K: [80, 82], my.Q3_K: [108],
}


def _make_blocks(qtype, n_blocks=8, seed=0):
    size, _ = my.BLOCK_SIZES[qtype]
    rng = np.random.default_rng(seed)
    blocks = rng.integers(0, 256, (n_blocks, size), dtype=np.uint8)
    d = (rng.uniform(-2, 2, (n_blocks, len(_F16_FIELDS[qtype])))
         .astype(np.float16))
    for i, off in enumerate(_F16_FIELDS[qtype]):
        blocks[:, off:off + 2] = d[:, i:i + 1].view(np.uint8)
    return blocks


@pytest.mark.parametrize("qtype", [my.Q8_0, my.Q4_0, my.Q4_1, my.Q5_0,
                                   my.Q5_1, my.Q2_K, my.Q3_K, my.Q4_K,
                                   my.Q5_K, my.Q6_K])
def test_dequant_matches_reference(ref_dequant, qtype):
    import gguf as gguf_stub

    blocks = _make_blocks(qtype)
    n_blocks, size = blocks.shape
    _, elems = my.BLOCK_SIZES[qtype]

    mine = my.dequantize(blocks.reshape(-1), qtype, n_blocks * elems)

    fn = ref_dequant.dequantize_functions[qtype]
    ref = fn(torch.from_numpy(blocks), elems, size,
             dtype=torch.float32).float().numpy().reshape(-1)

    np.testing.assert_allclose(mine, ref, rtol=1e-5, atol=1e-6)


def test_gguf_container_roundtrip(tmp_path):
    """Write a minimal GGUF file and parse it back."""
    import struct

    name = b"blocks.0.attn.w"
    data = np.arange(64, dtype=np.float32)
    dims = (8, 8)  # gguf order (innermost first)
    path = tmp_path / "tiny.gguf"
    with open(path, "wb") as f:
        f.write(b"GGUF")
        f.write(struct.pack("<I", 3))
        f.write(struct.pack("<Q", 1))  # tensors
        f.write(struct.pack("<Q", 1))  # kv
        key = b"general.alignment"
        f.write(struct.pack("<Q", len(key)) + key)
        f.write(struct.pack("<I", 4))  # uint32
        f.write(struct.pack("<I", 32))
        f.write(struct.pack("<Q", len(name)) + name)
        f.write(struct.pack("<I", 2))
        f.write(struct.pack("<QQ", *dims))
        f.write(struct.pack("<I", my.F32))
        f.write(struct.pack("<Q", 0))
        pos = f.tell()
        f.write(b"\0" * ((32 - pos % 32) % 32))
        f.write(data.tobytes())

    tensors, qtypes, meta = my.read_gguf(str(path))
    assert qtypes[name.decode()] == my.F32
    np.testing.assert_array_equal(tensors[name.decode()],
                                  data.reshape(8, 8))


def test_native_dequant_matches_numpy():
    """Native C++ dequant (if built) must match the numpy implementations."""
    from seedvr2_tpu.ops import native

    if not native.available():
        pytest.skip("native library not built")
    for qtype in (my.Q8_0, my.Q4_K, my.Q6_K):
        blocks = _make_blocks(qtype, n_blocks=16, seed=qtype)
        nat = native.native_dequantize(blocks, qtype)
        ref = my._DEQUANT[qtype](blocks)
        np.testing.assert_allclose(nat, ref, rtol=0, atol=0)


def test_keep_q8_requantizes_k_quant_formats(tmp_path):
    """Q4_K large linears requantize to the Q8_0 serving layout under
    keep_q8, so Q4_K_M checkpoints serve through the fused dequant-matmul
    kernel instead of expanding to bf16 (the reference's minimum-VRAM tier,
    README.md:293). Verified on a synthetic GGUF file end-to-end."""
    import struct

    import numpy as np

    from seedvr2_tpu.ops import gguf as g
    from seedvr2_tpu.ops.quant_matmul import dequantize_q8

    K, N = 1024, 1280  # gguf dims innermost-first -> torch (N, K)
    n_elem = K * N
    blocks = _make_blocks(my.Q4_K, n_blocks=n_elem // 256, seed=3)
    name = b"blocks.0.attn.w"
    path = tmp_path / "q4k.gguf"
    with open(path, "wb") as f:
        f.write(b"GGUF")
        f.write(struct.pack("<I", 3))
        f.write(struct.pack("<Q", 1))  # tensors
        f.write(struct.pack("<Q", 1))  # kv
        key = b"general.alignment"
        f.write(struct.pack("<Q", len(key)) + key)
        f.write(struct.pack("<I", 4))
        f.write(struct.pack("<I", 32))
        f.write(struct.pack("<Q", len(name)) + name)
        f.write(struct.pack("<I", 2))
        f.write(struct.pack("<QQ", K, N))
        f.write(struct.pack("<I", my.Q4_K))
        f.write(struct.pack("<Q", 0))
        pos = f.tell()
        f.write(b"\0" * ((32 - pos % 32) % 32))
        f.write(blocks.tobytes())

    full = g.read_gguf(str(path))[0][name.decode()]          # float dequant
    kept = g.read_gguf(str(path), keep_q8=True)[0][name.decode()]
    assert set(kept) == {"q8", "scales"}
    assert kept["q8"].shape == (K, N) and kept["q8"].dtype == np.int8
    assert kept["scales"].shape == (K // 32, N)
    back = np.asarray(dequantize_q8(kept["q8"], kept["scales"])).T  # (N, K)
    denom = np.abs(full).mean() + 1e-9
    assert np.abs(back - full).mean() / denom < 0.02


def _write_gguf_2d(path, name: bytes, K: int, N: int, qtype, payload: bytes):
    import struct

    with open(path, "wb") as f:
        f.write(b"GGUF")
        f.write(struct.pack("<I", 3))
        f.write(struct.pack("<Q", 1))  # tensors
        f.write(struct.pack("<Q", 1))  # kv
        key = b"general.alignment"
        f.write(struct.pack("<Q", len(key)) + key)
        f.write(struct.pack("<I", 4))
        f.write(struct.pack("<I", 32))
        f.write(struct.pack("<Q", len(name)) + name)
        f.write(struct.pack("<I", 2))
        f.write(struct.pack("<QQ", K, N))
        f.write(struct.pack("<I", qtype))
        f.write(struct.pack("<Q", 0))
        pos = f.tell()
        f.write(b"\0" * ((32 - pos % 32) % 32))
        f.write(payload)


@pytest.mark.parametrize("qtype", ["Q4_K", "Q5_K"])
def test_native_kquant_affine_layout_bit_exact(tmp_path, qtype):
    """native_kquants=True keeps Q4_K/Q5_K as {"qa","s","m"}; the affine
    reconstruction s*q - m must reproduce the full dequant BIT-EXACTLY
    (zero requantization error, unlike the keep_q8 fallback)."""
    from seedvr2_tpu.ops import gguf as g

    qt = getattr(my, qtype)
    K, N = 1024, 1280
    blocks = _make_blocks(qt, n_blocks=K * N // 256, seed=11)
    name = b"blocks.0.attn.w"
    path = tmp_path / "kq.gguf"
    _write_gguf_2d(path, name, K, N, qt, blocks.tobytes())

    full = g.read_gguf(str(path))[0][name.decode()]  # (N, K) float dequant
    kept = g.read_gguf(str(path), keep_q8=True,
                       native_kquants=True)[0][name.decode()]
    assert set(kept) == {"qa", "s", "m"}
    assert kept["qa"].shape == (K, N) and kept["qa"].dtype == np.int8
    assert kept["s"].shape == (K // 32, N) and kept["m"].shape == (K // 32, N)
    qa = kept["qa"].T.reshape(N, K // 32, 32).astype(np.float32)
    recon = (qa * kept["s"].T[:, :, None]
             - kept["m"].T[:, :, None]).reshape(N, K)
    np.testing.assert_array_equal(recon, full)
