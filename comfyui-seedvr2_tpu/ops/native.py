"""ctypes bindings for the native host library (native/seedvr2_native.cpp).

Auto-builds with g++ on first import; every entry point has a numpy fallback
so the framework runs without a toolchain."""

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        build_py = os.path.join(root, "native", "build.py")
        import importlib.util

        spec = importlib.util.spec_from_file_location("_seedvr2_native_build",
                                                      build_py)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        path = mod.build()
        lib = ctypes.CDLL(path)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        for name, args in [
            ("dequant_q8_0", [u8p, ctypes.c_int64, f32p]),
            ("dequant_q4_k", [u8p, ctypes.c_int64, f32p]),
            ("dequant_q6_k", [u8p, ctypes.c_int64, f32p]),
            ("frames_u8_to_f32", [u8p, f32p, ctypes.c_int64, ctypes.c_int,
                                  ctypes.c_int]),
            ("frames_f32_to_u8", [f32p, u8p, ctypes.c_int64, ctypes.c_int,
                                  ctypes.c_int]),
        ]:
            fn = getattr(lib, name)
            fn.argtypes = args
            fn.restype = None
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


_NATIVE_DEQUANT = {8: "dequant_q8_0", 12: "dequant_q4_k", 14: "dequant_q6_k"}
_BLOCK = {8: (34, 32), 12: (144, 256), 14: (210, 256)}


def native_dequantize(blocks: np.ndarray, ggml_type: int) -> Optional[np.ndarray]:
    """(n_blocks, block_bytes) uint8 -> (n_blocks, elems) fp32, or None."""
    lib = _load()
    if lib is None or ggml_type not in _NATIVE_DEQUANT:
        return None
    n = blocks.shape[0]
    _, elems = _BLOCK[ggml_type]
    out = np.empty((n, elems), np.float32)
    blocks = np.ascontiguousarray(blocks)
    getattr(lib, _NATIVE_DEQUANT[ggml_type])(
        blocks.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(n),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def frames_to_float(frames_u8: np.ndarray, swap_rb: bool = False) -> np.ndarray:
    """(..., C) uint8 -> float32 [0,1]; native fast path when available."""
    lib = _load()
    c = frames_u8.shape[-1]
    if lib is None:
        out = frames_u8.astype(np.float32) / 255.0
        if swap_rb and c >= 3:
            out = np.concatenate([out[..., 2::-1][..., :3], out[..., 3:]],
                                 axis=-1)
        return out
    frames_u8 = np.ascontiguousarray(frames_u8)
    out = np.empty(frames_u8.shape, np.float32)
    lib.frames_u8_to_f32(
        frames_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(frames_u8.size // c), ctypes.c_int(c),
        ctypes.c_int(1 if swap_rb else 0))
    return out


def frames_to_uint8(frames_f32: np.ndarray, swap_rb: bool = False) -> np.ndarray:
    lib = _load()
    c = frames_f32.shape[-1]
    if lib is None:
        out = np.clip(frames_f32 * 255.0 + 0.5, 0, 255).astype(np.uint8)
        if swap_rb and c >= 3:
            out = np.concatenate([out[..., 2::-1][..., :3], out[..., 3:]],
                                 axis=-1)
        return out
    frames_f32 = np.ascontiguousarray(frames_f32, dtype=np.float32)
    out = np.empty(frames_f32.shape, np.uint8)
    lib.frames_f32_to_u8(
        frames_f32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(frames_f32.size // c), ctypes.c_int(c),
        ctypes.c_int(1 if swap_rb else 0))
    return out
