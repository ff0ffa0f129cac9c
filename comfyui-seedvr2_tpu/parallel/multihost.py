"""Multi-host (DCN) frame-range fan-out for long videos.

The reference fans a video out across GPUs with multiprocessing + shared
memory (inference_cli.py:1048-1214: even frame split, overlap on non-last
workers, Hann blend at the seams). Across TPU HOSTS there is no shared
memory — each host is an independent SPMD program over its own chips — so
the TPU-native equivalent is file-based: every host processes its frame
range (overlap included) into a .npy segment, and a final join pass blends
the seams. Intra-host parallelism stays SPMD (mesh dp / tile waves).

CLI surface:
    # on each host i of n (same command, different --host_index):
    python inference_cli.py in.mp4 --num_hosts n --host_index i ...
    # then once, anywhere with access to the segments:
    python inference_cli.py in.mp4 --num_hosts n --join_parts ...

With jax.distributed initialized, --host_index defaults to
jax.process_index() so the same command line works fleet-wide.
"""

import os
from typing import List, Tuple

import numpy as np


def frame_ranges(total: int, n_hosts: int,
                 overlap: int) -> List[Tuple[int, int]]:
    """Even frame split; every non-last range extends by `overlap` frames
    so the seams can be Hann-blended at join (reference
    inference_cli.py:1076-1097)."""
    assert n_hosts >= 1 and total >= 0
    base, rem = divmod(total, n_hosts)
    ranges = []
    start = 0
    for i in range(n_hosts):
        length = base + (1 if i < rem else 0)
        end = start + length
        ext_end = min(end + overlap, total) if i < n_hosts - 1 else end
        ranges.append((start, ext_end))
        start = end
    return ranges


def part_path(output: str, host_index: int) -> str:
    base, _ = os.path.splitext(output)
    return f"{base}.part{host_index}.npy"


def save_segment(output: str, host_index: int, frames: np.ndarray) -> str:
    """Segments store fp16: output frames are [0, 1] headed for 8-bit video,
    so half precision is visually lossless and halves the bytes a 4K
    segment puts on the shared filesystem (a 5-s 4K segment: ~6 GB fp32 ->
    3 GB fp16)."""
    path = part_path(output, host_index)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.save(path, frames.astype(np.float16))
    return path


def _load_segment(output: str, host_index: int) -> np.ndarray:
    path = part_path(output, host_index)
    if not os.path.isfile(path):
        raise FileNotFoundError(
            f"missing segment {path} (host {host_index} not finished?)")
    return np.load(path).astype(np.float32)


def iter_joined_segments(output: str, n_hosts: int, overlap: int):
    """Yield the assembled video as in-order (Ti, H, W, C) float32 chunks,
    Hann-blending each overlapped seam (reference inference_cli.py:
    1168-1204) while holding AT MOST one segment (+ the carried tail) in
    RAM — the streamed replacement for concatenating all segments (a 2-min
    4K video would need ~70 GB assembled fp32)."""
    from ..core.pipeline import blend_overlapping_frames

    tail = None
    for i in range(n_hosts):
        seg = _load_segment(output, i)
        if tail is not None:
            ov = min(overlap, tail.shape[0], seg.shape[0])
            if ov > 0:
                seg[:ov, :, :, :3] = blend_overlapping_frames(
                    tail[-ov:, :, :, :3], seg[:ov, :, :, :3], ov)
        if i < n_hosts - 1 and overlap > 0 and seg.shape[0] > overlap:
            # the last `overlap` frames reappear as the next segment's
            # head; hold them back so the blended version is emitted once
            yield seg[:-overlap]
            tail = seg[-overlap:]
        else:
            yield seg
            tail = None


def join_segments(output: str, n_hosts: int, overlap: int) -> np.ndarray:
    """Assembled (T, H, W, C) video in one array (tests / small jobs; the
    CLI streams iter_joined_segments straight to the video writer)."""
    return np.concatenate(
        list(iter_joined_segments(output, n_hosts, overlap)), axis=0)


def default_host_index() -> int:
    """jax.process_index() when jax.distributed is initialized, else 0."""
    try:
        import jax

        return jax.process_index()
    except Exception:  # pragma: no cover
        return 0


def distributed_init(coordinator_address: str, num_hosts: int,
                     host_index=None) -> bool:
    """jax.distributed.initialize for a real multi-host pod (replaces the
    reference's torch.distributed init_torch, src/common/distributed/
    basic.py:62-76). Must run before first device use. On TPU pods with no
    explicit host_index, jax infers process_id from the pod metadata.
    Returns True on success; failure is non-fatal (file-based fan-out
    works without a coordinator — segments just need a shared path)."""
    import jax

    kw = dict(coordinator_address=coordinator_address,
              num_processes=num_hosts)
    if host_index is not None:
        kw["process_id"] = int(host_index)
    try:
        jax.distributed.initialize(**kw)
        return True
    except Exception as exc:  # noqa: BLE001
        import warnings

        warnings.warn(f"jax.distributed.initialize failed ({exc}); "
                      "continuing with file-based fan-out only")
        return False
