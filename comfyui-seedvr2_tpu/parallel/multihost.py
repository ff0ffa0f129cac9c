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
    path = part_path(output, host_index)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.save(path, frames.astype(np.float32))
    return path


def join_segments(output: str, n_hosts: int, overlap: int) -> np.ndarray:
    """Load every host's segment, Hann-blend the overlapped seams, return
    the assembled (T, H, W, C) video (reference :1168-1204)."""
    from ..core.pipeline import blend_overlapping_frames

    parts = []
    for i in range(n_hosts):
        path = part_path(output, i)
        if not os.path.isfile(path):
            raise FileNotFoundError(
                f"missing segment {path} (host {i} not finished?)")
        parts.append(np.load(path))

    out = parts[0]
    for nxt in parts[1:]:
        ov = min(overlap, out.shape[0], nxt.shape[0])
        if ov > 0:
            blended = blend_overlapping_frames(out[-ov:, :, :, :3],
                                               nxt[:ov, :, :, :3], ov)
            head = nxt[:ov].copy()
            head[:, :, :, :3] = blended
            out = np.concatenate([out[:-ov], head, nxt[ov:]], axis=0)
        else:
            out = np.concatenate([out, nxt], axis=0)
    return out


def default_host_index() -> int:
    """jax.process_index() when jax.distributed is initialized, else 0."""
    try:
        import jax

        return jax.process_index()
    except Exception:  # pragma: no cover
        return 0
