"""Host-side video/image I/O (OpenCV), feeding the TPU pipeline.

Mirrors the reference CLI's I/O behavior (inference_cli.py:356-754): BGR->RGB
float32 [0,1] THWC frames, streaming reads with skip/cap, incremental MP4
writes, PNG round-trip with alpha."""

import os
from typing import List, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

VIDEO_EXTS = {".mp4", ".avi", ".mov", ".mkv", ".webm", ".m4v"}
IMAGE_EXTS = {".png", ".jpg", ".jpeg", ".bmp", ".webp", ".tiff"}


def detect_input_type(path: str) -> str:
    if os.path.isdir(path):
        return "directory"
    ext = os.path.splitext(path)[1].lower()
    if ext in VIDEO_EXTS:
        return "video"
    if ext in IMAGE_EXTS:
        return "image"
    raise ValueError(f"unsupported input: {path}")


def read_image(path: str) -> np.ndarray:
    """-> (1, H, W, C) float32 [0,1], C=3 or 4 (alpha preserved)."""
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise IOError(f"cannot read image: {path}")
    if img.ndim == 2:
        img = cv2.cvtColor(img, cv2.COLOR_GRAY2RGB)
    elif img.shape[2] == 4:
        img = cv2.cvtColor(img, cv2.COLOR_BGRA2RGBA)
    else:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    return (img.astype(np.float32) / 255.0)[None]


def write_image(path: str, frame: np.ndarray):
    """frame: (H, W, C) float32 [0,1]."""
    img = np.clip(frame * 255.0, 0, 255).astype(np.uint8)
    if img.shape[2] == 4:
        img = cv2.cvtColor(img, cv2.COLOR_RGBA2BGRA)
    else:
        img = cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if not cv2.imwrite(path, img):
        raise IOError(f"cannot write image: {path}")


class VideoReader:
    def __init__(self, path: str, skip_first_frames: int = 0,
                 load_cap: int = 0):
        self.cap = cv2.VideoCapture(path)
        if not self.cap.isOpened():
            raise IOError(f"cannot open video: {path}")
        self.fps = self.cap.get(cv2.CAP_PROP_FPS) or 30.0
        self.total = int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT))
        self.width = int(self.cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        self.height = int(self.cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        if skip_first_frames:
            self.cap.set(cv2.CAP_PROP_POS_FRAMES, skip_first_frames)
        self.remaining = self.total - skip_first_frames
        if load_cap > 0:
            self.remaining = min(self.remaining, load_cap)

    def read_frames(self, count: int) -> np.ndarray:
        frames: List[np.ndarray] = []
        while len(frames) < count and self.remaining > 0:
            ok, frame = self.cap.read()
            if not ok:
                break
            frames.append(frame)  # BGR uint8
            self.remaining -= 1
        if not frames:
            return np.zeros((0, self.height, self.width, 3), np.float32)
        from ..ops.native import frames_to_float

        return frames_to_float(np.stack(frames), swap_rb=True)

    def close(self):
        self.cap.release()


class VideoWriter:
    def __init__(self, path: str, fps: float, size_hw: Tuple[int, int]):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        h, w = size_hw
        fourcc = cv2.VideoWriter_fourcc(*"mp4v")
        self.writer = cv2.VideoWriter(path, fourcc, fps, (w, h))
        if not self.writer.isOpened():
            raise IOError(f"cannot open video writer: {path}")

    def write_frames(self, frames: np.ndarray):
        """frames: (T, H, W, 3) float32 [0,1]."""
        from ..ops.native import frames_to_uint8

        for frame in frames:
            self.writer.write(frames_to_uint8(frame[..., :3], swap_rb=True))

    def close(self):
        self.writer.release()


def read_directory(path: str) -> np.ndarray:
    files = sorted(
        f for f in os.listdir(path)
        if os.path.splitext(f)[1].lower() in IMAGE_EXTS)
    if not files:
        raise IOError(f"no images in directory: {path}")
    frames = [read_image(os.path.join(path, f))[0] for f in files]
    c = min(f.shape[-1] for f in frames)
    return np.stack([f[..., :c] for f in frames])
