#!/usr/bin/env python
"""Example: long-video streaming upscale (bounded memory) — the CLI does the
same thing; this shows the pieces (reference: SeedVR2_HD_video_upscale
workflow + inference_cli.py chunked streaming)."""

import subprocess
import sys

CMD = [
    sys.executable, "../inference_cli.py", "INPUT.mp4",
    "--resolution", "1080",
    "--batch_size", "21",           # largest 4n+1 <= typical shot length
    "--chunk_size", "125",          # frames held in host RAM at once
    "--temporal_overlap", "4",      # Hann-blended seams between batches/chunks
    "--color_correction", "lab",
    "--vae_decode_tiled",           # bound HBM at high output resolutions
    "--vae_decode_tile_size", "1024",
    "--cache_dit", "--cache_vae",   # keep weights + compiled fns across chunks
]

if __name__ == "__main__":
    print("example command:\n ", " ".join(CMD))
