#!/usr/bin/env python
"""Example: single-image 4x upscale through the node API.

Equivalent to the reference SeedVR2_simple_image_upscale workflow
(example_workflows/ in the reference repo)."""

import sys

sys.path.insert(0, "..")
import _bootstrap  # noqa: F401,E402

import numpy as np  # noqa: E402

from seedvr2_tpu.interfaces import (SeedVR2LoadDiTModel,  # noqa: E402
                                    SeedVR2LoadVAEModel, SeedVR2VideoUpscaler)
from seedvr2_tpu.utils import video_io  # noqa: E402


def main(input_path: str, output_path: str, resolution: int = 1080):
    frames = video_io.read_image(input_path)  # (1, H, W, C) [0,1]

    dit = SeedVR2LoadDiTModel.execute(
        model="seedvr2_ema_3b_fp16.safetensors", attention_mode="flash")
    vae = SeedVR2LoadVAEModel.execute(model="ema_vae_fp16.safetensors")

    out = SeedVR2VideoUpscaler.execute(
        image=frames, dit=dit, vae=vae, seed=42, resolution=resolution,
        color_correction="lab")
    video_io.write_image(output_path, out[0])
    print(f"wrote {output_path} {out.shape}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 1080)
