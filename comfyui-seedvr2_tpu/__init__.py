"""seedvr2_tpu — a TPU-native (JAX/XLA/Pallas/pjit) rebuild of the SeedVR2
one-step diffusion video/image upscaler framework.

Capability target: the ComfyUI-SeedVR2 reference (/root/reference), i.e.
 - 3B / 7B NaDiT rectified-flow denoisers with 3D windowed attention,
 - causal video VAE (8x spatial, 4x temporal, 16 latent channels),
 - 4-phase batch pipeline (encode -> upscale -> decode -> postprocess),
 - streaming CLI with temporal-overlap blending,
 - color correction (LAB / wavelet / wavelet_adaptive / HSV / AdaIN),
 - fp16 / fp8 / GGUF weight formats,
 - multi-chip scale-out over a jax.sharding.Mesh (replacing the reference's
   multiprocessing fan-out).

The design is TPU-first rather than a port: static-shape window bucketing
instead of varlen packing, functional temporal-state threading in the VAE
instead of mutable module memory, pjit sharding instead of NCCL collectives.
"""

__version__ = "0.1.0"
