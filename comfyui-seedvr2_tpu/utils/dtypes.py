"""Dtype policy for the TPU pipeline.

The reference probes CUBLAS at runtime to pick bf16 vs fp16
(src/optimization/compatibility.py:207-222) and wraps fp8 models in a
compatibility shim. On TPU none of that is needed: bf16 is the native matmul
format, fp32 is used for the numerically sensitive islands (RoPE, softmax
accumulation, normalization statistics, color math), and fp8/quantized weights
are a *storage* format expanded to bf16 (or fed to fused dequant matmuls) at
the kernel boundary.
"""

import jax.numpy as jnp

# Unified compute dtype across the pipeline (reference: COMPUTE_DTYPE).
COMPUTE_DTYPE = jnp.bfloat16

# Accumulation / sensitive-math dtype.
ACCUM_DTYPE = jnp.float32

# Storage dtypes understood by the weight loader.
STORAGE_DTYPES = {
    "float16": jnp.float16,
    "bfloat16": jnp.bfloat16,
    "float32": jnp.float32,
    "fp8_e4m3fn": jnp.float8_e4m3fn,
}


def to_compute(x):
    """Cast activations to the pipeline compute dtype."""
    return x.astype(COMPUTE_DTYPE) if x.dtype != COMPUTE_DTYPE else x
