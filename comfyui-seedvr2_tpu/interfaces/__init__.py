"""ComfyUI-shaped node API (4 nodes, same config-dict contract as the
reference src/interfaces/: SeedVR2LoadDiTModel, SeedVR2LoadVAEModel,
SeedVR2TorchCompileSettings, SeedVR2VideoUpscaler).

The nodes are plain-Python (dict in / dict out, numpy frames) so the contract
is usable from any host app; when ComfyUI is importable, `comfy_entrypoint`
registers them. Device strings from the reference schema ("cuda:0", "cpu")
map onto TPU devices transparently."""

from .nodes import (SeedVR2LoadDiTModel, SeedVR2LoadVAEModel,
                    SeedVR2TorchCompileSettings, SeedVR2VideoUpscaler)

NODE_CLASS_MAPPINGS = {
    "SeedVR2LoadDiTModel": SeedVR2LoadDiTModel,
    "SeedVR2LoadVAEModel": SeedVR2LoadVAEModel,
    "SeedVR2TorchCompileSettings": SeedVR2TorchCompileSettings,
    "SeedVR2VideoUpscaler": SeedVR2VideoUpscaler,
}


def comfy_entrypoint():  # pragma: no cover - requires ComfyUI runtime
    return NODE_CLASS_MAPPINGS
