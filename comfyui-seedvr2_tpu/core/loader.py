"""Weight loading: reference checkpoints -> JAX parameter pytrees.

The parameter tree intentionally mirrors the reference checkpoint key
structure (src/core/model_loader.py:84-155 loads safetensors/.pth/.gguf with
these names), so conversion is purely mechanical:
 - Linear `weight` (2D) -> "w", transposed to (in, out) for x @ w.
 - Conv3d `weight` (5D, (out, in, kt, kh, kw)) -> "w", transposed to
   (kt, kh, kw, in, out) for NDHWC lax.conv_general_dilated.
 - `bias` -> "b".
 - 1D norm / modulation parameters keep their names.
 - RoPE frequency buffers ("*.rope.freqs", "*.dummy") are dropped — they are
   recomputed at plan time (models/dit/rope.py).

Unlike the reference there is no meta-device dance: arrays are read directly
into host numpy and transferred to HBM (optionally sharded) in one hop.
"""

import re
from dataclasses import replace
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from .configs import DiTConfig

_SKIP_PATTERNS = (
    re.compile(r"\.rope\."),
    re.compile(r"\.freqs$"),
    re.compile(r"\.dummy$"),
)

# fp8 weights are storage-only: upcast at load (TPU matmuls run bf16).
_TORCH_DTYPE_UPCAST = {"float8_e4m3fn", "float8_e5m2"}


def _should_skip(key: str) -> bool:
    return any(p.search(key) for p in _SKIP_PATTERNS)


def _assign(tree: dict, parts, value):
    node = tree
    for p in parts[:-1]:
        if isinstance(node, list):
            node = node[int(p)]
        else:
            node = node.setdefault(p, {})
    leaf = parts[-1]
    if isinstance(node, list):
        node[int(leaf)] = value
    else:
        node[leaf] = value


def _listify_blocks(tree: dict) -> dict:
    """Convert {'blocks': {'0': {...}, '1': {...}}} into an ordered list."""
    if "blocks" in tree and isinstance(tree["blocks"], dict):
        blocks = tree["blocks"]
        tree["blocks"] = [blocks[str(i)] for i in range(len(blocks))]
    return tree


def convert_state_dict(
    state: Dict[str, np.ndarray],
    dtype=jnp.bfloat16,
    conv_keys: Optional[re.Pattern] = None,
) -> dict:
    """Convert a torch-layout state dict (numpy arrays) to our param tree.

    Args:
        state: flat {torch_key: np.ndarray}.
        dtype: target storage dtype for floating-point weights.
        conv_keys: regex matching keys whose 5D/4D weights are convolutions
            (needed to distinguish conv weights from linear weights).
    """
    tree: dict = {}
    for key, val in state.items():
        if _should_skip(key):
            continue
        parts = key.split(".")
        leaf = parts[-1]
        if isinstance(val, dict) and ("q8" in val or "qa" in val):
            # quantized linear weight: merge {"q8","scales"} (Q8_0 layout)
            # or {"qa","s","m"} (native K-quant affine layout) into the
            # module node (consumed by ops/layers.linear via fused kernels)
            for part, arr in val.items():
                _assign(tree, parts[:-1] + [part], jnp.asarray(arr))
            continue
        arr = np.asarray(val)
        if leaf == "weight":
            if arr.ndim == 2:
                parts[-1] = "w"
                arr = np.ascontiguousarray(arr.T)
            elif arr.ndim == 5:
                parts[-1] = "w"
                arr = np.ascontiguousarray(arr.transpose(2, 3, 4, 1, 0))
            elif arr.ndim == 4:
                parts[-1] = "w"
                arr = np.ascontiguousarray(arr.transpose(2, 3, 1, 0))
            # 1D norm weights keep name "weight"
        elif leaf == "bias":
            parts[-1] = "b"
        if np.issubdtype(arr.dtype, np.floating) or arr.dtype.name in (
            "bfloat16", "float8_e4m3fn", "float8_e5m2"
        ):
            arr = jnp.asarray(arr).astype(dtype)
        else:
            arr = jnp.asarray(arr)
        _assign(tree, parts, arr)
    return _listify_blocks(tree)


def sniff_dit_config(state: Dict[str, np.ndarray],
                     base: DiTConfig) -> DiTConfig:
    """Infer architecture dims from checkpoint tensor shapes.

    The reference resolves the architecture from YAML configs bundled per
    checkpoint family (model_configuration.py:1099-1121); here the flat key
    names + shapes determine every dimension, so custom/pruned/tiny
    checkpoints load without a sidecar config. `base` supplies what shapes
    cannot express (family, rope/window flavor, patch size). Falls back to
    `base` unchanged when required tensors are absent (e.g. quantized dict
    leaves)."""
    def get(*keys):
        for k in keys:
            v = state.get(k)
            if isinstance(v, np.ndarray):
                return v
        return None

    qkv0 = get("blocks.0.attn.proj_qkv.vid.weight",
               "blocks.0.attn.proj_qkv.all.weight")
    vid_in = get("vid_in.proj.weight")
    norm_q = get("blocks.0.attn.norm_q.vid.weight",
                 "blocks.0.attn.norm_q.all.weight")
    vid_out = get("vid_out.proj.weight")
    if qkv0 is None or vid_in is None or norm_q is None or vid_out is None:
        return base

    D = int(vid_in.shape[0])
    head_dim = int(norm_q.shape[0])
    heads = int(qkv0.shape[0]) // 3 // head_dim
    pt, ph, pw = base.patch_size
    pprod = pt * ph * pw
    block_pat = re.compile(r"^blocks\.(\d+)\.")
    block_ids = {int(m.group(1)) for k in state
                 for m in [block_pat.match(k)] if m}
    txt_pat = re.compile(r"^blocks\.(\d+)\.attn\.proj_qkv\.txt\.")
    txt_blocks = {int(m.group(1)) for k in state
                  for m in [txt_pat.match(k)] if m}
    txt_in = get("txt_in.weight")
    swiglu = any(".proj_in_gate." in k for k in state)
    mlp_in = get("blocks.0.mlp.vid.proj_in.weight",
                 "blocks.0.mlp.all.proj_in.weight")
    expand_ratio = base.expand_ratio
    if mlp_in is not None:
        hidden = int(mlp_in.shape[0])
        if swiglu:
            from ..ops.layers import swiglu_hidden_dim

            # 256-rounding can map several ratios to one hidden dim at small
            # D; prefer the family default when it matches
            for r in (base.expand_ratio, 2, 3, 4, 6, 8):
                if swiglu_hidden_dim(D, r) == hidden:
                    expand_ratio = r
                    break
        else:
            expand_ratio = hidden // D

    kwargs = dict(
        vid_in_channels=int(vid_in.shape[1]) // pprod,
        vid_out_channels=int(vid_out.shape[0]) // pprod,
        vid_dim=D,
        txt_in_dim=int(txt_in.shape[1]) if txt_in is not None else D,
        heads=heads,
        head_dim=head_dim,
        expand_ratio=expand_ratio,
        qk_bias="blocks.0.attn.proj_qkv.vid.bias" in state
                or "blocks.0.attn.proj_qkv.all.bias" in state,
        num_layers=max(block_ids) + 1 if block_ids else base.num_layers,
        mlp_type="swiglu" if swiglu else "normal",
        vid_out_norm="vid_out_norm.weight" in state,
        upscaler=any(k.startswith("emb_scale.") for k in state),
    )
    if base.family == "dit_3b":
        kwargs["mm_layers"] = len(txt_blocks)
        kwargs["rope_dim"] = head_dim
    else:
        kwargs["shared_qkv"] = not txt_blocks
        kwargs["shared_mlp"] = not any(
            re.match(r"^blocks\.\d+\.mlp\.txt\.", k) for k in state)
        kwargs["rope_dim"] = head_dim // 2
    return replace(base, **kwargs)


def sniff_vae_config(state: Dict[str, np.ndarray], base) -> "object":
    """Infer the VAE architecture from checkpoint tensor shapes (torch-layout
    keys, after VAE key fixups). Same rationale as sniff_dit_config; the
    published checkpoint reproduces VAE_V3 exactly."""
    from .configs import VAEConfig

    def get(k):
        v = state.get(k)
        return v if isinstance(v, np.ndarray) else None

    conv_in = get("encoder.conv_in.weight")
    conv_out = get("encoder.conv_out.weight")
    if conv_in is None or conv_out is None:
        return base

    down_pat = re.compile(r"^encoder\.down_blocks\.(\d+)\.")
    n_blocks = 1 + max({int(m.group(1)) for k in state
                        for m in [down_pat.match(k)] if m}, default=-1)
    if n_blocks <= 0:
        return base
    chans = []
    for i in range(n_blocks):
        w = get(f"encoder.down_blocks.{i}.resnets.0.conv1.weight")
        if w is None:
            return base
        chans.append(int(w.shape[0]))
    res_pat = re.compile(r"^encoder\.down_blocks\.0\.resnets\.(\d+)\.")
    layers_per_block = 1 + max(int(m.group(1)) for k in state
                               for m in [res_pat.match(k)] if m)
    temporal_scale_num = 0
    saw_5d_downsampler = False
    for i in range(n_blocks - 1):
        w = get(f"encoder.down_blocks.{i}.downsamplers.0.conv.weight")
        if w is not None and w.ndim == 5:
            saw_5d_downsampler = True
            if w.shape[2] == 3:
                temporal_scale_num += 1
    if not saw_5d_downsampler and n_blocks > 1:
        # 2D-stored checkpoint: temporal kernel depth is not expressible in
        # the file (the reference reads it off the constructed module during
        # inflation, causal_inflation_lib.py:473-495) — keep the base
        # config's temporal structure.
        temporal_scale_num = base.temporal_scale_num
    gcd = int(np.gcd.reduce(chans))
    groups = max(g for g in range(1, min(gcd, base.norm_num_groups) + 1)
                 if gcd % g == 0)
    # Legacy video_vae.py family markers: 1x1x1 quant/post-quant convs
    # around the latent (video_vae.py:765-784), no mid-block attention
    # (video_vae.py:440-466), and a depth-1 resnet conv2 kernel when
    # time_receptive_field="half" (video_vae.py:273-280).
    mid_attention = any(k.startswith("encoder.mid_block.attentions.")
                        for k in state)
    conv2 = get("encoder.down_blocks.0.resnets.0.conv2.weight")
    trf = ("half" if conv2 is not None and conv2.ndim == 5
           and conv2.shape[2] == 1 else base.time_receptive_field)
    return VAEConfig(
        in_channels=int(conv_in.shape[1]),
        out_channels=int(get("decoder.conv_out.weight").shape[0])
        if get("decoder.conv_out.weight") is not None else base.out_channels,
        latent_channels=int(conv_out.shape[0]) // 2,
        block_out_channels=tuple(chans),
        layers_per_block=layers_per_block,
        norm_num_groups=groups,
        temporal_scale_num=temporal_scale_num,
        spatial_downsample_factor=2 ** (n_blocks - 1),
        temporal_downsample_factor=2 ** temporal_scale_num,
        slicing_sample_min_size=base.slicing_sample_min_size,
        scaling_factor=base.scaling_factor,
        shifting_factor=base.shifting_factor,
        time_receptive_field=trf,
        mid_attention=mid_attention,
        use_quant_conv=get("quant_conv.weight") is not None,
        use_post_quant_conv=get("post_quant_conv.weight") is not None,
    )


def vae_template_shapes(cfg=None) -> Dict[str, tuple]:
    """Flat reference-layout key -> torch-layout weight shape for a VAE
    config, derived from our own initializer via jax.eval_shape (no compute).

    Used by 2D->3D conv inflation to recover each conv's temporal kernel
    depth, which a 2D-stored checkpoint cannot express (the reference reads
    it off the constructed module; src/models/video_vae_v3/modules/
    causal_inflation_lib.py:473-495)."""
    import jax

    from ..models.vae.pipeline_vae import init_vae_params

    if cfg is None:
        from .configs import VAE_V3 as cfg  # noqa: N811

    tree = jax.eval_shape(
        lambda k: init_vae_params(k, cfg), jax.random.PRNGKey(0))

    out: Dict[str, tuple] = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}{k}.")
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, f"{prefix}{i}.")
        else:
            key, shape = prefix[:-1], tuple(node.shape)
            parts = key.split(".")
            leaf = parts[-1]
            if leaf == "w":
                parts[-1] = "weight"
                if len(shape) == 2:  # (in, out) -> (out, in)
                    shape = (shape[1], shape[0])
                elif len(shape) == 5:  # (kt,kh,kw,ci,co) -> (co,ci,kt,kh,kw)
                    shape = (shape[4], shape[3], shape[0], shape[1], shape[2])
            elif leaf == "b":
                parts[-1] = "bias"
            out[".".join(parts)] = shape

    walk(tree, "")
    return out


def inflate_vae_2d_convs(state: Dict[str, np.ndarray], cfg=None,
                         mode: str = "tail") -> Dict[str, np.ndarray]:
    """Inflate 2D-stored conv weights (out,in,kh,kw) to the 3D causal conv
    layout (out,in,kt,kh,kw) at load, matching the reference's
    InflatedCausalConv3d state-dict hook (src/models/video_vae_v3/modules/
    causal_inflation_lib.py:440-495):

      - "tail": zero temporal taps except the LAST, which carries the 2D
        weight (a causal conv then reproduces the 2D conv per frame).
      - "replicate": the 2D weight repeated across kt, divided by kt.

    Biases are 1D in both the 2D and 3D modules (copied unchanged). Keys are
    torch-layout (post key-fixups, pre convert_state_dict). No-op when the
    checkpoint already stores 5D convs (published ema_vae_fp16 layout).
    A 4D weight with no counterpart in the target architecture is carried
    through unchanged (aux tensors from training exports); a weight the
    architecture DOES consume raises when its spatial geometry disagrees."""
    if mode not in ("tail", "replicate"):
        raise ValueError(f"unknown inflation mode {mode!r}")
    four_d = [k for k, v in state.items()
              if k.endswith(".weight") and np.asarray(v).ndim == 4]
    if not four_d:
        return state
    template = vae_template_shapes(cfg)
    out = dict(state)
    for k in four_d:
        tgt = template.get(k)
        if tgt is None:
            # Auxiliary tensor the model never reads (training-export
            # discriminator/LPIPS heads, EMA shadows, ...): carry it
            # through unchanged like convert_state_dict always has —
            # only weights the architecture will consume must inflate.
            import warnings

            warnings.warn(
                f"VAE checkpoint stores 4D weight {k!r} with no counterpart "
                "in the target architecture; carried through uninflated "
                "(unused by the model).", stacklevel=2)
            continue
        if len(tgt) == 4:
            continue  # genuinely-2D conv in the target too: no inflation
        w2 = np.asarray(state[k])
        o, i, kh, kw = w2.shape
        to, ti, kt, th, tw = tgt
        if (o, i, kh, kw) != (to, ti, th, tw):
            raise ValueError(
                f"VAE 2D conv weight {k!r} has shape {w2.shape}, "
                f"incompatible with target 3D conv {tgt} — cannot inflate.")
        if mode == "replicate":
            w3 = np.repeat(w2[:, :, None], kt, axis=2) / float(kt)
            w3 = w3.astype(w2.dtype)
        else:
            w3 = np.zeros((to, ti, kt, th, tw), dtype=w2.dtype)
            w3[:, :, -1] = w2
        out[k] = w3
    return out


def load_safetensors(path: str, dtype=jnp.bfloat16) -> dict:
    """Load a safetensors checkpoint into the param tree (host -> HBM)."""
    from safetensors import safe_open

    state = {}
    with safe_open(path, framework="numpy") as f:
        for key in f.keys():
            if _should_skip(key):
                continue
            state[key] = f.get_tensor(key)
    return convert_state_dict(state, dtype=dtype)


def torch_module_to_params(module, dtype=jnp.float32) -> dict:
    """Test helper: convert a live torch module's state_dict (used by the
    golden-parity oracle tests)."""
    state = {}
    for k, v in module.state_dict().items():
        t = v.detach().cpu()
        if t.dtype.is_floating_point:
            t = t.float()
        state[k] = t.numpy()
    return convert_state_dict(state, dtype=dtype)
