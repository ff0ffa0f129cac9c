"""Test-only loader for the PyTorch reference implementation (/root/reference).

Used EXCLUSIVELY as a numerical oracle in golden-parity tests: we load the
reference model code on CPU, run tiny configurations with shared random
weights, and compare our JAX implementation's outputs within tolerance.
Nothing from the reference is vendored into the framework.

The reference depends on `rotary_embedding_torch` and `diffusers`, which are
not installed in this image; minimal functional stand-ins are registered in
sys.modules before loading (only the small pieces the DiT path touches).
"""

import importlib.util
import sys
import types
from pathlib import Path

import torch
from torch import nn

REFERENCE_ROOT = Path("/root/reference")


def _install_rotary_stub():
    if "rotary_embedding_torch" in sys.modules:
        return
    mod = types.ModuleType("rotary_embedding_torch")

    class RotaryEmbedding(nn.Module):
        def __init__(self, dim, freqs_for="lang", theta=10000, max_freq=256,
                     **kwargs):
            super().__init__()
            self.freqs_for = freqs_for
            if freqs_for == "lang":
                freqs = 1.0 / (
                    theta ** (torch.arange(0, dim, 2)[: dim // 2].float() / dim)
                )
            elif freqs_for == "pixel":
                freqs = torch.linspace(1.0, max_freq / 2, dim // 2) * torch.pi
            else:
                raise NotImplementedError(freqs_for)
            self.freqs = nn.Parameter(freqs, requires_grad=False)

        def forward(self, t, seq_len=None):
            freqs = torch.einsum("..., f -> ... f", t.float(), self.freqs)
            return torch.repeat_interleave(freqs, 2, dim=-1)

        def get_axial_freqs(self, *dims):
            all_freqs = []
            for ind, d in enumerate(dims):
                if self.freqs_for == "pixel":
                    pos = torch.linspace(-1, 1, steps=d)
                else:
                    pos = torch.arange(d)
                freqs = self.forward(pos, seq_len=d)
                all_axis = [None] * len(dims)
                all_axis[ind] = slice(None)
                new_axis_slice = (Ellipsis, *all_axis, slice(None))
                all_freqs.append(freqs[new_axis_slice])
            all_freqs = torch.broadcast_tensors(*all_freqs)
            return torch.cat(all_freqs, dim=-1)

    def _rotate_half(x):
        x = x.unflatten(-1, (-1, 2))
        x1, x2 = x.unbind(dim=-1)
        x = torch.stack((-x2, x1), dim=-1)
        return x.flatten(-2)

    def apply_rotary_emb(freqs, t, start_index=0, scale=1.0, seq_dim=-2):
        rot_dim = freqs.shape[-1]
        end_index = start_index + rot_dim
        t_left = t[..., :start_index]
        t_mid = t[..., start_index:end_index]
        t_right = t[..., end_index:]
        t_mid = (t_mid * freqs.cos() * scale) + (
            _rotate_half(t_mid) * freqs.sin() * scale
        )
        return torch.cat((t_left, t_mid, t_right), dim=-1)

    mod.RotaryEmbedding = RotaryEmbedding
    mod.apply_rotary_emb = apply_rotary_emb
    sys.modules["rotary_embedding_torch"] = mod


def _install_diffusers_stub():
    if "diffusers" in sys.modules:
        return
    root = types.ModuleType("diffusers")
    models = types.ModuleType("diffusers.models")
    embeddings = types.ModuleType("diffusers.models.embeddings")
    normalization = types.ModuleType("diffusers.models.normalization")

    def get_timestep_embedding(timesteps, embedding_dim, flip_sin_to_cos=False,
                               downscale_freq_shift=0, scale=1,
                               max_period=10000):
        half_dim = embedding_dim // 2
        exponent = -torch.log(torch.tensor(float(max_period))) * torch.arange(
            half_dim, dtype=torch.float32, device=timesteps.device
        )
        exponent = exponent / (half_dim - downscale_freq_shift)
        emb = torch.exp(exponent)
        emb = timesteps[:, None].float() * emb[None, :]
        emb = scale * emb
        emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
        if flip_sin_to_cos:
            emb = torch.cat([emb[:, half_dim:], emb[:, :half_dim]], dim=-1)
        if embedding_dim % 2 == 1:
            emb = torch.nn.functional.pad(emb, (0, 1, 0, 0))
        return emb

    class RMSNorm(nn.Module):
        def __init__(self, dim, eps=1e-5, elementwise_affine=True, **kwargs):
            super().__init__()
            self.eps = eps
            self.weight = nn.Parameter(torch.ones(dim)) if elementwise_affine else None

        def forward(self, x):
            var = x.float().pow(2).mean(dim=-1, keepdim=True)
            out = (x.float() * torch.rsqrt(var + self.eps)).to(x.dtype)
            if self.weight is not None:
                out = out * self.weight
            return out

    embeddings.get_timestep_embedding = get_timestep_embedding
    normalization.RMSNorm = RMSNorm
    models.embeddings = embeddings
    models.normalization = normalization
    root.models = models
    sys.modules["diffusers"] = root
    sys.modules["diffusers.models"] = models
    sys.modules["diffusers.models.embeddings"] = embeddings
    sys.modules["diffusers.models.normalization"] = normalization


def _install_diffusers_vae_stub():
    """Extend the diffusers stub with the 2D base modules the reference VAE
    subclasses (it replaces all convs with causal 3D versions; the bases only
    need to construct compatible attributes + the deprecated attention math)."""
    import torch.nn.functional as F

    diffusers = sys.modules["diffusers"]
    if hasattr(diffusers, "AutoencoderKL"):
        return

    class Upsample2D(nn.Module):
        def __init__(self, channels, use_conv=False, use_conv_transpose=False,
                     out_channels=None, name="conv", interpolate=True, **kw):
            super().__init__()
            self.channels = channels
            self.out_channels = out_channels or channels
            self.use_conv = use_conv
            self.use_conv_transpose = use_conv_transpose
            self.name = name
            self.interpolate = interpolate
            self.norm = None
            conv = nn.Conv2d(self.channels, self.out_channels, 3, padding=1)
            if name == "conv":
                self.conv = conv
            else:
                self.Conv2d_0 = conv

    class Downsample2D(nn.Module):
        def __init__(self, channels, use_conv=False, out_channels=None,
                     padding=1, name="conv", **kw):
            super().__init__()
            self.channels = channels
            self.out_channels = out_channels or channels
            self.use_conv = use_conv
            self.padding = padding
            self.name = name
            self.norm = None
            if use_conv:
                conv = nn.Conv2d(self.channels, self.out_channels, 3,
                                 stride=2, padding=padding)
            else:
                conv = nn.AvgPool2d(kernel_size=2, stride=2)
            self.conv = conv

    class ResnetBlock2D(nn.Module):
        def __init__(self, *, in_channels, out_channels=None, temb_channels=512,
                     groups=32, eps=1e-6, non_linearity="swish", dropout=0.0,
                     time_embedding_norm="default", output_scale_factor=1.0,
                     pre_norm=True, up=False, down=False, use_in_shortcut=None,
                     skip_time_act=False, **kw):
            super().__init__()
            self.in_channels = in_channels
            self.out_channels = out_channels or in_channels
            self.time_embedding_norm = time_embedding_norm
            self.output_scale_factor = output_scale_factor
            self.skip_time_act = skip_time_act
            self.up, self.down = up, down
            self.norm1 = nn.GroupNorm(groups, in_channels, eps=eps)
            self.conv1 = nn.Conv2d(in_channels, self.out_channels, 3, padding=1)
            self.norm2 = nn.GroupNorm(groups, self.out_channels, eps=eps)
            self.conv2 = nn.Conv2d(self.out_channels, self.out_channels, 3,
                                   padding=1)
            self.nonlinearity = nn.SiLU()
            self.dropout = nn.Dropout(dropout)
            self.time_emb_proj = (
                nn.Linear(temb_channels, self.out_channels)
                if temb_channels is not None else None
            )
            self.upsample = self.downsample = None
            self.use_in_shortcut = (
                self.in_channels != self.out_channels
                if use_in_shortcut is None else use_in_shortcut
            )
            self.conv_shortcut = (
                nn.Conv2d(in_channels, self.out_channels, 1)
                if self.use_in_shortcut else None
            )

    class _Block2D(nn.Module):
        def __init__(self, **kw):
            super().__init__()
            self.resnets = nn.ModuleList()
            self.downsamplers = None
            self.upsamplers = None

    class Attention(nn.Module):
        def __init__(self, query_dim, heads=8, dim_head=64,
                     rescale_output_factor=1.0, eps=1e-5, norm_num_groups=None,
                     spatial_norm_dim=None, residual_connection=False,
                     bias=False, upcast_softmax=False, **kw):
            super().__init__()
            self.heads = heads
            self.dim_head = dim_head
            self.scale = dim_head ** -0.5
            self.rescale_output_factor = rescale_output_factor
            self.residual_connection = residual_connection
            self.upcast_softmax = upcast_softmax
            inner = heads * dim_head
            self.group_norm = (nn.GroupNorm(norm_num_groups, query_dim, eps=eps)
                               if norm_num_groups is not None else None)
            self.to_q = nn.Linear(query_dim, inner, bias=bias)
            self.to_k = nn.Linear(query_dim, inner, bias=bias)
            self.to_v = nn.Linear(query_dim, inner, bias=bias)
            self.to_out = nn.ModuleList([nn.Linear(inner, query_dim, bias=True),
                                         nn.Dropout(0.0)])

        def forward(self, hidden_states, temb=None):
            residual = hidden_states
            b, c, h, w = hidden_states.shape
            hs = hidden_states.view(b, c, h * w).transpose(1, 2)
            if self.group_norm is not None:
                hs = self.group_norm(hs.transpose(1, 2)).transpose(1, 2)
            q, k, v = self.to_q(hs), self.to_k(hs), self.to_v(hs)

            def split(x):
                return x.view(b, -1, self.heads, self.dim_head).transpose(1, 2)

            q, k, v = split(q), split(k), split(v)
            scores = torch.matmul(q, k.transpose(-1, -2)) * self.scale
            if self.upcast_softmax:
                scores = scores.float()
            probs = scores.softmax(dim=-1).to(v.dtype)
            out = torch.matmul(probs, v)
            out = out.transpose(1, 2).reshape(b, -1, self.heads * self.dim_head)
            out = self.to_out[1](self.to_out[0](out))
            out = out.transpose(1, 2).view(b, c, h, w)
            if self.residual_connection:
                out = out + residual
            return out / self.rescale_output_factor

    class SpatialNorm(nn.Module):
        def __init__(self, *a, **kw):
            super().__init__()

    class LoRACompatibleConv(nn.Conv2d):
        pass

    class DiagonalGaussianDistribution:
        def __init__(self, parameters, deterministic=False):
            self.parameters = parameters
            self.mean, self.logvar = torch.chunk(parameters, 2, dim=1)

        def mode(self):
            return self.mean

        def sample(self):
            std = torch.exp(0.5 * torch.clamp(self.logvar, -30.0, 20.0))
            return self.mean + std * torch.randn_like(self.mean)

    class DecoderOutput:
        def __init__(self, sample):
            self.sample = sample

    class AutoencoderKLOutput:
        def __init__(self, latent_dist):
            self.latent_dist = latent_dist

    class AutoencoderKL(nn.Module):
        def __init__(self, *args, **kwargs):
            super().__init__()
            self.use_slicing = False
            self.use_tiling = False

        def enable_slicing(self):
            self.use_slicing = True

        def disable_slicing(self):
            self.use_slicing = False

        @property
        def device(self):
            try:
                return next(self.parameters()).device
            except StopIteration:
                return torch.device("cpu")

    def apply_forward_hook(fn):
        return fn

    def is_torch_version(op, version):
        return True

    # register module tree (and attach to parents so `from a.b.c import x` works)
    def _mod(name):
        m = sys.modules.get(name) or types.ModuleType(name)
        sys.modules[name] = m
        parent_name, _, child = name.rpartition(".")
        if parent_name:
            parent = _mod(parent_name)
            setattr(parent, child, m)
        return m

    diffusers.AutoencoderKL = AutoencoderKL
    ap = _mod("diffusers.models.attention_processor")
    ap.Attention = Attention
    ap.SpatialNorm = SpatialNorm
    vae_mod = _mod("diffusers.models.autoencoders")
    vae_sub = _mod("diffusers.models.autoencoders.vae")
    vae_sub.DecoderOutput = DecoderOutput
    vae_sub.DiagonalGaussianDistribution = DiagonalGaussianDistribution
    vae_mod.vae = vae_sub
    _mod("diffusers.models.downsampling").Downsample2D = Downsample2D
    _mod("diffusers.models.upsampling").Upsample2D = Upsample2D
    _mod("diffusers.models.lora").LoRACompatibleConv = LoRACompatibleConv
    _mod("diffusers.models.modeling_outputs").AutoencoderKLOutput = AutoencoderKLOutput
    _mod("diffusers.models.resnet").ResnetBlock2D = ResnetBlock2D
    blocks = _mod("diffusers.models.unets.unet_2d_blocks")
    blocks.DownEncoderBlock2D = _Block2D
    blocks.UpDecoderBlock2D = _Block2D
    _mod("diffusers.models.unets")
    utils = _mod("diffusers.utils")
    utils.is_torch_version = is_torch_version
    _mod("diffusers.utils.accelerate_utils").apply_forward_hook = apply_forward_hook


def _install_omegaconf_stub():
    """refsrc.common.diffusion.config annotates with DictConfig/ListConfig."""
    if "omegaconf" in sys.modules:
        return
    mod = types.ModuleType("omegaconf")

    class DictConfig(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            # omegaconf semantics: attribute writes land in the mapping
            # (generation_phases.py sets runner.config.diffusion.cfg.scale)
            self[k] = v

    class ListConfig(list):
        pass

    class OmegaConf:
        @staticmethod
        def create(obj=None):
            return DictConfig(obj or {})

        @staticmethod
        def register_new_resolver(name, fn, **kw):
            pass  # ${eval:...} resolution is unused in the test configs

    mod.DictConfig = DictConfig
    mod.ListConfig = ListConfig
    mod.OmegaConf = OmegaConf
    sys.modules["omegaconf"] = mod


def _install_torchvision_stub():
    """color_fix imports ToTensor/ToPILImage (unused in the tensor paths);
    generation_utils builds its video transform chain from Compose/Lambda/
    Normalize — those three are real functional equivalents."""
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")

    class _Unused:
        def __call__(self, *a, **k):
            raise NotImplementedError

    class Compose:
        def __init__(self, fns):
            self.fns = list(fns)

        def __call__(self, x):
            for fn in self.fns:
                x = fn(x)
            return x

    class Lambda:
        def __init__(self, fn):
            self.fn = fn

        def __call__(self, x):
            return self.fn(x)

    class Normalize:
        """torchvision semantics on (..., C, H, W): per-channel
        (x - mean) / std."""

        def __init__(self, mean, std, inplace=False):
            self.mean = mean if isinstance(mean, (list, tuple)) else [mean]
            self.std = std if isinstance(std, (list, tuple)) else [std]

        def __call__(self, x):
            mean = torch.as_tensor(self.mean, dtype=x.dtype,
                                   device=x.device)
            std = torch.as_tensor(self.std, dtype=x.dtype, device=x.device)
            if mean.numel() == 1:
                return (x - mean) / std
            view = (-1,) + (1,) * 2
            return (x - mean.view(view)) / std.view(view)

    import enum

    import torch.nn.functional as F

    class InterpolationMode(str, enum.Enum):
        NEAREST = "nearest"
        BILINEAR = "bilinear"
        BICUBIC = "bicubic"
        LANCZOS = "lanczos"

    functional = types.ModuleType("torchvision.transforms.functional")

    def _resize(img, size, interpolation=InterpolationMode.BILINEAR,
                max_size=None, antialias=True):
        """Tensor-backend torchvision resize semantics: int size = short
        side, long side = int(size * long / short) (truncating, matching
        torchvision._compute_resized_output_size)."""
        h, w = img.shape[-2:]
        if isinstance(size, int):
            short, long = (h, w) if h <= w else (w, h)
            new_long = int(size * long / short)
            nh, nw = (size, new_long) if h <= w else (new_long, size)
        else:
            nh, nw = size
        if (nh, nw) == (h, w):
            return img
        mode = str(interpolation.value if hasattr(interpolation, "value")
                   else interpolation)
        x4 = img[None] if img.dim() == 3 else img
        aa = bool(antialias) and mode in ("bilinear", "bicubic")
        out = F.interpolate(
            x4.float(), size=(nh, nw), mode=mode, antialias=aa,
            align_corners=False if mode in ("bilinear", "bicubic") else None)
        out = out.to(img.dtype)
        return out[0] if img.dim() == 3 else out

    def _crop(img, top, left, height, width):
        return img[..., top:top + height, left:left + width]

    def _center_crop(img, output_size):
        if isinstance(output_size, int):
            output_size = (output_size, output_size)
        ch, cw = output_size
        h, w = img.shape[-2:]
        top = int(round((h - ch) / 2.0))
        left = int(round((w - cw) / 2.0))
        return _crop(img, top, left, ch, cw)

    functional.resize = _resize
    functional.crop = _crop
    functional.center_crop = _center_crop
    functional.InterpolationMode = InterpolationMode

    class Resize:
        def __init__(self, size, interpolation=InterpolationMode.BILINEAR,
                     max_size=None, antialias=True):
            self.size, self.interpolation = size, interpolation
            self.antialias = antialias

        def __call__(self, img):
            return _resize(img, self.size, self.interpolation,
                           antialias=self.antialias)

    class CenterCrop:
        def __init__(self, size):
            self.size = size

        def __call__(self, img):
            return _center_crop(img, self.size)

    transforms.ToTensor = _Unused
    transforms.ToPILImage = _Unused
    transforms.Compose = Compose
    transforms.Lambda = Lambda
    transforms.Normalize = Normalize
    transforms.Resize = Resize
    transforms.CenterCrop = CenterCrop
    transforms.InterpolationMode = InterpolationMode
    transforms.functional = functional
    tv.transforms = transforms
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.transforms.functional"] = functional


def load_reference_src():
    """Import /root/reference/src as package `refsrc` (CPU-only, test oracle)."""
    _install_rotary_stub()
    _install_diffusers_stub()
    _install_diffusers_vae_stub()
    _install_torchvision_stub()
    _install_omegaconf_stub()
    if "refsrc" in sys.modules:
        return sys.modules["refsrc"]
    spec = importlib.util.spec_from_file_location(
        "refsrc",
        REFERENCE_ROOT / "src" / "__init__.py",
        submodule_search_locations=[str(REFERENCE_ROOT / "src")],
    )
    module = importlib.util.module_from_spec(spec)
    sys.modules["refsrc"] = module
    spec.loader.exec_module(module)
    return module
