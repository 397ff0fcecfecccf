"""Shims that let the actual PyTorch reference in /root/reference run on CPU.

The reference imports a few external packages that aren't in this image:
``diffusers`` (get_timestep_embedding, RMSNorm, and the 2D autoencoder
building blocks its VAE subclasses), ``rotary_embedding_torch`` and
``torchvision``.  These shims provide faithful-subset reimplementations of
exactly the symbols the reference uses, installed into sys.modules before
importing reference code.  The reference modules themselves are imported
unmodified — these tests exercise the reference's own forward passes as the
parity oracle for our JAX implementation.

Fidelity notes:
- get_timestep_embedding matches diffusers.models.embeddings (sin||cos,
  exponent over half_dim with downscale_freq_shift).
- RotaryEmbedding/apply_rotary_emb match rotary-embedding-torch: lang freqs
  1/theta^(2i/dim), pixel freqs linspace(1, max_freq/2)*pi; per-axis angles
  duplicated adjacently ([f0,f0,f1,f1,...]); rotate_half on (d/2, 2) pairs.
  The reference only calls RotaryEmbedding(dim, freqs_for=..., theta/max_freq),
  .get_axial_freqs(*dims), and apply_rotary_emb(freqs, t)
  (reference: src/models/dit_3b/rope.py:28-46, dit_7b/rope.py).
- The diffusers 2D blocks (ResnetBlock2D, Up/Downsample2D, etc.) are needed
  only as *constructors*: the reference's 3D subclasses replace/inflate the
  convs and define their own forward passes
  (reference: src/models/video_vae_v3/modules/attn_video_vae.py:58-560).
"""

from __future__ import annotations

import math
import sys
import types

import torch
import torch.nn.functional as F
from torch import nn

REFERENCE_ROOT = "/root/reference"


# --------------------------------------------------------------------------- #
# diffusers.models.embeddings.get_timestep_embedding
# --------------------------------------------------------------------------- #


def get_timestep_embedding(
    timesteps: torch.Tensor,
    embedding_dim: int,
    flip_sin_to_cos: bool = False,
    downscale_freq_shift: float = 1,
    scale: float = 1,
    max_period: int = 10000,
) -> torch.Tensor:
    assert len(timesteps.shape) == 1, "Timesteps should be a 1d-array"
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * torch.arange(
        start=0, end=half_dim, dtype=torch.float32, device=timesteps.device
    )
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = torch.exp(exponent)
    emb = timesteps[:, None].float() * emb[None, :]
    emb = scale * emb
    emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
    if flip_sin_to_cos:
        emb = torch.cat([emb[:, half_dim:], emb[:, :half_dim]], dim=-1)
    if embedding_dim % 2 == 1:
        emb = F.pad(emb, (0, 1, 0, 0))
    return emb


class RMSNorm(nn.Module):
    """diffusers.models.normalization.RMSNorm (fp32 variance)."""

    def __init__(self, dim, eps: float = 1e-5, elementwise_affine: bool = True, bias: bool = False):
        super().__init__()
        self.eps = eps
        self.elementwise_affine = elementwise_affine
        if isinstance(dim, int):
            dim = (dim,)
        self.dim = torch.Size(dim)
        self.weight = nn.Parameter(torch.ones(dim)) if elementwise_affine else None
        self.bias = nn.Parameter(torch.zeros(dim)) if (elementwise_affine and bias) else None

    def forward(self, hidden_states):
        input_dtype = hidden_states.dtype
        variance = hidden_states.to(torch.float32).pow(2).mean(-1, keepdim=True)
        hidden_states = hidden_states.to(torch.float32) * torch.rsqrt(variance + self.eps)
        if self.weight is not None:
            hidden_states = hidden_states.to(input_dtype) * self.weight
            if self.bias is not None:
                hidden_states = hidden_states + self.bias
        else:
            hidden_states = hidden_states.to(input_dtype)
        return hidden_states


# --------------------------------------------------------------------------- #
# rotary_embedding_torch
# --------------------------------------------------------------------------- #


def _rotate_half(x: torch.Tensor) -> torch.Tensor:
    x = x.unflatten(-1, (-1, 2))
    x1, x2 = x.unbind(dim=-1)
    x = torch.stack((-x2, x1), dim=-1)
    return x.flatten(-2)


def apply_rotary_emb(freqs, t, start_index: int = 0, scale: float = 1.0, seq_dim: int = -2):
    rot_dim = freqs.shape[-1]
    end_index = start_index + rot_dim
    assert rot_dim <= t.shape[-1], (rot_dim, t.shape)
    t_left = t[..., :start_index]
    t_mid = t[..., start_index:end_index]
    t_right = t[..., end_index:]
    t_mid = (t_mid * freqs.cos() * scale) + (_rotate_half(t_mid) * freqs.sin() * scale)
    return torch.cat((t_left, t_mid, t_right), dim=-1)


class RotaryEmbedding(nn.Module):
    def __init__(
        self,
        dim: int,
        custom_freqs=None,
        freqs_for: str = "lang",
        theta: float = 10000,
        max_freq: float = 10,
        num_freqs: int = 1,
        learned_freq: bool = False,
        **kwargs,
    ):
        super().__init__()
        self.freqs_for = freqs_for
        if custom_freqs is not None:
            freqs = custom_freqs
        elif freqs_for == "lang":
            freqs = 1.0 / (theta ** (torch.arange(0, dim, 2)[: (dim // 2)].float() / dim))
        elif freqs_for == "pixel":
            freqs = torch.linspace(1.0, max_freq / 2, dim // 2) * math.pi
        elif freqs_for == "constant":
            freqs = torch.ones(num_freqs).float()
        else:
            raise ValueError(freqs_for)
        self.freqs = nn.Parameter(freqs, requires_grad=learned_freq)

    def forward(self, t: torch.Tensor, seq_len=None, offset=0) -> torch.Tensor:
        freqs = self.freqs
        freqs = torch.einsum("..., f -> ... f", t.to(freqs.dtype), freqs)
        return freqs.repeat_interleave(2, dim=-1)

    def get_axial_freqs(self, *dims) -> torch.Tensor:
        all_freqs = []
        for ind, d in enumerate(dims):
            if self.freqs_for == "pixel":
                pos = torch.linspace(-1, 1, steps=d)
            else:
                pos = torch.arange(d)
            freqs = self.forward(pos, seq_len=d)  # [d, f]
            shape = [1] * len(dims) + [freqs.shape[-1]]
            shape[ind] = d
            freqs = freqs.reshape(shape).expand(*dims, freqs.shape[-1])
            all_freqs.append(freqs)
        return torch.cat(all_freqs, dim=-1)


# --------------------------------------------------------------------------- #
# install
# --------------------------------------------------------------------------- #


def _module(name: str) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
        if "." in name:
            parent, child = name.rsplit(".", 1)
            setattr(_module(parent), child, mod)
    return mod


def install_shims() -> None:
    """Install fake diffusers / rotary_embedding_torch / torchvision modules
    into sys.modules (idempotent; no-op for packages that really exist)."""
    if "rotary_embedding_torch" not in sys.modules:
        ret = _module("rotary_embedding_torch")
        ret.RotaryEmbedding = RotaryEmbedding
        ret.apply_rotary_emb = apply_rotary_emb

    try:
        import diffusers  # noqa: F401
    except ImportError:
        _install_diffusers_shim()

    try:
        import torchvision  # noqa: F401
    except ImportError:
        tv = _module("torchvision")
        tvt = _module("torchvision.transforms")

        class ToTensor:  # imported by color_fix.py but unused by the 5 methods
            def __call__(self, pic):
                raise NotImplementedError

        class ToPILImage:
            def __call__(self, pic):
                raise NotImplementedError

        class Compose:
            """torchvision.transforms.Compose (apply in order)."""

            def __init__(self, transforms):
                self.transforms = list(transforms)

            def __call__(self, x):
                for t in self.transforms:
                    x = t(x)
                return x

        class Lambda:
            def __init__(self, fn):
                self.fn = fn

            def __call__(self, x):
                return self.fn(x)

        class Normalize:
            """torchvision Normalize over the channel dim at -3 (the
            reference calls Normalize(0.5, 0.5) on [T, C, H, W] videos,
            generation_utils.py:80)."""

            def __init__(self, mean, std, inplace=False):
                self.mean, self.std = mean, std

            def __call__(self, x):
                mean = torch.as_tensor(self.mean, dtype=x.dtype).reshape(-1, 1, 1)
                std = torch.as_tensor(self.std, dtype=x.dtype).reshape(-1, 1, 1)
                return (x - mean) / std

        class InterpolationMode:
            BICUBIC = "bicubic"
            BILINEAR = "bilinear"
            NEAREST = "nearest"

        def _tvf_resize(image, size, interpolation=InterpolationMode.BICUBIC,
                        antialias=True):
            """torchvision.transforms.functional.resize for tensors: int
            size -> shortest edge = size, long edge FLOORS
            (_compute_resized_output_size); tuple -> exact. Lowers to
            F.interpolate like real torchvision."""
            h, w = image.shape[-2:]
            if isinstance(size, int):
                short, long_ = (h, w) if h <= w else (w, h)
                ns, nl = size, int(size * long_ / short)
                out_hw = (ns, nl) if h <= w else (nl, ns)
            else:
                out_hw = tuple(size)
            x = image
            squeeze = x.ndim == 3
            if squeeze:
                x = x.unsqueeze(0)
            y = F.interpolate(
                x.float(), size=out_hw, mode=str(interpolation),
                align_corners=False, antialias=bool(antialias),
            ).to(image.dtype)
            return y.squeeze(0) if squeeze else y

        def _tvf_center_crop(img, output_size):
            th, tw = output_size
            h, w = img.shape[-2:]
            i, j = (h - th) // 2, (w - tw) // 2
            return img[..., i : i + th, j : j + tw]

        tvf = _module("torchvision.transforms.functional")
        tvf.resize = _tvf_resize
        tvf.center_crop = _tvf_center_crop
        tvf.InterpolationMode = InterpolationMode

        class Resize:
            def __init__(self, size, interpolation=InterpolationMode.BICUBIC, **kw):
                self.size, self.interpolation = size, interpolation

            def __call__(self, img):
                return _tvf_resize(img, self.size, self.interpolation)

        class CenterCrop:
            def __init__(self, size):
                self.size = (size, size) if isinstance(size, int) else size

            def __call__(self, img):
                return _tvf_center_crop(img, self.size)

        tvt.ToTensor = ToTensor
        tvt.ToPILImage = ToPILImage
        tvt.Compose = Compose
        tvt.Lambda = Lambda
        tvt.Normalize = Normalize
        tvt.InterpolationMode = InterpolationMode
        tvt.Resize = Resize
        tvt.CenterCrop = CenterCrop
        tvt.functional = tvf
        tv.transforms = tvt

    try:
        import omegaconf  # noqa: F401
    except ImportError:
        _install_omegaconf_shim()

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


def _install_omegaconf_shim() -> None:
    """Attribute-dict subset of omegaconf — the reference's core modules
    import DictConfig/ListConfig/OmegaConf at module level and the parity
    tests hand-construct runner configs, so only attribute access, .get(),
    and no-op merge/readonly plumbing are needed."""
    om = _module("omegaconf")

    class ListConfig(list):
        pass

    class DictConfig(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError:
                raise AttributeError(k)

        def __setattr__(self, k, v):
            self[k] = v

    def _wrap(v):
        if isinstance(v, dict):
            return DictConfig({k: _wrap(x) for k, x in v.items()})
        if isinstance(v, (list, tuple)):
            return ListConfig([_wrap(x) for x in v])
        return v

    class OmegaConf:
        @staticmethod
        def create(obj=None):
            return _wrap(obj or {})

        @staticmethod
        def set_readonly(cfg, flag):
            pass

        @staticmethod
        def register_new_resolver(*a, **k):
            pass

        @staticmethod
        def merge(a, b):
            out = dict(a)
            for k, v in dict(b).items():
                if k in out and isinstance(out[k], dict) and isinstance(v, dict):
                    out[k] = OmegaConf.merge(out[k], v)
                else:
                    out[k] = v
            return _wrap(out)

        @staticmethod
        def to_object(cfg):
            if isinstance(cfg, dict):
                return {k: OmegaConf.to_object(v) for k, v in cfg.items()}
            if isinstance(cfg, list):
                return [OmegaConf.to_object(v) for v in cfg]
            return cfg

    om.DictConfig = DictConfig
    om.ListConfig = ListConfig
    om.OmegaConf = OmegaConf


def make_config(obj):
    """Build a reference-style attr-dict config from a plain dict (the
    omegaconf-shim DictConfig, or real omegaconf when installed)."""
    try:
        from omegaconf import OmegaConf

        return OmegaConf.create(obj)
    except ImportError:  # pragma: no cover
        raise


def _install_diffusers_shim() -> None:
    diff = _module("diffusers")
    emb = _module("diffusers.models.embeddings")
    emb.get_timestep_embedding = get_timestep_embedding
    normmod = _module("diffusers.models.normalization")
    normmod.RMSNorm = RMSNorm

    # ---- 2D VAE building blocks (constructors; forwards mostly unused — the
    # reference's 3D subclasses replace the convs and override forward) -----
    class Downsample2D(nn.Module):
        """diffusers.models.downsampling.Downsample2D (conv path)."""

        def __init__(self, channels, use_conv=False, out_channels=None, padding=1,
                     name="conv", kernel_size=3, bias=True, **kwargs):
            super().__init__()
            self.channels = channels
            self.out_channels = out_channels or channels
            self.use_conv = use_conv
            self.padding = padding
            self.name = name
            if use_conv:
                conv = nn.Conv2d(self.channels, self.out_channels, kernel_size=kernel_size,
                                 stride=2, padding=padding, bias=bias)
            else:
                conv = nn.AvgPool2d(kernel_size=2, stride=2)
            if name == "conv":
                self.Conv2d_0 = conv
                self.conv = conv
            elif name == "Conv2d_0":
                self.conv = conv
            else:
                self.conv = conv

        def forward(self, hidden_states, *args, **kwargs):
            if self.use_conv and self.padding == 0:
                hidden_states = F.pad(hidden_states, (0, 1, 0, 1), mode="constant", value=0)
            return self.conv(hidden_states)

    class Upsample2D(nn.Module):
        """diffusers.models.upsampling.Upsample2D (conv path)."""

        def __init__(self, channels, use_conv=False, use_conv_transpose=False,
                     out_channels=None, name="conv", kernel_size=None, padding=1,
                     bias=True, interpolate=True, **kwargs):
            super().__init__()
            self.channels = channels
            self.out_channels = out_channels or channels
            self.use_conv = use_conv
            self.use_conv_transpose = use_conv_transpose
            self.name = name
            self.interpolate = interpolate
            conv = None
            if use_conv_transpose:
                if kernel_size is None:
                    kernel_size = 4
                conv = nn.ConvTranspose2d(channels, self.out_channels,
                                          kernel_size=kernel_size, stride=2, padding=padding, bias=bias)
            elif use_conv:
                if kernel_size is None:
                    kernel_size = 3
                conv = nn.Conv2d(self.channels, self.out_channels,
                                 kernel_size=kernel_size, padding=padding, bias=bias)
            if name == "conv":
                self.conv = conv
            else:
                self.Conv2d_0 = conv

        def forward(self, hidden_states, output_size=None, *args, **kwargs):
            if self.use_conv_transpose:
                return self.conv(hidden_states)
            if self.interpolate:
                if output_size is None:
                    hidden_states = F.interpolate(hidden_states, scale_factor=2.0, mode="nearest")
                else:
                    hidden_states = F.interpolate(hidden_states, size=output_size, mode="nearest")
            if self.use_conv:
                if self.name == "conv":
                    hidden_states = self.conv(hidden_states)
                else:
                    hidden_states = self.Conv2d_0(hidden_states)
            return hidden_states

    class ResnetBlock2D(nn.Module):
        """diffusers.models.resnet.ResnetBlock2D (norm-silu-conv x2 + shortcut).

        Subset: no time embedding projection when temb_channels is None, no
        up/down, standard GroupNorm, SiLU nonlinearity — the configuration the
        reference VAE uses (attn_video_vae.py builds it via DownEncoderBlock2D/
        UpDecoderBlock2D with temb_channels=None)."""

        def __init__(self, *, in_channels, out_channels=None, conv_shortcut=False,
                     dropout=0.0, temb_channels=512, groups=32, groups_out=None,
                     pre_norm=True, eps=1e-6, non_linearity="swish",
                     skip_time_act=False, time_embedding_norm="default",
                     kernel=None, output_scale_factor=1.0, use_in_shortcut=None,
                     up=False, down=False, conv_shortcut_bias=True,
                     conv_2d_out_channels=None):
            super().__init__()
            self.pre_norm = True
            self.in_channels = in_channels
            out_channels = in_channels if out_channels is None else out_channels
            self.out_channels = out_channels
            self.use_conv_shortcut = conv_shortcut
            self.up = up
            self.down = down
            self.output_scale_factor = output_scale_factor
            self.time_embedding_norm = time_embedding_norm
            if groups_out is None:
                groups_out = groups
            self.norm1 = nn.GroupNorm(num_groups=groups, num_channels=in_channels, eps=eps, affine=True)
            self.conv1 = nn.Conv2d(in_channels, out_channels, kernel_size=3, stride=1, padding=1)
            if temb_channels is not None:
                self.time_emb_proj = nn.Linear(temb_channels, out_channels)
            else:
                self.time_emb_proj = None
            self.norm2 = nn.GroupNorm(num_groups=groups_out, num_channels=out_channels, eps=eps, affine=True)
            self.dropout = nn.Dropout(dropout)
            conv_2d_out_channels = conv_2d_out_channels or out_channels
            self.conv2 = nn.Conv2d(out_channels, conv_2d_out_channels, kernel_size=3, stride=1, padding=1)
            self.nonlinearity = nn.SiLU()
            self.upsample = self.downsample = None
            if self.up:
                self.upsample = Upsample2D(in_channels, use_conv=False)
            elif self.down:
                self.downsample = Downsample2D(in_channels, use_conv=False, padding=1, name="op")
            self.use_in_shortcut = (
                self.in_channels != conv_2d_out_channels if use_in_shortcut is None else use_in_shortcut
            )
            self.conv_shortcut = None
            if self.use_in_shortcut:
                self.conv_shortcut = nn.Conv2d(in_channels, conv_2d_out_channels,
                                               kernel_size=1, stride=1, padding=0, bias=conv_shortcut_bias)

        def forward(self, input_tensor, temb=None, *args, **kwargs):
            hidden_states = input_tensor
            hidden_states = self.norm1(hidden_states)
            hidden_states = self.nonlinearity(hidden_states)
            if self.upsample is not None:
                input_tensor = self.upsample(input_tensor)
                hidden_states = self.upsample(hidden_states)
            elif self.downsample is not None:
                input_tensor = self.downsample(input_tensor)
                hidden_states = self.downsample(hidden_states)
            hidden_states = self.conv1(hidden_states)
            if self.time_emb_proj is not None:
                temb = self.time_emb_proj(self.nonlinearity(temb))[:, :, None, None]
                hidden_states = hidden_states + temb
            hidden_states = self.norm2(hidden_states)
            hidden_states = self.nonlinearity(hidden_states)
            hidden_states = self.dropout(hidden_states)
            hidden_states = self.conv2(hidden_states)
            if self.conv_shortcut is not None:
                input_tensor = self.conv_shortcut(input_tensor)
            return (input_tensor + hidden_states) / self.output_scale_factor

    class DownEncoderBlock2D(nn.Module):
        """diffusers.models.unets.unet_2d_blocks.DownEncoderBlock2D."""

        def __init__(self, in_channels, out_channels, dropout=0.0, num_layers=1,
                     resnet_eps=1e-6, resnet_time_scale_shift="default",
                     resnet_act_fn="swish", resnet_groups=32, resnet_pre_norm=True,
                     output_scale_factor=1.0, add_downsample=True, downsample_padding=1):
            super().__init__()
            resnets = []
            for i in range(num_layers):
                cur_in = in_channels if i == 0 else out_channels
                resnets.append(ResnetBlock2D(
                    in_channels=cur_in, out_channels=out_channels, temb_channels=None,
                    eps=resnet_eps, groups=resnet_groups, dropout=dropout,
                    time_embedding_norm=resnet_time_scale_shift,
                    non_linearity=resnet_act_fn, output_scale_factor=output_scale_factor,
                    pre_norm=resnet_pre_norm))
            self.resnets = nn.ModuleList(resnets)
            if add_downsample:
                self.downsamplers = nn.ModuleList([
                    Downsample2D(out_channels, use_conv=True, out_channels=out_channels,
                                 padding=downsample_padding, name="op")
                ])
            else:
                self.downsamplers = None

        def forward(self, hidden_states, *args, **kwargs):
            for resnet in self.resnets:
                hidden_states = resnet(hidden_states, temb=None)
            if self.downsamplers is not None:
                for downsampler in self.downsamplers:
                    hidden_states = downsampler(hidden_states)
            return hidden_states

    class UpDecoderBlock2D(nn.Module):
        """diffusers.models.unets.unet_2d_blocks.UpDecoderBlock2D."""

        def __init__(self, in_channels, out_channels, resolution_idx=None, dropout=0.0,
                     num_layers=1, resnet_eps=1e-6, resnet_time_scale_shift="default",
                     resnet_act_fn="swish", resnet_groups=32, resnet_pre_norm=True,
                     output_scale_factor=1.0, add_upsample=True, temb_channels=None):
            super().__init__()
            resnets = []
            for i in range(num_layers):
                input_channels = in_channels if i == 0 else out_channels
                resnets.append(ResnetBlock2D(
                    in_channels=input_channels, out_channels=out_channels,
                    temb_channels=temb_channels, eps=resnet_eps, groups=resnet_groups,
                    dropout=dropout, time_embedding_norm=resnet_time_scale_shift,
                    non_linearity=resnet_act_fn, output_scale_factor=output_scale_factor,
                    pre_norm=resnet_pre_norm))
            self.resnets = nn.ModuleList(resnets)
            if add_upsample:
                self.upsamplers = nn.ModuleList([Upsample2D(out_channels, use_conv=True,
                                                            out_channels=out_channels)])
            else:
                self.upsamplers = None
            self.resolution_idx = resolution_idx

        def forward(self, hidden_states, temb=None, *args, **kwargs):
            for resnet in self.resnets:
                hidden_states = resnet(hidden_states, temb=temb)
            if self.upsamplers is not None:
                for upsampler in self.upsamplers:
                    hidden_states = upsampler(hidden_states)
            return hidden_states

    class Attention(nn.Module):
        """diffusers.models.attention_processor.Attention — the subset the
        reference's VAE mid-block uses: self-attention with group_norm,
        residual_connection=True, spatial input rescaled to (B, HW, C)
        (attn_video_vae.py:615-631)."""

        def __init__(self, query_dim, cross_attention_dim=None, heads=8, dim_head=64,
                     dropout=0.0, bias=False, upcast_attention=False, upcast_softmax=False,
                     cross_attention_norm=None, cross_attention_norm_num_groups=32,
                     added_kv_proj_dim=None, norm_num_groups=None, spatial_norm_dim=None,
                     out_bias=True, scale_qk=True, only_cross_attention=False,
                     eps=1e-5, rescale_output_factor=1.0, residual_connection=False,
                     _from_deprecated_attn_block=False, processor=None, out_dim=None,
                     **kwargs):
            super().__init__()
            self.inner_dim = out_dim if out_dim is not None else dim_head * heads
            self.query_dim = query_dim
            cross_attention_dim = cross_attention_dim if cross_attention_dim is not None else query_dim
            self.rescale_output_factor = rescale_output_factor
            self.residual_connection = residual_connection
            self.heads = out_dim // dim_head if out_dim is not None else heads
            self.scale = dim_head**-0.5 if scale_qk else 1.0
            if norm_num_groups is not None:
                self.group_norm = nn.GroupNorm(num_channels=query_dim, num_groups=norm_num_groups,
                                               eps=eps, affine=True)
            else:
                self.group_norm = None
            self.spatial_norm = None
            self.to_q = nn.Linear(query_dim, self.inner_dim, bias=bias)
            self.to_k = nn.Linear(cross_attention_dim, self.inner_dim, bias=bias)
            self.to_v = nn.Linear(cross_attention_dim, self.inner_dim, bias=bias)
            self.to_out = nn.ModuleList([nn.Linear(self.inner_dim, query_dim, bias=out_bias),
                                         nn.Dropout(dropout)])

        def forward(self, hidden_states, encoder_hidden_states=None, attention_mask=None,
                    temb=None, **cross_attention_kwargs):
            residual = hidden_states
            input_ndim = hidden_states.ndim
            if input_ndim == 4:
                batch_size, channel, height, width = hidden_states.shape
                hidden_states = hidden_states.view(batch_size, channel, height * width).transpose(1, 2)
            if self.group_norm is not None:
                if input_ndim == 4:
                    hs = hidden_states.transpose(1, 2)
                    hs = self.group_norm(hs)
                    hidden_states = hs.transpose(1, 2)
                else:
                    hidden_states = self.group_norm(hidden_states.transpose(1, 2)).transpose(1, 2)
            if encoder_hidden_states is None:
                encoder_hidden_states = hidden_states
            query = self.to_q(hidden_states)
            key = self.to_k(encoder_hidden_states)
            value = self.to_v(encoder_hidden_states)
            b, lq, _ = query.shape
            h = self.heads
            d = self.inner_dim // h
            query = query.view(b, lq, h, d).transpose(1, 2)
            key = key.view(b, -1, h, d).transpose(1, 2)
            value = value.view(b, -1, h, d).transpose(1, 2)
            hidden_states = F.scaled_dot_product_attention(query, key, value)
            hidden_states = hidden_states.transpose(1, 2).reshape(b, lq, self.inner_dim)
            hidden_states = self.to_out[0](hidden_states)
            hidden_states = self.to_out[1](hidden_states)
            if input_ndim == 4:
                hidden_states = hidden_states.transpose(-1, -2).reshape(batch_size, channel, height, width)
            if self.residual_connection:
                hidden_states = hidden_states + residual
            hidden_states = hidden_states / self.rescale_output_factor
            return hidden_states

    class SpatialNorm(nn.Module):
        def __init__(self, f_channels, zq_channels):
            super().__init__()
            self.norm_layer = nn.GroupNorm(num_channels=f_channels, num_groups=32, eps=1e-6, affine=True)
            self.conv_y = nn.Conv2d(zq_channels, f_channels, kernel_size=1)
            self.conv_b = nn.Conv2d(zq_channels, f_channels, kernel_size=1)

        def forward(self, f, zq):
            f_size = f.shape[-2:]
            zq = F.interpolate(zq, size=f_size, mode="nearest")
            norm_f = self.norm_layer(f)
            return norm_f * self.conv_y(zq) + self.conv_b(zq)

    class DiagonalGaussianDistribution:
        """diffusers.models.autoencoders.vae.DiagonalGaussianDistribution."""

        def __init__(self, parameters, deterministic=False):
            self.parameters = parameters
            self.mean, self.logvar = torch.chunk(parameters, 2, dim=1)
            self.logvar = torch.clamp(self.logvar, -30.0, 20.0)
            self.deterministic = deterministic
            self.std = torch.exp(0.5 * self.logvar)
            self.var = torch.exp(self.logvar)
            if self.deterministic:
                self.var = self.std = torch.zeros_like(self.mean)

        def sample(self, generator=None):
            sample = torch.randn(self.mean.shape, generator=generator,
                                 device=self.parameters.device, dtype=self.parameters.dtype)
            return self.mean + self.std * sample

        def mode(self):
            return self.mean

    class DecoderOutput:
        def __init__(self, sample, commit_loss=None):
            self.sample = sample

    class AutoencoderKLOutput:
        def __init__(self, latent_dist):
            self.latent_dist = latent_dist

    class _ConfigMeta:
        """Stand-in for diffusers' register_to_config machinery: the reference
        subclasses diffusers.AutoencoderKL and calls its __init__ (which in
        real diffusers registers a FrozenDict config). The VAE's runtime
        behaviour only touches self.config fields set explicitly."""

    class _FrozenConfig(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

    class AutoencoderKL(nn.Module):
        """Shim of diffusers.AutoencoderKL sufficient as a base class: records
        __init__ kwargs into .config; builds no modules (the reference
        subclasses build their own encoder/decoder/quant convs).

        Real diffusers builds Encoder/Decoder here, but the reference's
        VideoAutoencoderKL.__init__ (attn_video_vae.py:1063+) overrides them
        immediately; to keep the shim honest we build nothing and let the
        subclass define all submodules."""

        def __init__(self, **kwargs):
            nn.Module.__init__(self)
            defaults = dict(
                in_channels=3, out_channels=3,
                down_block_types=("DownEncoderBlock2D",),
                up_block_types=("UpDecoderBlock2D",),
                block_out_channels=(64,), layers_per_block=1, act_fn="silu",
                latent_channels=4, norm_num_groups=32, sample_size=32,
                scaling_factor=0.18215,
            )
            defaults.update(kwargs)
            self.config = _FrozenConfig(defaults)
            self.use_slicing = False
            self.use_tiling = False

        def register_to_config(self, **kwargs):
            self.config.update(kwargs)

        @property
        def device(self):  # diffusers ModelMixin.device
            return next(self.parameters()).device

        @property
        def dtype(self):  # diffusers ModelMixin.dtype
            return next(self.parameters()).dtype

        def enable_slicing(self):
            self.use_slicing = True

        def disable_slicing(self):
            self.use_slicing = False

        def enable_tiling(self):
            self.use_tiling = True

        def disable_tiling(self):
            self.use_tiling = False

    def is_torch_version(operation, version):
        from packaging import version as pv

        tv = pv.parse(torch.__version__.split("+")[0])
        ov = pv.parse(version)
        return {"==": tv == ov, ">=": tv >= ov, ">": tv > ov, "<=": tv <= ov, "<": tv < ov}[operation]

    def apply_forward_hook(fn):
        return fn

    class LoRACompatibleConv(nn.Conv2d):
        pass

    diff.AutoencoderKL = AutoencoderKL
    _module("diffusers.models")
    ap = _module("diffusers.models.attention_processor")
    ap.Attention = Attention
    ap.SpatialNorm = SpatialNorm
    _module("diffusers.models.autoencoders")
    vae_mod = _module("diffusers.models.autoencoders.vae")
    vae_mod.DecoderOutput = DecoderOutput
    vae_mod.DiagonalGaussianDistribution = DiagonalGaussianDistribution
    ds = _module("diffusers.models.downsampling")
    ds.Downsample2D = Downsample2D
    lora = _module("diffusers.models.lora")
    lora.LoRACompatibleConv = LoRACompatibleConv
    mo = _module("diffusers.models.modeling_outputs")
    mo.AutoencoderKLOutput = AutoencoderKLOutput
    rn = _module("diffusers.models.resnet")
    rn.ResnetBlock2D = ResnetBlock2D
    _module("diffusers.models.unets")
    u2d = _module("diffusers.models.unets.unet_2d_blocks")
    u2d.DownEncoderBlock2D = DownEncoderBlock2D
    u2d.UpDecoderBlock2D = UpDecoderBlock2D
    us = _module("diffusers.models.upsampling")
    us.Upsample2D = Upsample2D
    du = _module("diffusers.utils")
    du.is_torch_version = is_torch_version
    dua = _module("diffusers.utils.accelerate_utils")
    dua.apply_forward_hook = apply_forward_hook
