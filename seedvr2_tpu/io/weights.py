"""Checkpoint loading: reference torch safetensors -> TPU param pytrees.

The reference ships weights as torch safetensors (DiT: seedvr2_ema_3b/7b_*
.safetensors; VAE: ema_vae_fp16.safetensors) loaded via meta-device deferred
materialization (reference: src/core/model_loader.py:84-153, 416-544). Here
loading is a single host-side pass: read tensors -> rename/transpose into
our layout -> device_put (optionally with a NamedSharding per leaf).

Layout conversions:
- torch Linear [out, in]        -> ours [in, out]       (transpose)
- torch Conv3d [O, I, D, H, W]  -> ours [D, H, W, I, O]  (transpose 2,3,4,1,0)
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

from ..config import DiTConfig, VAEConfig

Params = Dict


def _t_linear(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _t_conv3d(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(2, 3, 4, 1, 0))


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Load a safetensors file to host numpy (handles bf16/fp16/fp8 — the
    registry ships fp8_e4m3fn and mixed-precision checkpoints, reference:
    model_registry.py:34-57)."""
    from safetensors import safe_open

    out = {}
    needs_torch = []
    with safe_open(path, framework="np") as f:
        keys = list(f.keys())
        for k in keys:
            try:
                out[k] = f.get_tensor(k)
            except Exception:
                needs_torch.append(k)
    if needs_torch:
        # dtypes numpy can't represent (bf16, fp8_e4m3fn): one torch pass,
        # upcast to fp32.
        import torch
        from safetensors import torch as st_torch

        full = st_torch.load_file(path)
        for k in needs_torch:
            out[k] = full[k].to(torch.float32).numpy()
    return out


def load_pth(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .pth checkpoint to host numpy (reference:
    model_loader.py:141-153 — mmap + weights_only=True for safety)."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True, mmap=True)
    if isinstance(state, dict) and "state_dict" in state and isinstance(state["state_dict"], dict):
        state = state["state_dict"]
    out = {}
    for k, v in state.items():
        if not hasattr(v, "numpy"):
            continue
        if v.dtype in (torch.bfloat16, torch.float16, torch.float32, torch.float64):
            out[k] = v.to(torch.float32).numpy()
        else:
            out[k] = v.numpy()
    return out


def load_state_dict_any(path: str, dtype=np.float32) -> Dict[str, np.ndarray]:
    """Format dispatch: .safetensors / .gguf / .pth|.pt (reference:
    load_quantized_state_dict, model_loader.py:84-153)."""
    if path.endswith(".gguf"):
        from .gguf import load_gguf_state_dict

        return load_gguf_state_dict(path, dtype)
    if path.endswith((".pth", ".pt")):
        return load_pth(path)
    return load_safetensors(path)


# --------------------------------------------------------------------------- #
# DiT key mapping
# --------------------------------------------------------------------------- #

_ADA_KEYS = ("attn_shift", "attn_scale", "attn_gate", "mlp_shift", "mlp_scale", "mlp_gate")


def dit_key_map(cfg: DiTConfig) -> Dict[str, Tuple[str, str]]:
    """our flat path -> (torch key, transform). Flat path uses '/'."""
    m: Dict[str, Tuple[str, str]] = {
        "vid_in/w": ("vid_in.proj.weight", "linear"),
        "vid_in/b": ("vid_in.proj.bias", "none"),
        "txt_in/w": ("txt_in.weight", "linear"),
        "txt_in/b": ("txt_in.bias", "none"),
        "emb_in/proj_in/w": ("emb_in.proj_in.weight", "linear"),
        "emb_in/proj_in/b": ("emb_in.proj_in.bias", "none"),
        "emb_in/proj_hid/w": ("emb_in.proj_hid.weight", "linear"),
        "emb_in/proj_hid/b": ("emb_in.proj_hid.bias", "none"),
        "emb_in/proj_out/w": ("emb_in.proj_out.weight", "linear"),
        "emb_in/proj_out/b": ("emb_in.proj_out.bias", "none"),
        "vid_out/w": ("vid_out.proj.weight", "linear"),
        "vid_out/b": ("vid_out.proj.bias", "none"),
    }
    if cfg.vid_out_norm:
        m["vid_out_norm/w"] = ("vid_out_norm.weight", "none")
        m["vid_out_ada/vid/out_shift"] = ("vid_out_ada.out_shift", "none")
        m["vid_out_ada/vid/out_scale"] = ("vid_out_ada.out_scale", "none")

    for i in range(cfg.num_layers):
        shared = cfg.shared_weights(i)
        vid_only = cfg.vid_only(i)
        branches = ["all"] if shared else (["vid"] if vid_only else ["vid", "txt"])

        def bset(our_mid, ref_mid, has_bias=True, kind="linear", bias_kind="none", branches=branches):
            for br in branches:
                m[f"blocks/{i}/{our_mid}/{br}/w"] = (f"blocks.{i}.{ref_mid}.{br}.weight", kind)
                if has_bias:
                    m[f"blocks/{i}/{our_mid}/{br}/b"] = (f"blocks.{i}.{ref_mid}.{br}.bias", bias_kind)

        bset("attn/qkv", "attn.proj_qkv", has_bias=cfg.qk_bias, kind="qkv_w", bias_kind="qkv_b")
        bset("attn/out", "attn.proj_out", has_bias=True)
        for br in branches:
            m[f"blocks/{i}/attn/norm_q/{br}/w"] = (f"blocks.{i}.attn.norm_q.{br}.weight", "none")
            m[f"blocks/{i}/attn/norm_k/{br}/w"] = (f"blocks.{i}.attn.norm_k.{br}.weight", "none")

        mlp_branches = ["all"] if shared else (["vid"] if vid_only else ["vid", "txt"])
        if cfg.mlp_type == "swiglu":
            for sub in ("proj_in_gate", "proj_in", "proj_out"):
                for br in mlp_branches:
                    m[f"blocks/{i}/mlp/{br}/{sub}/w"] = (f"blocks.{i}.mlp.{br}.{sub}.weight", "linear")
        else:
            for sub in ("proj_in", "proj_out"):
                for br in mlp_branches:
                    m[f"blocks/{i}/mlp/{br}/{sub}/w"] = (f"blocks.{i}.mlp.{br}.{sub}.weight", "linear")
                    m[f"blocks/{i}/mlp/{br}/{sub}/b"] = (f"blocks.{i}.mlp.{br}.{sub}.bias", "none")
        for br in mlp_branches:
            for ak in _ADA_KEYS:
                m[f"blocks/{i}/ada/{br}/{ak}"] = (f"blocks.{i}.ada.{br}.{ak}", "none")
    return m


# --------------------------------------------------------------------------- #
# VAE key mapping
# --------------------------------------------------------------------------- #


def vae_key_map(cfg: VAEConfig) -> Dict[str, Tuple[str, str]]:
    m: Dict[str, Tuple[str, str]] = {}

    def conv(our, ref):
        m[f"{our}/w"] = (f"{ref}.weight", "conv3d")
        m[f"{our}/b"] = (f"{ref}.bias", "none")

    def norm(our, ref):
        m[f"{our}/w"] = (f"{ref}.weight", "none")
        m[f"{our}/b"] = (f"{ref}.bias", "none")

    def lin(our, ref):
        m[f"{our}/w"] = (f"{ref}.weight", "linear")
        m[f"{our}/b"] = (f"{ref}.bias", "none")

    def resnet(our, ref, cin, cout):
        norm(f"{our}/norm1", f"{ref}.norm1")
        conv(f"{our}/conv1", f"{ref}.conv1")
        norm(f"{our}/norm2", f"{ref}.norm2")
        conv(f"{our}/conv2", f"{ref}.conv2")
        if cin != cout:
            conv(f"{our}/conv_shortcut", f"{ref}.conv_shortcut")

    def mid(our, ref, c):
        resnet(f"{our}/resnet0", f"{ref}.resnets.0", c, c)
        resnet(f"{our}/resnet1", f"{ref}.resnets.1", c, c)
        if cfg.mid_block_attention:
            norm(f"{our}/attn/group_norm", f"{ref}.attentions.0.group_norm")
            lin(f"{our}/attn/to_q", f"{ref}.attentions.0.to_q")
            lin(f"{our}/attn/to_k", f"{ref}.attentions.0.to_k")
            lin(f"{our}/attn/to_v", f"{ref}.attentions.0.to_v")
            lin(f"{our}/attn/to_out", f"{ref}.attentions.0.to_out.0")

    boc = cfg.block_out_channels
    conv("encoder/conv_in", "encoder.conv_in")
    cin = boc[0]
    for i in range(cfg.num_blocks):
        cout = boc[i]
        for j in range(cfg.layers_per_block):
            resnet(
                f"encoder/down{i}/resnets/{j}",
                f"encoder.down_blocks.{i}.resnets.{j}",
                cin if j == 0 else cout,
                cout,
            )
        if i < cfg.num_blocks - 1:
            conv(f"encoder/down{i}/downsample", f"encoder.down_blocks.{i}.downsamplers.0.conv")
        cin = cout
    mid("encoder/mid", "encoder.mid_block", boc[-1])
    norm("encoder/norm_out", "encoder.conv_norm_out")
    conv("encoder/conv_out", "encoder.conv_out")

    rev = list(reversed(boc))
    conv("decoder/conv_in", "decoder.conv_in")
    mid("decoder/mid", "decoder.mid_block", rev[0])
    cin = rev[0]
    for i in range(cfg.num_blocks):
        cout = rev[i]
        for j in range(cfg.layers_per_block + 1):
            resnet(
                f"decoder/up{i}/resnets/{j}",
                f"decoder.up_blocks.{i}.resnets.{j}",
                cin if j == 0 else cout,
                cout,
            )
        if i < cfg.num_blocks - 1:
            conv(f"decoder/up{i}/upsample/upscale", f"decoder.up_blocks.{i}.upsamplers.0.upscale_conv")
            conv(f"decoder/up{i}/upsample/conv", f"decoder.up_blocks.{i}.upsamplers.0.conv")
        cin = cout
    norm("decoder/norm_out", "decoder.conv_norm_out")
    conv("decoder/conv_out", "decoder.conv_out")
    return m


# --------------------------------------------------------------------------- #
# Tree <-> flat helpers + loading
# --------------------------------------------------------------------------- #


def flatten_tree(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(flatten_tree(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = tree
    return out


def unflatten_into(template, flat: Dict[str, np.ndarray], prefix=""):
    """Build a tree shaped like template from flat path -> array."""
    if isinstance(template, dict):
        return {k: unflatten_into(v, flat, f"{prefix}{k}/") for k, v in template.items()}
    if isinstance(template, (list, tuple)):
        return [unflatten_into(v, flat, f"{prefix}{i}/") for i, v in enumerate(template)]
    return flat[prefix[:-1]]


def _t_qkv_w(w: np.ndarray) -> np.ndarray:
    # torch [3*inner, D] -> ours [D, 3, inner]
    out3, d = w.shape
    return np.ascontiguousarray(w.T.reshape(d, 3, out3 // 3))


def _t_qkv_b(b: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(b.reshape(3, -1))


_TRANSFORMS = {
    "none": lambda x: x,
    "linear": _t_linear,
    "conv3d": _t_conv3d,
    "qkv_w": _t_qkv_w,
    "qkv_b": _t_qkv_b,
}
_INVERSE = {
    "none": lambda x: x,
    "linear": lambda x: np.ascontiguousarray(np.asarray(x).T),
    "conv3d": lambda x: np.ascontiguousarray(np.asarray(x).transpose(4, 3, 0, 1, 2)),
    "qkv_w": lambda x: np.ascontiguousarray(
        np.asarray(x).reshape(x.shape[0], -1).T
    ),
    "qkv_b": lambda x: np.ascontiguousarray(np.asarray(x).reshape(-1)),
}


def convert_state_dict(
    state: Dict[str, np.ndarray], key_map: Dict[str, Tuple[str, str]], dtype=np.float32
) -> Dict[str, np.ndarray]:
    """torch state dict -> flat our-layout dict. Raises on missing keys."""
    out = {}
    missing = []
    for ours, (theirs, kind) in key_map.items():
        if theirs not in state:
            missing.append(theirs)
            continue
        arr = np.asarray(state[theirs])
        out[ours] = _TRANSFORMS[kind](arr).astype(dtype)
    if missing:
        raise KeyError(f"Checkpoint missing {len(missing)} keys, e.g. {missing[:5]}")
    return out


def export_state_dict(
    params, key_map: Dict[str, Tuple[str, str]]
) -> Dict[str, np.ndarray]:
    """our params -> torch-layout state dict (for round-trip tests and
    checkpoint re-export)."""
    flat = flatten_tree(params)
    out = {}
    for ours, (theirs, kind) in key_map.items():
        out[theirs] = _INVERSE[kind](np.asarray(flat[ours]))
    return out


def load_dit_params(path: str, cfg: DiTConfig, template, dtype=np.float32):
    state = load_state_dict_any(path, dtype)
    flat = convert_state_dict(state, dit_key_map(cfg), dtype)
    return unflatten_into(template, flat)


def load_vae_params(path: str, cfg: VAEConfig, template, dtype=np.float32):
    state = load_state_dict_any(path, dtype)
    flat = convert_state_dict(state, vae_key_map(cfg), dtype)
    return unflatten_into(template, flat)


def load_text_embeddings(directory: Optional[str] = None) -> Tuple[np.ndarray, np.ndarray]:
    """Load the fixed prompt embeddings. The model has no text encoder at
    inference — the reference ships pos_emb.pt / neg_emb.pt in-repo
    (loaded at generation_utils.py:517-557); we bundle the same tensors as
    an npz asset and also accept a directory containing the original .pt
    files."""
    if directory:
        pos_pt = os.path.join(directory, "pos_emb.pt")
        npz = os.path.join(directory, "text_embeddings.npz")
        if os.path.exists(pos_pt):
            import torch

            pos = torch.load(pos_pt, weights_only=True, map_location="cpu")
            neg = torch.load(
                os.path.join(directory, "neg_emb.pt"), weights_only=True, map_location="cpu"
            )
            return pos.to(torch.float32).numpy(), neg.to(torch.float32).numpy()
        if os.path.exists(npz):
            data = np.load(npz)
            return data["pos"], data["neg"]
    bundled = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "assets", "text_embeddings.npz")
    data = np.load(bundled)
    return data["pos"], data["neg"]
