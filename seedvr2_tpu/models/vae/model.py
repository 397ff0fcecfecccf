"""Causal 3D video VAE (8x spatial, 4x temporal, 16 latent channels).

TPU-native reimplementation of the reference VideoAutoencoderKLWrapper
(reference: src/models/video_vae_v3/modules/attn_video_vae.py). Layout is
channels-last [B, T, H, W, C] throughout (TPU convolutions want NDHWC);
GroupNorm statistics are per-frame exactly like the reference's
``causal_norm_wrapper`` rearrange to (b t) c h w (reference:
causal_inflation_lib.py:354-409). Streaming state is explicit (see
causal_conv.py) instead of module-held memory banks.

Encoder: conv_in -> 4x DownEncoderBlock3D (2 resnets each; spatial down on
blocks 0-2, temporal down on blocks 1-2) -> mid (resnet, per-frame 2D
attention, resnet) -> GroupNorm/SiLU/conv_out -> 2*latent channels.
Decoder mirrors it with 3-resnet up blocks and MAGViT depth-to-space
upsampling with identity-initialised 1x1x1 expansion
(reference: attn_video_vae.py:91-103).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...config import VAEConfig
from ...ops.normalization import group_norm
from .causal_conv import State, StreamCtx, causal_conv3d

Params = Dict


# --------------------------------------------------------------------------- #
# Init helpers
# --------------------------------------------------------------------------- #


def _conv3d_params(key, kt, kh, kw, cin, cout, dtype):
    fan_in = kt * kh * kw * cin
    w = jax.random.normal(key, (kt, kh, kw, cin, cout), jnp.float32) * (fan_in**-0.5)
    return {"w": w.astype(dtype), "b": jnp.zeros((cout,), dtype)}


def _linear_params(key, cin, cout, dtype):
    w = jax.random.normal(key, (cin, cout), jnp.float32) * (cin**-0.5)
    return {"w": w.astype(dtype), "b": jnp.zeros((cout,), dtype)}


def _norm_params(c, dtype):
    return {"w": jnp.ones((c,), dtype), "b": jnp.zeros((c,), dtype)}


def _resnet_params(key, cin, cout, cfg: VAEConfig, dtype):
    k = jax.random.split(key, 3)
    kt1 = 3 if cfg.time_receptive_field == "full" else 1
    p = {
        "norm1": _norm_params(cin, dtype),
        "conv1": _conv3d_params(k[0], kt1, 3, 3, cin, cout, dtype),
        "norm2": _norm_params(cout, dtype),
        "conv2": _conv3d_params(k[1], 3, 3, 3, cout, cout, dtype),
    }
    if cin != cout:
        p["conv_shortcut"] = _conv3d_params(k[2], 1, 1, 1, cin, cout, dtype)
    return p


def _attn_params(key, c, dtype):
    k = jax.random.split(key, 4)
    return {
        "group_norm": _norm_params(c, dtype),
        "to_q": _linear_params(k[0], c, c, dtype),
        "to_k": _linear_params(k[1], c, c, dtype),
        "to_v": _linear_params(k[2], c, c, dtype),
        "to_out": _linear_params(k[3], c, c, dtype),
    }


def _mid_params(key, c, cfg, dtype):
    k = jax.random.split(key, 3)
    p = {"resnet0": _resnet_params(k[0], c, c, cfg, dtype), "resnet1": _resnet_params(k[1], c, c, cfg, dtype)}
    if cfg.mid_block_attention:
        p["attn"] = _attn_params(k[2], c, dtype)
    return p


def init_vae_params(cfg: VAEConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, 64)
    ki = iter(range(64))
    boc = cfg.block_out_channels
    enc: Params = {"conv_in": _conv3d_params(keys[next(ki)], 3, 3, 3, cfg.in_channels, boc[0], dtype)}
    cin = boc[0]
    for i in range(cfg.num_blocks):
        cout = boc[i]
        blk = {"resnets": []}
        for j in range(cfg.layers_per_block):
            blk["resnets"].append(_resnet_params(keys[next(ki)], cin if j == 0 else cout, cout, cfg, dtype))
        if i < cfg.num_blocks - 1:
            td = cfg.encoder_temporal_down(i)
            blk["downsample"] = _conv3d_params(keys[next(ki)], 3 if td else 1, 3, 3, cout, cout, dtype)
        enc[f"down{i}"] = blk
        cin = cout
    enc["mid"] = _mid_params(keys[next(ki)], boc[-1], cfg, dtype)
    enc["norm_out"] = _norm_params(boc[-1], dtype)
    enc["conv_out"] = _conv3d_params(keys[next(ki)], 3, 3, 3, boc[-1], 2 * cfg.latent_channels, dtype)

    rev = list(reversed(boc))
    dec: Params = {"conv_in": _conv3d_params(keys[next(ki)], 3, 3, 3, cfg.latent_channels, rev[0], dtype)}
    dec["mid"] = _mid_params(keys[next(ki)], rev[0], cfg, dtype)
    cin = rev[0]
    for i in range(cfg.num_blocks):
        cout = rev[i]
        blk = {"resnets": []}
        for j in range(cfg.layers_per_block + 1):
            blk["resnets"].append(_resnet_params(keys[next(ki)], cin if j == 0 else cout, cout, cfg, dtype))
        if i < cfg.num_blocks - 1:
            tu = cfg.decoder_temporal_up(i)
            ratio = 4 * (2 if tu else 1)
            # MAGViT identity-init 1x1x1 expansion (reference:
            # attn_video_vae.py:94-103) + 3x3x3 causal conv.
            up_w = np.tile(np.eye(cout, dtype=np.float32), (ratio, 1)).reshape(cout * ratio, cout)
            blk["upsample"] = {
                "upscale": {
                    "w": jnp.asarray(up_w.T[None, None, None], dtype),  # [1,1,1,C,C*r]
                    "b": jnp.zeros((cout * ratio,), dtype),
                },
                "conv": _conv3d_params(keys[next(ki)], 3, 3, 3, cout, cout, dtype),
            }
        dec[f"up{i}"] = blk
        cin = cout
    dec["norm_out"] = _norm_params(rev[-1], dtype)
    dec["conv_out"] = _conv3d_params(keys[next(ki)], 3, 3, 3, rev[-1], cfg.out_channels, dtype)
    return {"encoder": enc, "decoder": dec}


# --------------------------------------------------------------------------- #
# Forward blocks
# --------------------------------------------------------------------------- #


def _gn(p, x, groups):
    """Per-frame GroupNorm on [B, T, H, W, C] (stats per (b, t))."""
    B, T, H, W, C = x.shape
    y = group_norm(x.reshape(B * T, H, W, C), groups, p["w"], p["b"], eps=1e-6)
    return y.reshape(x.shape)


def _silu(x):
    return jax.nn.silu(x.astype(jnp.float32)).astype(x.dtype)


def _resnet(p, cfg: VAEConfig, x, ctx: StreamCtx, name: str):
    """ResnetBlock3D (reference: attn_video_vae.py:311-362, temb=None path).

    GroupNorm+SiLU run INSIDE each conv (``gn=``): the Pallas path folds
    them into the conv's slab load, and the streaming carry holds the raw
    input tail — numerically identical either way (causal_conv.py)."""
    with ctx.scope(name):
        gn1 = (p["norm1"], cfg.norm_num_groups)
        gn2 = (p["norm2"], cfg.norm_num_groups)
        h = causal_conv3d(p["conv1"], x, ctx, "conv1", gn=gn1)
        h = causal_conv3d(p["conv2"], h, ctx, "conv2", gn=gn2)
        if "conv_shortcut" in p:
            x = causal_conv3d(p["conv_shortcut"], x, ctx, "shortcut", spatial_pad=((0, 0), (0, 0)))
        return x + h


def _mid_attention(p, cfg: VAEConfig, x):
    """Per-frame single-head 2D self-attention with residual
    (reference: attn_video_vae.py:656-668 + diffusers Attention)."""
    B, T, H, W, C = x.shape
    res = x
    h = _gn(p["group_norm"], x, cfg.norm_num_groups)
    h = h.reshape(B * T, H * W, C)

    def lin(pp, v):
        return v @ pp["w"].astype(v.dtype) + pp["b"].astype(v.dtype)

    q, k, v = lin(p["to_q"], h), lin(p["to_k"], h), lin(p["to_v"], h)
    logits = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * (1.0 / np.sqrt(C))
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    o = jnp.einsum("bqk,bkc->bqc", probs, v)
    o = lin(p["to_out"], o).reshape(B, T, H, W, C)
    return o + res


def _mid(p, cfg: VAEConfig, x, ctx: StreamCtx, name: str):
    with ctx.scope(name):
        x = _resnet(p["resnet0"], cfg, x, ctx, "resnet0")
        if "attn" in p:
            x = _mid_attention(p["attn"], cfg, x)
        x = _resnet(p["resnet1"], cfg, x, ctx, "resnet1")
        return x


def _remove_head(x):
    """Drop the duplicated second frame after temporal depth-to-space on the
    first slice (reference: causal_inflation_lib.py:412-419, times=1)."""
    return jnp.concatenate([x[:, :1], x[:, 2:]], axis=1)


# Folded upsample (expansion + depth-to-space + conv as one low-res conv,
# folded_upsample.py): 3.5x fewer FLOPs on the decode-dominating upsample
# convs, numerically equal to the naive path up to fp32 fold reassociation
# (tests/test_folded_upsample.py). Toggle for A/B and fallback.
_FOLDED_UPSAMPLE = True


def set_folded_upsample(on: bool) -> None:
    global _FOLDED_UPSAMPLE
    _FOLDED_UPSAMPLE = bool(on)


def _upsample(p, cfg: VAEConfig, x, ctx: StreamCtx, name: str, temporal_up: bool):
    """MAGViT-v2 depth-to-space upsample (reference: attn_video_vae.py:110-174).
    Channel unpack order matches "b (x y z c) f h w -> b c (f z) (h x) (w y)"."""
    if _FOLDED_UPSAMPLE:
        from .folded_upsample import upsample_folded

        return upsample_folded(p, cfg, x, ctx, name, temporal_up)
    B, T, H, W, C = x.shape
    with ctx.scope(name):
        tz = 2 if temporal_up else 1
        y = x @ p["upscale"]["w"][0, 0, 0].astype(x.dtype) + p["upscale"]["b"].astype(x.dtype)
        # y: [B,T,H,W, (sx*sy*tz*C)] with x (h) slowest, then y (w), z (t), c.
        y = y.reshape(B, T, H, W, 2, 2, tz, C)
        y = y.transpose(0, 1, 6, 2, 4, 3, 5, 7)  # B T z H x W y C
        y = y.reshape(B, T * tz, H * 2, W * 2, C)
        if temporal_up and ctx.mode != "active":
            y = _remove_head(y)
        y = causal_conv3d(p["conv"], y, ctx, "conv")
        return y


def encoder_forward(
    params: Params, cfg: VAEConfig, x: jnp.ndarray, ctx: Optional[StreamCtx] = None
) -> jnp.ndarray:
    """[B, T, H, W, 3] -> moments [B, T', H/8, W/8, 2*latent]
    (reference: Encoder3D.forward, attn_video_vae.py:808-856)."""
    p = params["encoder"]
    ctx = ctx or StreamCtx("disabled")
    with ctx.scope("encoder"):
        h = causal_conv3d(p["conv_in"], x, ctx, "conv_in")
        for i in range(cfg.num_blocks):
            blk = p[f"down{i}"]
            with ctx.scope(f"down{i}"):
                for j, rp in enumerate(blk["resnets"]):
                    h = _resnet(rp, cfg, h, ctx, f"resnet{j}")
                if "downsample" in blk:
                    # Asymmetric (0,1,0,1) spatial pad (reference:
                    # attn_video_vae.py:242-244 with padding=0)
                    td = cfg.encoder_temporal_down(i)
                    h = causal_conv3d(
                        blk["downsample"],
                        h,
                        ctx,
                        "downsample",
                        stride=(2 if td else 1, 2, 2),
                        spatial_pad=((0, 1), (0, 1)),
                        temporal_pad=1 if td else 0,
                    )
        h = _mid(p["mid"], cfg, h, ctx, "mid")
        h = _gn(p["norm_out"], h, cfg.norm_num_groups)
        h = _silu(h)
        h = causal_conv3d(p["conv_out"], h, ctx, "conv_out")
        return h


def decoder_forward(
    params: Params, cfg: VAEConfig, z: jnp.ndarray, ctx: Optional[StreamCtx] = None
) -> jnp.ndarray:
    """[B, T', H', W', latent] -> [B, T, 8H', 8W', 3]
    (reference: Decoder3D.forward, attn_video_vae.py:983-1035)."""
    p = params["decoder"]
    ctx = ctx or StreamCtx("disabled")
    with ctx.scope("decoder"):
        h = causal_conv3d(p["conv_in"], z, ctx, "conv_in")
        h = _mid(p["mid"], cfg, h, ctx, "mid")
        for i in range(cfg.num_blocks):
            blk = p[f"up{i}"]
            with ctx.scope(f"up{i}"):
                for j, rp in enumerate(blk["resnets"]):
                    h = _resnet(rp, cfg, h, ctx, f"resnet{j}")
                if "upsample" in blk:
                    h = _upsample(blk["upsample"], cfg, h, ctx, "upsample", cfg.decoder_temporal_up(i))
        h = _gn(p["norm_out"], h, cfg.norm_num_groups)
        h = _silu(h)
        h = causal_conv3d(p["conv_out"], h, ctx, "conv_out")
        return h


def posterior_mode(moments: jnp.ndarray) -> jnp.ndarray:
    """Deterministic latent = mean of the diagonal Gaussian
    (reference: attn_video_vae.py:1688 p.mode())."""
    c = moments.shape[-1] // 2
    return moments[..., :c]


def posterior_sample(moments: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    c = moments.shape[-1] // 2
    mean = moments[..., :c]
    logvar = jnp.clip(moments[..., c:], -30.0, 20.0)
    std = jnp.exp(0.5 * logvar.astype(jnp.float32))
    eps = jax.random.normal(key, mean.shape, jnp.float32)
    return (mean.astype(jnp.float32) + std * eps).astype(mean.dtype)
