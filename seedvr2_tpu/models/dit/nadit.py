"""NaDiT — Native-resolution Diffusion Transformer, TPU-native.

Ground-up JAX reimplementation of the reference NaDiT 3B/7B
(reference: src/models/dit_3b/nadit.py, src/models/dit_7b/nadit.py and their
nablocks). Differences from the reference are deliberate TPU design:

- Dense, statically-shaped tensors [B, L, D] instead of flattened varlen
  (L, c) + shape tensors: one pipeline run has constant shapes, so the
  whole na.py index machinery becomes compile-time gather plans
  (models/dit/windows.py).
- Window attention over padded uniform windows with a key-validity mask
  instead of flash-attn varlen cu_seqlens
  (reference: dit_3b/nablocks/attention/mmattn.py:190-257).
- Text tokens are appended to every window; their attention outputs are
  averaged over windows, matching na.repeat_concat_idx's coalescing
  (reference: dit_3b/na.py:396-417).
- Per-window RoPE with window-local coordinates, matching the reference's
  get_freqs on window_shape (3B mmrope: temporal offset by txt_len,
  dit_3b/rope.py:154-176; 7B pixel rope, dit_7b/rope.py:95-111).
- Parameters are a plain nested-dict pytree -> trivially shardable with
  jax.sharding NamedSharding (parallel/sharding.py), replacing BlockSwap.

Quirk replicated on purpose: the reference 3B vid_out_ada asks AdaSingle for
layer "out" but, due to the shared per-forward cache key "emb_repeat_0_vid",
receives the *attn-layer* slice of the time embedding computed by the blocks
(reference: dit_3b/modulation.py:80-87 with nadit.py:236-244). We therefore
use the attn slice (l=0) for the output modulation; checkpoint parity
requires this, a "fixed" version would change numerics.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...config import DiTConfig
from ...ops.attention import attention
from ...ops.normalization import rms_norm
from ...ops.rope import apply_rotary, axial_freqs_lang, axial_freqs_pixel, pad_angles
from ...parallel.sp import constrain_attn_io, constrain_tokens, constrain_windows
from .windows import WindowPlan, window_plan

Params = Dict


# --------------------------------------------------------------------------- #
# Static per-resolution attention plan (windows + rope angles + masks)
# --------------------------------------------------------------------------- #


class LayerPlan(NamedTuple):
    plan: WindowPlan
    vid_angles: Optional[np.ndarray]  # [n_win, max_len, rot] or None
    txt_angles: Optional[np.ndarray]  # [txt_len, rot] or None


class AttnPlans(NamedTuple):
    """One entry per distinct window method (plain / shifted)."""

    plain: LayerPlan
    shifted: LayerPlan
    thw: Tuple[int, int, int]
    txt_len: int

    def for_layer(self, i: int) -> LayerPlan:
        # window_method alternates [plain, shifted] (reference:
        # configs_*/main.yaml window_method).
        return self.plain if i % 2 == 0 else self.shifted


def plan_device_args(plans: AttnPlans) -> Dict:
    """Plan constants as a device-array pytree to pass INTO jit as an
    ARGUMENT (``nadit_forward(..., plan_args=...)``).

    Without this, the gather indices and rope angle tables embed into every
    compiled program as literals — ~22MB at 1080p and ~90MB at 4K, which
    (a) bloats every per-shape executable and (b) trips remote compile
    helpers that cap program size (observed HTTP 413 on this environment's
    tunnel). Upload once per shape bucket, reuse across steps/executables."""

    def one(lp: LayerPlan):
        d = {
            "index": jnp.asarray(lp.plan.index.reshape(-1)),
            "inverse": jnp.asarray(lp.plan.inverse),
            "valid": jnp.asarray(lp.plan.valid),
        }
        if lp.vid_angles is not None:
            d["vid_angles"] = jnp.asarray(lp.vid_angles)
        if lp.txt_angles is not None:
            d["txt_angles"] = jnp.asarray(lp.txt_angles)
        return d

    return {"plain": one(plans.plain), "shifted": one(plans.shifted)}


def _plan_arrays(lp: LayerPlan, args: Optional[Dict]):
    """(index, inverse, valid, vid_angles, txt_angles) as jnp values, from
    the argument pytree when given, else embedded from the host plan."""
    if args is not None:
        return (
            args["index"],
            args["inverse"],
            args["valid"],
            args.get("vid_angles"),
            args.get("txt_angles"),
        )
    return (
        jnp.asarray(lp.plan.index.reshape(-1)),
        jnp.asarray(lp.plan.inverse),
        jnp.asarray(lp.plan.valid),
        None if lp.vid_angles is None else jnp.asarray(lp.vid_angles),
        None if lp.txt_angles is None else jnp.asarray(lp.txt_angles),
    )


def _rope_angles_for_plan(
    cfg: DiTConfig, plan: WindowPlan, txt_len: int
) -> Tuple[Optional[np.ndarray], Optional[np.ndarray]]:
    rot3 = ((cfg.rope_dim // 3) & ~1) * 3
    max_len = plan.max_len
    vid = np.zeros((plan.n_win, max_len, rot3), dtype=np.float32)
    if cfg.rope_type == "mmrope3d":
        per = (cfg.rope_dim // 3) & ~1
        for i, (t, h, w) in enumerate(plan.shapes):
            a = axial_freqs_lang((t, h, w), per, offsets=(txt_len, 0, 0))
            vid[i, : t * h * w] = a.reshape(-1, rot3)
        txt_axis = axial_freqs_lang((txt_len,), per) if txt_len else np.zeros((0, per), np.float32)
        txt = np.tile(txt_axis.reshape(txt_len, per), (1, 3)).astype(np.float32)
        return pad_angles(vid, cfg.head_dim), pad_angles(txt, cfg.head_dim)
    if cfg.rope_type == "window_pixel":
        per = (cfg.rope_dim // 3) & ~1
        for i, (t, h, w) in enumerate(plan.shapes):
            a = axial_freqs_pixel((t, h, w), per)
            vid[i, : t * h * w] = a.reshape(-1, rot3)
        return pad_angles(vid, cfg.head_dim), None  # 7B does not rope text
    if cfg.rope_type in (None, "none"):
        return None, None
    raise NotImplementedError(cfg.rope_type)


def build_attn_plans(cfg: DiTConfig, thw: Tuple[int, int, int], txt_len: int) -> AttnPlans:
    """Host-side: all static per-shape constants for attention."""
    plain = window_plan(thw, cfg.window, shifted=False)
    shifted = window_plan(thw, cfg.window, shifted=True)
    pv, pt = _rope_angles_for_plan(cfg, plain, txt_len)
    sv, st = _rope_angles_for_plan(cfg, shifted, txt_len)
    return AttnPlans(
        plain=LayerPlan(plain, pv, pt),
        shifted=LayerPlan(shifted, sv, st),
        thw=thw,
        txt_len=txt_len,
    )


# --------------------------------------------------------------------------- #
# Parameter initialization
# --------------------------------------------------------------------------- #


def _linear(key, din, dout, dtype, bias=True):
    w = jax.random.normal(key, (din, dout), jnp.float32) * (din**-0.5)
    p = {"w": w.astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((dout,), dtype)
    return p


def _mm(key, make, shared: bool, vid_only: bool):
    """Build vid/txt (or shared 'all') param group, mirroring MMModule
    (reference: dit_3b/mm.py:35-57)."""
    k1, k2 = jax.random.split(key)
    if shared:
        return {"all": make(k1)}
    out = {"vid": make(k1)}
    if not vid_only:
        out["txt"] = make(k2)
    return out


def _ada_params(key, dim, dtype, layers=("attn", "mlp"), modes=("in", "out")):
    """AdaSingle per-branch params (reference: dit_3b/modulation.py:43-63)."""
    out = {}
    keys = jax.random.split(key, len(layers) * 3)
    i = 0
    for l in layers:
        if "in" in modes:
            out[f"{l}_shift"] = (jax.random.normal(keys[i], (dim,)) / dim**0.5).astype(dtype)
            out[f"{l}_scale"] = (jax.random.normal(keys[i + 1], (dim,)) / dim**0.5 + 1).astype(dtype)
        if "out" in modes:
            out[f"{l}_gate"] = (jax.random.normal(keys[i + 2], (dim,)) / dim**0.5).astype(dtype)
        i += 3
    return out


def init_params(cfg: DiTConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, cfg.num_layers + 8)
    D = cfg.vid_dim
    inner = cfg.inner_dim
    patch_in_dim = cfg.vid_in_channels * int(np.prod(cfg.patch_size))
    patch_out_dim = cfg.vid_out_channels * int(np.prod(cfg.patch_size))

    params: Params = {
        "vid_in": _linear(keys[0], patch_in_dim, D, dtype),
        "txt_in": _linear(keys[1], cfg.txt_in_dim, cfg.txt_dim, dtype),
        "emb_in": {
            "proj_in": _linear(keys[2], cfg.sinusoidal_dim, D, dtype),
            "proj_hid": _linear(keys[3], D, D, dtype),
            "proj_out": _linear(keys[4], D, cfg.emb_dim, dtype),
        },
        "vid_out": _linear(keys[5], D, patch_out_dim, dtype),
    }
    if cfg.vid_out_norm:
        params["vid_out_norm"] = {"w": jnp.ones((D,), dtype)}
        params["vid_out_ada"] = {
            "vid": _ada_params(keys[6], D, dtype, layers=("out",), modes=("in",))
        }

    blocks: List[Params] = []
    for i in range(cfg.num_layers):
        bk = jax.random.split(keys[8 + i], 8)
        shared = cfg.shared_weights(i)
        vid_only = cfg.vid_only(i)
        if cfg.mlp_type == "swiglu":
            hidden = int(2 * D * cfg.expand_ratio / 3)
            m = cfg.swiglu_multiple_of
            hidden = m * ((hidden + m - 1) // m)

            def make_mlp(k, hidden=hidden):
                k1, k2, k3 = jax.random.split(k, 3)
                return {
                    "proj_in_gate": _linear(k1, D, hidden, dtype, bias=False),
                    "proj_in": _linear(k2, D, hidden, dtype, bias=False),
                    "proj_out": _linear(k3, hidden, D, dtype, bias=False),
                }

        else:

            def make_mlp(k):
                k1, k2 = jax.random.split(k)
                return {
                    "proj_in": _linear(k1, D, D * cfg.expand_ratio, dtype),
                    "proj_out": _linear(k2, D * cfg.expand_ratio, D, dtype),
                }

        def make_qkv(k):
            # stored [D, 3, inner] so the head dim shards cleanly on the
            # "tensor" mesh axis (parallel/sharding.py)
            p = _linear(k, D, 3 * inner, dtype, bias=cfg.qk_bias)
            p["w"] = p["w"].reshape(D, 3, inner)
            if "b" in p:
                p["b"] = p["b"].reshape(3, inner)
            return p

        block = {
            "attn": {
                "qkv": _mm(bk[0], make_qkv, shared, False),
                "out": _mm(bk[1], lambda k: _linear(k, inner, D, dtype), shared, False),
                "norm_q": _mm(bk[2], lambda k: {"w": jnp.ones((cfg.head_dim,), dtype)}, shared, False),
                "norm_k": _mm(bk[3], lambda k: {"w": jnp.ones((cfg.head_dim,), dtype)}, shared, False),
            },
            "mlp": _mm(bk[4], make_mlp, shared, vid_only),
            "ada": _mm(bk[5], lambda k: _ada_params(k, D, dtype), shared, vid_only),
        }
        blocks.append(block)
    params["blocks"] = blocks
    return params


# --------------------------------------------------------------------------- #
# Building blocks
# --------------------------------------------------------------------------- #


def _apply_linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    if "w_q" in p:  # int8 weight-only storage (ops/quant.py)
        y = x @ p["w_q"].astype(x.dtype)
        y = y * p["w_s"].astype(x.dtype)
    else:
        y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _branch(p: Params, name: str) -> Params:
    return p["all"] if "all" in p else p[name]


def _has_txt(p: Params) -> bool:
    return "all" in p or "txt" in p


def time_embedding(p: Params, cfg: DiTConfig, timestep: jnp.ndarray, dtype) -> jnp.ndarray:
    """Sinusoidal + MLP time embedding (reference: dit_3b/embedding.py:25-62;
    sinusoid layout = diffusers get_timestep_embedding with
    flip_sin_to_cos=False, downscale_freq_shift=0: [sin | cos])."""
    half = cfg.sinusoidal_dim // 2
    t = timestep.astype(jnp.float32)
    freqs = jnp.exp(-np.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half)
    ang = t[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1).astype(dtype)
    emb = _apply_linear(p["proj_in"], emb)
    emb = jax.nn.silu(emb.astype(jnp.float32)).astype(dtype)
    emb = _apply_linear(p["proj_hid"], emb)
    emb = jax.nn.silu(emb.astype(jnp.float32)).astype(dtype)
    emb = _apply_linear(p["proj_out"], emb)
    return emb  # [B, 6*D]


def _ada_slices(emb: jnp.ndarray, dim: int) -> jnp.ndarray:
    """emb [B, 6*dim] -> [B, dim, 2(layer), 3(shift,scale,gate)]
    (reference: modulation.py:76)."""
    B = emb.shape[0]
    return emb.reshape(B, dim, 2, 3)


def _ada(
    p_ada: Params,
    branch: str,
    x: jnp.ndarray,  # [B, L, D]
    emb_slices: jnp.ndarray,  # [B, D, 2, 3]
    emb_idx: int,  # 0 = attn slice, 1 = mlp slice
    mode: str,
    param_prefix: Optional[str] = None,
) -> jnp.ndarray:
    """AdaSingle (reference: modulation.py:65-118):
    in:  x * (scaleA + scaleB) + (shiftA + shiftB)
    out: x * (gateA + gateB)."""
    p = _branch(p_ada, branch)
    prefix = param_prefix or ("attn", "mlp")[emb_idx]
    e = emb_slices[:, :, emb_idx, :]  # [B, D, 3]
    shiftA = e[..., 0][:, None]  # [B, 1, D]
    scaleA = e[..., 1][:, None]
    gateA = e[..., 2][:, None]
    dt = x.dtype
    if mode == "in":
        shiftB = p[f"{prefix}_shift"].astype(dt)
        scaleB = p[f"{prefix}_scale"].astype(dt)
        return x * (scaleA.astype(dt) + scaleB) + (shiftA.astype(dt) + shiftB)
    gateB = p.get(f"{prefix}_gate")
    g = gateA.astype(dt) if gateB is None else gateA.astype(dt) + gateB.astype(dt)
    return x * g


def _mlp(p_mlp: Params, branch: str, x: jnp.ndarray, cfg: DiTConfig) -> jnp.ndarray:
    p = _branch(p_mlp, branch)
    if cfg.mlp_type == "swiglu":
        gate = _apply_linear(p["proj_in_gate"], x)
        up = _apply_linear(p["proj_in"], x)
        h = jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) * up
        return _apply_linear(p["proj_out"], h)
    h = _apply_linear(p["proj_in"], x)
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(x.dtype)
    return _apply_linear(p["proj_out"], h)


def _window_attention(
    p_attn: Params,
    cfg: DiTConfig,
    vid: jnp.ndarray,  # [B, L, D]
    txt: jnp.ndarray,  # [B, Lt, D]
    lp: LayerPlan,
    has_txt_weights: bool,
    pa: Optional[Dict] = None,  # plan_device_args entry for this layer
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    B, L, D = vid.shape
    Lt = txt.shape[1]
    H, hd = cfg.heads, cfg.head_dim
    inner = cfg.inner_dim
    plan = lp.plan
    nW, mL = plan.n_win, plan.max_len
    idx, inv, valid_w, vid_ang, txt_ang = _plan_arrays(lp, pa)

    def qkv_proj(pq, x):
        if "w_q" in pq:
            w = pq["w_q"].astype(x.dtype)  # [D, 3, inner] int8 widened
            y = jnp.einsum("bld,dox->blox", x, w) * pq["w_s"].astype(x.dtype)
        else:
            y = jnp.einsum("bld,dox->blox", x, pq["w"].astype(x.dtype))
        if "b" in pq:
            y = y + pq["b"].astype(x.dtype)
        return y  # [B, L, 3, inner]

    vid_qkv = qkv_proj(_branch(p_attn["qkv"], "vid"), vid)
    txt_qkv = qkv_proj(_branch(p_attn["qkv"], "txt"), txt)

    # Window partition (static gather). Under SP this gather is where GSPMD
    # inserts the seq<->window all-to-all.
    vid_qkv_w = jnp.take(vid_qkv, idx, axis=1).reshape(B, nW, mL, 3, H, hd)
    vid_qkv_w = constrain_windows(vid_qkv_w)
    txt_qkv = txt_qkv.reshape(B, Lt, 3, H, hd)
    del vid_qkv

    vq, vk, vv = vid_qkv_w[:, :, :, 0], vid_qkv_w[:, :, :, 1], vid_qkv_w[:, :, :, 2]
    tq, tk, tv = txt_qkv[:, :, 0], txt_qkv[:, :, 1], txt_qkv[:, :, 2]

    if cfg.qk_norm:
        vq = rms_norm(vq, _branch(p_attn["norm_q"], "vid")["w"], cfg.norm_eps)
        vk = rms_norm(vk, _branch(p_attn["norm_k"], "vid")["w"], cfg.norm_eps)
        tq = rms_norm(tq, _branch(p_attn["norm_q"], "txt")["w"], cfg.norm_eps)
        tk = rms_norm(tk, _branch(p_attn["norm_k"], "txt")["w"], cfg.norm_eps)

    # RoPE with window-local coordinates. Angles: [nW, mL, rot] -> broadcast
    # over batch and heads ([B, nW, mL, H, hd] rotates last dim).
    if vid_ang is not None:
        ang = vid_ang[None, :, :, None, :]  # [1,nW,mL,1,rot]
        vq = apply_rotary(vq, ang)
        vk = apply_rotary(vk, ang)
    if txt_ang is not None and Lt > 0:
        tang = txt_ang[None, :, None, :]  # [1,Lt,1,rot]
        tq = apply_rotary(tq, tang)
        tk = apply_rotary(tk, tang)

    # Append txt tokens to every window: [B, nW, mL+Lt, H, hd].
    def with_txt(vw, tw):
        tw = jnp.broadcast_to(tw[:, None], (B, nW, Lt, H, hd))
        return jnp.concatenate([vw, tw], axis=2)

    q = constrain_attn_io(with_txt(vq, tq).reshape(B * nW, mL + Lt, H, hd))
    k = constrain_attn_io(with_txt(vk, tk).reshape(B * nW, mL + Lt, H, hd))
    v = constrain_attn_io(with_txt(vv, tv).reshape(B * nW, mL + Lt, H, hd))

    kv_valid = jnp.concatenate(
        [valid_w, jnp.ones((nW, Lt), bool)], axis=1
    )  # [nW, mL+Lt]
    kv_valid = jnp.broadcast_to(kv_valid[None], (B, nW, mL + Lt)).reshape(B * nW, mL + Lt)

    out = attention(q, k, v, kv_valid=kv_valid)  # [B*nW, mL+Lt, H, hd]
    out = out.reshape(B, nW, mL + Lt, inner)

    vid_out_w = out[:, :, :mL].reshape(B, nW * mL, inner)
    # Scatter windows back to token order (exact partition -> pure gather).
    vid_out = constrain_tokens(jnp.take(vid_out_w, inv, axis=1))  # [B, L, inner]

    # Text coalescing: average over windows (reference: na.py:396-417).
    txt_out = jnp.mean(out[:, :, mL:].astype(jnp.float32), axis=1).astype(out.dtype)

    vid_out = _apply_linear(_branch(p_attn["out"], "vid"), vid_out)
    txt_out = _apply_linear(_branch(p_attn["out"], "txt"), txt_out)
    return vid_out, txt_out


def _window_attention_fused(
    p_attn: Params,
    cfg: DiTConfig,
    vid: jnp.ndarray,  # [B, L, D]
    txt: jnp.ndarray,  # [B, Lt, D]
    lp: LayerPlan,
    pa: Optional[Dict] = None,  # plan_device_args entry for this layer
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Head-major path feeding ops/fused_window_attention.py: every layout
    change rides a GEMM (projection in/out), rope+mask+softmax live in the
    kernel. Numerically equivalent to _window_attention (tests). Under
    seq/tensor sharding hints the kernel runs inside shard_map with windows
    sharded over "seq" and heads over "tensor" (no collectives inside —
    windows are independent)."""
    from ...ops.fused_window_attention import (
        fused_window_attention,
        fused_window_attention_sharded,
    )
    from ...parallel.sp import current_hints

    B, L, D = vid.shape
    Lt = txt.shape[1]
    H, hd = cfg.heads, cfg.head_dim
    plan = lp.plan
    nW, mL = plan.n_win, plan.max_len
    idx, inv, valid, vid_ang, txt_ang = _plan_arrays(lp, pa)

    def qkv_hm(pq, x):
        w = pq["w_q"].astype(x.dtype) if "w_q" in pq else pq["w"].astype(x.dtype)
        w = w.reshape(D if w.shape[0] == D else w.shape[0], 3, H, hd)
        y = jnp.einsum("bld,dohx->bohlx", x, w)  # [B, 3, H, L, hd]
        if "w_s" in pq:
            y = y * pq["w_s"].astype(x.dtype).reshape(1, 3, H, 1, hd)
        if "b" in pq:
            y = y + pq["b"].astype(x.dtype).reshape(1, 3, H, 1, hd)
        return y

    vid_qkv = qkv_hm(_branch(p_attn["qkv"], "vid"), vid)
    txt_qkv = qkv_hm(_branch(p_attn["qkv"], "txt"), txt)  # [B,3,H,Lt,hd]

    # qk rms-norm is folded into the kernel (fused_window_attention._kernel)
    # — normalizing here would materialize a second full qkv tensor per
    # layer (the former jnp.stack, ~600MB of HBM round-trips at 7B 1080p);
    # the kernel normalizes each window tile in VMEM instead, op-for-op the
    # same numerics (reference qk_norm: dit_3b/nablocks/attention/mmattn.py).
    if cfg.qk_norm:
        norms = jnp.stack(
            [
                _branch(p_attn["norm_q"], "vid")["w"],
                _branch(p_attn["norm_k"], "vid")["w"],
                _branch(p_attn["norm_q"], "txt")["w"],
                _branch(p_attn["norm_k"], "txt")["w"],
            ]
        ).astype(jnp.float32)
    else:
        norms = None

    vid_win = jnp.take(vid_qkv, idx, axis=3).reshape(B, 3, H, nW, mL, hd)

    vang = vid_ang if vid_ang is not None else jnp.zeros((nW, mL, hd), jnp.float32)
    rope_txt = lp.txt_angles is not None and Lt > 0
    tang = txt_ang if rope_txt else jnp.zeros((Lt, hd), jnp.float32)

    from ...ops.attention import get_attention_backend

    quant_qk = get_attention_backend() == "fused_int8"
    hints = current_hints()
    if hints is not None:
        ovid, otxt = fused_window_attention_sharded(
            vid_win, txt_qkv, vang, tang, valid, rope_txt,
            hints.mesh, norms=norms, qk_norm=cfg.qk_norm, eps=cfg.norm_eps,
            seq=hints.seq, tensor=hints.tensor,
        )
        # drop seq-padding windows (all-invalid) before scatter/coalesce
        ovid = ovid[:, :, :nW]
        otxt = otxt[:, :, :nW]
    else:
        ovid, otxt = fused_window_attention(
            vid_win, txt_qkv, vang, tang, valid, rope_txt,
            norms=norms, qk_norm=cfg.qk_norm, eps=cfg.norm_eps,
            quant_qk=quant_qk,
        )
    # scatter windows back (token order) in head-major layout
    vid_tok = jnp.take(ovid.reshape(B, H, nW * mL, hd), inv, axis=2)  # [B,H,L,hd]
    txt_tok = jnp.mean(otxt.astype(jnp.float32), axis=2).astype(otxt.dtype)  # [B,H,Lt,hd]

    def out_proj(po, x_hm):
        w = po["w_q"].astype(x_hm.dtype) if "w_q" in po else po["w"].astype(x_hm.dtype)
        w = w.reshape(H, hd, -1)
        y = jnp.einsum("bhld,hdD->blD", x_hm, w)
        if "w_s" in po:
            y = y * po["w_s"].astype(x_hm.dtype)
        if "b" in po:
            y = y + po["b"].astype(x_hm.dtype)
        return y

    vid_out = out_proj(_branch(p_attn["out"], "vid"), vid_tok)
    txt_out = out_proj(_branch(p_attn["out"], "txt"), txt_tok)
    return vid_out, txt_out


def block_forward(
    p: Params,
    cfg: DiTConfig,
    layer: int,
    vid: jnp.ndarray,
    txt: jnp.ndarray,
    emb_slices: jnp.ndarray,
    lp: LayerPlan,
    pa: Optional[Dict] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One NaMMSRTransformerBlock (reference: dit_3b/nablocks/mmsr_block.py:84-128)."""
    vid_only = cfg.vid_only(layer)

    vid_a = rms_norm(vid, None, cfg.norm_eps)
    txt_a = rms_norm(txt, None, cfg.norm_eps)
    if not vid_only:
        vid_a = _ada(p["ada"], "vid", vid_a, emb_slices, 0, "in")
        txt_a = _ada(p["ada"], "txt", txt_a, emb_slices, 0, "in")
    else:
        vid_a = _ada(p["ada"], "vid", vid_a, emb_slices, 0, "in")
    from ...ops.attention import get_attention_backend

    # Fused kernel in all modes (reference runs flash-attn in all modes,
    # compatibility.py:286-384); under seq/tensor sharding it runs inside
    # shard_map (ops/fused_window_attention.py:fused_window_attention_sharded).
    if get_attention_backend() in ("fused", "fused_int8"):
        vid_a, txt_a = _window_attention_fused(p["attn"], cfg, vid_a, txt_a, lp, pa)
    else:
        vid_a, txt_a = _window_attention(p["attn"], cfg, vid_a, txt_a, lp, True, pa)
    vid_a = _ada(p["ada"], "vid", vid_a, emb_slices, 0, "out")
    if not vid_only:
        txt_a = _ada(p["ada"], "txt", txt_a, emb_slices, 0, "out")
    vid = vid + vid_a
    txt = txt + txt_a

    vid_m = rms_norm(vid, None, cfg.norm_eps)
    vid_m = _ada(p["ada"], "vid", vid_m, emb_slices, 1, "in")
    vid_m = _mlp(p["mlp"], "vid", vid_m, cfg)
    vid_m = _ada(p["ada"], "vid", vid_m, emb_slices, 1, "out")
    vid = vid + vid_m
    if not vid_only:
        txt_m = rms_norm(txt, None, cfg.norm_eps)
        txt_m = _ada(p["ada"], "txt", txt_m, emb_slices, 1, "in")
        txt_m = _mlp(p["mlp"], "txt", txt_m, cfg)
        txt_m = _ada(p["ada"], "txt", txt_m, emb_slices, 1, "out")
        txt = txt + txt_m
    return vid, txt


# --------------------------------------------------------------------------- #
# Layer-scan execution (stacked weights)
# --------------------------------------------------------------------------- #


def layer_exec_plan(cfg: DiTConfig):
    """Static execution plan: maximal even-aligned runs of structurally
    uniform layers become ``("scan", start, n_pairs)`` items (one lax.scan
    over (plain, shifted) window-plan pairs); leftovers are
    ``("layer", i)``. 7B (uniform 36 layers) -> one scan of 18 pairs; 3B ->
    scan(0,5) separate-weight pairs + scan(10,10) shared pairs + layers
    30, 31 unrolled (layer 31 is vid_only).

    Why: unrolling 32-36 layers into one program makes the executable and
    its argument list scale with depth — ~1150 param leaves and a program
    the remote compile helper chokes on at 4K shapes. Scanning compiles ONE
    pair body per segment: programs shrink ~15x, weights become a handful
    of stacked leaves, and window-plan constants embed once."""
    keys = [(cfg.shared_weights(i), cfg.vid_only(i)) for i in range(cfg.num_layers)]
    plan = []
    i = 0
    while i < cfg.num_layers:
        if i % 2 == 0:
            j = i
            while j + 1 < cfg.num_layers and keys[j] == keys[i] and keys[j + 1] == keys[i]:
                j += 2
            n_pairs = (j - i) // 2
            if n_pairs >= 2:
                plan.append(("scan", i, n_pairs))
                i = j
                continue
        plan.append(("layer", i))
        i += 1
    return plan


def _stack_trees_consuming(trees: List[Params]) -> Params:
    """Stack matching leaves of per-layer trees along a new leading axis,
    deleting source references as they are consumed so peak extra memory is
    one stacked leaf group, not a full second copy of the weights (matters
    on a 16GB chip holding 8.6GB of int8 7B weights)."""

    def rec(nodes):
        if isinstance(nodes[0], dict):
            out = {}
            for k in list(nodes[0].keys()):
                sub = [n[k] for n in nodes]
                out[k] = rec(sub)
                for n in nodes:
                    n.pop(k, None)
            return out
        return jnp.stack(nodes)

    return rec(trees)


def stack_blocks(params: Params, cfg: DiTConfig) -> Params:
    """Convert ``params["blocks"]`` (list of per-layer trees) to the
    scanned layout consumed by nadit_forward:

    - ``blocks_scan``: one ``{"even": tree[n,...], "odd": tree[n,...]}``
      per ("scan", start, n) item of layer_exec_plan;
    - ``blocks_rest``: the unrolled leftovers keyed by str(layer).

    CONSUMES the input blocks' leaves (dicts are emptied in place) to stay
    within HBM; callers must treat the input tree as dead afterwards.
    No-op if already stacked."""
    if "blocks_scan" in params:
        return params
    blocks = params["blocks"]
    out = {k: v for k, v in params.items() if k != "blocks"}
    segs = []
    rest: Dict[str, Params] = {}
    for item in layer_exec_plan(cfg):
        if item[0] == "layer":
            rest[str(item[1])] = blocks[item[1]]
        else:
            start, n = item[1], item[2]
            segs.append(
                {
                    "even": _stack_trees_consuming([blocks[start + 2 * k] for k in range(n)]),
                    "odd": _stack_trees_consuming([blocks[start + 2 * k + 1] for k in range(n)]),
                }
            )
    out["blocks_scan"] = segs
    out["blocks_rest"] = rest
    return out


def _run_layers(
    params: Params,
    cfg: DiTConfig,
    x: jnp.ndarray,
    t_emb: jnp.ndarray,
    emb_slices: jnp.ndarray,
    plans: "AttnPlans",
    plan_args: Optional[Dict] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    def pa_for(i):
        if plan_args is None:
            return None
        return plan_args["plain"] if i % 2 == 0 else plan_args["shifted"]

    if "blocks_scan" not in params:
        for i, bp in enumerate(params["blocks"]):
            x, t_emb = block_forward(
                bp, cfg, i, x, t_emb, emb_slices, plans.for_layer(i), pa_for(i)
            )
        return x, t_emb

    scan_iter = iter(params["blocks_scan"])
    for item in layer_exec_plan(cfg):
        if item[0] == "layer":
            i = item[1]
            bp = params["blocks_rest"][str(i)]
            x, t_emb = block_forward(
                bp, cfg, i, x, t_emb, emb_slices, plans.for_layer(i), pa_for(i)
            )
            continue
        start, _n = item[1], item[2]
        seg = next(scan_iter)
        lp_even = plans.for_layer(start)  # plain (start is even)
        lp_odd = plans.for_layer(start + 1)  # shifted

        def body(carry, seg_slice, start=start, lp_even=lp_even, lp_odd=lp_odd):
            cx, ct = carry
            cx, ct = block_forward(
                seg_slice["even"], cfg, start, cx, ct, emb_slices, lp_even, pa_for(start)
            )
            cx, ct = block_forward(
                seg_slice["odd"], cfg, start + 1, cx, ct, emb_slices, lp_odd, pa_for(start + 1)
            )
            return (cx, ct), None

        (x, t_emb), _ = jax.lax.scan(body, (x, t_emb), seg)
    return x, t_emb


# --------------------------------------------------------------------------- #
# Patchify / full forward
# --------------------------------------------------------------------------- #


def patchify(p: Params, cfg: DiTConfig, vid: jnp.ndarray) -> jnp.ndarray:
    """[B, T, H, W, C] -> [B, T*(H/h)*(W/w), D]. Channel packing order matches
    the reference's "(T t) (H h) (W w) c -> T H W (t h w c)"
    (reference: dit_3b/patch/patch_v1.py:91)."""
    pt, ph, pw = cfg.patch_size
    assert pt == 1, "temporal patch > 1 not used by SeedVR2 checkpoints"
    B, T, H, W, C = vid.shape
    assert H % ph == 0 and W % pw == 0, (H, W, cfg.patch_size)
    x = vid.reshape(B, T, H // ph, ph, W // pw, pw, C)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)  # B T H' W' h w c
    x = x.reshape(B, T * (H // ph) * (W // pw), ph * pw * C)
    return _apply_linear(p, x)


def unpatchify(p: Params, cfg: DiTConfig, vid: jnp.ndarray, thw: Tuple[int, int, int]) -> jnp.ndarray:
    """[B, L, D] -> [B, T, H*h, W*w, C_out] (reference: patch_v1.py:100-127)."""
    pt, ph, pw = cfg.patch_size
    T, Hp, Wp = thw
    B = vid.shape[0]
    x = _apply_linear(p, vid)  # [B, L, h*w*C]
    C = cfg.vid_out_channels
    x = x.reshape(B, T, Hp, Wp, ph, pw, C)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)
    return x.reshape(B, T, Hp * ph, Wp * pw, C)


def nadit_forward(
    params: Params,
    cfg: DiTConfig,
    vid: jnp.ndarray,  # [B, T, H, W, vid_in_channels]
    txt: jnp.ndarray,  # [B, Lt, txt_in_dim]
    timestep: jnp.ndarray,  # [B]
    plans: AttnPlans,
    plan_args: Optional[Dict] = None,  # plan_device_args(plans)
) -> jnp.ndarray:
    """Full NaDiT forward. Returns [B, T, H, W, vid_out_channels].

    `plans` must be built with build_attn_plans(cfg, patched_thw, txt_len)
    where patched_thw = (T, H // ph, W // pw). Pass ``plan_args``
    (plan_device_args(plans)) through the enclosing jit's arguments to keep
    index/angle tables out of the compiled program's constants.
    """
    B, T, H, W, _ = vid.shape
    pt, ph, pw = cfg.patch_size
    thw = (T, H // ph, W // pw)
    assert plans.thw == thw, (plans.thw, thw)

    x = constrain_tokens(patchify(params["vid_in"], cfg, vid))  # [B, L, D]
    t_emb = _apply_linear(params["txt_in"], txt)
    emb = time_embedding(params["emb_in"], cfg, timestep, x.dtype)  # [B, 6D]
    emb_slices = _ada_slices(emb, cfg.vid_dim)

    x, t_emb = _run_layers(params, cfg, x, t_emb, emb_slices, plans, plan_args)

    if cfg.vid_out_norm:
        x = rms_norm(x, params["vid_out_norm"]["w"], cfg.norm_eps)
        # Quirk: uses the attn-layer emb slice (see module docstring).
        x = _ada(params["vid_out_ada"], "vid", x, emb_slices, 0, "in", param_prefix="out")

    return unpatchify(params["vid_out"], cfg, x, thw)
