"""Fused window-attention path == reference path (CPU interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seedvr2_tpu.config import dit_tiny
from seedvr2_tpu.models.dit.nadit import build_attn_plans, init_params, nadit_forward
from seedvr2_tpu.ops.attention import set_attention_backend


@pytest.mark.parametrize("rope", ["mmrope3d", "window_pixel"])
def test_fused_matches_reference_path(rope):
    cfg = dit_tiny(rope_type=rope)
    params = init_params(cfg, jax.random.PRNGKey(0))
    thw, txt_len = (2, 6, 8), 4
    plans = build_attn_plans(cfg, thw, txt_len)
    vid = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 12, 16, cfg.vid_in_channels)) * 0.4
    txt = jax.random.normal(jax.random.PRNGKey(2), (1, txt_len, cfg.txt_in_dim)) * 0.4
    t = jnp.array([800.0])

    set_attention_backend("xla")
    ref = np.asarray(nadit_forward(params, cfg, vid, txt, t, plans))
    try:
        set_attention_backend("fused")
        out = np.asarray(nadit_forward(params, cfg, vid, txt, t, plans))
    finally:
        set_attention_backend("xla")
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_fused_with_int8_weights():
    from seedvr2_tpu.ops.quant import quantize_dit_params

    cfg = dit_tiny()
    params = init_params(cfg, jax.random.PRNGKey(0))
    qparams = quantize_dit_params(params, min_size=1024)
    thw, txt_len = (1, 4, 4), 3
    plans = build_attn_plans(cfg, thw, txt_len)
    vid = jax.random.normal(jax.random.PRNGKey(3), (1, 1, 8, 8, cfg.vid_in_channels)) * 0.3
    txt = jax.random.normal(jax.random.PRNGKey(4), (1, txt_len, cfg.txt_in_dim)) * 0.3
    t = jnp.array([900.0])
    try:
        set_attention_backend("fused")
        a = np.asarray(nadit_forward(params, cfg, vid, txt, t, plans))
        b = np.asarray(nadit_forward(qparams, cfg, vid, txt, t, plans))
    finally:
        set_attention_backend("xla")
    rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-6)
    assert rel < 0.15


def test_fused_int8_attention_close_to_bf16():
    """sageattn tier (fused_int8): per-token int8 q/k inside the kernel —
    logits carry ~0.8% quantization error, outputs must stay close to the
    bf16 fused path (reference maps sageattn_* the same way,
    compatibility.py:387-545)."""
    cfg = dit_tiny()
    params = init_params(cfg, jax.random.PRNGKey(0))
    thw, txt_len = (2, 6, 8), 4
    plans = build_attn_plans(cfg, thw, txt_len)
    vid = jax.random.normal(jax.random.PRNGKey(5), (1, 2, 12, 16, cfg.vid_in_channels)) * 0.4
    txt = jax.random.normal(jax.random.PRNGKey(6), (1, txt_len, cfg.txt_in_dim)) * 0.4
    t = jnp.array([700.0])
    try:
        set_attention_backend("fused")
        ref = np.asarray(nadit_forward(params, cfg, vid, txt, t, plans))
        set_attention_backend("sageattn_2")  # alias -> fused_int8
        out = np.asarray(nadit_forward(params, cfg, vid, txt, t, plans))
    finally:
        set_attention_backend("xla")
    assert not np.array_equal(out, ref)  # the int8 path actually ran
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-6)
    assert rel < 0.05
