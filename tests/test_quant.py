"""int8 weight-only quantization: error bounds and forward parity."""

import jax
import jax.numpy as jnp
import numpy as np

from seedvr2_tpu.config import dit_tiny
from seedvr2_tpu.models.dit.nadit import build_attn_plans, init_params, nadit_forward
from seedvr2_tpu.ops import quant as Q


def test_quantize_roundtrip_error():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 128)) * 0.02
    q = Q.quantize_weight(w)
    deq = np.asarray(Q.dequantize_weight(q, jnp.float32))
    err = np.abs(deq - np.asarray(w))
    # per-column absmax/127 step bound
    step = np.abs(np.asarray(w)).max(0) / 127.0
    assert (err <= step[None] * 0.5 + 1e-8).all()


def test_linear_apply_quantized_close():
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 64)) * 0.5
    w = jax.random.normal(jax.random.PRNGKey(2), (64, 32)) * 0.05
    dense = Q.linear_apply({"w": w}, x)
    qp = Q.quantize_weight(w)
    quant = Q.linear_apply(qp, x)
    rel = np.abs(np.asarray(quant) - np.asarray(dense)).max() / np.abs(np.asarray(dense)).max()
    assert rel < 0.02


def test_quantized_dit_forward_close():
    cfg = dit_tiny()
    params = init_params(cfg, jax.random.PRNGKey(0))
    qparams = Q.quantize_dit_params(params, min_size=1024)
    assert Q.tree_bytes(qparams) < Q.tree_bytes(params) * 0.65

    thw, txt_len = (1, 8, 8), 3
    plans = build_attn_plans(cfg, thw, txt_len)
    vid = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 16, 16, cfg.vid_in_channels)) * 0.3
    txt = jax.random.normal(jax.random.PRNGKey(2), (1, txt_len, cfg.txt_in_dim)) * 0.3
    t = jnp.array([1000.0])
    ref = np.asarray(nadit_forward(params, cfg, vid, txt, t, plans))
    out = np.asarray(nadit_forward(qparams, cfg, vid, txt, t, plans))
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-6)
    assert rel < 0.15, rel
