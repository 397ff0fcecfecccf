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


def test_synthetic_quantized_tree_matches_real_structure():
    """synthetic_quantized_dit_params must mirror quantize_dit_params(
    init_params(...)) exactly in tree paths, shapes and dtypes — it stands
    in for the real tree in benches and the multichip dryrun."""
    import jax

    from seedvr2_tpu.config import dit_tiny
    from seedvr2_tpu.models.dit.nadit import init_params
    from seedvr2_tpu.ops.quant import (
        quantize_dit_params,
        synthetic_quantized_dit_params,
    )

    # tiny config with min_size lowered so some weights actually quantize
    cfg = dit_tiny()
    real = quantize_dit_params(
        init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16), min_size=1 << 10
    )
    # patch the synthetic builder's threshold through the module constant
    import seedvr2_tpu.ops.quant as Q

    old = Q._QUANT_MIN_SIZE
    Q._QUANT_MIN_SIZE = 1 << 10
    try:
        synth = synthetic_quantized_dit_params(cfg)
    finally:
        Q._QUANT_MIN_SIZE = old

    real_flat = jax.tree.leaves_with_path(real)
    synth_flat = jax.tree.leaves_with_path(synth)
    assert len(real_flat) == len(synth_flat)
    for (pr, lr), (ps, ls) in zip(real_flat, synth_flat):
        assert jax.tree_util.keystr(pr) == jax.tree_util.keystr(ps)
        assert tuple(lr.shape) == tuple(ls.shape), (jax.tree_util.keystr(pr), lr.shape, ls.shape)
        assert np.dtype(lr.dtype) == np.dtype(ls.dtype), jax.tree_util.keystr(pr)


def test_on_device_synthetic_matches_host_tree():
    """synthetic_quantized_dit_params_on_device must produce the same tree
    (paths/shapes/dtypes) as the host builder, both unstacked and in the
    stacked scan layout — it replaces the host path in bench/dryrun setup."""
    import jax

    from seedvr2_tpu.config import dit_tiny
    from seedvr2_tpu.models.dit.nadit import stack_blocks
    from seedvr2_tpu.ops.quant import (
        synthetic_quantized_dit_params,
        synthetic_quantized_dit_params_on_device,
    )

    cfg = dit_tiny()
    host = synthetic_quantized_dit_params(cfg)
    dev = synthetic_quantized_dit_params_on_device(cfg, stacked=False)
    hf = jax.tree.leaves_with_path(host)
    df = jax.tree.leaves_with_path(dev)
    assert len(hf) == len(df)
    for (ph, lh), (pd, ld) in zip(hf, df):
        assert ph == pd
        assert lh.shape == ld.shape, (ph, lh.shape, ld.shape)
        assert str(jnp.asarray(lh).dtype) == str(ld.dtype), ph

    host_stacked = stack_blocks(
        jax.tree.map(jnp.asarray, synthetic_quantized_dit_params(cfg)), cfg
    )
    dev_stacked = synthetic_quantized_dit_params_on_device(cfg, stacked=True)
    hs = jax.tree.leaves_with_path(host_stacked)
    ds = jax.tree.leaves_with_path(dev_stacked)
    assert len(hs) == len(ds)
    for (ph, lh), (pd, ld) in zip(hs, ds):
        assert ph == pd
        assert lh.shape == ld.shape, (ph, lh.shape, ld.shape)
        assert lh.dtype == ld.dtype, ph
