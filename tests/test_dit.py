"""NaDiT structure/behaviour tests on tiny configs (3B-style mmrope and
7B-style window-pixel rope variants)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seedvr2_tpu.config import dit_tiny, dit_3b, dit_7b
from seedvr2_tpu.models.dit.nadit import (
    build_attn_plans,
    init_params,
    nadit_forward,
    patchify,
    time_embedding,
    unpatchify,
)


@pytest.fixture(scope="module", params=["mmrope3d", "window_pixel"])
def setup(request):
    cfg = dit_tiny(rope_type=request.param)
    params = init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def _inputs(cfg, thw=(2, 8, 8), txt_len=4, seed=1):
    t, h, w = thw
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    vid = jax.random.normal(k1, (1, t, h * 2, w * 2, cfg.vid_in_channels)) * 0.5
    txt = jax.random.normal(k2, (1, txt_len, cfg.txt_in_dim)) * 0.5
    plans = build_attn_plans(cfg, thw, txt_len)
    return vid, txt, plans


def test_forward_shape(setup):
    cfg, params = setup
    vid, txt, plans = _inputs(cfg)
    out = nadit_forward(params, cfg, vid, txt, jnp.array([1000.0]), plans)
    assert out.shape == (1, 2, 16, 16, cfg.vid_out_channels)
    assert np.isfinite(np.asarray(out)).all()


def test_forward_deterministic(setup):
    cfg, params = setup
    vid, txt, plans = _inputs(cfg)
    t = jnp.array([1000.0])
    a = nadit_forward(params, cfg, vid, txt, t, plans)
    b = nadit_forward(params, cfg, vid, txt, t, plans)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_timestep_changes_output(setup):
    cfg, params = setup
    vid, txt, plans = _inputs(cfg)
    a = nadit_forward(params, cfg, vid, txt, jnp.array([1000.0]), plans)
    b = nadit_forward(params, cfg, vid, txt, jnp.array([500.0]), plans)
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-4


def test_text_conditions_output(setup):
    cfg, params = setup
    vid, txt, plans = _inputs(cfg)
    t = jnp.array([1000.0])
    a = nadit_forward(params, cfg, vid, txt, t, plans)
    b = nadit_forward(params, cfg, vid, txt * 0.1, t, plans)
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-5


def test_patchify_roundtrip(setup):
    """With square identity projections and c_in == c_out, unpatchify must
    exactly invert patchify (verifies the (h w c) packing order)."""
    cfg, params = setup
    t, h, w = 2, 6, 8
    c = cfg.vid_out_channels  # = vid_dim / 4 in the tiny config
    assert 4 * c == cfg.vid_dim
    vid = jax.random.normal(jax.random.PRNGKey(3), (1, t, h, w, c))
    eye = {"w": jnp.eye(cfg.vid_dim), "b": jnp.zeros((cfg.vid_dim,))}
    x = patchify(eye, cfg, vid)
    assert x.shape == (1, t * (h // 2) * (w // 2), cfg.vid_dim)
    y = unpatchify(eye, cfg, x, (t, h // 2, w // 2))
    np.testing.assert_allclose(y, vid, atol=1e-6)


def test_time_embedding_layout(setup):
    cfg, params = setup
    emb = time_embedding(params["emb_in"], cfg, jnp.array([0.0]), jnp.float32)
    assert emb.shape == (1, cfg.emb_dim)
    # at t=0: sin part = 0, cos part = 1 -> deterministic value
    half = cfg.sinusoidal_dim // 2
    ang = jnp.zeros((1, half))
    sincos = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    ref = sincos @ params["emb_in"]["proj_in"]["w"] + params["emb_in"]["proj_in"]["b"]
    ref = jax.nn.silu(ref)
    ref = ref @ params["emb_in"]["proj_hid"]["w"] + params["emb_in"]["proj_hid"]["b"]
    ref = jax.nn.silu(ref)
    ref = ref @ params["emb_in"]["proj_out"]["w"] + params["emb_in"]["proj_out"]["b"]
    np.testing.assert_allclose(emb, ref, atol=1e-5)


def test_full_config_param_shapes():
    """Real 3B/7B configs produce the expected parameter inventory without
    allocating 3B params (structure check via eval_shape)."""
    for cfg in (dit_3b(), dit_7b()):
        shapes = jax.eval_shape(lambda k: init_params(cfg, k, jnp.bfloat16), jax.random.PRNGKey(0))
        assert len(shapes["blocks"]) == cfg.num_layers
        b0 = shapes["blocks"][0]
        assert b0["attn"]["qkv"]["vid"]["w"].shape == (cfg.vid_dim, 3, cfg.inner_dim)
        # 3B: layers >= mm_layers share weights
        last = shapes["blocks"][-1]
        if cfg.mm_layers < cfg.num_layers:
            assert "all" in last["attn"]["qkv"]
        else:
            assert "txt" in last["attn"]["qkv"]
        if cfg.vid_out_norm:
            assert "vid_out_norm" in shapes
            assert set(shapes["vid_out_ada"]["vid"]) == {"out_shift", "out_scale"}


def test_full_configs_forward_shapes_abstractly():
    """Trace the REAL 3B and 7B forwards with eval_shape (no allocation):
    catches dim mismatches in the full-size configs."""
    for cfg in (dit_3b(), dit_7b()):
        thw, txt_len = (1, 8, 8), 7
        plans = build_attn_plans(cfg, thw, txt_len)

        def fwd(params, vid, txt, t):
            return nadit_forward(params, cfg, vid, txt, t, plans)

        params_shape = jax.eval_shape(lambda k: init_params(cfg, k, jnp.bfloat16), jax.random.PRNGKey(0))
        out = jax.eval_shape(
            fwd,
            params_shape,
            jax.ShapeDtypeStruct((1, 1, 16, 16, cfg.vid_in_channels), jnp.bfloat16),
            jax.ShapeDtypeStruct((1, txt_len, cfg.txt_in_dim), jnp.bfloat16),
            jax.ShapeDtypeStruct((1,), jnp.float32),
        )
        assert out.shape == (1, 1, 16, 16, cfg.vid_out_channels)


def test_single_window_txt_passthrough():
    """With one window, txt coalescing (mean over 1) must be exact: compare
    against a hand-computed dense attention for a 1-layer model."""
    cfg = dit_tiny()
    params = init_params(cfg, jax.random.PRNGKey(0))
    thw = (1, 4, 4)  # small enough for a single window
    plans = build_attn_plans(cfg, thw, 2)
    assert plans.plain.plan.n_win == 1
    vid = jax.random.normal(jax.random.PRNGKey(5), (1, 1, 8, 8, cfg.vid_in_channels))
    txt = jax.random.normal(jax.random.PRNGKey(6), (1, 2, cfg.txt_in_dim))
    out = nadit_forward(params, cfg, vid, txt, jnp.array([800.0]), plans)
    assert out.shape == (1, 1, 8, 8, cfg.vid_out_channels)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("rope", ["mmrope3d", "window_pixel"])
def test_scan_stacked_matches_unrolled(rope):
    """lax.scan execution over stacked layer weights (stack_blocks) must
    reproduce the unrolled per-layer loop exactly (same weights, same plan
    alternation). Uses 6 layers so the plan mixes scanned pairs with the
    3B tail quirk (last layer vid_only)."""
    import dataclasses

    from seedvr2_tpu.models.dit.nadit import layer_exec_plan, stack_blocks

    cfg = dataclasses.replace(
        dit_tiny(rope), num_layers=10, mm_layers=4 if rope == "mmrope3d" else 1
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(5)
    vid = jnp.asarray(rng.standard_normal((1, 2, 8, 8, cfg.vid_in_channels), np.float32) * 0.3)
    txt = jnp.asarray(rng.standard_normal((1, 4, cfg.txt_in_dim), np.float32) * 0.3)
    t = jnp.asarray([500.0])
    plans = build_attn_plans(cfg, (2, 4, 4), 4)

    ref = nadit_forward(params, cfg, vid, txt, t, plans)

    plan = layer_exec_plan(cfg)
    assert any(item[0] == "scan" for item in plan), plan
    # deep-copy leaves first: stack_blocks consumes its input
    import copy

    params2 = jax.tree.map(lambda x: x, params)
    params2["blocks"] = [copy.deepcopy(b) for b in params["blocks"]]
    stacked = stack_blocks(params2, cfg)
    assert "blocks_scan" in stacked
    out = nadit_forward(stacked, cfg, vid, txt, t, plans)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_layer_exec_plan_shapes():
    from seedvr2_tpu.config import dit_3b, dit_7b
    from seedvr2_tpu.models.dit.nadit import layer_exec_plan

    assert layer_exec_plan(dit_7b()) == [("scan", 0, 18)]
    assert layer_exec_plan(dit_3b()) == [
        ("scan", 0, 5),
        ("scan", 10, 10),
        ("layer", 30),
        ("layer", 31),
    ]
