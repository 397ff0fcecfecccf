"""Unit tests for the rectified-flow math (SURVEY.md §4a: schedule
conversions, timestep shift, trailing timesteps, CFG)."""

import jax.numpy as jnp
import numpy as np
import pytest

from seedvr2_tpu.pipeline import diffusion as dm


def test_lerp_schedule_coeffs():
    T = 1000.0
    t = jnp.array([0.0, 250.0, 1000.0])
    np.testing.assert_allclose(dm.schedule_A(t, T), [1.0, 0.75, 0.0], atol=1e-6)
    np.testing.assert_allclose(dm.schedule_B(t, T), [0.0, 0.25, 1.0], atol=1e-6)


def test_forward_interpolation():
    x0 = jnp.ones((2, 3)) * 2.0
    xT = jnp.zeros((2, 3))
    out = dm.schedule_forward(x0, xT, jnp.array([500.0, 0.0]), 1000.0)
    np.testing.assert_allclose(out[0], 1.0, atol=1e-6)
    np.testing.assert_allclose(out[1], 2.0, atol=1e-6)


@pytest.mark.parametrize("pred_type", ["x_0", "x_T", "v_lerp"])
def test_pred_roundtrip(pred_type):
    """convert_to_pred -> convert_from_pred recovers (x0, xT). (v_cos is
    excluded: its inversion formula assumes A^2+B^2=1, which does not hold
    for the lerp schedule — same as the reference formulas.)"""
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(2, 4, 4).astype(np.float32))
    xT = jnp.asarray(rng.randn(2, 4, 4).astype(np.float32))
    t = jnp.array([250.0, 700.0])
    T = 1000.0
    x_t = dm.schedule_forward(x0, xT, t, T)
    pred = dm.convert_to_pred(x0, xT, t, T, pred_type)
    r0, rT = dm.convert_from_pred(pred, pred_type, x_t, t, T)
    np.testing.assert_allclose(r0, x0, atol=1e-4)
    np.testing.assert_allclose(rT, xT, atol=1e-4)


def test_v_cos_formulas():
    """v_cos uses A*x_T - B*x_0 (to) and the rotation inverse (from),
    matching reference schedules/base.py:102-105, 124-125 verbatim."""
    T = 1000.0
    t = jnp.array([300.0])
    x0 = jnp.full((1, 2), 1.5)
    xT = jnp.full((1, 2), -0.5)
    A, B = 0.7, 0.3
    pred = dm.convert_to_pred(x0, xT, t, T, "v_cos")
    np.testing.assert_allclose(pred, A * (-0.5) - B * 1.5, rtol=1e-6)
    x_t = dm.schedule_forward(x0, xT, t, T)
    r0, rT = dm.convert_from_pred(pred, "v_cos", x_t, t, T)
    np.testing.assert_allclose(r0, A * x_t - B * pred, rtol=1e-6)
    np.testing.assert_allclose(rT, A * pred + B * x_t, rtol=1e-6)


def test_v_lerp_identity():
    """For lerp schedule, v_lerp prediction is exactly x_T - x_0."""
    x0 = jnp.ones((1, 2))
    xT = jnp.full((1, 2), 3.0)
    v = dm.convert_to_pred(x0, xT, jnp.array([100.0]), 1000.0, "v_lerp")
    np.testing.assert_allclose(v, 2.0)


def test_trailing_timesteps():
    # steps=1 -> [T] exactly (reference: trailing.py with arange(1,0,-1))
    np.testing.assert_allclose(dm.uniform_trailing_timesteps(1, 1000.0), [1000.0])
    # steps=4, no shift -> [1000, 750, 500, 250]
    np.testing.assert_allclose(
        dm.uniform_trailing_timesteps(4, 1000.0), [1000.0, 750.0, 500.0, 250.0], rtol=1e-6
    )
    # shift=3: t' = 3t/(1+2t) on normalized t
    t = np.array([1.0, 0.75, 0.5, 0.25])
    expected = 3 * t / (1 + 2 * t) * 1000.0
    np.testing.assert_allclose(dm.uniform_trailing_timesteps(4, 1000.0, 3.0), expected, rtol=1e-6)


def test_timestep_transform_anchor_points():
    """Anchors from reference infer.py:299-300: img 256^2 -> shift 1,
    1024^2 -> 3.2; vid 256*256*37 px-frames -> 1, 1280*720*145 -> 5."""
    T = 1000.0
    t = jnp.array([500.0])

    # Image (single latent frame): latent 32x32 => pixels 256x256 -> shift 1.0
    shapes = jnp.array([[1, 32, 32]])
    out = dm.timestep_transform(t, shapes, T)
    np.testing.assert_allclose(out, 500.0, rtol=1e-5)

    # Image 1024x1024 -> shift 3.2: t' = 3.2*0.5/(1+2.2*0.5)*1000
    shapes = jnp.array([[1, 128, 128]])
    out = dm.timestep_transform(t, shapes, T)
    np.testing.assert_allclose(out, 3.2 * 0.5 / (1 + 2.2 * 0.5) * 1000, rtol=1e-5)

    # Video at the first anchor: frames=37 -> latent t = 10 (since (10-1)*4+1=37)
    shapes = jnp.array([[10, 32, 32]])
    out = dm.timestep_transform(t, shapes, T)
    np.testing.assert_allclose(out, 500.0, rtol=1e-5)


def test_euler_single_step_endpoint():
    """One trailing step at t=T with v_lerp returns x0 = x_T - pred
    (the deployed one-step configuration)."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 8).astype(np.float32))
    out = dm.euler_sample(x, lambda xt, t, i: v, [1000.0], 1000.0, "v_lerp")
    np.testing.assert_allclose(out, x - v, atol=1e-5)


def test_euler_two_steps_matches_manual():
    T = 1000.0
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 4).astype(np.float32))

    def f(xt, t, i):
        return xt * 0.1

    ts = [1000.0, 500.0]
    out = dm.euler_sample(x, f, ts, T, "v_lerp")
    # manual
    cur = x
    for t, s in [(1000.0, 500.0), (500.0, 0.0)]:
        pred = cur * 0.1
        x0, xT = dm.convert_from_pred(pred, "v_lerp", cur, jnp.array([t]), T)
        cur = dm.schedule_forward(x0, xT, jnp.array([s]), T)
    np.testing.assert_allclose(out, cur, atol=1e-5)


def test_cfg():
    pos = jnp.ones((1, 4)) * 2
    neg = jnp.ones((1, 4))
    out = dm.classifier_free_guidance(pos, neg, 7.5)
    np.testing.assert_allclose(out, 1 + 7.5 * 1.0)
    # scale 1 dispatch short-circuits the negative branch
    called = {"neg": False}

    def neg_fn():
        called["neg"] = True
        return neg

    out = dm.cfg_dispatch(lambda: pos, neg_fn, 1.0)
    assert not called["neg"]
    np.testing.assert_allclose(out, pos)


def test_snr_isnr_roundtrip():
    T = 1000.0
    t = jnp.array([100.0, 400.0, 900.0])
    snr = dm.schedule_snr(t, T)
    np.testing.assert_allclose(dm.schedule_isnr(snr, T), t, rtol=1e-5)
