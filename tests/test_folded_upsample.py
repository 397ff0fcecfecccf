"""Folded upsample (models/vae/folded_upsample.py) vs the naive
expansion + depth-to-space + causal-conv path: identical numerics in fp32
(up to fold reassociation ~1e-5) across stream modes and both upsample
kinds, plus full-decoder equivalence including temporal slicing."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seedvr2_tpu.config import vae_tiny
from seedvr2_tpu.models.vae import model as M
from seedvr2_tpu.models.vae.causal_conv import StreamCtx
from seedvr2_tpu.models.vae.folded_upsample import upsample_folded


def _rand_upsample_params(key, c, ratio):
    """Random (NOT identity-init) expansion + conv so the fold is fully
    exercised — identity E would hide phase-block mixups."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "upscale": {
            "w": jax.random.normal(k1, (1, 1, 1, c, c * ratio), jnp.float32) * 0.3,
            "b": jax.random.normal(k2, (c * ratio,), jnp.float32) * 0.5,
        },
        "conv": {
            "w": jax.random.normal(k3, (3, 3, 3, c, c), jnp.float32) * 0.2,
            "b": jax.random.normal(k4, (c,), jnp.float32) * 0.5,
        },
    }


def _naive(p, cfg, x, ctx, temporal_up):
    M.set_folded_upsample(False)
    try:
        return M._upsample(p, cfg, x, ctx, "upsample", temporal_up)
    finally:
        M.set_folded_upsample(True)


CFG = vae_tiny()


@pytest.mark.parametrize("temporal_up", [True, False])
@pytest.mark.parametrize("T", [1, 2, 3, 5])
def test_single_shot_matches_naive(temporal_up, T):
    c = 8
    key = jax.random.PRNGKey(hash((temporal_up, T)) % 2**31)
    p = _rand_upsample_params(key, c, 8 if temporal_up else 4)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, T, 6, 5, c), jnp.float32)
    ref = _naive(p, CFG, x, StreamCtx("disabled"), temporal_up)
    got = upsample_folded(p, CFG, x, StreamCtx("disabled"), "upsample", temporal_up)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("temporal_up", [True, False])
def test_streaming_matches_naive_chain(temporal_up):
    """init slice + two active slices == the naive path run the same way
    (each side threads its OWN state format)."""
    c = 8
    p = _rand_upsample_params(jax.random.PRNGKey(7), c, 8 if temporal_up else 4)
    slices = [
        jax.random.normal(jax.random.PRNGKey(10 + i), (1, t, 6, 5, c), jnp.float32)
        for i, t in enumerate([3, 2, 2])
    ]

    def run(fn):
        outs, state = [], {}
        for i, xs in enumerate(slices):
            ctx = StreamCtx("init" if i == 0 else "active", state)
            outs.append(fn(p, CFG, xs, ctx, temporal_up))
            state = ctx.out_state
        return jnp.concatenate(outs, axis=1)

    ref = run(lambda p_, c_, x_, ctx_, t_: _naive(p_, c_, x_, ctx_, t_))
    got = run(lambda p_, c_, x_, ctx_, t_: upsample_folded(p_, c_, x_, ctx_, "upsample", t_))
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("tz,kt_low,A", [(2, 2, 2), (1, 3, 1), (2, 1, 1)])
def test_pallas_kernel_matches_xla_form(tz, kt_low, A):
    """ops/fold_upsample_kernel.py (interpret mode) vs the XLA ones-channel
    form on the same folded weights — incl. boundary-mask bias handling."""
    from seedvr2_tpu.models.vae import folded_upsample as F
    from seedvr2_tpu.ops.fold_upsample_kernel import fold_upsample_conv

    c = 128  # kernel requires lane-aligned channels
    ratio = 4 * tz
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3 * tz + kt_low), 3)
    W = jax.random.normal(k1, (3, 3, 3, c, c), jnp.float32) * 0.2
    E = jax.random.normal(k2, (c, c * ratio), jnp.float32) * 0.3
    be = jax.random.normal(k3, (c * ratio,), jnp.float32) * 0.5
    tmap = (
        F._T_MAP_PAIR if (tz, A) == (2, 2) else
        F._T_MAP_S0 if (tz, A) == (2, 1) else F._T_MAP_TZ1
    )
    x_ext = jax.random.normal(jax.random.PRNGKey(9), (1, kt_low + 2, 9, 6, c), jnp.float32)

    K, btab = F._fold_core(W, E, be, tz, tmap, kt_low)
    got = fold_upsample_conv(x_ext, K, btab, jnp.zeros((c,)), A, interpret=True)

    Kaug = F._fold_kernel(W, E, be, tz, tmap, kt_low, jnp.float32)
    ref = F._interleave(F._phase_conv(F._augment(x_ext), Kaug), A, c)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=2e-4)


def test_full_decoder_folded_matches_naive():
    """decoder_forward end-to-end, folded vs naive, incl. temporal slicing
    (slicing_decode drives init/active through every upsample)."""
    from seedvr2_tpu.models.vae.model import decoder_forward, init_vae_params
    from seedvr2_tpu.models.vae.tiling import slicing_decode

    cfg = CFG
    params = init_vae_params(cfg, jax.random.PRNGKey(0))
    # randomize the identity-init expansions so the fold is non-trivial
    dec = params["decoder"]
    for i in range(cfg.num_blocks):
        blk = dec[f"up{i}"]
        if "upsample" in blk:
            k = jax.random.PRNGKey(100 + i)
            blk["upsample"]["upscale"]["w"] = (
                jax.random.normal(k, blk["upsample"]["upscale"]["w"].shape, jnp.float32) * 0.3
            )
            blk["upsample"]["upscale"]["b"] = (
                jax.random.normal(k, blk["upsample"]["upscale"]["b"].shape, jnp.float32) * 0.4
            )
    z = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 4, 4, cfg.latent_channels), jnp.float32)

    M.set_folded_upsample(False)
    try:
        ref = decoder_forward(params, cfg, z)
        ref_sliced = slicing_decode(params, cfg, z)
    finally:
        M.set_folded_upsample(True)
    got = decoder_forward(params, cfg, z)
    got_sliced = slicing_decode(params, cfg, z)

    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(
        np.asarray(got_sliced), np.asarray(ref_sliced), atol=5e-4, rtol=5e-4
    )
