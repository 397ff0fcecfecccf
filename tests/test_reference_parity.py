"""Logit-level parity against the ACTUAL PyTorch reference in /root/reference.

These tests import the reference's own modules (pure torch, CPU) — via the
faithful-subset dependency shims in ref_shims.py — build tiny-config models,
export their ``state_dict()`` through our io/weights.py key map, and assert
our JAX forward matches the reference forward within fp32 tolerance.

This is the oracle the round-1 suite lacked: every numeric claim (mmrope
offsets, AdaSingle emb-slice quirk, window math, qk-norm placement, SwiGLU,
text mean-coalescing) is checked against the reference's executed code, not
our own re-derivation.  It also drives the dit_key_map/vae_key_map through a
real reference ``state_dict()``, so checkpoint-name parity is a regression
test rather than an eyeballed claim.

Reference call targets:
- NaDiT 3B forward: /root/reference/src/models/dit_3b/nadit.py:190-248
- NaDiT 7B forward: /root/reference/src/models/dit_7b/nadit.py:152
- VAE encode/decode: .../video_vae_v3/modules/attn_video_vae.py:1680-1698
- color fixes: /root/reference/src/utils/color_fix.py
- alpha guided filter: /root/reference/src/core/alpha_upscaling.py
"""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ref_shims import install_shims  # noqa: E402

install_shims()

from seedvr2_tpu.config import DiTConfig, dit_tiny  # noqa: E402
from seedvr2_tpu.io import weights as W  # noqa: E402
from seedvr2_tpu.models.dit.nadit import (  # noqa: E402
    build_attn_plans,
    init_params,
    nadit_forward,
)

ATOL = 2e-4
RTOL = 2e-4


def _tiny_cfg_3b() -> DiTConfig:
    # dit_tiny but with the reference's hard-coded SwiGLU multiple_of=256
    # (reference: src/models/dit_3b/mlp.py:50 — not configurable there).
    return dataclasses.replace(dit_tiny("mmrope3d"), swiglu_multiple_of=256)


def _tiny_cfg_7b() -> DiTConfig:
    return dit_tiny("window_pixel")


def _build_reference_nadit_3b(cfg: DiTConfig):
    from src.models.dit_3b.nadit import NaDiT

    n = cfg.num_layers
    model = NaDiT(
        vid_in_channels=cfg.vid_in_channels,
        vid_out_channels=cfg.vid_out_channels,
        vid_dim=cfg.vid_dim,
        txt_in_dim=cfg.txt_in_dim,
        txt_dim=cfg.txt_dim,
        emb_dim=cfg.emb_dim,
        heads=cfg.heads,
        head_dim=cfg.head_dim,
        expand_ratio=cfg.expand_ratio,
        norm="fusedrms",
        norm_eps=cfg.norm_eps,
        ada="single",
        qk_bias=cfg.qk_bias,
        qk_norm="fusedrms",
        patch_size=tuple(cfg.patch_size),
        num_layers=n,
        block_type="mmdit_sr",
        mm_layers=cfg.mm_layers,
        mlp_type=cfg.mlp_type,
        window=tuple(cfg.window),
        window_method=(n // 2) * ["720pwin_by_size_bysize", "720pswin_by_size_bysize"],
        rope_type=cfg.rope_type,
        rope_dim=cfg.rope_dim,
        vid_out_norm="fusedrms" if cfg.vid_out_norm else None,
        msa_type=None,
        mca_type=None,
        attention_mode="sdpa",
    )
    model.eval()
    # The reference TimeEmbedding hard-codes sinusoidal_dim=256
    # (nadit.py:119-123); tiny configs use a smaller one for speed.
    import src.models.dit_3b.embedding as ref_emb

    model.emb_in = ref_emb.TimeEmbedding(
        sinusoidal_dim=cfg.sinusoidal_dim,
        hidden_dim=max(cfg.vid_dim, cfg.txt_dim),
        output_dim=cfg.emb_dim,
    )
    model.eval()
    return model


def _randomize(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = model.state_dict()
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            sd[k] = torch.randn(v.shape, generator=g, dtype=torch.float32) * 0.05
            if k.endswith("scale"):
                sd[k] += 1.0
    model.load_state_dict(sd)
    return model


def _params_from_reference(model, cfg: DiTConfig):
    """reference state_dict -> our param tree, via the production key map."""
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    key_map = W.dit_key_map(cfg)
    flat = W.convert_state_dict(sd, key_map, dtype=np.float32)
    template = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    params = W.unflatten_into(template, flat)
    # Every reference tensor must be either consumed by the map or a known
    # non-weight (rope frequency buffers are re-derived on our side).
    consumed = {theirs for theirs, _ in key_map.values()}
    leftovers = [k for k in sd if k not in consumed and ".rope." not in k]
    assert not leftovers, f"reference keys unmapped: {leftovers[:8]}"
    return params


def _run_reference_nadit(model, vid_np, txt_np, t):
    """vid_np [T,H,W,C] pre-patch, txt_np [Lt, Ctxt]."""
    T, H, Wd, C = vid_np.shape
    vid = torch.from_numpy(vid_np.reshape(T * H * Wd, C))
    txt = torch.from_numpy(txt_np)
    vid_shape = torch.tensor([[T, H, Wd]], dtype=torch.long)
    txt_shape = torch.tensor([[txt_np.shape[0]]], dtype=torch.long)
    with torch.no_grad():
        out = model(vid, txt, vid_shape, txt_shape, torch.tensor([t]))
    return out.vid_sample.numpy().reshape(T, H, Wd, -1)


@pytest.mark.parametrize("thw", [(1, 16, 16), (3, 12, 20)])
def test_nadit_3b_logit_parity(thw):
    cfg = _tiny_cfg_3b()
    model = _randomize(_build_reference_nadit_3b(cfg), seed=3)
    params = _params_from_reference(model, cfg)

    T, H, Wd = thw
    rng = np.random.default_rng(7)
    vid_np = rng.standard_normal((T, H, Wd, cfg.vid_in_channels), dtype=np.float32) * 0.3
    txt_np = rng.standard_normal((6, cfg.txt_in_dim), dtype=np.float32) * 0.3

    ref = _run_reference_nadit(model, vid_np, txt_np, 1000.0)

    pt, ph, pw = cfg.patch_size
    plans = build_attn_plans(cfg, (T, H // ph, Wd // pw), txt_np.shape[0])
    ours = nadit_forward(
        params,
        cfg,
        jnp.asarray(vid_np)[None],
        jnp.asarray(txt_np)[None],
        jnp.array([1000.0]),
        plans,
    )
    ours = np.asarray(ours[0])

    assert ref.shape == ours.shape, (ref.shape, ours.shape)
    np.testing.assert_allclose(ours, ref, atol=ATOL, rtol=RTOL)


def _build_reference_nadit_7b(cfg: DiTConfig):
    from src.models.dit_7b.nadit import NaDiT

    n = cfg.num_layers
    model = NaDiT(
        vid_in_channels=cfg.vid_in_channels,
        vid_out_channels=cfg.vid_out_channels,
        vid_dim=cfg.vid_dim,
        txt_in_dim=cfg.txt_in_dim,
        txt_dim=cfg.txt_dim,
        emb_dim=cfg.emb_dim,
        heads=cfg.heads,
        head_dim=cfg.head_dim,
        expand_ratio=cfg.expand_ratio,
        norm="fusedrms",
        norm_eps=cfg.norm_eps,
        ada="single",
        qk_bias=cfg.qk_bias,
        qk_rope=True,
        qk_norm="fusedrms",
        patch_size=tuple(cfg.patch_size),
        num_layers=n,
        block_type="mmdit_sr",
        shared_qkv=False,
        shared_mlp=False,
        mlp_type=cfg.mlp_type,
        window=tuple(cfg.window),
        window_method=(n // 2) * ["720pwin_by_size_bysize", "720pswin_by_size_bysize"],
        attention_mode="sdpa",
    )
    import src.models.dit_7b.embedding as ref_emb

    model.emb_in = ref_emb.TimeEmbedding(
        sinusoidal_dim=cfg.sinusoidal_dim,
        hidden_dim=max(cfg.vid_dim, cfg.txt_dim),
        output_dim=cfg.emb_dim,
    )
    model.eval()
    return model


@pytest.mark.parametrize("thw", [(1, 16, 16), (3, 12, 20)])
def test_nadit_7b_logit_parity(thw):
    # 7B structure: every layer separate vid/txt weights, GELU MLP,
    # per-window pixel rope, no vid_out_norm
    # (reference: configs_7b/main.yaml, dit_7b/nablocks/mmsr_block.py).
    cfg = dataclasses.replace(_tiny_cfg_7b(), mm_layers=2)
    model = _randomize(_build_reference_nadit_7b(cfg), seed=5)
    params = _params_from_reference(model, cfg)

    T, H, Wd = thw
    rng = np.random.default_rng(17)
    vid_np = rng.standard_normal((T, H, Wd, cfg.vid_in_channels), dtype=np.float32) * 0.3
    txt_np = rng.standard_normal((6, cfg.txt_in_dim), dtype=np.float32) * 0.3

    ref = _run_reference_nadit(model, vid_np, txt_np, 1000.0)

    pt, ph, pw = cfg.patch_size
    plans = build_attn_plans(cfg, (T, H // ph, Wd // pw), txt_np.shape[0])
    ours = np.asarray(
        nadit_forward(
            params, cfg, jnp.asarray(vid_np)[None], jnp.asarray(txt_np)[None],
            jnp.array([1000.0]), plans,
        )[0]
    )
    assert ref.shape == ours.shape, (ref.shape, ours.shape)
    np.testing.assert_allclose(ours, ref, atol=ATOL, rtol=RTOL)


# --------------------------------------------------------------------------- #
# VAE
# --------------------------------------------------------------------------- #


def _build_reference_vae(cfg):
    from src.models.video_vae_v3.modules.attn_video_vae import VideoAutoencoderKLWrapper

    model = VideoAutoencoderKLWrapper(
        spatial_downsample_factor=cfg.spatial_downsample_factor,
        temporal_downsample_factor=cfg.temporal_downsample_factor,
        freeze_encoder=False,
        act_fn="silu",
        block_out_channels=list(cfg.block_out_channels),
        down_block_types=["DownEncoderBlock3D"] * cfg.num_blocks,
        up_block_types=["UpDecoderBlock3D"] * cfg.num_blocks,
        in_channels=cfg.in_channels,
        latent_channels=cfg.latent_channels,
        layers_per_block=cfg.layers_per_block,
        norm_num_groups=cfg.norm_num_groups,
        out_channels=cfg.out_channels,
        slicing_sample_min_size=cfg.slicing_sample_min_size,
        temporal_scale_num=cfg.temporal_scale_num,
        inflation_mode="pad",
        use_quant_conv=False,
        use_post_quant_conv=False,
    )
    model.debug = None  # tiled paths read self.debug (set by the pipeline)
    model.eval()
    return model


@pytest.fixture(scope="module")
def vae_pair():
    from seedvr2_tpu.config import vae_tiny
    from seedvr2_tpu.models.vae.model import init_vae_params

    cfg = vae_tiny()
    model = _randomize(_build_reference_vae(cfg), seed=21)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    key_map = W.vae_key_map(cfg)
    flat = W.convert_state_dict(sd, key_map, dtype=np.float32)
    template = init_vae_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    params = W.unflatten_into(template, flat)
    consumed = {theirs for theirs, _ in key_map.values()}
    leftovers = [k for k in sd if k not in consumed]
    assert not leftovers, f"reference VAE keys unmapped: {leftovers[:8]}"
    return cfg, model, params


@pytest.mark.parametrize("T", [1, 5])
def test_vae_encode_parity_full(vae_pair, T):
    from seedvr2_tpu.models.vae.model import posterior_mode
    from seedvr2_tpu.models.vae.tiling import slicing_encode

    cfg, model, params = vae_pair
    rng = np.random.default_rng(31)
    x = rng.standard_normal((1, 3, T, 32, 32), dtype=np.float32).clip(-1, 1)

    with torch.no_grad():
        ref = model.encode(torch.from_numpy(x)).latent.numpy()  # [B,C,T',h,w]

    ours = posterior_mode(slicing_encode(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 4, 1))))
    ours = np.asarray(ours).transpose(0, 4, 1, 2, 3)
    if T == 1:
        ref = ref[:, :, None] if ref.ndim == 4 else ref
    np.testing.assert_allclose(ours, ref, atol=ATOL, rtol=RTOL)


def test_vae_decode_parity_full(vae_pair):
    from seedvr2_tpu.models.vae.tiling import slicing_decode

    cfg, model, params = vae_pair
    rng = np.random.default_rng(37)
    z = rng.standard_normal((1, cfg.latent_channels, 2, 4, 4), dtype=np.float32)

    with torch.no_grad():
        ref = model.decode(torch.from_numpy(z)).sample.numpy()  # [B,3,T,H,W]

    ours = slicing_decode(params, cfg, jnp.asarray(z.transpose(0, 2, 3, 4, 1)))
    ours = np.asarray(ours).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(ours, ref, atol=ATOL, rtol=RTOL)


def test_vae_encode_decode_parity_sliced(vae_pair):
    """Multi-slice streaming: the reference's MemoryState INITIALIZING->ACTIVE
    thread vs our scan-carry stream state (attn_video_vae.py:1254-1300)."""
    cfg, model, params = vae_pair
    from seedvr2_tpu.models.vae.model import posterior_mode
    from seedvr2_tpu.models.vae.tiling import slicing_decode, slicing_encode

    model.set_causal_slicing(split_size=cfg.slicing_sample_min_size, memory_device="same")
    try:
        rng = np.random.default_rng(41)
        x = rng.standard_normal((1, 3, 13, 32, 32), dtype=np.float32).clip(-1, 1)
        with torch.no_grad():
            ref_lat = model.encode(torch.from_numpy(x)).latent
            ref_dec = model.decode(ref_lat).sample.numpy()
        ref_lat_np = ref_lat.numpy()

        ours_lat = posterior_mode(
            slicing_encode(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 4, 1)))
        )
        np.testing.assert_allclose(
            np.asarray(ours_lat).transpose(0, 4, 1, 2, 3), ref_lat_np, atol=ATOL, rtol=RTOL
        )
        ours_dec = slicing_decode(params, cfg, ours_lat)
        np.testing.assert_allclose(
            np.asarray(ours_dec).transpose(0, 4, 1, 2, 3), ref_dec, atol=5e-4, rtol=5e-4
        )
    finally:
        model.disable_slicing()


@pytest.mark.parametrize("tile_batch", [1, 3])
def test_vae_tiled_decode_parity(vae_pair, tile_batch):
    """Spatial tiled decode vs reference tiled_decode (cosine-ramp blending,
    attn_video_vae.py:1470-1630). Geometry chosen so the reference's clipped
    grid and our shift-last-start uniform grid coincide ((H-lt) % stride == 0);
    elsewhere tile placement deliberately differs (see tiling._tile_starts).
    tile_batch=3 exercises the remainder-group padding (4 tiles -> 3+1)."""
    cfg, model, params = vae_pair
    from seedvr2_tpu.models.vae.tiling import tiled_decode

    rng = np.random.default_rng(43)
    z = rng.standard_normal((1, cfg.latent_channels, 2, 12, 12), dtype=np.float32)

    with torch.no_grad():
        ref = model.decode(
            torch.from_numpy(z), tiled=True, tile_size=(64, 64), tile_overlap=(32, 32)
        ).sample.numpy()

    ours = tiled_decode(
        params, cfg, jnp.asarray(z.transpose(0, 2, 3, 4, 1)), (64, 64), (32, 32),
        tile_batch=tile_batch,
    )
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 4, 1, 2, 3), ref, atol=5e-4, rtol=5e-4
    )


def test_vae_tiled_encode_parity(vae_pair):
    """Spatial tiled encode vs reference tiled_encode
    (attn_video_vae.py:1302-1468), coinciding-grid geometry."""
    cfg, model, params = vae_pair
    from seedvr2_tpu.models.vae.tiling import tiled_encode
    from seedvr2_tpu.models.vae.model import posterior_mode

    rng = np.random.default_rng(47)
    x = rng.standard_normal((1, 3, 5, 96, 96), dtype=np.float32).clip(-1, 1)

    with torch.no_grad():
        ref = model.encode(
            torch.from_numpy(x), tiled=True, tile_size=(64, 64), tile_overlap=(32, 32)
        ).latent.numpy()

    moments = tiled_encode(
        params, cfg, jnp.asarray(x.transpose(0, 2, 3, 4, 1)), (64, 64), (32, 32),
        tile_batch=2,
    )
    ours = np.asarray(posterior_mode(moments)).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=5e-4)


# --------------------------------------------------------------------------- #
# Color correction + alpha
# --------------------------------------------------------------------------- #


def _frames(shape=(2, 3, 24, 24), seed=51):
    rng = np.random.default_rng(seed)
    return rng.random(shape, dtype=np.float32)


@pytest.mark.parametrize(
    "method",
    ["wavelet", "adain", "lab", "hsv", "wavelet_adaptive"],
)
def test_color_fix_parity(method):
    """All 5 color-transfer methods vs the reference implementations
    (reference: src/utils/color_fix.py:72-857). Inputs are [N,C,H,W] in [0,1]
    (the reference applies them per-batch in phase 4)."""
    import src.utils.color_fix as ref_cf

    from seedvr2_tpu.ops import color as ours_cf

    # both implementations take [-1, 1] video batches (phase-4 convention)
    content = _frames(seed=51) * 2.0 - 1.0
    style = (_frames(seed=53) * 0.8 + 0.1) * 2.0 - 1.0

    class _NullDebug:
        def log(self, *a, **k):
            pass

    dbg = _NullDebug()
    # copies: the reference mutates in-place (e.g. content_feat.add_(1.0)),
    # and torch.from_numpy shares memory with the numpy inputs
    tc, ts = torch.from_numpy(content.copy()), torch.from_numpy(style.copy())
    with torch.no_grad():
        if method == "wavelet":
            ref = ref_cf.wavelet_reconstruction(tc, ts)
        elif method == "adain":
            ref = ref_cf.adaptive_instance_normalization(tc, ts)
        elif method == "lab":
            ref = ref_cf.lab_color_transfer(tc, ts, dbg)
        elif method == "hsv":
            ref = ref_cf.hsv_saturation_histogram_match(tc, ts, dbg)
        else:
            ref = ref_cf.wavelet_adaptive_color_correction(tc, ts, dbg)
    ref = ref.numpy()

    # ours operates on [B, C, H, W] like the reference
    ours = np.asarray(
        ours_cf.apply_color_correction(method, jnp.asarray(content), jnp.asarray(style))
    )

    # histogram-matching methods involve sort/searchsorted on near-equal
    # values — allow a slightly looser tol there
    tol = 5e-3 if method in ("lab", "hsv") else 1e-4
    assert ref.shape == ours.shape
    mismatch = np.abs(ours - ref)
    assert np.quantile(mismatch, 0.999) < tol, (
        method, float(mismatch.max()), float(np.quantile(mismatch, 0.999)))


@pytest.mark.parametrize("kind", ["gradient", "binary"])
def test_alpha_guided_filter_parity(kind):
    """Edge-guided alpha upscale (both branches) vs the reference
    (reference: src/core/alpha_upscaling.py:289-438). The reference rounds
    Sobel through uint8 via OpenCV; tiny quantization-boundary flips can
    cascade through the binary-snap thresholds, so compare by quantile."""
    import src.core.alpha_upscaling as ref_alpha

    from seedvr2_tpu.pipeline.alpha import upscale_alpha_batch

    rng = np.random.default_rng(61)
    N, h, w, H, W = 2, 16, 16, 32, 32
    if kind == "gradient":
        alpha_lo = (rng.random((N, h, w), dtype=np.float32) * 0.6 + 0.2)
    else:
        alpha_lo = (rng.random((N, h, w)) > 0.5).astype(np.float32)
    # smooth-ish RGB so Sobel maxima aren't razor-edge ties
    base = rng.random((N, H // 4, W // 4, 3), dtype=np.float32)
    rgb_hi = np.stack([
        np.kron(base[i], np.ones((4, 4, 1), np.float32)) for i in range(N)
    ])

    t_alpha = torch.from_numpy(alpha_lo)[:, None]  # T 1 h w
    t_rgb_lo = torch.zeros((N, 3, h, w))  # input_rgb is unused by 'guided'
    t_rgb_hi = torch.from_numpy(rgb_hi.transpose(0, 3, 1, 2))  # T 3 H W
    with torch.no_grad():
        ref = ref_alpha.edge_guided_alpha_upscale(
            input_alpha=t_alpha, input_rgb=t_rgb_lo, upscaled_rgb=t_rgb_hi,
            method="guided", debug=None,
        )
    ref_np = ref.numpy()[:, 0]  # T H W

    ours = upscale_alpha_batch(alpha_lo[..., None], rgb_hi)
    assert ours.shape == ref_np.shape, (ours.shape, ref_np.shape)
    err = np.abs(ours - ref_np)
    assert np.quantile(err, 0.99) < 2e-3, (kind, float(err.max()),
                                           float(np.quantile(err, 0.99)))


def test_nadit_3b_timestep_sensitivity_matches():
    """Same weights, two timesteps: the delta must match too (exercises the
    TimeEmbedding + AdaSingle emb pathway incl. the vid_out_ada quirk)."""
    cfg = _tiny_cfg_3b()
    model = _randomize(_build_reference_nadit_3b(cfg), seed=11)
    params = _params_from_reference(model, cfg)

    rng = np.random.default_rng(13)
    vid_np = rng.standard_normal((2, 8, 8, cfg.vid_in_channels), dtype=np.float32) * 0.3
    txt_np = rng.standard_normal((4, cfg.txt_in_dim), dtype=np.float32) * 0.3

    plans = build_attn_plans(cfg, (2, 4, 4), 4)
    for t in (250.0, 999.0):
        ref = _run_reference_nadit(model, vid_np, txt_np, t)
        ours = np.asarray(
            nadit_forward(
                params, cfg, jnp.asarray(vid_np)[None], jnp.asarray(txt_np)[None],
                jnp.array([t]), plans,
            )[0]
        )
        np.testing.assert_allclose(ours, ref, atol=ATOL, rtol=RTOL)


class TestResizeParity:
    """Direct parity of ops/resize.py's resampler vs torch's antialiased
    bicubic — the reference's NaResize resizes with torchvision bicubic +
    antialias (reference: src/data/image/transforms/side_resize.py:60-74;
    torchvision is absent here, and TVF.resize with antialias=True lowers to
    F.interpolate(mode='bicubic', antialias=True), which is the oracle)."""

    # downscale, upscale, odd sizes, identity-adjacent, reference workloads
    CASES = [
        (720, 1080),   # the bench upscale
        (1080, 720),   # downscale
        (479, 333),    # odd -> odd downscale
        (333, 479),    # odd -> odd upscale
        (212, 1080),   # extreme upscale (Eyes_212x120.mp4 short side)
        (64, 63),      # near-identity downscale
    ]

    @pytest.mark.parametrize("insz,outsz", CASES)
    def test_resample_matrix_1d(self, insz, outsz):
        import torch.nn.functional as TF

        from seedvr2_tpu.ops.resize import resample_matrix

        rng = np.random.default_rng(insz * 1000 + outsz)
        x = rng.standard_normal((1, 1, insz, 4), dtype=np.float32)
        ref = TF.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            size=(1, outsz),
            mode="bicubic",
            align_corners=False,
            antialias=True,
        ).permute(0, 2, 3, 1).numpy()[0, 0]
        m = resample_matrix(insz, outsz)  # [out, in]
        ours = m @ x[0, 0]
        # Taps and support match exactly; the residual is torch computing
        # tap weights in float32 where we use float64 (verified: identical
        # nonzero tap sets, weights differ ~3e-5, output ~1.6e-4 on N(0,1)
        # data — far below the 1/255 output quantization).
        np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)

    @pytest.mark.parametrize(
        "shape,out",
        [
            ((2, 120, 212, 3), (180, 318)),  # 1.5x upscale, both axes odd-ish
            ((1, 96, 128, 3), (48, 64)),     # 2x downscale
            ((1, 45, 80, 3), (135, 240)),    # 3x upscale (720p-norm shapes)
        ],
    )
    def test_resize_plane_2d(self, shape, out):
        import torch.nn.functional as TF

        from seedvr2_tpu.ops.resize import resize_plane

        rng = np.random.default_rng(0)
        x = rng.random(shape, dtype=np.float32)
        ref = TF.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            size=out,
            mode="bicubic",
            align_corners=False,
            antialias=True,
        ).permute(0, 2, 3, 1).numpy()
        ours = np.asarray(resize_plane(jnp.asarray(x), out[0], out[1]))
        np.testing.assert_allclose(ours, ref, atol=5e-5, rtol=5e-5)
