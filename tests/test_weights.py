"""Checkpoint key mapping: export our params to a torch-layout state dict,
reload, and verify bit-exact round-trip for both DiT and VAE (the mapping is
what makes real reference checkpoints loadable)."""

import jax
import numpy as np

from seedvr2_tpu.config import dit_tiny, vae_tiny
from seedvr2_tpu.io import weights as W
from seedvr2_tpu.models.dit.nadit import init_params as init_dit
from seedvr2_tpu.models.vae.model import init_vae_params


def _roundtrip(params, key_map):
    state = W.export_state_dict(params, key_map)
    flat = W.convert_state_dict(state, key_map)
    rebuilt = W.unflatten_into(params, flat)
    f0 = W.flatten_tree(params)
    f1 = W.flatten_tree(rebuilt)
    assert set(f0) == set(f1)
    for k in f0:
        np.testing.assert_array_equal(np.asarray(f0[k]), np.asarray(f1[k]), err_msg=k)
    return state


def test_dit_roundtrip_3b_style():
    cfg = dit_tiny()  # mm_layers split + vid_only last layer + out norm
    params = init_dit(cfg, jax.random.PRNGKey(0))
    state = _roundtrip(params, W.dit_key_map(cfg))
    # spot-check torch-side naming conventions
    assert "vid_in.proj.weight" in state
    assert "blocks.0.attn.proj_qkv.vid.weight" in state
    assert "blocks.1.attn.proj_qkv.all.weight" in state  # shared layer
    assert "vid_out_ada.out_shift" in state
    # torch linear layout is [out, in]
    assert state["txt_in.weight"].shape == (cfg.txt_dim, cfg.txt_in_dim)


def test_dit_roundtrip_7b_style():
    cfg = dit_tiny(rope_type="window_pixel")
    params = init_dit(cfg, jax.random.PRNGKey(1))
    state = _roundtrip(params, W.dit_key_map(cfg))
    assert "blocks.0.mlp.txt.proj_in.bias" in state  # GELU mlp has biases
    assert not any("vid_out_ada" in k for k in state)


def test_vae_roundtrip():
    cfg = vae_tiny()
    params = init_vae_params(cfg, jax.random.PRNGKey(2))
    state = _roundtrip(params, W.vae_key_map(cfg))
    assert "encoder.conv_in.weight" in state
    assert "decoder.up_blocks.0.upsamplers.0.upscale_conv.weight" in state
    assert "encoder.mid_block.attentions.0.to_out.0.weight" in state
    # torch conv layout is [O, I, D, H, W]
    w = state["encoder.conv_in.weight"]
    assert w.shape == (cfg.block_out_channels[0], cfg.in_channels, 3, 3, 3)
    # resnet0 of encoder block2 changes channels (8->16) -> has shortcut
    assert "encoder.down_blocks.2.resnets.0.conv_shortcut.weight" in state


def test_key_map_covers_all_params():
    for cfg, init, km in [
        (dit_tiny(), init_dit, W.dit_key_map),
        (vae_tiny(), init_vae_params, W.vae_key_map),
    ]:
        params = init(cfg, jax.random.PRNGKey(0))
        flat = W.flatten_tree(params)
        mapped = set(km(cfg).keys())
        ours = set(flat.keys())
        assert mapped == ours, (
            f"unmapped: {sorted(ours - mapped)[:5]} extra: {sorted(mapped - ours)[:5]}"
        )


def test_pth_checkpoint_loading(tmp_path):
    """.pth checkpoints load through the same key map (reference:
    model_loader.py:141-153 mmap + weights_only torch.load)."""
    import torch

    cfg = dit_tiny()
    params = init_dit(cfg, jax.random.PRNGKey(2))
    key_map = W.dit_key_map(cfg)
    state = W.export_state_dict(params, key_map)
    path = str(tmp_path / "tiny.pth")
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in state.items()}, path)

    template = jax.eval_shape(lambda k: init_dit(cfg, k), jax.random.PRNGKey(0))
    rebuilt = W.load_dit_params(path, cfg, template)
    f0, f1 = W.flatten_tree(params), W.flatten_tree(rebuilt)
    assert set(f0) == set(f1)
    for k in f0:
        np.testing.assert_allclose(np.asarray(f0[k]), np.asarray(f1[k]), err_msg=k)


def test_pth_nested_state_dict(tmp_path):
    """Checkpoints wrapped as {'state_dict': ...} unwrap automatically."""
    import torch

    path = str(tmp_path / "wrapped.pth")
    torch.save({"state_dict": {"a.weight": torch.ones(3)}}, path)
    out = W.load_pth(path)
    assert list(out) == ["a.weight"]
    np.testing.assert_array_equal(out["a.weight"], np.ones(3, np.float32))
