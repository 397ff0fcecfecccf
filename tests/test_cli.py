"""CLI end-to-end smoke test: synthetic tiny checkpoints -> main() -> output
image. Exercises argv parsing, the loader path (incl. orbax cache), the full
4-phase pipeline and image IO exactly as a user invocation would."""

import dataclasses
import os

import jax
import numpy as np
import pytest

import inference_cli
from seedvr2_tpu.config import dit_tiny, vae_tiny
from seedvr2_tpu.io import video as vio
from seedvr2_tpu.io import weights as W
from seedvr2_tpu.models.dit.nadit import init_params as init_dit
from seedvr2_tpu.models.vae.model import init_vae_params


@pytest.fixture(scope="module")
def tiny_model_dir(tmp_path_factory):
    from safetensors.numpy import save_file

    d = tmp_path_factory.mktemp("cli_models")
    vae_cfg = vae_tiny()
    dit_cfg = dataclasses.replace(
        dit_tiny(),
        vid_in_channels=2 * vae_cfg.latent_channels + 1,
        vid_out_channels=vae_cfg.latent_channels,
    )
    dit_params = init_dit(dit_cfg, jax.random.PRNGKey(0))
    vae_params = init_vae_params(vae_cfg, jax.random.PRNGKey(1))
    save_file(
        {k: np.ascontiguousarray(v) for k, v in W.export_state_dict(dit_params, W.dit_key_map(dit_cfg)).items()},
        str(d / "tiny_dit.safetensors"),
    )
    save_file(
        {k: np.ascontiguousarray(v) for k, v in W.export_state_dict(vae_params, W.vae_key_map(vae_cfg)).items()},
        str(d / "tiny_vae.safetensors"),
    )
    return d


def test_cli_image_end_to_end(tiny_model_dir, tmp_path):
    img = np.random.RandomState(0).rand(20, 24, 3).astype(np.float32)
    inp = str(tmp_path / "in.png")
    out = str(tmp_path / "out.png")
    vio.write_image(inp, img)

    rc = inference_cli.main(
        [
            inp,
            "--output", out,
            "--dit_model", "tiny_dit.safetensors",
            "--vae_model", "tiny_vae.safetensors",
            "--model_dir", str(tiny_model_dir),
            "--resolution", "32",
            "--color_correction", "wavelet",
        ]
    )
    assert rc == 0
    assert os.path.exists(out)
    result = vio.read_image(out)
    assert result.shape[0] >= 26 and result.shape[2] == 3


def test_cli_video_end_to_end(tiny_model_dir, tmp_path):
    frames = (np.random.RandomState(1).rand(6, 20, 24, 3) > 0.5).astype(np.float32)
    inp = str(tmp_path / "in.mp4")
    out = str(tmp_path / "out.mp4")
    w = vio.make_video_writer(inp, 24, 20, 10.0)
    w.write(frames)
    w.close()

    rc = inference_cli.main(
        [
            inp,
            "--output", out,
            "--dit_model", "tiny_dit.safetensors",
            "--vae_model", "tiny_vae.safetensors",
            "--model_dir", str(tiny_model_dir),
            "--resolution", "32",
            "--color_correction", "none",
            "--batch_size", "5",
            # reference flag (inference_cli.py:1356) — must parse and run
            "--10bit",
        ]
    )
    assert rc == 0
    r = vio.VideoReader(out)
    assert r.total_frames == 6
    r.close()


def test_cli_directory_mixed_media(tiny_model_dir, tmp_path):
    """Directory batch mode processes videos AND images, keeping original
    filenames in the _upscaled dir (reference: inference_cli.py:280-296
    VIDEO_EXTENSIONS | IMAGE_EXTENSIONS; generate_output_path :395-419)."""
    src = tmp_path / "batch"
    src.mkdir()
    rs = np.random.RandomState(3)
    for name in ("a.mp4", "b.mp4"):
        w = vio.make_video_writer(str(src / name), 24, 20, 10.0)
        w.write((rs.rand(6, 20, 24, 3) > 0.5).astype(np.float32))
        w.close()
    vio.write_image(str(src / "c.png"), rs.rand(20, 24, 3).astype(np.float32))

    rc = inference_cli.main(
        [
            str(src),
            "--dit_model", "tiny_dit.safetensors",
            "--vae_model", "tiny_vae.safetensors",
            "--model_dir", str(tiny_model_dir),
            "--resolution", "32",
            "--color_correction", "none",
            "--batch_size", "5",
        ]
    )
    assert rc == 0
    out_dir = str(src) + "_upscaled"
    for name in ("a.mp4", "b.mp4"):
        r = vio.VideoReader(os.path.join(out_dir, name))
        assert r.total_frames == 6
        r.close()
    img = vio.read_image(os.path.join(out_dir, "c.png"))
    assert img.shape[0] >= 26


def test_cli_mesh_auto_video_runs_data_parallel(tiny_model_dir, tmp_path, monkeypatch):
    """VERDICT r4 #1: on a multi-device host, `--mesh auto` (the default)
    must actually run the frame-DP multichip path for a long-enough video —
    no silent single-chip fallback."""
    from seedvr2_tpu.pipeline import multichip

    frames = (np.random.RandomState(5).rand(16, 20, 24, 3) > 0.5).astype(np.float32)
    inp = str(tmp_path / "in16.mp4")
    out = str(tmp_path / "out16.mp4")
    w = vio.make_video_writer(inp, 24, 20, 10.0)
    w.write(frames)
    w.close()

    seen = {}
    orig = multichip.generate_multichip

    def spy(runner, images, mesh, **kw):
        seen["mesh"] = dict(mesh.shape)
        seen["runner_mesh"] = getattr(runner, "mesh", None) is not None
        seen["n_frames"] = len(images)
        return orig(runner, images, mesh, **kw)

    monkeypatch.setattr(multichip, "generate_multichip", spy)
    rc = inference_cli.main(
        [
            inp,
            "--output", out,
            "--dit_model", "tiny_dit.safetensors",
            "--vae_model", "tiny_vae.safetensors",
            "--model_dir", str(tiny_model_dir),
            "--resolution", "32",
            "--color_correction", "none",
            "--batch_size", "5",
        ]
    )
    assert rc == 0
    # tiny model fits one chip -> the policy gives all 8 devices to "data"
    assert seen["mesh"]["data"] == 8
    assert seen["runner_mesh"]  # the mesh reached the runner (loader wiring)
    r = vio.VideoReader(out)
    assert r.total_frames == 16
    r.close()


def _dit_tensor_sharded(runner) -> bool:
    import jax as _jax

    for leaf in _jax.tree.leaves(runner.dit_params):
        s = getattr(leaf, "sharding", None)
        if s is not None and "tensor" in str(getattr(s, "spec", "")):
            return True
    return False


def test_cli_explicit_mesh_tensor_shards_dit(tiny_model_dir):
    """--mesh d,s,t with tensor > 1 must reach load_runner as shard_dit:
    the runner's DiT leaves carry 'tensor' NamedShardings."""
    args = inference_cli.parse_arguments(
        [
            "unused.mp4",
            "--dit_model", "tiny_dit.safetensors",
            "--vae_model", "tiny_vae.safetensors",
            "--model_dir", str(tiny_model_dir),
            "--resolution", "32",
            "--mesh", "4,1,2",
        ]
    )
    mesh = inference_cli.build_mesh(args, 16)
    assert mesh is not None and mesh.shape == {"data": 4, "seq": 1, "tensor": 2}
    runner, _, _ = inference_cli.build_runner(args, mesh)
    assert runner.mesh is mesh
    assert _dit_tensor_sharded(runner)


def test_cli_auto_mesh_image_tensor_shards(tiny_model_dir):
    """`--mesh auto` for an image workload tensor-shards the DiT (capped by
    head divisibility: tiny heads=2 -> tensor=2) instead of leaving every
    chip but one idle."""
    args = inference_cli.parse_arguments(
        [
            "unused.png",
            "--dit_model", "tiny_dit.safetensors",
            "--vae_model", "tiny_vae.safetensors",
            "--model_dir", str(tiny_model_dir),
            "--resolution", "32",
        ]
    )
    mesh = inference_cli.build_mesh(args, 1)
    assert mesh is not None and mesh.shape["tensor"] == 2
    runner, _, _ = inference_cli.build_runner(args, mesh)
    assert _dit_tensor_sharded(runner)


@pytest.mark.parametrize("n_in", [12, 14])  # 14: last chunk is exactly the carry
def test_cli_chunked_overlap_frame_count(tiny_model_dir, tmp_path, n_in):
    """Chunked streaming with temporal overlap must emit each input frame
    exactly once, seam-blended (reference: inference_cli.py:678-709)."""
    frames = (np.random.RandomState(2).rand(n_in, 20, 24, 3) > 0.5).astype(np.float32)
    inp = str(tmp_path / f"in{n_in}.mp4")
    out = str(tmp_path / f"out{n_in}.mp4")
    w = vio.make_video_writer(inp, 24, 20, 10.0)
    w.write(frames)
    w.close()

    rc = inference_cli.main(
        [
            inp,
            "--output", out,
            "--dit_model", "tiny_dit.safetensors",
            "--vae_model", "tiny_vae.safetensors",
            "--model_dir", str(tiny_model_dir),
            "--resolution", "32",
            "--color_correction", "none",
            "--batch_size", "5",
            "--chunk_size", "8",
            "--temporal_overlap", "2",
        ]
    )
    assert rc == 0
    r = vio.VideoReader(out)
    assert r.total_frames == n_in
    r.close()
