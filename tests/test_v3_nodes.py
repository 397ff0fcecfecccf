"""Execute the ComfyUI V3 node surface under a stub comfy_api host
(VERDICT r4 #5 — this surface was previously import-smoke-tested only).

Covers interfaces.py:_build_v3_nodes through real execution: extension +
node-list construction, schema rendering from the shared table, the full
3-node workflow (LoadDiT -> LoadVAE -> VideoUpscaler) with tiny synthetic
checkpoints, the weighted ProgressBar protocol, the comfy interrupt hook,
and the torch IMAGE output contract (reference:
src/interfaces/video_upscaler.py:226-580, __init__.py:14-29).
"""

import asyncio
import dataclasses
import importlib

import jax
import numpy as np
import pytest

import comfy_stub
import seedvr2_tpu.interfaces as I


@pytest.fixture()
def comfy(monkeypatch):
    state = comfy_stub.install(monkeypatch)
    yield state


@pytest.fixture(scope="module")
def tiny_model_dir(tmp_path_factory):
    from safetensors.numpy import save_file

    from seedvr2_tpu.config import dit_tiny, vae_tiny
    from seedvr2_tpu.io import weights as W
    from seedvr2_tpu.models.dit.nadit import init_params as init_dit
    from seedvr2_tpu.models.vae.model import init_vae_params

    d = tmp_path_factory.mktemp("v3_models")
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


def _node_classes(comfy):
    ext = asyncio.run(I.comfy_entrypoint())
    nodes = asyncio.run(ext.get_node_list())
    return {cls.__name__: cls for cls in nodes}


def test_extension_and_schemas(comfy):
    nodes = _node_classes(comfy)
    assert set(nodes) == {
        "SeedVR2VideoUpscaler",
        "SeedVR2LoadDiTModel",
        "SeedVR2LoadVAEModel",
        "SeedVR2TorchCompileSettings",
    }
    for node_id, cls in nodes.items():
        schema = cls.define_schema()
        spec = I.node_schemas()[node_id]
        assert schema.node_id == node_id
        assert schema.display_name == spec["display_name"]
        assert [i.name for i in schema.inputs] == [i.name for i in spec["inputs"]]
        assert len(schema.outputs) == len(spec["outputs"])
    # custom types render as Custom inputs (reference custom node types)
    up = nodes["SeedVR2VideoUpscaler"].define_schema()
    kinds = {i.name: i.kind for i in up.inputs}
    assert kinds["dit"] == "Custom:SEEDVR2_DIT"
    assert kinds["vae"] == "Custom:SEEDVR2_VAE"
    assert kinds["image"] == "Image"


def test_v3_workflow_executes_with_torch_image_contract(comfy, tiny_model_dir):
    """The full 3-node V3 workflow: loader nodes emit config dicts, the
    upscaler runs the pipeline, the result obeys ComfyUI's IMAGE contract
    (torch.Tensor [T, H, W, C] float32 in [0, 1]) and the ProgressBar gets
    a monotonic absolute 0..100 sequence."""
    import torch

    nodes = _node_classes(comfy)
    comfy.node_id = "42"  # the executing-context node id the wrapper reads

    dit_out = nodes["SeedVR2LoadDiTModel"].execute(model="tiny_dit.safetensors")
    vae_out = nodes["SeedVR2LoadVAEModel"].execute(model="tiny_vae.safetensors")
    assert isinstance(dit_out, comfy_stub.StubNodeOutput)
    dit_cfg, vae_cfg = dit_out.values[0], vae_out.values[0]
    assert dit_cfg["model"] == "tiny_dit.safetensors"
    assert dit_cfg["node_id"] == "42"  # get_executing_context wiring

    frames = np.random.RandomState(0).rand(5, 20, 24, 3).astype(np.float32)
    out = nodes["SeedVR2VideoUpscaler"].execute(
        image=frames,
        dit=dit_cfg,
        vae=vae_cfg,
        seed=7,
        resolution=32,
        batch_size=5,
        color_correction="none",
        model_dir=str(tiny_model_dir),
    )
    img = out.values[0]
    assert isinstance(img, torch.Tensor)  # _maybe_torch_image under comfy
    assert img.dtype == torch.float32
    assert img.ndim == 4 and img.shape[0] == 5 and img.shape[3] == 3
    assert img.shape[1] >= 26 and img.shape[2] >= 30  # upscaled (res 32, /16 pad)
    assert float(img.min()) >= 0.0 and float(img.max()) <= 1.0

    # weighted ProgressBar protocol (reference: video_upscaler.py:287-313):
    # absolute, monotonic, reaches 100
    assert comfy.progress_bars, "upscaler must create a ProgressBar"
    ups = comfy.progress_bars[-1].updates
    assert ups == sorted(ups)
    assert ups[-1] == 100


def test_v3_interrupt_raises(comfy, tiny_model_dir):
    """comfy.model_management interrupt propagates out of execute()
    (reference: generation_utils.py:660-663 checked per batch)."""
    nodes = _node_classes(comfy)
    dit_cfg = nodes["SeedVR2LoadDiTModel"].execute(model="tiny_dit.safetensors").values[0]
    vae_cfg = nodes["SeedVR2LoadVAEModel"].execute(model="tiny_vae.safetensors").values[0]
    frames = np.random.RandomState(1).rand(2, 16, 16, 3).astype(np.float32)
    comfy.interrupted = True
    with pytest.raises(comfy_stub.InterruptProcessingException):
        nodes["SeedVR2VideoUpscaler"].execute(
            image=frames,
            dit=dit_cfg,
            vae=vae_cfg,
            seed=7,
            resolution=32,
            batch_size=5,
            color_correction="none",
            model_dir=str(tiny_model_dir),
        )


def test_v3_compile_settings_passthrough(comfy):
    nodes = _node_classes(comfy)
    out = nodes["SeedVR2TorchCompileSettings"].execute(
        backend="inductor", mode="default", fullgraph=False
    )
    assert out.values[0]["backend"] == "inductor"  # accepted + ignored on TPU
