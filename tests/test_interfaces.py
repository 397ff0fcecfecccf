"""Node-layer contract: same node names, parameter lists, dict-passing
schema, progress weighting and interrupt behaviour as the reference's
ComfyUI V3 nodes (reference: src/interfaces/*.py)."""

import re

import numpy as np
import pytest

from seedvr2_tpu import interfaces as I

REF_DIR = "/root/reference/src/interfaces"
REF_FILES = {
    "SeedVR2VideoUpscaler": "video_upscaler.py",
    "SeedVR2LoadDiTModel": "dit_model_loader.py",
    "SeedVR2LoadVAEModel": "vae_model_loader.py",
    "SeedVR2TorchCompileSettings": "torch_compile_settings.py",
}


def _ref_input_names(node_id: str) -> list:
    with open(f"{REF_DIR}/{REF_FILES[node_id]}") as f:
        src = f.read()
    return re.findall(r'io\.[A-Za-z]+(?:\("\w+"\))?\.Input\("([a-z_0-9]+)"', src)


def test_node_mappings_present():
    assert set(I.NODE_CLASS_MAPPINGS) == set(REF_FILES)


@pytest.mark.parametrize("node_id", sorted(REF_FILES))
def test_schema_parity_with_reference(node_id):
    """Every reference node input exists here under the same name (V3 schema
    parity, reference: src/interfaces/*.py define_schema)."""
    ours = [i.name for i in I.node_schemas()[node_id]["inputs"]]
    theirs = _ref_input_names(node_id)
    assert theirs, f"failed to extract reference inputs for {node_id}"
    missing = set(theirs) - set(ours)
    assert not missing, f"{node_id} missing reference inputs: {missing}"
    # enumeration order matches too (cheap to keep, nice for UI diffing)
    assert [n for n in ours if n in set(theirs)] == theirs


def test_loader_nodes_emit_config_dicts():
    (dit,) = I.SeedVR2LoadDiTModel().execute(model="seedvr2_ema_3b_fp16.safetensors")
    assert dit["model"] == "seedvr2_ema_3b_fp16.safetensors"
    assert dit["attention_mode"] == "fused"  # measured-fastest default
    (vae,) = I.SeedVR2LoadVAEModel().execute(decode_tiled=True, decode_tile_size=1024)
    assert vae["decode_tile_size"] == (1024, 1024)
    assert vae["tile_debug"] == "false"
    (args,) = I.SeedVR2TorchCompileSettings().execute(mode="default")
    assert isinstance(args, dict)


def test_progress_weights_match_reference():
    # reference: video_upscaler.py:287-298 weights 0.2/0.25/0.5/0.05
    assert I.SeedVR2VideoUpscaler.PHASE_WEIGHTS == (0.20, 0.25, 0.50, 0.05)
    node = I.SeedVR2VideoUpscaler()
    seen = []
    cb = node._weighted_progress(seen.append)
    cb(1, 2, 5, "Phase 1: Encoding")
    cb(2, 2, 5, "Phase 1: Encoding")
    cb(1, 1, 5, "Phase 4: Post-processing")
    assert abs(seen[0] - 0.10) < 1e-6
    assert abs(seen[1] - 0.20) < 1e-6
    assert abs(seen[2] - 1.0) < 1e-6


def test_input_types_schema():
    for cls in I.NODE_CLASS_MAPPINGS.values():
        t = cls.INPUT_TYPES()
        assert "required" in t


def test_global_cache_staleness_eviction():
    """Same node ids + different model selection must evict, like the
    reference's GlobalModelCache (model_cache.py:163-231)."""

    class FakeRunner:
        released = False

        def release_dit(self):
            self.released = True

    cache = I.GlobalRunnerCache()
    r1 = FakeRunner()
    cache.put("n1+n2", ("3b.safetensors", "vae", "fused"), r1)
    assert cache.get("n1+n2", ("3b.safetensors", "vae", "fused")) is r1
    # model changed on the same nodes -> stale, evicted, weights released
    assert cache.get("n1+n2", ("7b.safetensors", "vae", "fused")) is None
    assert r1.released
    assert len(cache) == 0


def test_cache_hit_with_changed_cfg_invalidates_compiled():
    """A cache hit whose PipelineConfig differs must drop the Runner's
    per-shape compiled closures: they captured the old cfg at trace time
    (noise scales, color method, tile setup are baked into the trace)."""
    import dataclasses

    from seedvr2_tpu.pipeline.runner import Runner

    cfg = _tiny_cfg()
    runner = Runner(cfg, None, None, np.zeros((4, cfg.dit.txt_in_dim), np.float32))
    runner._dit_step_cache[("fake",)] = object()
    runner._finalize_cache[("fake",)] = object()
    runner._vae_cache[("fake",)] = object()
    runner.invalidate_compiled()
    assert not runner._dit_step_cache
    assert not runner._finalize_cache
    assert not runner._vae_cache
    # sanity: frozen-dataclass equality is what the node layer keys off
    assert dataclasses.replace(cfg, latent_noise_scale=0.5) != cfg


def test_node_mesh_policy_video_vs_image():
    """The node layer builds the workload-aware mesh (VERDICT r4 #1): long
    videos go frame-DP, images tensor-shard the DiT (capped by heads)."""
    from seedvr2_tpu.config import dit_tiny

    mesh_v = I.SeedVR2VideoUpscaler._build_mesh(dit_tiny(), 100)
    assert mesh_v is not None and mesh_v.shape["data"] == 8
    mesh_i = I.SeedVR2VideoUpscaler._build_mesh(dit_tiny(), 1)
    assert mesh_i is not None and mesh_i.shape["tensor"] == 2


def test_interrupt_fn_aborts_generation():
    """ctx interrupt is checked per batch (reference:
    generation_utils.py:660-663, called at every phase loop)."""
    from seedvr2_tpu.pipeline import phases

    class Interrupted(Exception):
        pass

    def interrupt():
        raise Interrupted()

    frames = np.random.RandomState(0).rand(2, 16, 16, 3).astype(np.float32)
    with pytest.raises(Interrupted):
        phases.generate(None, frames, cfg=_tiny_cfg(), interrupt_fn=interrupt)


def _tiny_cfg():
    import dataclasses

    from seedvr2_tpu.config import PipelineConfig, dit_tiny, vae_tiny

    vae_cfg = vae_tiny()
    return PipelineConfig(
        dit=dataclasses.replace(
            dit_tiny(),
            vid_in_channels=2 * vae_cfg.latent_channels + 1,
            vid_out_channels=vae_cfg.latent_channels,
        ),
        vae=vae_cfg,
        resolution=32,
    )
