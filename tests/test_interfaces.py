"""Node-layer contract: same node names, dict-passing schema, progress
weighting as the reference's ComfyUI V3 nodes."""

import numpy as np

from seedvr2_tpu import interfaces as I


def test_node_mappings_present():
    assert set(I.NODE_CLASS_MAPPINGS) == {
        "SeedVR2VideoUpscaler",
        "SeedVR2LoadDiTModel",
        "SeedVR2LoadVAEModel",
        "SeedVR2TorchCompileSettings",
    }


def test_loader_nodes_emit_config_dicts():
    (dit,) = I.SeedVR2LoadDiTModel().execute(model="seedvr2_ema_3b_fp16.safetensors")
    assert dit["model"] == "seedvr2_ema_3b_fp16.safetensors"
    assert dit["attention_mode"] == "pallas"
    (vae,) = I.SeedVR2LoadVAEModel().execute(decode_tiled=True, decode_tile_size=1024)
    assert vae["decode_tile_size"] == (1024, 1024)
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
