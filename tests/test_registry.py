"""Model registry: variant picking, discovery, sha validation cache."""

import json
import os

import pytest

from seedvr2_tpu.io import registry as R


def test_model_variant():
    assert R.model_variant("seedvr2_ema_7b_fp16.safetensors") == "7b"
    assert R.model_variant("seedvr2_ema_3b-Q4_K_M.gguf") == "3b"
    assert R.model_variant("seedvr2_ema_7b_sharp_fp16.safetensors") == "7b"


def test_registry_contents():
    assert R.DEFAULT_VAE in R.MODEL_REGISTRY
    assert R.MODEL_REGISTRY["ema_vae_fp16.safetensors"].category == "vae"
    assert len(R.available_models("dit")) == 10
    assert len(R.available_models("vae")) == 1


def test_find_model_path(tmp_path):
    d1 = tmp_path / "a"
    d2 = tmp_path / "b"
    d1.mkdir(), d2.mkdir()
    (d2 / "Model_X.SafeTensors").write_bytes(b"x")
    assert R.find_model_path("model_x.safetensors", [str(d1), str(d2)]) == str(
        d2 / "Model_X.SafeTensors"
    )
    assert R.find_model_path("missing.safetensors", [str(d1)]) is None


def test_discovered_models(tmp_path):
    (tmp_path / "custom_dit.safetensors").write_bytes(b"x")
    names = R.discovered_models([str(tmp_path)])
    assert "custom_dit.safetensors" in names
    assert R.DEFAULT_DIT in names


def test_verify_model_cache(tmp_path):
    p = tmp_path / "w.bin"
    p.write_bytes(b"hello")
    import hashlib

    digest = hashlib.sha256(b"hello").hexdigest()
    assert R.verify_model(str(p), digest)
    # cache file written
    assert os.path.exists(str(p) + ".sha256.json")
    assert R.verify_model(str(p), digest)  # cached path
    assert not R.verify_model(str(p), "0" * 64)
