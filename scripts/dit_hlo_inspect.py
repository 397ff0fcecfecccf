"""Local (CPU, no TPU) inspection of the DiT step's lowered HLO.

Lowers the exact bench-geometry 7B (and 3B) one-step program with abstract
arguments and reports suspicious patterns: fp32 dot_generals, large
transposes/copies, per-layer op counts. Run:

    PYTHONPATH= JAX_PLATFORMS=cpu python scripts/dit_hlo_inspect.py [7b|3b]
"""

import os
import re
import sys
from collections import Counter

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "7b"
    from seedvr2_tpu.config import PipelineConfig, dit_3b, dit_7b, vae_config
    from seedvr2_tpu.models.dit.nadit import init_params
    from seedvr2_tpu.ops.quant import quantize_dit_params
    from seedvr2_tpu.pipeline.runner import Runner
    from seedvr2_tpu.utils.debug import Debug

    dit = dit_7b() if variant == "7b" else dit_3b()
    cfg = PipelineConfig(dit=dit, vae=vae_config(), batch_size=5, resolution=1080)
    thw = (2, 136, 240)  # latent of 5-frame 1080p (1088x1920)
    txt_len = 77

    # Abstract param tree (no memory): shapes of the int8-quantized params.
    dense = jax.eval_shape(
        lambda k: init_params(cfg.dit, k, dtype=jnp.bfloat16), jax.random.PRNGKey(0)
    )

    def q_shapes(tree):
        if isinstance(tree, dict):
            if "w" in tree and hasattr(tree["w"], "ndim") and tree["w"].ndim >= 2 and np.prod(tree["w"].shape) >= (1 << 16):
                out = {k: v for k, v in tree.items() if k != "w"}
                w = tree["w"]
                out["w_q"] = jax.ShapeDtypeStruct(w.shape, jnp.int8)
                out["w_s"] = jax.ShapeDtypeStruct(
                    w.shape[1:] if w.ndim == 3 else (w.shape[-1],), jnp.float32
                )
                return out
            return {k: q_shapes(v) for k, v in tree.items()}
        if isinstance(tree, list):
            return [q_shapes(v) for v in tree]
        return tree

    p_shapes = dict(dense)
    p_shapes["blocks"] = [q_shapes(b) for b in dense["blocks"]]

    text = jax.ShapeDtypeStruct((1, txt_len, cfg.dit.txt_in_dim), jnp.float32)
    latent = jax.ShapeDtypeStruct((1,) + thw + (16,), jnp.bfloat16)
    rng = jax.ShapeDtypeStruct((2,), jnp.uint32)

    runner = Runner.__new__(Runner)
    runner.cfg = cfg
    runner.text_pos = text
    runner.text_neg = None
    runner.debug = Debug(False)
    runner.mesh = None

    step = runner._build_step_body(thw, txt_len)
    lowered = jax.jit(step).lower(p_shapes, latent, text, rng)
    txt_hlo = lowered.as_text()
    with open(f"/tmp/dit_{variant}_stablehlo.txt", "w") as f:
        f.write(txt_hlo)

    # --- window geometry report ---
    from seedvr2_tpu.models.dit.nadit import build_attn_plans

    patched = (thw[0], thw[1] // 2, thw[2] // 2)
    plans = build_attn_plans(cfg.dit, patched, txt_len)
    for name, lp in (("plain", plans.plain), ("shifted", plans.shifted)):
        pl = lp.plan
        print(
            f"{name}: nW={pl.n_win} max_len={pl.max_len} "
            f"L={patched[0]*patched[1]*patched[2]} pad_frac="
            f"{pl.n_win*pl.max_len/(patched[0]*patched[1]*patched[2]):.3f} "
            f"angles={'None' if lp.vid_angles is None else lp.vid_angles.shape}"
        )

    # --- HLO pattern stats ---
    lines = txt_hlo.splitlines()
    dot_f32 = 0
    dot_bf16 = 0
    dots = 0
    big_transposes = []
    convert_bytes = 0
    for ln in lines:
        if "stablehlo.dot_general" in ln:
            dots += 1
            if re.search(r"-> tensor<[^>]*xf32>", ln):
                dot_f32 += 1
            elif re.search(r"-> tensor<[^>]*xbf16>", ln):
                dot_bf16 += 1
        m = re.search(r"stablehlo.transpose.*tensor<([0-9x]+)x(f32|bf16|i8)>", ln)
        if m:
            dims = [int(d) for d in m.group(1).split("x")]
            sz = np.prod(dims) * (4 if m.group(2) == "f32" else 2 if m.group(2) == "bf16" else 1)
            if sz > 8e6:
                big_transposes.append((sz / 1e6, m.group(1), m.group(2)))
        m = re.search(r"stablehlo.convert.*tensor<([0-9x]+)x(i8|bf16)>\) -> tensor<[0-9x]+x(f32|bf16)>", ln)
        if m:
            dims = [int(d) for d in m.group(1).split("x")]
            convert_bytes += int(np.prod(dims)) * (2 if m.group(3) == "bf16" else 4)

    print(f"dots={dots} f32-out={dot_f32} bf16-out={dot_bf16}")
    print(f"convert-output-bytes total = {convert_bytes/1e9:.2f} GB")
    tc = Counter((t[1], t[2]) for t in big_transposes)
    print("big transposes (>8MB):")
    for (shape, dt), n in tc.most_common(12):
        print(f"  {n:4d} x {shape} {dt}")
    opc = Counter()
    for ln in lines:
        m = re.search(r"stablehlo\.(\w+)", ln)
        if m:
            opc[m.group(1)] += 1
    print("op histogram (top):", opc.most_common(15))


if __name__ == "__main__":
    main()
