"""TPU golden tie (round-5 VERDICT item 10): render the reference flagship
scene (cornell_teapot.xml, ref Assign10-Path_Tracing/example.png analog) at
320x240 on the REAL TPU through the production engine and compare it
statistically against the stored golden `assets/golden/cornell_teapot.png`
(a converged CPU render from an earlier round).

The two renders use different RNG streams (on-core PRNG vs threefry
planes), so the gate is statistical, not pixelwise: per-channel mean |diff|
bounded by the Monte-Carlo noise floor at this pass count, plus a high
pixelwise correlation. Prints ONE JSON line and writes the TPU render next
to the golden as `cornell_teapot_tpu.png`.

Usage: PYTHONPATH=. python scripts/tpu_golden_tie.py [passes]
"""
import json
import os
import sys

import numpy as np


def main():
    import jax.numpy as jnp

    from raytracing_tpu import RenderConfig
    from raytracing_tpu.accel import prepare_grids
    from raytracing_tpu.io.png import read_png, write_png
    from raytracing_tpu.io.scene_xml import load_scene
    from raytracing_tpu.models.assignments import REF_ROOT
    from raytracing_tpu.render import pathtracer

    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    W, H = 320, 240
    xml = os.path.join(REF_ROOT,
                       "Assign10-Path_Tracing/scenes/cornell_teapot.xml")
    scene = prepare_grids(load_scene(xml, W, H), "auto", mesh_slabs="auto")
    cfg = RenderConfig(width=W, height=H, spp=1, bounces=5,
                       use_megakernel=True, use_grid=True, mega_block=0)
    state = pathtracer.init_state(cfg)
    state = pathtracer.render_passes(scene, state, cfg, passes)
    img = np.asarray(pathtracer.image(state, cfg))

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    gold_path = os.path.join(root, "assets/golden/cornell_teapot.png")
    gold = np.asarray(read_png(gold_path), np.float32) / 255.0
    out_path = os.path.join(root, "assets/golden/cornell_teapot_tpu.png")
    write_png(out_path, jnp.asarray(img))

    diff = np.abs(img - gold)
    mean_abs = [float(diff[..., c].mean()) for c in range(3)]
    a = img.reshape(-1, 3) - img.reshape(-1, 3).mean(0)
    b = gold.reshape(-1, 3) - gold.reshape(-1, 3).mean(0)
    corr = float((a * b).sum()
                 / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-12))
    ok = max(mean_abs) < 0.02 and corr > 0.98
    print(json.dumps({"metric": "tpu_golden_tie_cornell_teapot",
                      "passes": passes, "mean_abs_diff": mean_abs,
                      "pixel_corr": round(corr, 5), "pass": bool(ok),
                      "artifact": "assets/golden/cornell_teapot_tpu.png"}))


if __name__ == "__main__":
    main()
