"""On-TPU verification of the champion (cell) backward: the fused Pallas
kernel's cotangents vs the value-level twin (_bwd_champion) on the REAL
chip, teapot grid mode — the production route checked end-to-end where the
CPU test suite can only run interpret mode.

Prints ONE JSON line (paste into BASELINE.md).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/verify_cell_tpu.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from raytracing_tpu import RenderConfig
from raytracing_tpu.accel import prepare_grids
from raytracing_tpu.models.scenes import big_mesh_scene
from raytracing_tpu.render import pathtracer
from raytracing_tpu.render.mega import render_pass_mega, u_planes_for_pass

W, H = 128, 96


def main():
    scene = prepare_grids(big_mesh_scene("teapot.json", cols=W, rows=H),
                          "auto", mesh_slabs="auto")
    cfg = RenderConfig(width=W, height=H, spp=1, bounces=2,
                       use_megakernel=True, use_grid=True,
                       mega_grad_wrt=("sph", "mat", "tri"))
    state0 = pathtracer.init_state(cfg)
    # u-planes force the value-level route's draws == the kernel's
    u = u_planes_for_pass(state0["key"], state0["passes"], cfg,
                          scene.lights.count)

    def grads(force_value_level):
        c = cfg
        if force_value_level:
            # interpret=False still, but route the BACKWARD through the
            # value-level champion program by running on CPU? No — both
            # on TPU: the value twin is reachable by monkeypatching the
            # dispatch; simplest faithful A/B is via the private API.
            pass

        def loss(params):
            sc = dataclasses.replace(
                scene,
                triangles=dataclasses.replace(scene.triangles,
                                              v=params["tv"]),
                materials=params["mat"])
            st = render_pass_mega(sc, state0, c, u_planes=u,
                                  interpret=False)
            return jnp.mean(st["acc"] ** 2)

        params = {"tv": scene.triangles.v, "mat": scene.materials}
        return jax.jit(jax.grad(loss))(params)

    # Pallas champion kernel (production)
    g_pallas = grads(False)
    jax.block_until_ready(g_pallas)

    # value-level twin: swap the dispatcher
    from raytracing_tpu.ops.pallas import megakernel_grad as MG
    orig = MG._bwd_champ_pallas

    def via_value(par, ipar, sph, tri, mat, lig, g, u_planes, ids, occs,
                  *, bwd_sublanes=32, interpret=False, **kw):
        assert u_planes is not None, \
            "value-level A/B needs u_planes (run with u_planes set)"
        return MG._bwd_champion(par, ipar, sph, tri, mat, lig, g,
                                u_planes, ids, occs, **kw)

    MG._bwd_champ_pallas = via_value
    MG._make_diff_op.cache_clear()
    try:
        g_value = grads(True)
        jax.block_until_ready(g_value)
    finally:
        MG._bwd_champ_pallas = orig
        MG._make_diff_op.cache_clear()

    out = {"metric": "cell_backward_tpu_pallas_vs_value", "scene":
           f"teapot grid {W}x{H} b2", "groups": {}}
    ok = True
    for k in g_pallas:
        a = np.asarray(g_value[k]).ravel()
        b = np.asarray(g_pallas[k]).ravel()
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        cos = float((a * b).sum() / max(na * nb, 1e-20))
        ratio = float(nb / max(na, 1e-20))
        fin = bool(np.isfinite(b).all())
        out["groups"][k] = {"cos": round(cos, 6),
                            "norm_ratio": round(ratio, 4),
                            "finite": fin}
        ok &= fin and cos > 0.9999 and 0.99 < ratio < 1.01
    out["pass"] = bool(ok)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
