"""Silhouette-driven inverse rendering with edge-aware gradients.

Recovers a sphere's position from a target image when the initial guess
barely overlaps the target silhouette — the regime where the hard
renderer's gradients (exact only in the interior) go silent and only
edge-aware/visibility gradients (BASELINE.json north star) carry signal.

Two engines:

  * ``soft`` — the toy O(N) soft path tracer (diff/soft.py
    render_pathtrace_soft): soft forward AND backward; anneals bandwidth.
  * ``mega`` — the PRODUCTION path: hard fused megakernel forward +
    edge-aware soft backward through the custom VJP
    (cfg.mega_edge_bandwidth; ops/pallas/megakernel_grad.py
    _tile_program_soft). The image you optimize is the real render.

Run:  python examples/silhouette_optim.py [soft|mega]   (CPU, ~1-3 min)
"""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if __name__ == "__main__":
    jax.config.update("jax_platforms", "cpu")

import dataclasses

import jax.numpy as jnp
import numpy as np
import optax


def optimize(engine="soft", width=48, height=36, steps=None,
             offset=(0.35, -0.25), lr=2e-2, bandwidth=None,
             verbose=False):
    """Run the silhouette recovery; returns (start_error, final_error)."""
    from raytracing_tpu import RenderConfig
    from raytracing_tpu.models.scenes import cornell_box
    from raytracing_tpu.render import pathtracer

    cfg = RenderConfig(width=width, height=height, spp=1, bounces=1)
    scene = cornell_box(cols=cfg.width, rows=cfg.height)
    true_center = np.asarray(scene.spheres.center).copy()

    if engine == "mega":
        from raytracing_tpu.render.mega import (render_pass_mega,
                                                u_planes_for_pass)
        bw = bandwidth or 3e-2
        cfg_m = dataclasses.replace(cfg, use_megakernel=True,
                                    mega_edge_bandwidth=bw)
        st = pathtracer.init_state(cfg_m)
        u = u_planes_for_pass(st["key"], st["passes"], cfg_m,
                              scene.lights.count)
        interpret = jax.default_backend() == "cpu"

        def acc_of(center):
            sc = dataclasses.replace(
                scene,
                spheres=dataclasses.replace(scene.spheres, center=center))
            out = render_pass_mega(sc, st, cfg_m, u_planes=u,
                                   interpret=interpret)
            return out["acc"]

        target = jax.lax.stop_gradient(acc_of(jnp.asarray(true_center)))

        def loss_fn(center, _bw):
            return jnp.mean((acc_of(center) - target) ** 2)

        # the forward is the hard render; gradients ride the edge-aware
        # backward — eager on CPU (whole-tile vjp jit compile is minutes),
        # jitted Pallas backward on TPU
        grad_fn = jax.grad(loss_fn) if interpret \
            else jax.jit(jax.grad(loss_fn), static_argnums=1)
        schedule = [bw] * (steps if steps is not None else 40)
    else:
        from raytracing_tpu.diff.soft import render_pathtrace_soft

        def render(center, bw):
            sc = dataclasses.replace(
                scene,
                spheres=dataclasses.replace(scene.spheres, center=center))
            return render_pathtrace_soft(sc, cfg, bandwidth=bw, tau=bw)

        target = render(jnp.asarray(true_center), 2e-3)

        def loss_fn(center, bw):
            return jnp.mean((render(center, bw) - target) ** 2)

        grad_fn = jax.jit(jax.grad(loss_fn), static_argnums=1)
        schedule = [3e-2] * 30 + [1e-2] * 30 + [3e-3] * 20
        if steps is not None:
            schedule = schedule[:steps]

    start = true_center.copy()
    start[0, 0] += offset[0]
    start[0, 1] += offset[1]
    params = jnp.asarray(start)
    start_err = float(np.linalg.norm(start[0] - true_center[0]))

    opt = optax.adam(lr)
    opt_state = opt.init(params)
    for i, bw in enumerate(schedule):
        g = grad_fn(params, bw)
        updates, opt_state = opt.update(g, opt_state)
        params = optax.apply_updates(params, updates)
        if verbose and i % max(1, len(schedule) // 10) == 0:
            err = float(jnp.linalg.norm(params[0] - true_center[0]))
            print(f"step {i:3d}  bw={bw:.0e}  center err={err:.4f}",
                  flush=True)

    final_err = float(jnp.linalg.norm(params[0] - true_center[0]))
    return start_err, final_err


def main():
    engine = sys.argv[1] if len(sys.argv) > 1 else "soft"
    steps = 12 if engine == "mega" else None
    width, height = (24, 18) if engine == "mega" else (48, 36)
    start_err, final_err = optimize(engine=engine, width=width,
                                    height=height, steps=steps,
                                    verbose=True)
    print(f"[{engine}] final center error: {final_err:.4f} "
          f"(started at {start_err:.4f})")
    thresh = 0.06 if engine == "soft" else 0.6 * start_err
    assert final_err < thresh, "silhouette optimization did not converge"
    print("OK: edge-aware gradients recovered the sphere position")


if __name__ == "__main__":
    main()
