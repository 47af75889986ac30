"""Silhouette-driven inverse rendering through the SOFT path tracer.

Recovers a sphere's position from a target image when the initial guess
barely overlaps the target silhouette — the regime where the hard
renderer's gradients (exact only in the interior) go silent and only
edge-aware/visibility gradients (diff/soft.py, BASELINE.json north star)
carry signal. Anneals the smoothing bandwidth while optimizing with Adam.

Run:  python examples/silhouette_optim.py        (CPU, ~1 min)
"""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses

import jax.numpy as jnp
import numpy as np
import optax

from raytracing_tpu import RenderConfig
from raytracing_tpu.diff.soft import render_pathtrace_soft
from raytracing_tpu.models.scenes import cornell_box


def main():
    cfg = RenderConfig(width=48, height=36, spp=1, bounces=1)
    scene = cornell_box(cols=cfg.width, rows=cfg.height)
    true_center = np.asarray(scene.spheres.center).copy()

    def render(center, bandwidth):
        sc = dataclasses.replace(
            scene, spheres=dataclasses.replace(scene.spheres,
                                               center=center))
        return render_pathtrace_soft(sc, cfg, bandwidth=bandwidth,
                                     tau=bandwidth)

    target = render(jnp.asarray(true_center), 2e-3)

    # start with sphere 0 shifted most of a radius away: its silhouette
    # barely overlaps the target's
    start = true_center.copy()
    start[0, 0] += 0.35
    start[0, 1] -= 0.25
    params = jnp.asarray(start)

    @jax.jit
    def loss_fn(center, bandwidth):
        img = render(center, bandwidth)
        return jnp.mean((img - target) ** 2)

    opt = optax.adam(2e-2)
    opt_state = opt.init(params)
    grad_fn = jax.jit(jax.grad(loss_fn), static_argnums=1)

    schedule = [3e-2] * 30 + [1e-2] * 30 + [3e-3] * 20
    for i, bw in enumerate(schedule):
        g = grad_fn(params, bw)
        updates, opt_state = opt.update(g, opt_state)
        params = optax.apply_updates(params, updates)
        if i % 10 == 0:
            err = float(jnp.linalg.norm(params[0] - true_center[0]))
            print(f"step {i:3d}  bw={bw:.0e}  loss={float(loss_fn(params, bw)):.3e}  "
                  f"center err={err:.4f}")

    err = float(jnp.linalg.norm(params[0] - true_center[0]))
    print(f"final center error: {err:.4f} (started at "
          f"{np.linalg.norm(start[0] - true_center[0]):.4f})")
    assert err < 0.06, "silhouette optimization did not converge"
    print("OK: silhouette gradients recovered the sphere position")


if __name__ == "__main__":
    main()
