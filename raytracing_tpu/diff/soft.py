"""Edge-aware differentiable rendering via soft visibility.

The hard renderer's gradients are exact almost everywhere but miss the
silhouette (visibility) terms — moving a sphere edge across a pixel is a
step function. This module provides the reparameterized/smoothed pipeline
(BASELINE.json north star: "reparameterized/edge-aware sampling"):

  * every sphere contributes a smooth coverage weight
      alpha_i = sigmoid(-(b^2-ish signed miss distance) / bandwidth)
    instead of a binary hit;
  * depth resolution is a softmin over t (temperature tau);
  * as bandwidth, tau -> 0 the soft image converges to the hard image
    (tested), and gradients are well-defined EVERYWHERE, including edges.

This is the differentiation-friendly twin of render/simple.py; the hard
path stays the production forward renderer.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.types import Camera, Spheres
from ..render.camera import pinhole_rays, pixel_grid

Array = jax.Array


@partial(jax.jit, static_argnames=("bandwidth", "tau"))
def render_fake_shade_soft(cam: Camera, spheres: Spheres, colors: Array,
                           bandwidth: float = 1e-2,
                           tau: float = 1e-2) -> Array:
    """Soft version of the Assign02 fake-shade renderer
    (ref Assign02 code.cl:158-232). Fully differentiable wrt sphere
    centers/radii, colors and camera. Returns (rows, cols, 3)."""
    col, row = pixel_grid(cam)
    rays = pinhole_rays(cam, col, row)
    o, d = rays.o, rays.d                     # (R,3)

    # per-sphere smooth coverage + depth, (S, R) layout
    omc = o[None, :, :] - spheres.center[:, None, :]       # (S,R,3)
    b = jnp.sum(omc * d[None, :, :], -1)                   # (S,R)
    c = jnp.sum(omc * omc, -1) - (spheres.radius ** 2)[:, None]
    dis = b * b - c                                        # (a=1) quarter-disc
    # smooth hit probability: dis > 0 means geometric hit
    alpha = jax.nn.sigmoid(dis / bandwidth)                # (S,R)
    alpha = alpha * spheres.mask[:, None]
    front = jax.nn.sigmoid(-b / bandwidth)                 # in front of eye
    alpha = alpha * front

    sq = jnp.sqrt(jnp.maximum(dis, 1e-12))
    t = -b - sq                                            # near root
    # softmin over depth among covering spheres
    w = alpha * jax.nn.softmax(-t / tau
                               + jnp.log(jnp.maximum(alpha, 1e-20)), axis=0)

    p = o[None, :, :] + t[..., None] * d[None, :, :]       # (S,R,3)
    n = p - spheres.center[:, None, :]
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    shade = jnp.einsum("j,srj->sr", cam.w, n)              # (S,R)
    rgb = colors[:, None, :3] * shade[..., None]           # (S,R,3)

    img = jnp.sum(w[..., None] * rgb, axis=0)              # (R,3)
    return img.reshape(cam.rows, cam.cols, 3)
