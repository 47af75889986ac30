"""Primary-ray generation: pinhole, parallel (orthographic), thin lens.

Reference math (Assign10-Path_Tracing/code.cl):
  * getRay           code.cl:108-119  (pinhole)
  * getParallelRay   code.cl:90-106   (orthographic)
  * getFocalPoint    code.cl:174-181  (pinhole ray ∩ focal plane)
  * getThinLensRay   code.cl:183-197  (lens-sampled origin -> focal point)
  * initTrace        code.cl:458-543  (per-pixel spp sub-rays + AABB clip)

All generators are dense over the full pixel grid: (rows*cols*spp,) rays in
pixel-major, sample-minor order — the exact slot layout of the reference's
persistent ray buffer (code.cl:473-475: ``rays += (cols*row+col)*spp``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.types import AABB, Camera, Rays, safe_normalize
from ..core.sampling import concentric_disk, stratified_lens_coords
from ..ops.intersect import aabb_window

Array = jax.Array
INF = jnp.inf


def pixel_grid(cam: Camera) -> tuple[Array, Array]:
    """(col, row) float arrays of shape (rows*cols,), row-major."""
    col = jax.lax.broadcasted_iota(jnp.float32, (cam.rows, cam.cols), 1)
    row = jax.lax.broadcasted_iota(jnp.float32, (cam.rows, cam.cols), 0)
    return col.reshape(-1), row.reshape(-1)


def film_point(cam: Camera, col: Array, row: Array) -> Array:
    """Point on the film plane relative to eye (ref getRay code.cl:110-113):
    (-.5 + (c+.5)/cols)·w·U + (.5 − (r+.5)/rows)·h·V − W."""
    su = (-0.5 + (col + 0.5) / cam.cols) * cam.width
    sv = (0.5 - (row + 0.5) / cam.rows) * cam.height
    return su[:, None] * cam.u[None, :] + sv[:, None] * cam.v[None, :] \
        - cam.w[None, :]


def pinhole_rays(cam: Camera, col: Array, row: Array) -> Rays:
    """ref getRay (code.cl:108-119): o = eye, d = normalize(film point)."""
    cop = film_point(cam, col, row)
    d = safe_normalize(cop)
    n = col.shape[0]
    o = jnp.broadcast_to(cam.eye[None, :], (n, 3))
    return Rays(o=o, d=d, mint=jnp.zeros((n,)), maxt=jnp.full((n,), INF))


def parallel_rays(cam: Camera, col: Array, row: Array) -> Rays:
    """Orthographic (ref getParallelRay code.cl:90-106): o = film point,
    d = -W."""
    cop = film_point(cam, col, row)
    n = col.shape[0]
    d = jnp.broadcast_to(-cam.w[None, :], (n, 3))
    return Rays(o=cop, d=d, mint=jnp.zeros((n,)), maxt=jnp.full((n,), INF))


def focal_points(cam: Camera, col: Array, row: Array, focal_length) -> Array:
    """Pinhole ray ∩ plane at distance focal_length along -W
    (ref getFocalPoint code.cl:174-181)."""
    rays = pinhole_rays(cam, col, row)
    pip = cam.eye - focal_length * cam.w
    nrm = cam.w
    dplane = -jnp.sum(pip * nrm)
    t = -(jnp.sum(rays.o * nrm[None, :], -1) + dplane) / \
        jnp.sum(rays.d * nrm[None, :], -1)
    return rays.at(t)


def thin_lens_rays(cam: Camera, focal_pt: Array, lens_radius,
                   lens_uv: Array) -> Rays:
    """Ray from a lens point toward the focal point
    (ref getThinLensRay code.cl:183-197).

    focal_pt: (N, 3); lens_uv: (N, 2) in [0,1]^2."""
    dxy = concentric_disk(lens_uv) * lens_radius
    o = cam.eye[None, :] + dxy[:, 0:1] * cam.u[None, :] \
        + dxy[:, 1:2] * cam.v[None, :]
    d = safe_normalize(focal_pt - o)
    n = o.shape[0]
    return Rays(o=o, d=d, mint=jnp.zeros((n,)), maxt=jnp.full((n,), INF))


def clip_to_bounds(rays: Rays, bounds: AABB) -> Rays:
    """Clip ray windows to the scene AABB; misses become dead rays
    (mint = maxt), exactly the initTrace convention (code.cl:495-501)."""
    tmin, tmax, ok = aabb_window(rays.o, rays.d, bounds.pmin, bounds.pmax)
    mint = jnp.where(ok, tmin, rays.maxt)
    maxt = jnp.where(ok, tmax, rays.maxt)
    return Rays(o=rays.o, d=rays.d, mint=mint, maxt=maxt)


def generate_primary_rays(cam: Camera, bounds: AABB, focal_length,
                          lens_radius, spp: int, key: Array | None = None,
                          lens_uv: Array | None = None) -> Rays:
    """The initTrace kernel (code.cl:458-543) as one dense op.

    spp > 1: stratified lens-cell centers per pixel (code.cl:482-509).
    spp == 1: one random lens sample per pixel (code.cl:510-527) — pass
    ``lens_uv`` (P, 2) from the pass-wide random tensor, or ``key`` to draw
    here; neither gives the deterministic lens center.
    Rays are ordered pixel-major, sample-minor, and clipped to ``bounds``."""
    col, row = pixel_grid(cam)                     # (P,)
    fp = focal_points(cam, col, row, focal_length)  # (P, 3)
    npix = col.shape[0]
    if spp > 1:
        uv = stratified_lens_coords(spp)           # (spp, 2)
        uv = jnp.broadcast_to(uv[None], (npix, spp, 2)).reshape(-1, 2)
    elif lens_uv is not None:
        uv = lens_uv
    elif key is not None:
        uv = jax.random.uniform(key, (npix, 2))
    else:
        uv = jnp.full((npix, 2), 0.5)
    fp_rep = jnp.repeat(fp, spp, axis=0) if spp > 1 else fp
    rays = thin_lens_rays(cam, fp_rep, lens_radius, uv)
    return clip_to_bounds(rays, bounds)
