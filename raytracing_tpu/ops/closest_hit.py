"""Closest-hit and any-hit drivers over whole object batches.

The reference walks objects with per-work-item champion loops
(ref sphereTrace Assign10-Path_Tracing/code.cl:745-786; molTrace
Assign02 code.cl:205-215). Here the champion search is a chunked
``lax.scan`` over the object axis with an all-pairs (R, C) tile per step —
dense, branch-free, MXU-backed (see ops/intersect.py).

Differentiability design: the champion *search* runs under stop_gradient
(integer argmin), then the winning object's parameters are gathered and the
hit distance / normal are **recomputed differentiably** for the (R,)-sized
champions only. Gradients are exact wherever the champion assignment is
locally constant (a.e.), and the backward pass never re-traverses the scan.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.types import Rays, Spheres, Triangles
from . import intersect as I

Array = jax.Array
INF = jnp.inf


class Champion(NamedTuple):
    t: Array      # (R,) differentiable hit distance; INF = miss
    idx: Array    # (R,) int32 object index; -1 = miss
    valid: Array  # (R,) bool


def _pad_axis0(x: Array, to: int, fill=0):
    n = x.shape[0]
    if n == to:
        return x
    pad = jnp.full((to - n,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([x, pad], axis=0)


def _chunked_champion(ts_of_chunk, chunk_data, n_chunks: int, R: int):
    """Generic champion scan. ``ts_of_chunk(data) -> (R, C) t-matrix``."""
    def body(carry, data):
        best_t, best_i, offset = carry
        ts = ts_of_chunk(data)                       # (R, C)
        cmin = ts.min(-1)
        carg = jnp.argmin(ts, -1).astype(jnp.int32) + offset
        better = cmin < best_t
        best_t = jnp.where(better, cmin, best_t)
        best_i = jnp.where(better, carg, best_i)
        return (best_t, best_i, offset + ts.shape[-1]), None

    init = (jnp.full((R,), INF), jnp.full((R,), -1, jnp.int32),
            jnp.int32(0))
    (best_t, best_i, _), _ = jax.lax.scan(body, init, chunk_data)
    return best_t, best_i


# ---------------------------------------------------------------------------
# Spheres
# ---------------------------------------------------------------------------

def closest_hit_spheres(rays: Rays, spheres: Spheres, *,
                        obj_chunk: int = 512,
                        formulation: str = "matmul") -> Champion:
    """Closest valid sphere hit per ray (ref sphereTrace champion loop,
    code.cl:761-772, without the grid — the grid path lives in accel/)."""
    S = spheres.count
    if S == 0:
        return Champion(t=jnp.full((rays.n,), INF),
                        idx=jnp.full((rays.n,), -1, jnp.int32),
                        valid=jnp.zeros((rays.n,), bool))
    C = min(obj_chunk, S)
    n_chunks = -(-S // C)
    P = n_chunks * C

    ts_fn = (I.sphere_ts_matmul if formulation == "matmul"
             else I.sphere_ts_pairwise)

    def search(o, d, mint, maxt, center, radius, mask):
        cen = _pad_axis0(center, P).reshape(n_chunks, C, 3)
        rad = _pad_axis0(radius, P).reshape(n_chunks, C)
        msk = _pad_axis0(mask, P, False).reshape(n_chunks, C)

        def chunk_ts(data):
            c, r, m = data
            return ts_fn(o, d, mint, maxt, c, r, m)

        return _chunked_champion(chunk_ts, (cen, rad, msk), n_chunks, o.shape[0])

    best_t, best_i = jax.lax.stop_gradient(
        search(rays.o, rays.d, rays.mint, rays.maxt,
               spheres.center, spheres.radius, spheres.mask))
    valid = jnp.isfinite(best_t) & rays.alive

    # differentiable recompute for champions — single-object quadratic,
    # (R,)-sized.  NaN-safety: non-champion lanes gather object 0 and can
    # produce dis<0 / inf; sanitize *inputs* before sqrt/where so no NaN can
    # leak through the backward pass of jnp.where (double-where pattern).
    safe_i = jnp.maximum(best_i, 0)
    c = spheres.center[safe_i]               # (R,3)
    r = spheres.radius[safe_i]               # (R,)
    omc = rays.o - c
    a = jnp.sum(rays.d * rays.d, -1)
    b = 2.0 * jnp.sum(omc * rays.d, -1)
    cq = jnp.sum(omc * omc, -1) - r * r
    dis = b * b - 4.0 * a * cq
    dis = jnp.where(valid & (dis > 0.0), dis, 1.0)
    sq = jnp.sqrt(dis)
    inv2a = 0.5 / a
    t0 = (-b - sq) * inv2a
    t1 = (-b + sq) * inv2a
    # pick the root nearest to the (non-diff) champion t
    finite_best = jnp.where(valid, best_t, 0.0)
    tt = jnp.where(jnp.abs(t0 - finite_best) <= jnp.abs(t1 - finite_best),
                   t0, t1)
    t = jnp.where(valid, tt, INF)
    return Champion(t=t, idx=jnp.where(valid, best_i, -1), valid=valid)


def sphere_hit_attrs(rays: Rays, spheres: Spheres, champ: Champion
                     ) -> tuple[Array, Array, Array]:
    """(p, normal, mat_id) at champion hits (ref code.cl:788-797).

    Invalid lanes get t substituted with 0 before evaluating o + t*d so that
    no inf/NaN enters the graph (their outputs are masked by mat_id = -1)."""
    t_safe = jnp.where(champ.valid, champ.t, 0.0)
    p = rays.at(t_safe)
    safe_i = jnp.maximum(champ.idx, 0)
    n = I.sphere_normal(p, spheres.center[safe_i])
    mat = jnp.where(champ.valid, spheres.mat_id[safe_i], -1)
    return p, n, mat


def anyhit_spheres(rays: Rays, spheres: Spheres, *, obj_chunk: int = 512,
                   formulation: str = "matmul") -> Array:
    """Occlusion test: any valid hit in the ray window (ref
    sphereShadowTrace, code.cl:1073-1193 — early-break replaced by a dense
    `any` reduce, which is the branch-free TPU equivalent)."""
    champ = closest_hit_spheres(rays, spheres, obj_chunk=obj_chunk,
                                formulation=formulation)
    return champ.valid


# ---------------------------------------------------------------------------
# Triangles
# ---------------------------------------------------------------------------

def closest_hit_triangles(rays: Rays, tris: Triangles, *,
                          obj_chunk: int = 512,
                          formulation: str = "matmul",
                          two_sided: bool = False) -> Champion:
    """Closest valid Möller–Trumbore hit per ray
    (ref triangleTrace, code.cl:802-935, sans grid)."""
    T = tris.count
    if T == 0:
        return Champion(t=jnp.full((rays.n,), INF),
                        idx=jnp.full((rays.n,), -1, jnp.int32),
                        valid=jnp.zeros((rays.n,), bool))
    C = min(obj_chunk, T)
    n_chunks = -(-T // C)
    P = n_chunks * C

    def search(o, d, mint, maxt, v, mask):
        vp = _pad_axis0(v, P).reshape(n_chunks, C, 3, 3)
        mp = _pad_axis0(mask, P, False).reshape(n_chunks, C)

        if formulation == "matmul":
            def chunk_ts(data):
                vc, mc = data
                tc = I.tri_constants(vc)
                return I.triangle_ts_matmul(o, d, mint, maxt, tc, mc,
                                            two_sided=two_sided)
        else:
            def chunk_ts(data):
                vc, mc = data
                return I.triangle_ts_pairwise(o, d, mint, maxt, vc, mc,
                                              two_sided=two_sided)
        return _chunked_champion(chunk_ts, (vp, mp), n_chunks, o.shape[0])

    best_t, best_i = jax.lax.stop_gradient(
        search(rays.o, rays.d, rays.mint, rays.maxt, tris.v, tris.mask))
    valid = jnp.isfinite(best_t) & rays.alive

    # differentiable recompute for champions (NaN-safe: div sanitized before
    # the divide so invalid lanes cannot poison the backward pass)
    safe_i = jnp.maximum(best_i, 0)
    v = tris.v[safe_i]                           # (R,3,3)
    p0 = v[:, 0]
    e1 = v[:, 1] - p0
    e2 = v[:, 2] - p0
    n_geo = jnp.cross(e2, e1)
    div = jnp.sum(rays.d * n_geo, -1)
    safe_div = jnp.where(valid & (div != 0.0), div, 1.0)
    t = jnp.sum((p0 - rays.o) * n_geo, -1) / safe_div
    t = jnp.where(valid, t, INF)
    return Champion(t=t, idx=jnp.where(valid, best_i, -1), valid=valid)


def triangle_hit_attrs(rays: Rays, tris: Triangles, champ: Champion,
                       mat_id_override: Array | None = None
                       ) -> tuple[Array, Array, Array]:
    """(p, interpolated normal, mat_id) at champion hits
    (ref triangleTrace code.cl:920-931; meshTrace single-matId variant
    code.cl:937-1070 → pass ``mat_id_override``)."""
    t_safe = jnp.where(champ.valid, champ.t, 0.0)
    p = rays.at(t_safe)
    safe_i = jnp.maximum(champ.idx, 0)
    v = tris.v[safe_i]
    beta, gamma = I.triangle_barycentrics(rays.o, rays.d, v)
    n = I.interpolate_normal(beta, gamma, tris.vn[safe_i])
    if mat_id_override is None:
        mat = tris.mat_id[safe_i]
    else:
        mat = jnp.broadcast_to(jnp.asarray(mat_id_override, jnp.int32),
                               champ.idx.shape)
    mat = jnp.where(champ.valid, mat, -1)
    return p, n, mat


def anyhit_triangles(rays: Rays, tris: Triangles, *, obj_chunk: int = 512,
                     formulation: str = "matmul",
                     two_sided: bool = False) -> Array:
    champ = closest_hit_triangles(rays, tris, obj_chunk=obj_chunk,
                                  formulation=formulation, two_sided=two_sided)
    return champ.valid
