"""Differentiable megakernel: custom VJP for the fused whole-pass kernel.

Round-1 the fused Pallas megakernel (ops/pallas/megakernel.py) was
forward-only, so the BASELINE.json metric — rays/s/chip forward+BACKWARD —
rode the 17x-slower XLA stage pipeline. This module closes that gap with a
``jax.custom_vjp`` whose

  * primal   = the existing forward kernel (unchanged, 3.6e9 segs/s/chip);
  * backward = ONE more Pallas kernel per pass that, per ray tile,
      1. rematerializes the exact draw sequence the forward consumed
         (from the u-planes tensor, or by re-seeding the on-core PRNG with
         the same (seed, pass, shard, tile) counters — both modes replay
         bit-identical uniforms),
      2. runs ``jax.vjp`` *inside the kernel* over a value-based re-
         expression of the tile program (``_tile_program`` below: the same
         math as the forward kernel, tables as jnp values instead of SMEM
         scalar reads, every sqrt/division double-``where``-guarded so the
         cotangents stay finite),
      3. accumulates the parameter cotangents (camera/par scalars, sphere
         table, triangle table, materials, lights) across the sequential
         TPU grid into single-block VMEM/SMEM outputs — the Pallas analog
         of the cross-work-item gradient reduction.

Champion-selection gradients follow the package-wide convention
(ops/closest_hit.py): AD through the ``jnp.where`` champion merge routes the
cotangent to the winning object only — exact wherever the champion
assignment is locally constant (a.e.), identical semantics to the XLA
pipeline's stop_gradient + differentiable-recompute.

Scope: the unrolled-table path (<= UNROLL_OBJECTS objects per type — the
production configuration for cornell-class scenes). Larger (SMEM fori_loop)
scenes keep the XLA pipeline for training; `supported_diff` gates.

Reference parity: gradients are of the Assign10 schedule
(/root/reference/Assign10-Path_Tracing/code.js:1806-1854) — the reference
itself has no backward pass at all; this is the BASELINE.json north-star
differentiability requirement.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import megakernel as MK
from .megakernel import (LANES, NPAR, SUBLANES, TILE, _concentric, _cross,
                         _normalize3, _pad_plane, _tangent_frame)

Array = jax.Array
INF = jnp.inf


def _safe_sqrt(x):
    """sqrt with a finite VJP at x <= 0 (double-where; primal identical to
    sqrt(max(x, 0)))."""
    pos = x > 0.0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)


def n_draw_pairs(spp: int, n_lig: int, bounces: int, rr: bool,
                 mode: str) -> int:
    """Number of (u0, u1) pairs the kernel consumes, in consumption order:
    [lens if spp==1], NEE per light, then per depth: [rr?], bounce,
    NEE per light (mirrors megakernel._Draws call sites)."""
    n = 1 if spp == 1 else 0
    if mode == "direct":
        return n + n_lig
    return n + n_lig + bounces * ((1 if rr else 0) + 1 + n_lig)


def _materialize_draws(u_ref, shape, *, spp, n_lig, bounces, rr, mode,
                       seed_scalar=None):
    """All draw pairs as concrete values, in the forward kernel's exact
    consumption order. u_ref=None -> on-core PRNG (caller must have seeded
    with the same mixed counter as the forward)."""
    d = MK._Draws(u_ref, shape)
    if spp > 1 and u_ref is not None:
        d.skip()                       # slot 0 reserved (XLA layout)
    return [d.pair() for _ in range(n_draw_pairs(spp, n_lig, bounces, rr,
                                                 mode))]


# ---------------------------------------------------------------------------
# Value-based tile program (the forward math as a differentiable function)
# ---------------------------------------------------------------------------

def _tile_program(par_s, sph, tri, mat, lig, pairs, ridf, in_range, *,
                  spp: int, width: int, bounces: int,
                  n_sph: int, n_tri: int, n_mat: int, n_lig: int,
                  two_sided: bool, normalize_emitter: bool,
                  russian_roulette: bool, rr_start_depth: int,
                  mode: str):
    """Accumulator DELTA for one ray tile as a pure function of the scene
    tables. Same math, same order as megakernel._render_pass_kernel (which
    cites the reference kernels line-by-line); differences are only
    (1) tables are jnp values, (2) AD-safe double-where guards around
    sqrt/divisions, (3) returns the delta instead of writing refs.

    par_s: list of NPAR scalar values (so the VJP yields per-scalar
    cotangents); pairs: list of (u0, u1) tiles consumed in order."""
    shape = ridf.shape
    draw_i = [0]

    def next_pair():
        p = pairs[draw_i[0]]
        draw_i[0] += 1
        return p

    sppf = jnp.float32(spp)
    pix = jnp.floor(ridf / sppf)
    samp = ridf - pix * sppf
    wf = jnp.float32(width)
    rowf = jnp.floor(pix / wf)
    colf = pix - rowf * wf

    def P(name, off=0):
        return par_s[MK._PAR[name] + off]

    ex, ey, ez = P("eye"), P("eye", 1), P("eye", 2)
    ux, uy, uz = P("u"), P("u", 1), P("u", 2)
    vx, vy, vz = P("v"), P("v", 1), P("v", 2)
    wx, wy, wz = P("w"), P("w", 1), P("w", 2)
    eps = P("eps")

    # film point -> pinhole dir -> focal point (ref getRay code.cl:108-119,
    # getFocalPoint code.cl:174-181)
    su = (-0.5 + (colf + 0.5) / P("cols")) * P("film_w")
    sv = (0.5 - (rowf + 0.5) / P("rows")) * P("film_h")
    cx = su * ux + sv * vx - wx
    cy = su * uy + sv * vy - wy
    cz0 = su * uz + sv * vz - wz
    px_, py_, pz_ = _normalize3(cx, cy, cz0)
    fl = P("focal")
    pipd = -((ex - fl * wx) * wx + (ey - fl * wy) * wy + (ez - fl * wz) * wz)
    den_f = px_ * wx + py_ * wy + pz_ * wz
    den_f = jnp.where(den_f == 0.0, 1.0, den_f)
    t_f = -((ex * wx + ey * wy + ez * wz) + pipd) / den_f
    fpx = ex + t_f * px_
    fpy = ey + t_f * py_
    fpz = ez + t_f * pz_

    # thin lens (ref getThinLensRay code.cl:183-197)
    if spp > 1:
        k = int(round(spp ** 0.5))
        si = jnp.floor(samp / k)
        sj = samp - si * k
        u0 = (sj + 0.5) / k
        u1 = (si + 0.5) / k
    else:
        u0, u1 = next_pair()
    dx_, dy_ = _concentric(u0, u1)
    lr = P("lens_r")
    ox = ex + lr * (dx_ * ux + dy_ * vx)
    oy = ey + lr * (dx_ * uy + dy_ * vy)
    oz = ez + lr * (dx_ * uz + dy_ * vz)
    dx, dy, dz = _normalize3(fpx - ox, fpy - oy, fpz - oz)

    # clip to scene AABB (ref initTrace code.cl:495-501)
    def slab(p_lo, p_hi, o_, d_):
        sd = jnp.where(d_ == 0.0, 1e-30, d_)
        t0 = (p_lo - o_) / sd
        t1 = (p_hi - o_) / sd
        return jnp.minimum(t0, t1), jnp.maximum(t0, t1)

    n0, f0 = slab(P("pmin"), P("pmax"), ox, dx)
    n1, f1 = slab(P("pmin", 1), P("pmax", 1), oy, dy)
    n2, f2 = slab(P("pmin", 2), P("pmax", 2), oz, dz)
    tmin = jnp.maximum(jnp.maximum(n0, jnp.maximum(n1, n2)), 0.0)
    tmax = jnp.minimum(f0, jnp.minimum(f1, f2))
    ok = (tmin <= tmax) & in_range
    mint = jnp.where(ok, tmin, INF)
    maxt = jnp.where(ok, tmax, INF)

    inf2 = jnp.full(shape, INF)
    zero = jnp.zeros(shape)

    def trace(ox, oy, oz, dx, dy, dz, mint, maxt):
        alive = mint != maxt
        a = dx * dx + dy * dy + dz * dz
        inv2a = 0.5 / a
        xx, xy_, xz_ = _cross(ox, oy, oz, dx, dy, dz)
        c = (inf2, zero, zero, zero, jnp.full(shape, -1.0))

        for i in range(n_sph):
            bt, bnx, bny, bnz, bm = c
            scx, scy, scz = sph[i, 0], sph[i, 1], sph[i, 2]
            r, mf, msk = sph[i, 3], sph[i, 4], sph[i, 5]
            mx = ox - scx
            my = oy - scy
            mz = oz - scz
            b = 2.0 * (mx * dx + my * dy + mz * dz)
            cq = mx * mx + my * my + mz * mz - r * r
            dis = b * b - 4.0 * a * cq
            sq = _safe_sqrt(dis)
            t0 = (-b - sq) * inv2a
            t1 = (-b + sq) * inv2a
            tmn = jnp.minimum(t0, t1)
            tmx = jnp.maximum(t0, t1)
            t = jnp.where((tmn >= mint) & (tmn <= maxt), tmn,
                          jnp.where((tmx >= mint) & (tmx <= maxt), tmx, inf2))
            t = jnp.where((dis >= 0.0) & (msk > 0.0) & alive, t, inf2)
            better = t < bt
            ts = jnp.where(better, t, 0.0)
            hnx, hny, hnz = _normalize3(ox + ts * dx - scx,
                                        oy + ts * dy - scy,
                                        oz + ts * dz - scz)
            c = (jnp.where(better, t, bt),
                 jnp.where(better, hnx, bnx),
                 jnp.where(better, hny, bny),
                 jnp.where(better, hnz, bnz),
                 jnp.where(better, mf, bm))

        for i in range(n_tri):
            bt, bnx, bny, bnz, bm = c
            ngx, ngy, ngz = tri[i, 0], tri[i, 1], tri[i, 2]
            c1x, c1y, c1z = tri[i, 3], tri[i, 4], tri[i, 5]
            c2x, c2y, c2z = tri[i, 6], tri[i, 7], tri[i, 8]
            e1x, e1y, e1z = tri[i, 9], tri[i, 10], tri[i, 11]
            e2x, e2y, e2z = tri[i, 12], tri[i, 13], tri[i, 14]
            kk, mf, msk = tri[i, 15], tri[i, 16], tri[i, 17]
            div = ngx * dx + ngy * dy + ngz * dz
            side_ok = (div != 0.0) if two_sided else (div > 0.0)
            idiv = 1.0 / jnp.where(div == 0.0, 1.0, div)
            beta = (e2x * xx + e2y * xy_ + e2z * xz_
                    - (c2x * dx + c2y * dy + c2z * dz)) * idiv
            gamma = ((c1x * dx + c1y * dy + c1z * dz)
                     - (e1x * xx + e1y * xy_ + e1z * xz_)) * idiv
            t = (kk - (ngx * ox + ngy * oy + ngz * oz)) * idiv
            okh = side_ok & (beta >= 0.0) & (beta <= 1.0) & (gamma >= 0.0) \
                & (beta + gamma <= 1.0) & (t >= mint) & (t <= maxt) \
                & (msk > 0.0) & alive
            t = jnp.where(okh, t, inf2)
            better = t < bt
            alpha = 1.0 - beta - gamma
            hnx = alpha * tri[i, 18] + beta * tri[i, 21] + gamma * tri[i, 24]
            hny = alpha * tri[i, 19] + beta * tri[i, 22] + gamma * tri[i, 25]
            hnz = alpha * tri[i, 20] + beta * tri[i, 23] + gamma * tri[i, 26]
            hnx, hny, hnz = _normalize3(hnx, hny, hnz)
            c = (jnp.where(better, t, bt),
                 jnp.where(better, hnx, bnx),
                 jnp.where(better, hny, bny),
                 jnp.where(better, hnz, bnz),
                 jnp.where(better, mf, bm))

        bt, bnx, bny, bnz, bm = c
        found = bm >= 0.0
        ts = jnp.where(found, bt, 0.0)
        hpx = ox + ts * dx
        hpy = oy + ts * dy
        hpz = oz + ts * dz
        new_maxt = jnp.where(found, bt, maxt)
        return new_maxt, (hpx, hpy, hpz, bnx, bny, bnz, bm)

    def anyhit(ox, oy, oz, dx, dy, dz, mint, maxt):
        alive = mint != maxt
        a = dx * dx + dy * dy + dz * dz
        inv2a = 0.5 / a
        xx, xy_, xz_ = _cross(ox, oy, oz, dx, dy, dz)
        occ = jnp.zeros(shape, bool)
        for i in range(n_sph):
            scx, scy, scz = sph[i, 0], sph[i, 1], sph[i, 2]
            r, msk = sph[i, 3], sph[i, 5]
            mx = ox - scx
            my = oy - scy
            mz = oz - scz
            b = 2.0 * (mx * dx + my * dy + mz * dz)
            cq = mx * mx + my * my + mz * mz - r * r
            dis = b * b - 4.0 * a * cq
            sq = _safe_sqrt(dis)
            t0 = (-b - sq) * inv2a
            t1 = (-b + sq) * inv2a
            tmn = jnp.minimum(t0, t1)
            tmx = jnp.maximum(t0, t1)
            hit = ((tmn >= mint) & (tmn <= maxt)) | \
                  ((tmx >= mint) & (tmx <= maxt))
            occ = occ | (hit & (dis >= 0.0) & (msk > 0.0) & alive)
        for i in range(n_tri):
            ngx, ngy, ngz = tri[i, 0], tri[i, 1], tri[i, 2]
            c1x, c1y, c1z = tri[i, 3], tri[i, 4], tri[i, 5]
            c2x, c2y, c2z = tri[i, 6], tri[i, 7], tri[i, 8]
            e1x, e1y, e1z = tri[i, 9], tri[i, 10], tri[i, 11]
            e2x, e2y, e2z = tri[i, 12], tri[i, 13], tri[i, 14]
            kk, msk = tri[i, 15], tri[i, 17]
            div = ngx * dx + ngy * dy + ngz * dz
            side_ok = (div != 0.0) if two_sided else (div > 0.0)
            idiv = 1.0 / jnp.where(div == 0.0, 1.0, div)
            beta = (e2x * xx + e2y * xy_ + e2z * xz_
                    - (c2x * dx + c2y * dy + c2z * dz)) * idiv
            gamma = ((c1x * dx + c1y * dy + c1z * dz)
                     - (e1x * xx + e1y * xy_ + e1z * xz_)) * idiv
            t = (kk - (ngx * ox + ngy * oy + ngz * oz)) * idiv
            okh = side_ok & (beta >= 0.0) & (beta <= 1.0) & (gamma >= 0.0) \
                & (beta + gamma <= 1.0) & (t >= mint) & (t <= maxt) \
                & (msk > 0.0) & alive
            occ = occ | okh
        return occ

    def albedo_of(mf):
        ar = jnp.zeros(shape)
        ag = jnp.zeros(shape)
        ab = jnp.zeros(shape)
        for m in range(n_mat):
            sel = mf == float(m)
            ar = jnp.where(sel, mat[m, 0], ar)
            ag = jnp.where(sel, mat[m, 1], ag)
            ab = jnp.where(sel, mat[m, 2], ab)
        return ar, ag, ab

    accr = jnp.zeros(shape)
    accg = jnp.zeros(shape)
    accb = jnp.zeros(shape)
    tpr = jnp.ones(shape)
    tpg = jnp.ones(shape)
    tpb = jnp.ones(shape)

    maxt, hit = trace(ox, oy, oz, dx, dy, dz, mint, maxt)
    hpx, hpy, hpz, hnx, hny, hnz, matf = hit

    if mode == "direct":
        ambient = P("ambient")
        valid = matf >= 0.0
        for li in range(n_lig):
            lpx, lpy, lpz = lig[li, 0], lig[li, 1], lig[li, 2]
            rad = lig[li, 12]
            tax, tay, taz = lig[li, 14], lig[li, 15], lig[li, 16]
            bax, bay, baz = lig[li, 17], lig[li, 18], lig[li, 19]
            u0, u1 = next_pair()
            sx, sy = _concentric(u0, u1)
            sx = sx * rad
            sy = sy * rad
            tgx = lpx + sx * tax + sy * bax
            tgy = lpy + sx * tay + sy * bay
            tgz = lpz + sx * taz + sy * baz
            sox = hpx + eps * hnx
            soy = hpy + eps * hny
            soz = hpz + eps * hnz
            dlx = tgx - sox
            dly = tgy - soy
            dlz = tgz - soz
            d2 = dlx * dlx + dly * dly + dlz * dlz
            dist = jnp.sqrt(jnp.where(d2 > 0.0, d2, 1.0))
            dist = jnp.where(d2 > 0.0, dist, 0.0)
            sdx, sdy, sdz = _normalize3(dlx, dly, dlz)
            smint = jnp.where(valid, 0.0, inf2)
            smaxt = jnp.where(valid, dist, inf2)
            occ = anyhit(sox, soy, soz, sdx, sdy, sdz, smint, smaxt)
            cosx = jnp.clip(sdx * hnx + sdy * hny + sdz * hnz, 0.0, 1.0)
            shade = jnp.clip(ambient + jnp.where(occ, 0.0, cosx), 0.0, 1.0)
            ar, ag, ab = albedo_of(matf)
            accr = accr + jnp.where(valid, ar * shade, 0.0)
            accg = accg + jnp.where(valid, ag * shade, 0.0)
            accb = accb + jnp.where(valid, ab * shade, 0.0)
        return accr, accg, accb

    # emitter hits on the primary segment (ref lightRender code.cl:600-629)
    for li in range(n_lig):
        lpx, lpy, lpz = lig[li, 0], lig[li, 1], lig[li, 2]
        lnx, lny, lnz = lig[li, 3], lig[li, 4], lig[li, 5]
        if normalize_emitter:
            ir, ig, ib = lig[li, 9], lig[li, 10], lig[li, 11]
        else:
            ir, ig, ib = lig[li, 6], lig[li, 7], lig[li, 8]
        rad = lig[li, 12]
        alive = mint != maxt
        den = dx * lnx + dy * lny + dz * lnz
        num = (lpx - ox) * lnx + (lpy - oy) * lny + (lpz - oz) * lnz
        t = num / jnp.where(den == 0.0, 1.0, den)
        qx = ox + t * dx - lpx
        qy = oy + t * dy - lpy
        qz = oz + t * dz - lpz
        on_disk = qx * qx + qy * qy + qz * qz <= rad * rad
        t = jnp.where((den != 0.0) & (num != 0.0) & on_disk, t, inf2)
        hitl = alive & (t < INF) & (t >= mint) & (t < maxt)
        accr = accr + jnp.where(hitl, ir, 0.0)
        accg = accg + jnp.where(hitl, ig, 0.0)
        accb = accb + jnp.where(hitl, ib, 0.0)
        mint = jnp.where(hitl, inf2, mint)
        maxt = jnp.where(hitl, inf2, maxt)
        matf = jnp.where(hitl, -1.0, matf)

    def nee(li, accr, accg, accb, tpr, tpg, tpb, matf, hp, hn):
        hpx, hpy, hpz = hp
        hnx, hny, hnz = hn
        lpx, lpy, lpz = lig[li, 0], lig[li, 1], lig[li, 2]
        lnx, lny, lnz = lig[li, 3], lig[li, 4], lig[li, 5]
        ir, ig, ib = lig[li, 6], lig[li, 7], lig[li, 8]
        rad, area = lig[li, 12], lig[li, 13]
        tax, tay, taz = lig[li, 14], lig[li, 15], lig[li, 16]
        bax, bay, baz = lig[li, 17], lig[li, 18], lig[li, 19]
        valid = matf >= 0.0
        u0, u1 = next_pair()
        sx, sy = _concentric(u0, u1)
        sx = sx * rad
        sy = sy * rad
        tgx = lpx + sx * tax + sy * bax
        tgy = lpy + sx * tay + sy * bay
        tgz = lpz + sx * taz + sy * baz
        sox = hpx + eps * hnx
        soy = hpy + eps * hny
        soz = hpz + eps * hnz
        dlx = tgx - sox
        dly = tgy - soy
        dlz = tgz - soz
        d2 = dlx * dlx + dly * dly + dlz * dlz
        dist = jnp.sqrt(jnp.where(d2 > 0.0, d2, 1.0))
        dist = jnp.where(d2 > 0.0, dist, 0.0)
        sdx, sdy, sdz = _normalize3(dlx, dly, dlz)
        smint = jnp.where(valid, 0.0, inf2)
        smaxt = jnp.where(valid, dist, inf2)
        occ = anyhit(sox, soy, soz, sdx, sdy, sdz, smint, smaxt)
        r2 = (hpx - lpx) ** 2 + (hpy - lpy) ** 2 + (hpz - lpz) ** 2
        cosx = jnp.clip(sdx * hnx + sdy * hny + sdz * hnz, 0.0, 1.0)
        cosy = jnp.clip(-(sdx * lnx + sdy * lny + sdz * lnz), 0.0, 1.0)
        geom = area * cosx * cosy / jnp.maximum(r2, 1e-20)
        free = valid & ~occ
        ar, ag, ab = albedo_of(matf)
        shr = jnp.where(free, geom * ir, 0.0)
        shg = jnp.where(free, geom * ig, 0.0)
        shb = jnp.where(free, geom * ib, 0.0)
        accr = accr + jnp.where(valid, tpr * ar * shr, 0.0)
        accg = accg + jnp.where(valid, tpg * ag * shg, 0.0)
        accb = accb + jnp.where(valid, tpb * ab * shb, 0.0)
        tpr = jnp.where(valid, tpr * ar, tpr)
        tpg = jnp.where(valid, tpg * ag, tpg)
        tpb = jnp.where(valid, tpb * ab, tpb)
        return accr, accg, accb, tpr, tpg, tpb

    for li in range(n_lig):
        accr, accg, accb, tpr, tpg, tpb = nee(
            li, accr, accg, accb, tpr, tpg, tpb, matf,
            (hpx, hpy, hpz), (hnx, hny, hnz))

    for _depth in range(bounces):
        if russian_roulette:
            u0, _ = next_pair()
            if _depth >= rr_start_depth:
                p_srv = jnp.clip(jnp.maximum(tpr, jnp.maximum(tpg, tpb)),
                                 0.05, 1.0)
                survive = u0 < p_srv
                inv_p = 1.0 / p_srv
                tpr = jnp.where(survive, tpr * inv_p, 0.0)
                tpg = jnp.where(survive, tpg * inv_p, 0.0)
                tpb = jnp.where(survive, tpb * inv_p, 0.0)
                matf = jnp.where(survive, matf, -1.0)
        valid = matf >= 0.0
        snx = jnp.where(valid, hnx, 0.0)
        sny = jnp.where(valid, hny, 0.0)
        snz = jnp.where(valid, hnz, 1.0)
        (tx, ty, tz), (bx, by, bz) = _tangent_frame(snx, sny, snz)
        u0, u1 = next_pair()
        cdx, cdy = _concentric(u0, u1)
        cz = _safe_sqrt(1.0 - cdx * cdx - cdy * cdy)
        dx, dy, dz = _normalize3(cdx * tx + cdy * bx + cz * snx,
                                 cdx * ty + cdy * by + cz * sny,
                                 cdx * tz + cdy * bz + cz * snz)
        ox = hpx + eps * hnx
        oy = hpy + eps * hny
        oz = hpz + eps * hnz
        mint = jnp.where(valid, 0.0, inf2)
        maxt = inf2
        maxt, hit = trace(ox, oy, oz, dx, dy, dz, mint, maxt)
        hpx, hpy, hpz, hnx, hny, hnz, matf = hit
        for li in range(n_lig):
            accr, accg, accb, tpr, tpg, tpb = nee(
                li, accr, accg, accb, tpr, tpg, tpb, matf,
                (hpx, hpy, hpz), (hnx, hny, hnz))

    return accr, accg, accb


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------

DIFF_ALL = ("par", "sph", "tri", "mat", "lig")


def _bwd_kernel(ipar, par, sph, tri, mat, lig, *rest,
                n_rays: int, spp: int, width: int, bounces: int,
                n_sph: int, n_tri: int, n_mat: int, n_lig: int,
                two_sided: bool, normalize_emitter: bool,
                use_u: bool, seed: int, mode: str,
                russian_roulette: bool, rr_start_depth: int,
                remat: bool, diff_wrt: tuple = DIFF_ALL,
                bwd_sublanes: int = SUBLANES):
    if use_u:
        u_ref = rest[0]
        g_refs = rest[1:4]
        outs = rest[4:9]
    else:
        u_ref = None
        g_refs = rest[0:3]
        outs = rest[3:8]
    dpar_ref, dsph_ref, dtri_ref, dmat_ref, dlig_ref = outs

    S_B = bwd_sublanes
    shape = (S_B, LANES)
    pid = pl.program_id(0)
    roff = ipar[1]
    if not use_u:
        # PRNG replay must match the FORWARD's (SUBLANES, LANES) tiles:
        # seed per forward tile, generate its full planes, slice this
        # backward tile's row window
        ratio = SUBLANES // S_B
        f_tile = pid // ratio if ratio > 1 else pid
        mixed = (jnp.int32(seed & 0x7FFFFFFF) * jnp.int32(1000003)
                 + ipar[0] * jnp.int32(40503) + roff * jnp.int32(131)
                 + f_tile)
        pltpu.prng_seed(mixed)
    pairs = _materialize_draws(u_ref, (SUBLANES, LANES) if not use_u
                               else shape,
                               spp=spp, n_lig=n_lig,
                               bounces=bounces, rr=russian_roulette,
                               mode=mode)
    if not use_u and S_B != SUBLANES:
        # pick this backward tile's row window of the forward's (SUBLANES,
        # LANES) planes. Branch-free masked select over the (static) ratio
        # — Mosaic has no dynamic_slice lowering for register values.
        q = pid % (SUBLANES // S_B)

        def pick(u):
            out = jnp.zeros((S_B, LANES), u.dtype)
            for r in range(SUBLANES // S_B):
                out = jnp.where(q == r, u[r * S_B:(r + 1) * S_B, :], out)
            return out

        pairs = [tuple(pick(u) for u in p) for p in pairs]

    rid = ((pid * S_B
            + jax.lax.broadcasted_iota(jnp.int32, shape, 0)) * LANES
           + jax.lax.broadcasted_iota(jnp.int32, shape, 1))
    in_range = rid < n_rays
    ridf = (rid + roff).astype(jnp.float32)

    vals = dict(par=[par[i] for i in range(NPAR)], sph=sph[:], tri=tri[:],
                mat=mat[:], lig=lig[:])

    prog = functools.partial(
        _tile_program, pairs=pairs, ridf=ridf, in_range=in_range,
        spp=spp, width=width, bounces=bounces, n_sph=n_sph, n_tri=n_tri,
        n_mat=n_mat, n_lig=n_lig, two_sided=two_sided,
        normalize_emitter=normalize_emitter,
        russian_roulette=russian_roulette, rr_start_depth=rr_start_depth,
        mode=mode)

    # differentiate only the requested parameter groups (the rest are
    # closure constants — their transpose work is DCE'd away; e.g. the
    # BASELINE metric wants geometry+albedo only, not the camera chain)
    sel = [n for n in DIFF_ALL if n in diff_wrt]

    def f(*sel_args):
        v = dict(vals)
        v.update(dict(zip(sel, sel_args)))
        return prog(v["par"], v["sph"], v["tri"], v["mat"], v["lig"])

    del remat  # segment-level remat hook (currently whole-tile vjp)
    _, vjp_fn = jax.vjp(f, *[vals[n] for n in sel])
    g = tuple(ref[:] for ref in g_refs)
    cot = dict(zip(sel, vjp_fn(g)))
    dpar_l = cot.get("par", [jnp.float32(0.0)] * NPAR)
    dsph = cot.get("sph", jnp.zeros_like(vals["sph"]))
    dtri = cot.get("tri", jnp.zeros_like(vals["tri"]))
    dmat = cot.get("mat", jnp.zeros_like(vals["mat"]))
    dlig = cot.get("lig", jnp.zeros_like(vals["lig"]))

    @pl.when(pid == 0)
    def _():
        for i in range(NPAR):
            dpar_ref[i] = 0.0
        dsph_ref[:] = jnp.zeros_like(dsph_ref)
        dtri_ref[:] = jnp.zeros_like(dtri_ref)
        dmat_ref[:] = jnp.zeros_like(dmat_ref)
        dlig_ref[:] = jnp.zeros_like(dlig_ref)

    for i in range(NPAR):
        dpar_ref[i] += dpar_l[i]
    dsph_ref[:] += dsph
    dtri_ref[:] += dtri
    dmat_ref[:] += dmat
    dlig_ref[:] += dlig


def _bwd_pallas(par, ipar, sph, tri, mat, lig, g, u_planes, *,
                spp, width, bounces, two_sided, normalize_emitter,
                seed, interpret, mode, russian_roulette, rr_start_depth,
                remat, diff_wrt=DIFF_ALL, bwd_sublanes=SUBLANES):
    """Parameter cotangents for one pass. g: (R, 3) cotangent of acc_out."""
    assert SUBLANES % bwd_sublanes == 0, \
        "backward tiles must subdivide the forward's PRNG tiles"
    R = g.shape[0]
    P = -(-R // TILE) * TILE
    n_tiles = P // (bwd_sublanes * LANES)
    g_planes = [_pad_plane(g[:, c], P) for c in range(3)]

    def nonempty(t):
        return t if t.shape[0] else jnp.zeros((1,) + t.shape[1:], t.dtype)

    sph, tri, mat, lig = map(nonempty, (sph, tri, mat, lig))
    kw = dict(n_rays=R, spp=spp, width=width, bounces=bounces,
              n_sph=sph.shape[0], n_tri=tri.shape[0],
              n_mat=mat.shape[0], n_lig=lig.shape[0],
              two_sided=two_sided, normalize_emitter=normalize_emitter,
              use_u=u_planes is not None, seed=seed, mode=mode,
              russian_roulette=russian_roulette,
              rr_start_depth=rr_start_depth, remat=remat,
              diff_wrt=tuple(diff_wrt), bwd_sublanes=bwd_sublanes)

    ray_block = pl.BlockSpec((bwd_sublanes, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    in_specs = [smem, smem, vmem, vmem, vmem, vmem]
    args = [ipar, par, sph, tri, mat, lig]
    if u_planes is not None:
        D2 = u_planes.shape[0]
        u3 = jnp.stack([_pad_plane(u_planes[j], P) for j in range(D2)])
        in_specs.append(pl.BlockSpec((D2, bwd_sublanes, LANES),
                                     lambda i: (0, i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(u3)
    in_specs += [ray_block] * 3
    args += g_planes

    # gradient outputs: whole-array blocks revisited by every grid step
    # (constant index map; TPU grids run sequentially on the core, so the
    # accumulation is well-defined)
    def acc_spec(t):
        return pl.BlockSpec(t.shape, lambda i: (0,) * t.ndim,
                            memory_space=pltpu.VMEM)

    out_shape = (
        jax.ShapeDtypeStruct((NPAR,), jnp.float32),
        jax.ShapeDtypeStruct(sph.shape, jnp.float32),
        jax.ShapeDtypeStruct(tri.shape, jnp.float32),
        jax.ShapeDtypeStruct(mat.shape, jnp.float32),
        jax.ShapeDtypeStruct(lig.shape, jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((NPAR,), lambda i: (0,), memory_space=pltpu.SMEM),
        acc_spec(sph), acc_spec(tri), acc_spec(mat), acc_spec(lig),
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, **kw),
        out_shape=out_shape,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
        # the transpose of a 5-bounce tile program keeps ~29 MB of
        # residuals live at 1024x1024 b5 — beyond the 16 MB default scoped
        # window but well within v5e's physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*args)


def _bwd_reference(par, ipar, sph, tri, mat, lig, g, u_planes, *,
                   spp, width, bounces, two_sided, normalize_emitter,
                   seed, mode, russian_roulette, rr_start_depth,
                   diff_wrt=("par", "sph", "tri", "mat", "lig")):
    """Plain-XLA cotangents: jax.vjp of _tile_program over the whole padded
    ray set as ONE tile. Used (a) on CPU/interpret, where running the
    backward Pallas kernel through the interpreter costs minutes per call,
    and (b) as the oracle the Pallas backward kernel is tested against.
    Requires u_planes (the on-core PRNG has no host analog)."""
    assert u_planes is not None, \
        "diff megakernel on CPU/interpret requires u_planes (no host PRNG)"
    R = g.shape[0]
    P = -(-R // LANES) * LANES
    shape = (P // LANES, LANES)
    g_planes = tuple(_pad_plane(g[:, c], P) for c in range(3))
    u3 = jnp.stack([_pad_plane(u_planes[j], P)
                    for j in range(u_planes.shape[0])])

    def nonempty(t):
        return t if t.shape[0] else jnp.zeros((1,) + t.shape[1:], t.dtype)

    sph_n, tri_n, mat_n, lig_n = map(nonempty, (sph, tri, mat, lig))
    pairs = _materialize_draws(u3, shape, spp=spp, n_lig=lig.shape[0],
                               bounces=bounces, rr=russian_roulette,
                               mode=mode)
    rid = (jax.lax.broadcasted_iota(jnp.int32, shape, 0) * LANES
           + jax.lax.broadcasted_iota(jnp.int32, shape, 1))
    in_range = rid < R
    ridf = (rid + ipar[1]).astype(jnp.float32)

    vals = dict(par=[par[i] for i in range(NPAR)], sph=sph_n, tri=tri_n,
                mat=mat_n, lig=lig_n)
    sel = [n for n in DIFF_ALL if n in diff_wrt]

    def f(*sel_args):
        v = dict(vals)
        v.update(dict(zip(sel, sel_args)))
        return _tile_program(
            v["par"], v["sph"], v["tri"], v["mat"], v["lig"],
            pairs, ridf, in_range,
            spp=spp, width=width, bounces=bounces,
            n_sph=sph.shape[0], n_tri=tri.shape[0],
            n_mat=mat.shape[0], n_lig=lig.shape[0],
            two_sided=two_sided, normalize_emitter=normalize_emitter,
            russian_roulette=russian_roulette,
            rr_start_depth=rr_start_depth, mode=mode)

    _, vjp_fn = jax.vjp(f, *[vals[n] for n in sel])
    cot = dict(zip(sel, vjp_fn(g_planes)))
    dpar_l = cot.get("par", [jnp.float32(0.0)] * NPAR)
    return (jnp.stack(dpar_l),
            cot.get("sph", jnp.zeros_like(sph_n)),
            cot.get("tri", jnp.zeros_like(tri_n)),
            cot.get("mat", jnp.zeros_like(mat_n)),
            cot.get("lig", jnp.zeros_like(lig_n)))


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _make_diff_op(spp, width, bounces, two_sided, normalize_emitter, seed,
                  interpret, mode, russian_roulette, rr_start_depth, remat,
                  diff_wrt, bwd_sublanes):
    kw = dict(spp=spp, width=width, bounces=bounces, two_sided=two_sided,
              normalize_emitter=normalize_emitter, seed=seed,
              interpret=interpret, mode=mode,
              russian_roulette=russian_roulette,
              rr_start_depth=rr_start_depth)

    @jax.custom_vjp
    def op(par, ipar, sph, tri, mat, lig, acc, u_planes):
        return MK.pathtrace_pass_pallas(par, ipar, sph, tri, mat, lig, acc,
                                        u_planes, **kw)

    def fwd(par, ipar, sph, tri, mat, lig, acc, u_planes):
        out = MK.pathtrace_pass_pallas(par, ipar, sph, tri, mat, lig, acc,
                                       u_planes, **kw)
        return out, (par, ipar, sph, tri, mat, lig, u_planes)

    def bwd(res, g):
        par, ipar, sph, tri, mat, lig, u_planes = res
        if interpret:
            bkw = dict(kw)
            bkw.pop("interpret")
            dpar, dsph, dtri, dmat, dlig = _bwd_reference(
                par, ipar, sph, tri, mat, lig, g, u_planes,
                diff_wrt=diff_wrt, **bkw)
        else:
            dpar, dsph, dtri, dmat, dlig = _bwd_pallas(
                par, ipar, sph, tri, mat, lig, g, u_planes,
                remat=remat, diff_wrt=diff_wrt,
                bwd_sublanes=bwd_sublanes, **kw)
        # slice off the dummy row added for empty tables
        def cut(d, t):
            return d[:t.shape[0]] if t.shape[0] else jnp.zeros_like(t)
        dipar = np.zeros(ipar.shape, jax.dtypes.float0)
        du = None if u_planes is None else jnp.zeros_like(u_planes)
        return (dpar, dipar, cut(dsph, sph), cut(dtri, tri),
                cut(dmat, mat), cut(dlig, lig), g, du)

    op.defvjp(fwd, bwd)
    return op


def pathtrace_pass_diff(par, ipar, sph, tri, mat, lig, acc, u_planes, *,
                        spp, width, bounces, two_sided, normalize_emitter,
                        seed, interpret=False, mode="path",
                        russian_roulette=False, rr_start_depth=0,
                        remat=True, diff_wrt=DIFF_ALL,
                        bwd_sublanes=SUBLANES):
    """Differentiable megakernel pass: primal = the fused forward kernel;
    backward = the fused recompute-VJP kernel above. Unrolled-table scenes
    only (see supported_diff in render/mega.py). ``diff_wrt`` restricts
    which parameter groups get real cotangents (others return zeros —
    opt-in via cfg.mega_grad_wrt; the BASELINE metric is geometry+albedo)."""
    op = _make_diff_op(spp, width, bounces, two_sided, normalize_emitter,
                       seed, interpret, mode, russian_roulette,
                       rr_start_depth, remat, tuple(diff_wrt),
                       bwd_sublanes)
    return op(par, ipar, sph, tri, mat, lig, acc, u_planes)
