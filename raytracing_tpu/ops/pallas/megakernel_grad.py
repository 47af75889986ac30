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

Backward routes (cfg.mega_bwd_impl; render/mega.bwd_impl_for picks):

  * "pallas" — the fused recompute-VJP kernel above (this module's
    round-2 design): re-sweeps the object tables inside jax.vjp. The
    production route for UNROLLED tables (<= UNROLL_OBJECTS/type).
  * "cell" (round 5) — the CHAMPION backward: the forward kernel RECORDS
    each trace segment's champion diff-table row and each NEE occlusion
    bit while marching its cells at full speed (megakernel record=True);
    the backward then needs NO object sweep — gather the champion rows,
    vjp the shading chain (_tile_program_champ), scatter the row
    cotangents. Production for streamed and grid-mode tables
    (_bwd_champ_pallas: one-hot MXU gather/scatter over champion-chunk
    ranges, on-core PRNG replay; _bwd_champion: the value-level twin and
    the CPU route — shallow graph, no cond-transpose recursion).
  * "xla" — the dense value-level sweep transpose (the oracle route;
    also the vectorized chunked-soft route for EDGE mode past the
    unroll budget).

`supported_diff` gates coverage (DIFF_TABLE_MAX / GRID_DIFF_MAX).

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

def _primary_rays(P, next_pair, ridf, in_range, *, spp: int, width: int,
                  block: int = 0):
    """Thin-lens primary rays + scene-AABB clip, shared by the hard and
    soft tile programs. Math identical to the forward kernel
    (megakernel._render_pass_kernel film/lens/clip chain; ref getRay
    code.cl:108-119, getThinLensRay 183-197, initTrace clip 495-501).
    ``block``: the kernel's blocked pixel decode (cfg.mega_block)."""
    shape = ridf.shape
    sppf = jnp.float32(spp)
    pix = jnp.floor(ridf / sppf)
    samp = ridf - pix * sppf
    wf = jnp.float32(width)
    if block:
        pbf = jnp.float32(block * block)
        bprf = jnp.float32(width // block)
        bidf = jnp.floor(pix / pbf)
        w_in = pix - bidf * pbf
        browf = jnp.floor(bidf / bprf)
        bcolf = bidf - browf * bprf
        wrowf = jnp.floor(w_in / jnp.float32(block))
        rowf = browf * block + wrowf
        colf = bcolf * block + (w_in - wrowf * block)
    else:
        rowf = jnp.floor(pix / wf)
        colf = pix - rowf * wf

    ex, ey, ez = P("eye"), P("eye", 1), P("eye", 2)
    ux, uy, uz = P("u"), P("u", 1), P("u", 2)
    vx, vy, vz = P("v"), P("v", 1), P("v", 2)
    wx, wy, wz = P("w"), P("w", 1), P("w", 2)

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
    return ox, oy, oz, dx, dy, dz, mint, maxt, ok


# chunk size for the CHUNKED soft (edge-aware) compositing — tables past
# the unroll budget: hypotheses composite chunk-locally (O(C^2) pairwise),
# then each chunk's blended surface competes as ONE hypothesis in a second
# O((N/C)^2) cross-chunk composite (soft_trace below). Converges to the
# same hard limit as bandwidth, tau -> 0 (within a chunk -> the chunk
# champion; across chunks -> the champion of champions). Tables arrive
# Morton-sorted (streaming prep), so chunks are spatially compact and the
# chunk blend mixes neighboring geometry, not scene-distant surfaces.
SOFT_CHUNK = 64

# object-loop chunking for the differentiable LARGE-table path: tables past
# the unroll budget run a checkpointed chunked lax.scan — residuals are one
# champion carry per chunk instead of per object, and the scan transpose
# accumulates the per-row table cotangents. 128 matches the forward
# streaming kernel's STREAM_CHUNK (chunk AABB tables line up 1:1).
DIFF_CHUNK = 128

DIFF_ALL = ("par", "sph", "tri", "mat", "lig")


def _tree_champion(t, fields):
    """Static log2 tree min-reduce over axis 0 of ``t`` (C, S, L),
    carrying ``fields`` (broadcastable to t) with FIRST-INDEX tie-breaking
    (a kept on t_a <= t_b) — identical winner to the sequential
    strictly-less champion loop. All static slices + elementwise selects:
    lowers in Mosaic (no scan/cumsum/argmin primitives). C must be a
    power of two (DIFF_CHUNK padding guarantees it)."""
    C = t.shape[0]
    fields = [jnp.broadcast_to(f, t.shape) for f in fields]
    while C > 1:
        h = C // 2
        keep_a = t[:h] <= t[h:C]
        t = jnp.where(keep_a, t[:h], t[h:C])
        fields = [jnp.where(keep_a, f[:h], f[h:C]) for f in fields]
        C = h
    return t[0], [f[0] for f in fields]


def _loop_diff(table, n, step, carry, windows=None, captures=(),
               chunk_fn=None, chunk=DIFF_CHUNK):
    """Reverse-differentiable object loop over ``table[:n]`` rows.

    Small tables unroll ``step`` with static row reads (identical jaxpr
    to the round-2 backward). Larger ones process DIFF_CHUNK-row chunks
    with ``chunk_fn(carry, rows, captures)`` — a BATCHED whole-chunk
    update ((C, S, L) broadcast candidates + tree champion merge) wrapped
    in a hand-rolled custom_vjp checkpoint (saves only carry/rows/
    captures, recomputes the chunk vjp in backward). Batched-not-scanned
    because Mosaic cannot lower scans with extensive inputs, remat
    closed_calls, or dynamic register indexing inside the Pallas backward
    kernel — and the batched form is the vectorized TPU-native expression
    anyway.

    ``windows=(chunk_aabbs, overlap_fn)``: each chunk is wrapped in
    ``lax.cond(overlap, chunk, skip)`` with every branch value an
    explicit operand (Mosaic rejects branch constvars), so the backward
    pays only for chunks the forward streaming kernel would have fetched
    (conservative tile culling; cond's VJP replays only the taken
    branch). ``overlap_fn(chunk_aabbs, ci, carry)`` must read AABB rows
    via SCALAR indexing (SMEM refs in-kernel). ``step``/``chunk_fn``
    take every differentiable outer value through ``captures`` (a
    custom_vjp cannot differentiate closed-over tracers). Padding rows
    must be no-ops (mask column 0 — the table builders guarantee it)."""
    if n <= MK.UNROLL_OBJECTS and windows is None:
        for i in range(n):
            carry = step(table[i], carry, captures)
        return carry
    assert chunk_fn is not None, "large tables need a batched chunk_fn"
    C = chunk
    assert C & (C - 1) == 0, "chunk size must be a power of two"
    nch = -(-n // C)
    F = table.shape[1]
    tb = table[:n]
    if nch * C != n:
        tb = jnp.concatenate([tb, jnp.zeros((nch * C - n, F), table.dtype)])
    tb = tb.reshape(nch, C, F)

    @jax.custom_vjp
    def chunk_ck(carry, rows, captures):
        return chunk_fn(carry, rows, captures)

    def chunk_fwd(carry, rows, captures):
        return chunk_fn(carry, rows, captures), (carry, rows, captures)

    def chunk_bwd(res, g):
        carry, rows, captures = res
        _, vjp = jax.vjp(chunk_fn, carry, rows, captures)
        return vjp(g)

    chunk_ck.defvjp(chunk_fwd, chunk_bwd)

    def take_chunk(c, rows, caps):
        return chunk_ck(c, rows, caps)

    def skip_chunk(c, rows, caps):
        return c

    if windows is None:
        for ci in range(nch):
            carry = chunk_ck(carry, tb[ci], captures)
        return carry

    chunk_aabbs, overlap_fn = windows
    for ci in range(nch):
        hit = overlap_fn(chunk_aabbs, ci, carry)
        carry = jax.lax.cond(hit, take_chunk, skip_chunk,
                             carry, tb[ci], captures)
    return carry


def _col(rows, j):
    """(C, F) table column j broadcast-ready against (S, L) ray tiles."""
    return rows[:, j][:, None, None]


def _sph_mm(rows, cap):
    """MATMUL-form sphere candidate generation: (c·d, c·o, |c|^2 - r^2)
    for all C rows as one (3C, 7) @ (7, N) contraction — the MXU form of
    the quadratic setup (ops/intersect.py sphere matmul trick). Used on
    the dense XLA backward route, where candidate generation would
    otherwise be VPU-broadcast-bound."""
    ox, oy, oz, dx, dy, dz = cap[0:6]
    shape = dx.shape
    C = rows.shape[0]
    feats = jnp.stack([dx, dy, dz, ox, oy, oz,
                       jnp.ones(shape, rows.dtype)]).reshape(7, -1)
    c = rows[:, 0:3]
    r = rows[:, 3:4]
    Z3 = jnp.zeros((C, 3), rows.dtype)
    Z1 = jnp.zeros((C, 1), rows.dtype)
    A = jnp.concatenate([
        jnp.concatenate([c, Z3, Z1], 1),                       # c·d
        jnp.concatenate([Z3, c, Z1], 1),                       # c·o
        jnp.concatenate([Z3, Z3,
                         (c * c).sum(1, keepdims=True) - r * r], 1),
    ], 0)
    E = (A @ feats).reshape(3, C, *shape)
    return E[0], E[1], E[2]


def _make_sph_chunk_trace(mm=False):
    def sph_chunk(carry, rows, cap):
        """Batched sphere chunk for the CLOSEST-HIT search: all C
        candidates as (C, S, L) broadcasts (or the MXU matmul form when
        ``mm``) + tree champion merge (math identical to the scalar
        sph_step; same winner by first-index tie-breaking)."""
        ox, oy, oz, dx, dy, dz, mint, maxt, a, inv2a, _, _, _ = cap
        alive = mint != maxt
        bt, bnx, bny, bnz, bm = carry
        scx, scy, scz = _col(rows, 0), _col(rows, 1), _col(rows, 2)
        r, mf, msk = _col(rows, 3), _col(rows, 4), _col(rows, 5)
        if mm:
            cd, co, c2r = _sph_mm(rows, cap)
            od = ox * dx + oy * dy + oz * dz
            oo = ox * ox + oy * oy + oz * oz
            b = 2.0 * (od - cd)
            cq = oo - 2.0 * co + c2r
        else:
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
                      jnp.where((tmx >= mint) & (tmx <= maxt), tmx, INF))
        t = jnp.where((dis >= 0.0) & (msk > 0.0) & alive, t, INF)
        ts = jnp.where(t < INF, t, 0.0)
        hnx, hny, hnz = _normalize3(ox + ts * dx - scx,
                                    oy + ts * dy - scy,
                                    oz + ts * dz - scz)
        tc, (cnx, cny, cnz, cmf) = _tree_champion(t, [hnx, hny, hnz, mf])
        better = tc < bt
        return (jnp.where(better, tc, bt),
                jnp.where(better, cnx, bnx),
                jnp.where(better, cny, bny),
                jnp.where(better, cnz, bnz),
                jnp.where(better, cmf, bm))

    return sph_chunk


_sph_chunk_trace = _make_sph_chunk_trace(False)


def _tri_mm(rows, cap):
    """MATMUL-form triangle candidate generation (div, beta/gamma/t
    numerators) for all C rows: one (4C, 10) @ (10, N) contraction over
    ray features [d, o x d, o, 1] — the constant-split Moller-Trumbore is
    affine in these (ops/intersect.py triangle_ts_matmul; ref
    interTriangle code.cl:250-288)."""
    ox, oy, oz, dx, dy, dz = cap[0:6]
    xx, xy_, xz_ = cap[10], cap[11], cap[12]
    shape = dx.shape
    C = rows.shape[0]
    feats = jnp.stack([dx, dy, dz, xx, xy_, xz_, ox, oy, oz,
                       jnp.ones(shape, rows.dtype)]).reshape(10, -1)
    ng = rows[:, 0:3]
    c1 = rows[:, 3:6]
    c2 = rows[:, 6:9]
    e1 = rows[:, 9:12]
    e2 = rows[:, 12:15]
    kk = rows[:, 15:16]
    Z3 = jnp.zeros((C, 3), rows.dtype)
    Z1 = jnp.zeros((C, 1), rows.dtype)
    A = jnp.concatenate([
        jnp.concatenate([ng, Z3, Z3, Z1], 1),        # div  = ng·d
        jnp.concatenate([-c2, e2, Z3, Z1], 1),       # beta num
        jnp.concatenate([c1, -e1, Z3, Z1], 1),       # gamma num
        jnp.concatenate([Z3, Z3, -ng, kk], 1),       # t num = k - ng·o
    ], 0)
    E = (A @ feats).reshape(4, C, *shape)
    return E[0], E[1], E[2], E[3]


def _make_tri_chunk_trace(two_sided, mm=False):
    def tri_chunk(carry, rows, cap):
        ox, oy, oz, dx, dy, dz, mint, maxt, a, inv2a, xx, xy_, xz_ = cap
        alive = mint != maxt
        bt, bnx, bny, bnz, bm = carry
        mf, msk = _col(rows, 16), _col(rows, 17)
        if mm:
            div, bnum, gnum, tnum = _tri_mm(rows, cap)
            side_ok = (div != 0.0) if two_sided else (div > 0.0)
            idiv = 1.0 / jnp.where(div == 0.0, 1.0, div)
            beta = bnum * idiv
            gamma = gnum * idiv
            t = tnum * idiv
        else:
            ngx, ngy, ngz = _col(rows, 0), _col(rows, 1), _col(rows, 2)
            c1x, c1y, c1z = _col(rows, 3), _col(rows, 4), _col(rows, 5)
            c2x, c2y, c2z = _col(rows, 6), _col(rows, 7), _col(rows, 8)
            e1x, e1y, e1z = _col(rows, 9), _col(rows, 10), _col(rows, 11)
            e2x, e2y, e2z = _col(rows, 12), _col(rows, 13), _col(rows, 14)
            kk = _col(rows, 15)
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
        t = jnp.where(okh, t, INF)
        alpha = 1.0 - beta - gamma
        hnx = alpha * _col(rows, 18) + beta * _col(rows, 21) \
            + gamma * _col(rows, 24)
        hny = alpha * _col(rows, 19) + beta * _col(rows, 22) \
            + gamma * _col(rows, 25)
        hnz = alpha * _col(rows, 20) + beta * _col(rows, 23) \
            + gamma * _col(rows, 26)
        hnx, hny, hnz = _normalize3(hnx, hny, hnz)
        tc, (cnx, cny, cnz, cmf) = _tree_champion(t, [hnx, hny, hnz, mf])
        better = tc < bt
        return (jnp.where(better, tc, bt),
                jnp.where(better, cnx, bnx),
                jnp.where(better, cny, bny),
                jnp.where(better, cnz, bnz),
                jnp.where(better, cmf, bm))

    return tri_chunk


def _tree_any(hit):
    """Static log2 tree OR-fold over axis 0 (f32 0/1)."""
    C = hit.shape[0]
    while C > 1:
        h = C // 2
        hit = jnp.maximum(hit[:h], hit[h:C])
        C = h
    return hit[0]


def _make_sph_chunk_occ(mm=False):
    def sph_chunk_occ(occ, rows, cap):
        ox, oy, oz, dx, dy, dz, mint, maxt, a, inv2a, _, _, _ = cap
        alive = mint != maxt
        r, msk = _col(rows, 3), _col(rows, 5)
        if mm:
            cd, co, c2r = _sph_mm(rows, cap)
            od = ox * dx + oy * dy + oz * dz
            oo = ox * ox + oy * oy + oz * oz
            b = 2.0 * (od - cd)
            cq = oo - 2.0 * co + c2r
        else:
            scx, scy, scz = _col(rows, 0), _col(rows, 1), _col(rows, 2)
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
        hit = hit & (dis >= 0.0) & (msk > 0.0) & alive
        return jnp.maximum(occ, _tree_any(jnp.where(hit, 1.0, 0.0)))

    return sph_chunk_occ


_sph_chunk_occ = _make_sph_chunk_occ(False)


def _make_tri_chunk_occ(two_sided, mm=False):
    def tri_chunk_occ(occ, rows, cap):
        ox, oy, oz, dx, dy, dz, mint, maxt, a, inv2a, xx, xy_, xz_ = cap
        alive = mint != maxt
        msk = _col(rows, 17)
        if mm:
            div, bnum, gnum, tnum = _tri_mm(rows, cap)
            side_ok = (div != 0.0) if two_sided else (div > 0.0)
            idiv = 1.0 / jnp.where(div == 0.0, 1.0, div)
            beta = bnum * idiv
            gamma = gnum * idiv
            t = tnum * idiv
        else:
            ngx, ngy, ngz = _col(rows, 0), _col(rows, 1), _col(rows, 2)
            c1x, c1y, c1z = _col(rows, 3), _col(rows, 4), _col(rows, 5)
            c2x, c2y, c2z = _col(rows, 6), _col(rows, 7), _col(rows, 8)
            e1x, e1y, e1z = _col(rows, 9), _col(rows, 10), _col(rows, 11)
            e2x, e2y, e2z = _col(rows, 12), _col(rows, 13), _col(rows, 14)
            kk = _col(rows, 15)
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
        return jnp.maximum(occ, _tree_any(jnp.where(okh, 1.0, 0.0)))

    return tri_chunk_occ


def _tile_program(par_s, sph, tri, mat, lig, pairs, ridf, in_range, *,
                  spp: int, width: int, bounces: int,
                  n_sph: int, n_tri: int, n_mat: int, n_lig: int,
                  two_sided: bool, normalize_emitter: bool,
                  russian_roulette: bool, rr_start_depth: int,
                  mode: str, tri_chunks=None, sph_chunks=None,
                  block: int = 0, diff_chunk: int = DIFF_CHUNK,
                  mm: bool = False,
                  trace_override=None, anyhit_override=None):
    """Accumulator DELTA for one ray tile as a pure function of the scene
    tables. Same math, same order as megakernel._render_pass_kernel (which
    cites the reference kernels line-by-line); differences are only
    (1) tables are jnp values, (2) AD-safe double-where guards around
    sqrt/divisions, (3) returns the delta instead of writing refs.

    par_s: list of NPAR scalar values (so the VJP yields per-scalar
    cotangents); pairs: list of (u0, u1) tiles consumed in order.
    ``tri_chunks``/``sph_chunks``: per-DIFF_CHUNK AABB tables (nc, >=6) of
    the Morton-sorted streamed tables (render/mega.tri_chunk_tables) —
    enables chunk culling in the large-table backward."""
    shape = ridf.shape
    draw_i = [0]

    def next_pair():
        p = pairs[draw_i[0]]
        draw_i[0] += 1
        return p

    def P(name, off=0):
        return par_s[MK._PAR[name] + off]

    eps = P("eps")
    ox, oy, oz, dx, dy, dz, mint, maxt, _ = _primary_rays(
        P, next_pair, ridf, in_range, spp=spp, width=width, block=block)

    inf2 = jnp.full(shape, INF)
    zero = jnp.zeros(shape)

    def safe_inv(d_):
        return 1.0 / jnp.where(d_ == 0.0, 1e-30, d_)

    def trace(ox, oy, oz, dx, dy, dz, mint, maxt):
        alive = mint != maxt
        a = dx * dx + dy * dy + dz * dz
        inv2a = 0.5 / a
        xx, xy_, xz_ = _cross(ox, oy, oz, dx, dy, dz)
        c = (inf2, zero, zero, zero, jnp.full(shape, -1.0))

        def chunk_overlap_trace(chk, ci, carry):
            """Tile-level chunk culling: does any ray's live [mint,
            min(maxt, champion)] window overlap chunk ci's AABB?
            (megakernel.chunk_overlap semantics; stop-gradient — culling
            is value-neutral, it only skips chunks that cannot hit.)
            Scalar reads only: chk may be an SMEM ref in-kernel."""
            bt = carry[0]
            near, far = MK._slab6(chk[ci, 0], chk[ci, 1], chk[ci, 2],
                                  chk[ci, 3], chk[ci, 4], chk[ci, 5],
                                  ox, oy, oz, safe_inv(dx), safe_inv(dy),
                                  safe_inv(dz))
            hi = jnp.minimum(maxt, bt)
            ov = (jnp.maximum(near, mint) <= jnp.minimum(far, hi)) & alive
            return jax.lax.stop_gradient(jnp.any(ov))

        caps = (ox, oy, oz, dx, dy, dz, mint, maxt, a, inv2a, xx, xy_, xz_)

        def sph_step(row, c, cap):
            ox, oy, oz, dx, dy, dz, mint, maxt, a, inv2a, _, _, _ = cap
            alive = mint != maxt
            bt, bnx, bny, bnz, bm = c
            scx, scy, scz = row[0], row[1], row[2]
            r, mf, msk = row[3], row[4], row[5]
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
            # scalar INF literal, NOT the inf2 closure array: step bodies
            # run inside cond branches whose jaxprs must be constvar-free
            t = jnp.where((tmn >= mint) & (tmn <= maxt), tmn,
                          jnp.where((tmx >= mint) & (tmx <= maxt), tmx, INF))
            t = jnp.where((dis >= 0.0) & (msk > 0.0) & alive, t, INF)
            better = t < bt
            ts = jnp.where(better, t, 0.0)
            hnx, hny, hnz = _normalize3(ox + ts * dx - scx,
                                        oy + ts * dy - scy,
                                        oz + ts * dz - scz)
            return (jnp.where(better, t, bt),
                    jnp.where(better, hnx, bnx),
                    jnp.where(better, hny, bny),
                    jnp.where(better, hnz, bnz),
                    jnp.where(better, mf, bm))

        def tri_step(row, c, cap):
            ox, oy, oz, dx, dy, dz, mint, maxt, a, inv2a, xx, xy_, xz_ = cap
            alive = mint != maxt
            bt, bnx, bny, bnz, bm = c
            ngx, ngy, ngz = row[0], row[1], row[2]
            c1x, c1y, c1z = row[3], row[4], row[5]
            c2x, c2y, c2z = row[6], row[7], row[8]
            e1x, e1y, e1z = row[9], row[10], row[11]
            e2x, e2y, e2z = row[12], row[13], row[14]
            kk, mf, msk = row[15], row[16], row[17]
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
            t = jnp.where(okh, t, INF)   # scalar literal (constvar-free)
            better = t < bt
            alpha = 1.0 - beta - gamma
            hnx = alpha * row[18] + beta * row[21] + gamma * row[24]
            hny = alpha * row[19] + beta * row[22] + gamma * row[25]
            hnz = alpha * row[20] + beta * row[23] + gamma * row[26]
            hnx, hny, hnz = _normalize3(hnx, hny, hnz)
            return (jnp.where(better, t, bt),
                    jnp.where(better, hnx, bnx),
                    jnp.where(better, hny, bny),
                    jnp.where(better, hnz, bnz),
                    jnp.where(better, mf, bm))

        sph_w = (sph_chunks, chunk_overlap_trace) \
            if sph_chunks is not None else None
        tri_w = (tri_chunks, chunk_overlap_trace) \
            if tri_chunks is not None else None
        c = _loop_diff(sph, n_sph, sph_step, c, windows=sph_w,
                       captures=caps,
                       chunk_fn=_make_sph_chunk_trace(mm),
                       chunk=diff_chunk)
        c = _loop_diff(tri, n_tri, tri_step, c, windows=tri_w,
                       captures=caps,
                       chunk_fn=_make_tri_chunk_trace(two_sided, mm),
                       chunk=diff_chunk)

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
        # occlusion carry is f32 0/1 so the chunked-scan path has a
        # uniform carry dtype (matches the forward kernel's convention)
        occ = jnp.zeros(shape)

        def chunk_overlap_occ(chk, ci, occ):
            near, far = MK._slab6(chk[ci, 0], chk[ci, 1], chk[ci, 2],
                                  chk[ci, 3], chk[ci, 4], chk[ci, 5],
                                  ox, oy, oz, safe_inv(dx), safe_inv(dy),
                                  safe_inv(dz))
            ov = (jnp.maximum(near, mint) <= jnp.minimum(far, maxt)) \
                & alive & (occ == 0.0)
            return jax.lax.stop_gradient(jnp.any(ov))

        caps = (ox, oy, oz, dx, dy, dz, mint, maxt, a, inv2a, xx, xy_, xz_)

        def sph_occ(row, occ, cap):
            ox, oy, oz, dx, dy, dz, mint, maxt, a, inv2a, _, _, _ = cap
            alive = mint != maxt
            scx, scy, scz = row[0], row[1], row[2]
            r, msk = row[3], row[5]
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
            return jnp.where(hit & (dis >= 0.0) & (msk > 0.0) & alive,
                             1.0, occ)

        def tri_occ(row, occ, cap):
            ox, oy, oz, dx, dy, dz, mint, maxt, a, inv2a, xx, xy_, xz_ = cap
            alive = mint != maxt
            ngx, ngy, ngz = row[0], row[1], row[2]
            c1x, c1y, c1z = row[3], row[4], row[5]
            c2x, c2y, c2z = row[6], row[7], row[8]
            e1x, e1y, e1z = row[9], row[10], row[11]
            e2x, e2y, e2z = row[12], row[13], row[14]
            kk, msk = row[15], row[17]
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
            return jnp.where(okh, 1.0, occ)

        sph_w = (sph_chunks, chunk_overlap_occ) \
            if sph_chunks is not None else None
        tri_w = (tri_chunks, chunk_overlap_occ) \
            if tri_chunks is not None else None
        occ = _loop_diff(sph, n_sph, sph_occ, occ, windows=sph_w,
                         captures=caps,
                         chunk_fn=_make_sph_chunk_occ(mm),
                         chunk=diff_chunk)
        occ = _loop_diff(tri, n_tri, tri_occ, occ, windows=tri_w,
                         captures=caps,
                         chunk_fn=_make_tri_chunk_occ(two_sided, mm),
                         chunk=diff_chunk)
        return occ > 0.0

    if trace_override is not None:
        # champion-resolution route (_tile_program_champ): trace/anyhit
        # consume the forward's recorded champion rows / occlusion bits
        # instead of sweeping the object tables
        trace = trace_override
        anyhit = anyhit_override

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
# CHAMPION (cell-marching) tile program — backward without object sweeps
# ---------------------------------------------------------------------------

def _champ_surface(rid, svals, tvals, n_sph, n_tri,
                   ox, oy, oz, dx, dy, dz, mint, maxt):
    """Champion surface from GATHERED row-value planes: re-derives
    (t, hit point, normal, mat) with the forward kernel's exact formulas.
    ``svals``: list of 6 planes [cx, cy, cz, r, mat, mask] (or None);
    ``tvals``: list of 27 planes (packed tri row cols 0..26) (or None).
    Shared by the value-level champion program (native gather) and the
    Pallas champion kernel (masked one-hot gather)."""
    shape = rid.shape
    found = rid >= 0.0
    nx = ny = nz = jnp.zeros(shape)
    t_sel = jnp.zeros(shape)
    matf = jnp.full(shape, -1.0)
    if n_sph:
        is_s = found & (rid < float(n_sph))
        scx, scy, scz, r, smf = svals[0], svals[1], svals[2], svals[3], \
            svals[4]
        # the kernel's sph_body quadratic, verbatim (root select under
        # the same [mint, maxt] window the champion loop used)
        a = dx * dx + dy * dy + dz * dz
        inv2a = 0.5 / a
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
        t_s = jnp.where((tmn >= mint) & (tmn <= maxt), tmn, tmx)
        ts_s = jnp.where(is_s, t_s, 0.0)
        snx, sny, snz = _normalize3(ox + ts_s * dx - scx,
                                    oy + ts_s * dy - scy,
                                    oz + ts_s * dz - scz)
        t_sel = jnp.where(is_s, t_s, t_sel)
        nx = jnp.where(is_s, snx, nx)
        ny = jnp.where(is_s, sny, ny)
        nz = jnp.where(is_s, snz, nz)
        matf = jnp.where(is_s, smf, matf)
    if n_tri:
        is_t = found & (rid >= float(n_sph))
        tv = tvals
        ngx, ngy, ngz = tv[0], tv[1], tv[2]
        c1x, c1y, c1z = tv[3], tv[4], tv[5]
        c2x, c2y, c2z = tv[6], tv[7], tv[8]
        e1x, e1y, e1z = tv[9], tv[10], tv[11]
        e2x, e2y, e2z = tv[12], tv[13], tv[14]
        kk, tmf = tv[15], tv[16]
        xx, xy_, xz_ = _cross(ox, oy, oz, dx, dy, dz)
        div = ngx * dx + ngy * dy + ngz * dz
        idiv = 1.0 / jnp.where(div == 0.0, 1.0, div)
        beta = (e2x * xx + e2y * xy_ + e2z * xz_
                - (c2x * dx + c2y * dy + c2z * dz)) * idiv
        gamma = ((c1x * dx + c1y * dy + c1z * dz)
                 - (e1x * xx + e1y * xy_ + e1z * xz_)) * idiv
        t_t = (kk - (ngx * ox + ngy * oy + ngz * oz)) * idiv
        alpha = 1.0 - beta - gamma
        tnx = alpha * tv[18] + beta * tv[21] + gamma * tv[24]
        tny = alpha * tv[19] + beta * tv[22] + gamma * tv[25]
        tnz = alpha * tv[20] + beta * tv[23] + gamma * tv[26]
        tnx, tny, tnz = _normalize3(tnx, tny, tnz)
        t_sel = jnp.where(is_t, t_t, t_sel)
        nx = jnp.where(is_t, tnx, nx)
        ny = jnp.where(is_t, tny, ny)
        nz = jnp.where(is_t, tnz, nz)
        matf = jnp.where(is_t, tmf, matf)
    ts = jnp.where(found, t_sel, 0.0)
    hpx = ox + ts * dx
    hpy = oy + ts * dy
    hpz = oz + ts * dz
    new_maxt = jnp.where(found, t_sel, maxt)
    return new_maxt, (hpx, hpy, hpz,
                      jnp.where(found, nx, 0.0),
                      jnp.where(found, ny, 0.0),
                      jnp.where(found, nz, 0.0),
                      jnp.where(found, matf, -1.0))

def _tile_program_champ(par_s, sph, tri, mat, lig, ids, occs, pairs, ridf,
                        in_range, *, spp: int, width: int, bounces: int,
                        n_sph: int, n_tri: int, n_mat: int, n_lig: int,
                        two_sided: bool, normalize_emitter: bool,
                        russian_roulette: bool, rr_start_depth: int,
                        mode: str, block: int = 0):
    """The Assign10 schedule as a function of the FORWARD'S RECORDED
    champions (the "cell" backward, round-5 VERDICT item 1).

    The hard program's gradient flows only through each trace segment's
    champion row (AD through the ``jnp.where`` champion merge) and not at
    all through occlusion tests (step functions). So once the forward
    megakernel — which already marches grid cells front-to-back with
    tile-level early exit at full speed (ref DDA code.cl:675-800) — has
    recorded each segment's champion DIFF-table row id and each NEE
    occlusion bit (megakernel.pathtrace_pass_pallas ``record=True``), the
    backward needs NO object sweep: this program GATHERS the champion
    rows (``sph[sid]``/``tri[tid]``), re-derives the champion surface
    analytically with the kernel's exact formulas, and runs the shading
    chain on it. ``jax.vjp`` through the gather scatter-adds the row
    cotangents back onto the diff tables — identical cotangents to the
    sweep-based ``_tile_program`` a.e., at O(rays) instead of
    O(rays x visited rows) cost.

    ``ids``: list of (S, L) planes, one per trace segment in schedule
    order (-1 miss; spheres in [0, n_sph), triangles offset by n_sph).
    ``occs``: list of (S, L) 0/1 planes, one per NEE occlusion in
    schedule order."""
    shape = ridf.shape
    seg_i = [0]
    occ_i = [0]
    # gathers only read the geometry columns; slicing before the gather
    # keeps the (S, L, F) gathered planes minimal (streamed tables are
    # padded to 128 DMA lanes). AD through the slice zero-pads the
    # cotangent back to the full table shape.
    sph_u = sph[:, 0:6] if n_sph else sph
    tri_u = tri[:, 0:27] if n_tri else tri

    def gather_vals(rid):
        """(svals, tvals) champion-row value planes by native gather (the
        AD transpose of this is the scatter-add back onto the tables)."""
        svals = tvals = None
        if n_sph:
            sid = jnp.clip(rid, 0.0, float(n_sph - 1)).astype(jnp.int32)
            sv = sph_u[sid]
            svals = [sv[..., k] for k in range(6)]
        if n_tri:
            tid = jnp.clip(rid - float(n_sph), 0.0,
                           float(n_tri - 1)).astype(jnp.int32)
            tv = tri_u[tid]
            tvals = [tv[..., k] for k in range(27)]
        return svals, tvals

    def trace_impl(ox, oy, oz, dx, dy, dz, mint, maxt):
        rid = ids[seg_i[0]]
        seg_i[0] += 1
        svals, tvals = gather_vals(rid)
        return _champ_surface(rid, svals, tvals, n_sph, n_tri,
                              ox, oy, oz, dx, dy, dz, mint, maxt)

    def anyhit_impl(ox, oy, oz, dx, dy, dz, mint, maxt):
        o = occs[occ_i[0]]
        occ_i[0] += 1
        return o > 0.5

    return _tile_program(par_s, sph, tri, mat, lig, pairs, ridf, in_range,
                         spp=spp, width=width, bounces=bounces,
                         n_sph=n_sph, n_tri=n_tri, n_mat=n_mat,
                         n_lig=n_lig, two_sided=two_sided,
                         normalize_emitter=normalize_emitter,
                         russian_roulette=russian_roulette,
                         rr_start_depth=rr_start_depth, mode=mode,
                         block=block, trace_override=trace_impl,
                         anyhit_override=anyhit_impl)


def _bwd_champion(par, ipar, sph, tri, mat, lig, g, u_planes, ids, occs, *,
                  spp, width, bounces, two_sided, normalize_emitter,
                  seed, mode, russian_roulette, rr_start_depth,
                  diff_wrt=DIFF_ALL, block=0):
    """Value-level cotangents via the champion program: jax.vjp of
    _tile_program_champ over the whole padded ray set as one tile. The
    graph is SHALLOW (no cond-chunk recursion — the round-4 oracle
    backward segfaulted XLA's CPU compiler on deep cond-transpose
    graphs) and sweep-free: gathers + shading chain + scatter-adds."""
    assert u_planes is not None, \
        "the champion backward replays draws from u_planes"
    R = g.shape[0]
    P = -(-R // LANES) * LANES
    shape = (P // LANES, LANES)
    g_planes = tuple(_pad_plane(g[:, c], P) for c in range(3))
    u3 = jnp.stack([_pad_plane(u_planes[j], P)
                    for j in range(u_planes.shape[0])])
    # pad rid slots with -1 (miss), not 0 (= "sphere row 0 found")
    ids_p = [_pad_plane(ids[k] + 1.0, P) - 1.0
             for k in range(ids.shape[0])]
    occs_p = [_pad_plane(occs[k], P) for k in range(occs.shape[0])]

    def nonempty(t):
        return t if t.shape[0] else jnp.zeros((1,) + t.shape[1:], t.dtype)

    sph_n, tri_n, mat_n, lig_n = map(nonempty, (sph, tri, mat, lig))
    pairs = _materialize_draws(u3, shape, spp=spp, n_lig=lig.shape[0],
                               bounces=bounces, rr=russian_roulette,
                               mode=mode)
    rid_ = (jax.lax.broadcasted_iota(jnp.int32, shape, 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, shape, 1))
    in_range = rid_ < R
    ridf = (rid_ + ipar[1]).astype(jnp.float32)

    vals = dict(par=[par[i] for i in range(NPAR)], sph=sph_n, tri=tri_n,
                mat=mat_n, lig=lig_n)
    sel = [n for n in DIFF_ALL if n in diff_wrt]

    def f(*sel_args):
        v = dict(vals)
        v.update(dict(zip(sel, sel_args)))
        return _tile_program_champ(
            v["par"], v["sph"], v["tri"], v["mat"], v["lig"],
            ids_p, occs_p, pairs, ridf, in_range,
            spp=spp, width=width, bounces=bounces,
            n_sph=sph.shape[0], n_tri=tri.shape[0],
            n_mat=mat.shape[0], n_lig=lig.shape[0],
            two_sided=two_sided, normalize_emitter=normalize_emitter,
            russian_roulette=russian_roulette,
            rr_start_depth=rr_start_depth, mode=mode, block=block)

    _, vjp_fn = jax.vjp(f, *[vals[n] for n in sel])
    cot = dict(zip(sel, vjp_fn(g_planes)))
    dpar_l = cot.get("par", [jnp.float32(0.0)] * NPAR)
    return (jnp.stack(dpar_l),
            cot.get("sph", jnp.zeros_like(sph_n)),
            cot.get("tri", jnp.zeros_like(tri_n)),
            cot.get("mat", jnp.zeros_like(mat_n)),
            cot.get("lig", jnp.zeros_like(lig_n)))


# rows per champion chunk in the Pallas champion backward: the one-hot
# gather/scatter matmuls are (32, rays) x (rays, cols) MXU contractions
CHAMP_CHUNK = 32


def _bwd_champ_kernel(ipar, par, sph, tri, mat, lig, ids_ref, *rest,
                      n_rays: int, spp: int, width: int, bounces: int,
                      n_sph: int, n_tri: int, n_mat: int, n_lig: int,
                      two_sided: bool, normalize_emitter: bool,
                      use_u: bool, seed: int, mode: str,
                      russian_roulette: bool, rr_start_depth: int,
                      diff_wrt: tuple, bwd_sublanes: int, block: int,
                      n_seg: int, n_occ: int,
                      sph_pad: int, tri_pad: int):
    """The CELL-MARCHING backward as ONE Pallas kernel (round-5 VERDICT
    item 1): per ray tile,

      1. replay the forward's draws (on-core PRNG re-seeded with the same
         (seed, pass, shard, tile) counters, or the u-planes tensor);
      2. GATHER each trace segment's champion row values from the diff
         tables with one-hot MXU matmuls over the tile's champion-chunk
         range (champions cluster: blocked pixel tiles see few chunks);
      3. run ``jax.vjp`` of the champion shading program (_champ_surface
         + the _tile_program shading chain — NO object sweeps; occlusion
         bits are recorded constants);
      4. SCATTER the row cotangents back with the transposed one-hot
         matmuls, accumulating into whole-table outputs across the grid.

    ``n_sph``/``n_tri`` are the UNPADDED diff-table row counts (the
    champion id space); ``sph_pad``/``tri_pad`` the padded table rows."""
    rest = list(rest)
    occ_ref = rest.pop(0) if n_occ else None
    u_ref = rest.pop(0) if use_u else None
    g_refs = rest[0:3]
    dpar_ref, dsph_ref, dtri_ref, dmat_ref, dlig_ref = rest[3:8]

    S_B = bwd_sublanes
    shape = (S_B, LANES)
    Rt = S_B * LANES
    pid = pl.program_id(0)
    roff = ipar[1]
    if not use_u:
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
        q = pid % (SUBLANES // S_B)

        def pick(u):
            out = jnp.zeros((S_B, LANES), u.dtype)
            for r in range(SUBLANES // S_B):
                out = jnp.where(q == r, u[r * S_B:(r + 1) * S_B, :], out)
            return out

        pairs = [tuple(pick(u) for u in p) for p in pairs]

    rid_ = ((pid * S_B
             + jax.lax.broadcasted_iota(jnp.int32, shape, 0)) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, shape, 1))
    in_range = rid_ < n_rays
    ridf = (rid_ + roff).astype(jnp.float32)

    ids = [ids_ref[k] for k in range(n_seg)]
    occs = [occ_ref[k] for k in range(n_occ)]

    def flat(x):
        return x.reshape(1, Rt)

    def unflat(x):
        return x.reshape(S_B, LANES)

    def onehot(ridc, lo):
        """(CHAMP_CHUNK, Rt) one-hot: M[j, r] = (ridc[r] == lo + j)."""
        rf = flat(ridc) - lo.astype(jnp.float32)
        jrow = jax.lax.broadcasted_iota(
            jnp.int32, (CHAMP_CHUNK, Rt), 0).astype(jnp.float32)
        return jnp.where(jrow == rf, 1.0, 0.0)

    def chunk_bounds(ridc, n_rows, n_pad):
        """Champion-chunk index range [c0, c1) covering this tile's valid
        ids in [0, n_rows) — champions cluster, so the range is tight."""
        valid = (ridc >= 0.0) & (ridc < float(n_rows))
        anyv = jnp.any(valid)
        mn = jnp.min(jnp.where(valid, ridc, jnp.float32(3e38)))
        mx = jnp.max(jnp.where(valid, ridc, jnp.float32(-1.0)))
        c0 = jnp.clip(jnp.floor(mn / CHAMP_CHUNK), 0.0,
                      float(n_pad // CHAMP_CHUNK)).astype(jnp.int32)
        c1 = jnp.clip(jnp.floor(mx / CHAMP_CHUNK) + 1.0, 0.0,
                      float(n_pad // CHAMP_CHUNK)).astype(jnp.int32)
        return jnp.where(anyv, c0, jnp.int32(0)), \
            jnp.where(anyv, c1, jnp.int32(0))

    HI = jax.lax.Precision.HIGHEST

    def gather_tab(ridc, tab_ref, n_rows, n_pad, F):
        """(F, Rt) champion-row values: sum over champion chunks of
        tab_chunk^T @ one-hot — each ray column receives exactly its
        champion's row (one-hot x bf16x6-pass = f32-exact)."""
        c0, c1 = chunk_bounds(ridc, n_rows, n_pad)

        def body(ci, acc):
            lo = ci * CHAMP_CHUNK
            M = onehot(ridc, lo)
            tabc = tab_ref[pl.ds(lo, CHAMP_CHUNK), :]
            G = jax.lax.dot_general(
                tabc, M, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=HI)
            return acc + G

        return jax.lax.fori_loop(c0, c1, body, jnp.zeros((F, Rt)))

    def scatter_tab(ridc, d_planes, dref, n_rows, n_pad):
        """Accumulate per-ray cotangent planes onto diff-table rows:
        one-hot @ D^T per champion chunk (MXU), += into the whole-table
        output ref."""
        F = dref.shape[1]
        D = jnp.concatenate(
            [flat(p) for p in d_planes]
            + [jnp.zeros((F - len(d_planes), Rt))] * (
                1 if F > len(d_planes) else 0), axis=0)
        c0, c1 = chunk_bounds(ridc, n_rows, n_pad)

        def body(ci, _):
            lo = ci * CHAMP_CHUNK
            M = onehot(ridc, lo)
            C = jax.lax.dot_general(
                M, D, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=HI)
            cur = dref[pl.ds(lo, CHAMP_CHUNK), :]
            dref[pl.ds(lo, CHAMP_CHUNK), :] = cur + C
            return 0

        jax.lax.fori_loop(c0, c1, body, 0)

    # ---- phase A: gather champion rows for every trace segment ---------
    seg_vals = []
    for s in range(n_seg):
        rid = ids[s]
        sv = tv = None
        if n_sph:
            G = gather_tab(rid, sph, n_sph, sph_pad, sph.shape[1])
            sv = [unflat(G[k:k + 1, :]) for k in range(6)]
        if n_tri:
            G = gather_tab(rid - float(n_sph), tri, n_tri, tri_pad,
                           tri.shape[1])
            tv = [unflat(G[k:k + 1, :]) for k in range(27)]
        seg_vals.append((sv, tv))

    # ---- phase B: vjp of the champion shading program ------------------
    par_list = [par[i] for i in range(NPAR)]
    mat_v = mat[:]
    lig_v = lig[:]
    want_geo = ("sph" in diff_wrt and n_sph) or \
        ("tri" in diff_wrt and n_tri)
    vals = dict(par=par_list, mat=mat_v, lig=lig_v, vals=seg_vals)
    sel = [n for n in ("par", "mat", "lig") if n in diff_wrt]
    if want_geo:
        sel.append("vals")
    dummy = jnp.zeros((1, 8))

    def f(*sel_args):
        v = dict(vals)
        v.update(dict(zip(sel, sel_args)))
        seg_i = [0]
        occ_i = [0]

        def trace_impl(ox, oy, oz, dx, dy, dz, mint, maxt):
            svt = v["vals"][seg_i[0]]
            rid = ids[seg_i[0]]
            seg_i[0] += 1
            return _champ_surface(rid, svt[0], svt[1], n_sph, n_tri,
                                  ox, oy, oz, dx, dy, dz, mint, maxt)

        def anyhit_impl(ox, oy, oz, dx, dy, dz, mint, maxt):
            o = occs[occ_i[0]]
            occ_i[0] += 1
            return o > 0.5

        return _tile_program(
            v["par"], dummy, dummy, v["mat"], v["lig"], pairs, ridf,
            in_range, spp=spp, width=width, bounces=bounces,
            n_sph=0, n_tri=0, n_mat=n_mat, n_lig=n_lig,
            two_sided=two_sided, normalize_emitter=normalize_emitter,
            russian_roulette=russian_roulette,
            rr_start_depth=rr_start_depth, mode=mode, block=block,
            trace_override=trace_impl, anyhit_override=anyhit_impl)

    _, vjp_fn = jax.vjp(f, *[vals[n] for n in sel])
    g = tuple(ref[:] for ref in g_refs)
    cot = dict(zip(sel, vjp_fn(g)))
    dpar_l = cot.get("par", [jnp.float32(0.0)] * NPAR)
    dmat = cot.get("mat", jnp.zeros_like(mat_v))
    dlig = cot.get("lig", jnp.zeros_like(lig_v))

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
    dmat_ref[:] += dmat
    dlig_ref[:] += dlig

    # ---- phase C: scatter row cotangents back onto the diff tables -----
    if want_geo:
        d_seg = cot["vals"]
        for s in range(n_seg):
            dsv, dtv = d_seg[s]
            rid = ids[s]
            if n_sph and "sph" in diff_wrt:
                scatter_tab(rid, dsv, dsph_ref, n_sph, sph_pad)
            if n_tri and "tri" in diff_wrt:
                scatter_tab(rid - float(n_sph), dtv, dtri_ref, n_tri,
                            tri_pad)


def _bwd_champ_pallas(par, ipar, sph, tri, mat, lig, g, u_planes, ids,
                      occs, *, spp, width, bounces, two_sided,
                      normalize_emitter, seed, mode, russian_roulette,
                      rr_start_depth, diff_wrt=DIFF_ALL,
                      bwd_sublanes=SUBLANES, block=0, interpret=False):
    """Host wrapper for the Pallas champion backward. Same contract as
    _bwd_champion (value level); tables ride whole in VMEM, row counts
    padded to CHAMP_CHUNK; geometry columns sliced to the packed widths
    (8 sphere / 32 triangle) before the kernel and the cotangent
    zero-padded back after."""
    R = g.shape[0]
    P = -(-R // TILE) * TILE
    n_tiles = P // (bwd_sublanes * LANES)
    g_planes = [_pad_plane(g[:, c], P) for c in range(3)]

    n_sph = sph.shape[0]
    n_tri = tri.shape[0]
    n_seg = ids.shape[0]
    n_occ = occs.shape[0]

    def prep(t, F):
        t2 = t[:, :F]
        pad = -(-max(t.shape[0], 1) // CHAMP_CHUNK) * CHAMP_CHUNK
        if pad != t2.shape[0]:
            t2 = jnp.concatenate(
                [t2, jnp.zeros((pad - t2.shape[0], F), t.dtype)])
        return t2.astype(jnp.float32)

    sph_p = prep(sph if n_sph else jnp.zeros((1, 8)), 8)
    tri_p = prep(tri if n_tri else jnp.zeros((1, 32)), 32)

    kw = dict(n_rays=R, spp=spp, width=width, bounces=bounces,
              n_sph=n_sph, n_tri=n_tri, n_mat=max(mat.shape[0], 1),
              n_lig=lig.shape[0], two_sided=two_sided,
              normalize_emitter=normalize_emitter,
              use_u=u_planes is not None, seed=seed, mode=mode,
              russian_roulette=russian_roulette,
              rr_start_depth=rr_start_depth, diff_wrt=tuple(diff_wrt),
              bwd_sublanes=bwd_sublanes, block=block,
              n_seg=n_seg, n_occ=n_occ,
              sph_pad=sph_p.shape[0], tri_pad=tri_p.shape[0])

    def nonempty(t):
        return t if t.shape[0] else jnp.zeros((1,) + t.shape[1:], t.dtype)

    mat_n, lig_n = map(nonempty, (mat, lig))
    ray_block = pl.BlockSpec((bwd_sublanes, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    def planes3(x, n):
        st = jnp.stack([_pad_plane(x[k], P) for k in range(n)])
        spec = pl.BlockSpec((n, bwd_sublanes, LANES), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
        return st, spec

    # pad rid slots with -1 (miss), not 0 (= "sphere row 0 found")
    ids3, ids_spec = planes3(ids + 1.0, n_seg)
    ids3 = ids3 - 1.0
    in_specs = [smem, smem, vmem, vmem, vmem, vmem, ids_spec]
    args = [ipar, par, sph_p, tri_p, mat_n, lig_n, ids3]
    if n_occ:
        occ3, occ_spec = planes3(occs, n_occ)
        in_specs.append(occ_spec)
        args.append(occ3)
    if u_planes is not None:
        D2 = u_planes.shape[0]
        u3, u_spec = planes3(u_planes, D2)
        in_specs.append(u_spec)
        args.append(u3)
    in_specs += [ray_block] * 3
    args += g_planes

    def acc_spec(shp):
        return pl.BlockSpec(shp, lambda i: (0,) * len(shp),
                            memory_space=pltpu.VMEM)

    out_shape = (
        jax.ShapeDtypeStruct((NPAR,), jnp.float32),
        jax.ShapeDtypeStruct(sph_p.shape, jnp.float32),
        jax.ShapeDtypeStruct(tri_p.shape, jnp.float32),
        jax.ShapeDtypeStruct(mat_n.shape, jnp.float32),
        jax.ShapeDtypeStruct(lig_n.shape, jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((NPAR,), lambda i: (0,), memory_space=pltpu.SMEM),
        acc_spec(sph_p.shape), acc_spec(tri_p.shape),
        acc_spec(mat_n.shape), acc_spec(lig_n.shape),
    )
    dpar, dsph_p, dtri_p, dmat, dlig = pl.pallas_call(
        functools.partial(_bwd_champ_kernel, **kw),
        out_shape=out_shape,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=114 * 1024 * 1024),
    )(*args)

    def restore(d_p, t):
        if t.shape[0] == 0:
            return jnp.zeros_like(t)
        d = d_p[:t.shape[0]]
        if t.shape[1] > d.shape[1]:
            d = jnp.concatenate(
                [d, jnp.zeros((d.shape[0], t.shape[1] - d.shape[1]))], -1)
        return d

    return (dpar, restore(dsph_p, sph), restore(dtri_p, tri),
            dmat[:mat.shape[0]] if mat.shape[0] else jnp.zeros_like(mat),
            dlig[:lig.shape[0]] if lig.shape[0] else jnp.zeros_like(lig))


# ---------------------------------------------------------------------------
# SOFT (edge-aware) tile program — the reparameterized twin of _tile_program
# ---------------------------------------------------------------------------

def _tile_program_soft(par_s, sph, tri, mat, lig, pairs, ridf, in_range, *,
                       spp: int, width: int, bounces: int,
                       n_sph: int, n_tri: int, n_mat: int, n_lig: int,
                       two_sided: bool, normalize_emitter: bool,
                       russian_roulette: bool, rr_start_depth: int,
                       mode: str, bandwidth: float, tau: float,
                       block: int = 0, vec: bool = False):
    """Edge-aware accumulator delta for one ray tile: the Assign10
    schedule with every visibility decision SMOOTHED (diff/soft.py
    semantics, restructured to the kernel's value-based tables and draw
    order so it can run as the megakernel VJP's backward program):

      * per-object coverage = sigmoid of the silhouette coordinate
        (spheres: quadratic discriminant; triangles: barycentric margin);
      * closest hit = softmin-depth blend of all hypotheses into ONE
        surface point/normal/albedo per ray — O(N) per bounce, not the
        O(N^2) all-pairs shading of diff/soft.py's direct pipeline;
      * NEE occlusion = product of per-occluder soft transmittances;
      * emitter hits = sigmoid disk coverage x soft depth race; paths
        survive with weight (1 - emitter_weight);
      * path aliveness = running product of per-depth coverages.

    Consumes draw pairs in EXACTLY the forward kernel's order (lens, NEE
    per light, then per depth: [rr], bounce, NEE per light), so the same
    replayed uniforms drive both programs. As bandwidth, tau -> 0 the
    value converges to the hard program's (tested); gradients exist
    everywhere, including silhouettes and shadow boundaries. Russian
    roulette stays HARD (it is a variance-reduction choice on replayed
    draws, not a geometric discontinuity).

    Ref: the same kernels _tile_program cites (code.js:1806-1854 schedule);
    this is the BASELINE.json north-star "reparameterized/edge-aware
    sampling" wired into the production path."""
    shape = ridf.shape
    draw_i = [0]

    def next_pair():
        p = pairs[draw_i[0]]
        draw_i[0] += 1
        return p

    def P(name, off=0):
        return par_s[MK._PAR[name] + off]

    eps = P("eps")
    bw = jnp.float32(bandwidth)
    ox, oy, oz, dx, dy, dz, mint, maxt, ok = _primary_rays(
        P, next_pair, ridf, in_range, spp=spp, width=width, block=block)

    zero = jnp.zeros(shape)

    # NOTE: every helper below takes its table as an EXPLICIT argument —
    # the chunked soft path wraps chunks in custom_vjp checkpoints, and a
    # custom_vjp cannot differentiate closed-over tracers (the tables are
    # differentiable); they thread through the checkpoint captures.
    def mat_rgb(mat, mf):
        """materials[mat_id].rgb for a SCALAR per-object mat id."""
        ar = jnp.float32(0.0)
        ag = jnp.float32(0.0)
        ab = jnp.float32(0.0)
        for m in range(n_mat):
            sel = mf == float(m)
            ar = jnp.where(sel, mat[m, 0], ar)
            ag = jnp.where(sel, mat[m, 1], ag)
            ab = jnp.where(sel, mat[m, 2], ab)
        return ar, ag, ab

    def sphere_hyp(sph, i, ox, oy, oz, dx, dy, dz, mint):
        """Soft coverage + depth for sphere i (a=1 convention of
        diff/soft.py _soft_sphere_hits; rays are normalized)."""
        scx, scy, scz = sph[i, 0], sph[i, 1], sph[i, 2]
        r, mf, msk = sph[i, 3], sph[i, 4], sph[i, 5]
        mx = ox - scx
        my = oy - scy
        mz = oz - scz
        b = mx * dx + my * dy + mz * dz
        cq = mx * mx + my * my + mz * mz - r * r
        dis = b * b - cq
        alpha = jax.nn.sigmoid(dis / bw) * jnp.where(msk > 0.0, 1.0, 0.0)
        t = -b - _safe_sqrt(dis)
        alpha = alpha * jax.nn.sigmoid((t - mint) / bw)
        return alpha, t, mf

    def sphere_geo(sph, i, t, ox, oy, oz, dx, dy, dz):
        scx, scy, scz = sph[i, 0], sph[i, 1], sph[i, 2]
        px = ox + t * dx
        py = oy + t * dy
        pz = oz + t * dz
        nx, ny, nz = _normalize3(px - scx, py - scy, pz - scz)
        return (px, py, pz), (nx, ny, nz)

    def tri_hyp(tri, i, ox, oy, oz, dx, dy, dz, mint, xx, xy_, xz_):
        """Soft coverage + depth + barycentrics for triangle i (sigmoid of
        the barycentric margin, diff/soft.py _soft_triangle_hits on the
        kernel's constant-split Moller-Trumbore rows)."""
        ngx, ngy, ngz = tri[i, 0], tri[i, 1], tri[i, 2]
        c1x, c1y, c1z = tri[i, 3], tri[i, 4], tri[i, 5]
        c2x, c2y, c2z = tri[i, 6], tri[i, 7], tri[i, 8]
        e1x, e1y, e1z = tri[i, 9], tri[i, 10], tri[i, 11]
        e2x, e2y, e2z = tri[i, 12], tri[i, 13], tri[i, 14]
        kk, mf, msk = tri[i, 15], tri[i, 16], tri[i, 17]
        div = ngx * dx + ngy * dy + ngz * dz
        side_ok = (div != 0.0) if two_sided else (div > 0.0)
        # double-where: near-parallel planes give astronomic t whose
        # products with ~0 weights would NaN the backward
        idiv = 1.0 / jnp.where(div == 0.0, 1.0, div)
        beta = (e2x * xx + e2y * xy_ + e2z * xz_
                - (c2x * dx + c2y * dy + c2z * dz)) * idiv
        gamma = ((c1x * dx + c1y * dy + c1z * dz)
                 - (e1x * xx + e1y * xy_ + e1z * xz_)) * idiv
        t_raw = (kk - (ngx * ox + ngy * oy + ngz * oz)) * idiv
        t = jnp.where(side_ok, t_raw, 1e6)
        margin = jnp.minimum(jnp.minimum(beta, gamma), 1.0 - beta - gamma)
        alpha = jax.nn.sigmoid(margin / bw) \
            * jnp.where(msk > 0.0, 1.0, 0.0) * side_ok
        alpha = alpha * jax.nn.sigmoid((t - mint) / bw)
        return alpha, t, beta, gamma, mf

    def tri_geo(tri, i, t, beta, gamma, ox, oy, oz, dx, dy, dz):
        px = ox + t * dx
        py = oy + t * dy
        pz = oz + t * dz
        al = jnp.clip(1.0 - beta - gamma, 0.0, 1.0)
        be = jnp.clip(beta, 0.0, 1.0)
        ga = jnp.clip(gamma, 0.0, 1.0)
        nx = al * tri[i, 18] + be * tri[i, 21] + ga * tri[i, 24]
        ny = al * tri[i, 19] + be * tri[i, 22] + ga * tri[i, 25]
        nz = al * tri[i, 20] + be * tri[i, 23] + ga * tri[i, 26]
        nx, ny, nz = _normalize3(nx, ny, nz)
        return (px, py, pz), (nx, ny, nz)

    # -- vectorized (value-level) row-chunk forms ---------------------------
    # Same math as the scalar helpers above with the chunk's rows STACKED on
    # a leading axis, so a chunk is O(1) jaxpr primitives instead of O(C)
    # (and the pairwise composite O(1) instead of O(C^2) via lax.scan).
    # Only the value-level route sets ``vec`` — XLA compile time of the
    # chunked soft backward was exploding past the unroll budget (round 4);
    # inside the Pallas kernel tables are SMEM refs read scalar-wise and the
    # unrolled form stands.
    def _rows(tab, lo, hi, k):
        return tab[lo:hi, k].reshape((hi - lo,) + (1,) * len(shape))

    def sphere_hyp_vec(sph, lo, hi, ox, oy, oz, dx, dy, dz, mint):
        scx, scy, scz = _rows(sph, lo, hi, 0), _rows(sph, lo, hi, 1), \
            _rows(sph, lo, hi, 2)
        r, mf, msk = _rows(sph, lo, hi, 3), _rows(sph, lo, hi, 4), \
            _rows(sph, lo, hi, 5)
        mx = ox - scx
        my = oy - scy
        mz = oz - scz
        b = mx * dx + my * dy + mz * dz
        cq = mx * mx + my * my + mz * mz - r * r
        dis = b * b - cq
        alpha = jax.nn.sigmoid(dis / bw) * jnp.where(msk > 0.0, 1.0, 0.0)
        t = -b - _safe_sqrt(dis)
        alpha = alpha * jax.nn.sigmoid((t - mint) / bw)
        return alpha, t, mf

    def sphere_geo_vec(sph, lo, hi, t, ox, oy, oz, dx, dy, dz):
        scx, scy, scz = _rows(sph, lo, hi, 0), _rows(sph, lo, hi, 1), \
            _rows(sph, lo, hi, 2)
        px = ox + t * dx
        py = oy + t * dy
        pz = oz + t * dz
        nx, ny, nz = _normalize3(px - scx, py - scy, pz - scz)
        return (px, py, pz), (nx, ny, nz)

    def tri_hyp_vec(tri, lo, hi, ox, oy, oz, dx, dy, dz, mint,
                    xx, xy_, xz_):
        C = lambda k: _rows(tri, lo, hi, k)          # noqa: E731
        ngx, ngy, ngz = C(0), C(1), C(2)
        c1x, c1y, c1z = C(3), C(4), C(5)
        c2x, c2y, c2z = C(6), C(7), C(8)
        e1x, e1y, e1z = C(9), C(10), C(11)
        e2x, e2y, e2z = C(12), C(13), C(14)
        kk, mf, msk = C(15), C(16), C(17)
        div = ngx * dx + ngy * dy + ngz * dz
        side_ok = (div != 0.0) if two_sided else (div > 0.0)
        idiv = 1.0 / jnp.where(div == 0.0, 1.0, div)
        beta = (e2x * xx + e2y * xy_ + e2z * xz_
                - (c2x * dx + c2y * dy + c2z * dz)) * idiv
        gamma = ((c1x * dx + c1y * dy + c1z * dz)
                 - (e1x * xx + e1y * xy_ + e1z * xz_)) * idiv
        t_raw = (kk - (ngx * ox + ngy * oy + ngz * oz)) * idiv
        t = jnp.where(side_ok, t_raw, 1e6)
        margin = jnp.minimum(jnp.minimum(beta, gamma), 1.0 - beta - gamma)
        alpha = jax.nn.sigmoid(margin / bw) \
            * jnp.where(msk > 0.0, 1.0, 0.0) * side_ok
        alpha = alpha * jax.nn.sigmoid((t - mint) / bw)
        return alpha, t, beta, gamma, mf

    def tri_geo_vec(tri, lo, hi, t, beta, gamma, ox, oy, oz, dx, dy, dz):
        px = ox + t * dx
        py = oy + t * dy
        pz = oz + t * dz
        al = jnp.clip(1.0 - beta - gamma, 0.0, 1.0)
        be = jnp.clip(beta, 0.0, 1.0)
        ga = jnp.clip(gamma, 0.0, 1.0)
        nx = al * _rows(tri, lo, hi, 18) + be * _rows(tri, lo, hi, 21) \
            + ga * _rows(tri, lo, hi, 24)
        ny = al * _rows(tri, lo, hi, 19) + be * _rows(tri, lo, hi, 22) \
            + ga * _rows(tri, lo, hi, 25)
        nz = al * _rows(tri, lo, hi, 20) + be * _rows(tri, lo, hi, 23) \
            + ga * _rows(tri, lo, hi, 26)
        nx, ny, nz = _normalize3(nx, ny, nz)
        return (px, py, pz), (nx, ny, nz)

    def _composite_vec(alpha, t, fields, first_good):
        """_composite over a stacked leading hypothesis axis: the pairwise
        soft depth ranking runs per-hypothesis inside a lax.scan, so the
        traced graph is constant-size in the hypothesis count."""
        M = alpha.shape[0]

        def w_body(cov, i):
            occ = alpha * jax.nn.sigmoid((t[i] - t) / tau)
            occ = occ.at[i].set(0.0)                 # no self-occlusion
            w = alpha[i] * jnp.prod(1.0 - occ, axis=0)
            return cov + w, w

        cov, ws = jax.lax.scan(w_body, zero, jnp.arange(M))
        cov = jnp.clip(cov, 0.0, 1.0)
        goodc = cov > first_good
        icov = 1.0 / jnp.where(goodc, cov, 1.0)
        wn = jnp.where(goodc, ws * icov, 0.0)
        blend = [jnp.sum(wn * f, axis=0) for f in fields]
        return cov, blend

    def _chunk_surface_vec(span, cap):
        """One chunk's soft-blended surface, fully vectorized over its
        rows: (cov, t, p, n, albedo) with the chunk-local composite."""
        (sph, tri, mat, ox, oy, oz, dx, dy, dz, mint,
         xx, xy_, xz_) = cap
        lo_s, hi_s, lo_t, hi_t = span
        if hi_s > lo_s:
            alpha, t, mf = sphere_hyp_vec(sph, lo_s, hi_s,
                                          ox, oy, oz, dx, dy, dz, mint)
            p, n = sphere_geo_vec(sph, lo_s, hi_s, t, ox, oy, oz,
                                  dx, dy, dz)
        else:
            alpha, t, beta, gamma, mf = tri_hyp_vec(
                tri, lo_t, hi_t, ox, oy, oz, dx, dy, dz, mint,
                xx, xy_, xz_)
            p, n = tri_geo_vec(tri, lo_t, hi_t, t, beta, gamma,
                               ox, oy, oz, dx, dy, dz)
        ar, ag, ab = mat_rgb(mat, mf)
        fields = (t, p[0], p[1], p[2], n[0], n[1], n[2], ar, ag, ab)
        cov_c, blend = _composite_vec(alpha, t, fields, 1e-9)
        return (cov_c, *blend)

    def _composite(alphas, ts, fields, first_good):
        """Soft ALPHA-COMPOSITED blend of hypotheses into one surface.
        Each hypothesis is occluded by nearer ones in proportion to their
        coverage:

            w_i = alpha_i * prod_{j != i} (1 - alpha_j * sig((t_i-t_j)/tau))

        — the sort-free soft depth ordering (NeRF-style compositing with a
        sigmoid rank). A plain softmin-over-depth is WRONG here: a
        near-depth hypothesis with tiny alpha (a just-missed sphere in
        front of a wall) would steal the entire softmax mass from the real
        surface (-dt/tau dwarfs log alpha), blacking out a halo ring and
        leaving threshold discontinuities. Compositing gives the wall
        (1 - alpha_sphere) of its weight instead — measured FD-allclose at
        512x512 including silhouettes.

        ``fields[i]``: tuple (t, px, py, pz, nx, ny, nz, ar, ag, ab).
        Returns (cov, blended fields list). ``first_good`` guards the
        cov division (see the 1/cov^2 backward note below)."""
        n = len(alphas)
        ws = []
        cov = zero
        for a_i in range(n):
            trans = jnp.ones(shape)
            for b_i in range(n):
                if a_i == b_i:
                    continue
                occ = alphas[b_i] * jax.nn.sigmoid(
                    (ts[a_i] - ts[b_i]) / tau)
                trans = trans * (1.0 - occ)
            w = alphas[a_i] * trans
            ws.append(w)
            cov = cov + w
        cov = jnp.clip(cov, 0.0, 1.0)
        # double-where: 1/cov^2 in the division's backward overflows for
        # cov ~ 1e-20 (diff/soft.py render_pathtrace_soft guard)
        goodc = cov > first_good
        icov = 1.0 / jnp.where(goodc, cov, 1.0)
        nf = len(fields[0])
        blend = [zero] * nf
        for w, f in zip(ws, fields):
            wn = jnp.where(goodc, w * icov, 0.0)
            for k in range(nf):
                blend[k] = blend[k] + wn * f[k]
        return cov, blend

    def _chunk_hyps(span, tables, ox, oy, oz, dx, dy, dz, mint,
                    xx, xy_, xz_):
        """(alpha, t, fields) hypotheses for sphere rows [lo_s, hi_s) and
        triangle rows [lo_t, hi_t); fields[i] = (t, p, n, albedo)."""
        lo_s, hi_s, lo_t, hi_t = span
        sph, tri, mat = tables
        alphas, ts, fields = [], [], []
        for i in range(lo_s, hi_s):
            alpha, t, mf = sphere_hyp(sph, i, ox, oy, oz, dx, dy, dz, mint)
            p, n = sphere_geo(sph, i, t, ox, oy, oz, dx, dy, dz)
            ar, ag, ab = mat_rgb(mat, mf)
            alphas.append(alpha)
            ts.append(t)
            fields.append((t, p[0], p[1], p[2], n[0], n[1], n[2],
                           ar, ag, ab))
        for i in range(lo_t, hi_t):
            alpha, t, beta, gamma, mf = tri_hyp(tri, i, ox, oy, oz,
                                                dx, dy, dz, mint,
                                                xx, xy_, xz_)
            p, n = tri_geo(tri, i, t, beta, gamma, ox, oy, oz, dx, dy, dz)
            ar, ag, ab = mat_rgb(mat, mf)
            alphas.append(alpha)
            ts.append(t)
            fields.append((t, p[0], p[1], p[2], n[0], n[1], n[2],
                           ar, ag, ab))
        return alphas, ts, fields

    def _chunk_ranges():
        """Static (lo_s, hi_s, lo_t, hi_t) chunk windows over the sphere
        then triangle tables, SOFT_CHUNK hypotheses per chunk."""
        spans = [("s", i, min(i + SOFT_CHUNK, n_sph))
                 for i in range(0, n_sph, SOFT_CHUNK)] + \
                [("t", i, min(i + SOFT_CHUNK, n_tri))
                 for i in range(0, n_tri, SOFT_CHUNK)]
        return [(lo, hi, 0, 0) if k == "s" else (0, 0, lo, hi)
                for k, lo, hi in spans]

    def _finish_surface(cov, blend):
        tbar = blend[0]
        pbar = (blend[1], blend[2], blend[3])
        nraw = (blend[4], blend[5], blend[6])
        albbar = (blend[7], blend[8], blend[9])
        # blended normal can be denormally small (edge pixels blending
        # opposing normals) — park those rays on a unit fallback
        n2 = nraw[0] ** 2 + nraw[1] ** 2 + nraw[2] ** 2
        good = n2 > 1e-8
        inv = jax.lax.rsqrt(jnp.where(good, n2, 1.0))
        nbar = (jnp.where(good, nraw[0] * inv, 0.0),
                jnp.where(good, nraw[1] * inv, 0.0),
                jnp.where(good, nraw[2] * inv, 1.0))
        return cov, tbar, pbar, nbar, albbar

    def _make_ck(fn, span):
        """Hand-rolled checkpoint of ``fn(span, cap)`` with the STATIC
        span closed over: saves only ``cap`` (ray state + tables) and
        recomputes the chunk inside its backward — the Mosaic-safe remat
        (jax.checkpoint's closed_call does not lower in Pallas)."""

        @jax.custom_vjp
        def ck(cap):
            return fn(span, cap)

        def fwd(cap):
            return fn(span, cap), cap

        def bwd(cap, g):
            _, vjp = jax.vjp(lambda c: fn(span, c), cap)
            return (vjp(g)[0],)

        ck.defvjp(fwd, bwd)
        return ck

    def soft_trace(sph, tri, mat, ox, oy, oz, dx, dy, dz, mint):
        """Soft composited surface (cov, tbar, pbar, nbar, albbar). Small
        tables: one global composite (round-3 path, O(N^2) pairwise on
        unrolled scalar reads — ~2x the hard trace at cornell scale).
        Larger tables: CHUNKED two-level composite — hypotheses composite
        chunk-locally (O(C^2) pairwise), then each chunk's blended surface
        competes as ONE hypothesis in a cross-chunk composite. Converges
        to the same hard limit as bandwidth, tau -> 0 (within a chunk ->
        the chunk champion; across chunks -> the champion of champions);
        tables arrive Morton-sorted (streaming prep), so chunks blend
        neighboring geometry, not scene-distant surfaces. Each chunk is
        checkpointed (custom_vjp saves ray state + table refs only and
        recomputes in its backward) so residual memory stays bounded —
        this lifts the edge-aware backward past the unroll budget
        (round-3 VERDICT missing #2)."""
        xx, xy_, xz_ = _cross(ox, oy, oz, dx, dy, dz)
        if n_sph + n_tri <= MK.UNROLL_OBJECTS:
            alphas, ts, fields = _chunk_hyps(
                (0, n_sph, 0, n_tri), (sph, tri, mat),
                ox, oy, oz, dx, dy, dz, mint, xx, xy_, xz_)
            cov, blend = _composite(alphas, ts, fields, 1e-6)
            return _finish_surface(cov, blend)

        def chunk_fn(span, cap):
            (sph, tri, mat, ox, oy, oz, dx, dy, dz, mint,
             xx, xy_, xz_) = cap
            alphas, ts, fields = _chunk_hyps(span, (sph, tri, mat),
                                             ox, oy, oz, dx, dy, dz,
                                             mint, xx, xy_, xz_)
            # chunk-local composite; guard threshold lower than the outer
            # one so faint chunk coverage still carries its surface blend
            cov_c, blend = _composite(alphas, ts, fields, 1e-9)
            return (cov_c, *blend)

        cap = (sph, tri, mat, ox, oy, oz, dx, dy, dz, mint, xx, xy_, xz_)
        if vec:
            # value-level route: vectorized chunk surfaces + a scan-based
            # cross-chunk merge — the traced graph stays constant-size per
            # chunk and per merge regardless of table size
            surfs = [_make_ck(_chunk_surface_vec, span)(cap)
                     for span in _chunk_ranges()]
            alpha_m = jnp.stack([s[0] for s in surfs])
            t_m = jnp.stack([s[1] for s in surfs])
            fields_m = tuple(jnp.stack([s[k] for s in surfs])
                             for k in range(1, 11))
            cov, blend = _composite_vec(alpha_m, t_m, fields_m, 1e-6)
            return _finish_surface(cov, blend)
        alphas, ts, fields = [], [], []
        for span in _chunk_ranges():
            out = _make_ck(chunk_fn, span)(cap)
            cov_c, blend = out[0], tuple(out[1:])
            alphas.append(cov_c)
            ts.append(blend[0])
            fields.append(blend)
        cov, blend = _composite(alphas, ts, fields, 1e-6)
        return _finish_surface(cov, blend)

    def soft_vis(sph, tri, ox, oy, oz, dx, dy, dz, dist):
        """Smooth shadow transmittance: product over occluders of
        (1 - coverage restricted to the segment window [0, dist]) — fully
        factorized, so chunking (checkpointed past the unroll budget) is
        exact, not an approximation."""
        xx, xy_, xz_ = _cross(ox, oy, oz, dx, dy, dz)

        def vis_span(span, cap):
            (sph, tri, ox, oy, oz, dx, dy, dz, dist, xx, xy_, xz_) = cap
            lo_s, hi_s, lo_t, hi_t = span
            vis = jnp.ones(shape)
            for i in range(lo_s, hi_s):
                alpha, t, _ = sphere_hyp(sph, i, ox, oy, oz, dx, dy, dz,
                                         zero)
                inside = alpha * jax.nn.sigmoid((dist - t) / bw)
                vis = vis * (1.0 - inside)
            for i in range(lo_t, hi_t):
                alpha, t, _, _, _ = tri_hyp(tri, i, ox, oy, oz, dx, dy, dz,
                                            zero, xx, xy_, xz_)
                inside = alpha * jax.nn.sigmoid((dist - t) / bw)
                vis = vis * (1.0 - inside)
            return vis

        cap = (sph, tri, ox, oy, oz, dx, dy, dz, dist, xx, xy_, xz_)
        if n_sph + n_tri <= MK.UNROLL_OBJECTS:
            return vis_span((0, n_sph, 0, n_tri), cap)

        def vis_span_vec(span, cap):
            # transmittance is a plain product over occluders, so the
            # vectorized form is EXACT (not an approximation)
            (sph, tri, ox, oy, oz, dx, dy, dz, dist, xx, xy_, xz_) = cap
            lo_s, hi_s, lo_t, hi_t = span
            if hi_s > lo_s:
                alpha, t, _ = sphere_hyp_vec(sph, lo_s, hi_s,
                                             ox, oy, oz, dx, dy, dz, zero)
            else:
                alpha, t, _, _, _ = tri_hyp_vec(
                    tri, lo_t, hi_t, ox, oy, oz, dx, dy, dz, zero,
                    xx, xy_, xz_)
            inside = alpha * jax.nn.sigmoid((dist - t) / bw)
            return jnp.prod(1.0 - inside, axis=0)

        vis = jnp.ones(shape)
        for span in _chunk_ranges():
            vis = vis * _make_ck(vis_span_vec if vec else vis_span,
                                 span)(cap)
        return vis

    accr = zero
    accg = zero
    accb = zero
    tpr = jnp.ones(shape)
    tpg = jnp.ones(shape)
    tpb = jnp.ones(shape)
    path_w = jnp.where(ok, 1.0, 0.0)

    def nee_soft(li, accr, accg, accb, tpr, tpg, tpb,
                 cov, path_w, pbar, nbar, albbar):
        """NEE with soft occlusion (ref initShadowTrace/sceneRender
        code.cl:631-673, 1323-1364; pre-update throughput +
        center-distance r^2 quirks kept)."""
        lpx, lpy, lpz = lig[li, 0], lig[li, 1], lig[li, 2]
        lnx, lny, lnz = lig[li, 3], lig[li, 4], lig[li, 5]
        ir, ig, ib = lig[li, 6], lig[li, 7], lig[li, 8]
        rad, area = lig[li, 12], lig[li, 13]
        tax, tay, taz = lig[li, 14], lig[li, 15], lig[li, 16]
        bax, bay, baz = lig[li, 17], lig[li, 18], lig[li, 19]
        u0, u1 = next_pair()
        sx, sy = _concentric(u0, u1)
        sx = sx * rad
        sy = sy * rad
        tgx = lpx + sx * tax + sy * bax
        tgy = lpy + sx * tay + sy * bay
        tgz = lpz + sx * taz + sy * baz
        sox = pbar[0] + eps * nbar[0]
        soy = pbar[1] + eps * nbar[1]
        soz = pbar[2] + eps * nbar[2]
        dlx = tgx - sox
        dly = tgy - soy
        dlz = tgz - soz
        d2 = dlx * dlx + dly * dly + dlz * dlz
        dist = jnp.sqrt(jnp.maximum(d2, 1e-20))
        sdx, sdy, sdz = _normalize3(dlx, dly, dlz)
        vis = soft_vis(sph, tri, sox, soy, soz, sdx, sdy, sdz, dist)
        r2 = (pbar[0] - lpx) ** 2 + (pbar[1] - lpy) ** 2 \
            + (pbar[2] - lpz) ** 2
        cosx = jnp.clip(sdx * nbar[0] + sdy * nbar[1] + sdz * nbar[2],
                        0.0, 1.0)
        cosy = jnp.clip(-(sdx * lnx + sdy * lny + sdz * lnz), 0.0, 1.0)
        geom = area * cosx * cosy / jnp.maximum(r2, 1e-20)
        gain = path_w * cov * vis * geom
        accr = accr + gain * tpr * albbar[0] * ir
        accg = accg + gain * tpg * albbar[1] * ig
        accb = accb + gain * tpb * albbar[2] * ib
        tpr = tpr * albbar[0]
        tpg = tpg * albbar[1]
        tpb = tpb * albbar[2]
        return accr, accg, accb, tpr, tpg, tpb

    if mode == "direct":
        # Assign08 soft shade: ambient + soft-visibility cosine, weighted
        # by coverage (ref Assign08 code.cl:916-939; diff/soft.py
        # render_direct_soft blended to O(N))
        ambient = P("ambient")
        cov, tbar, pbar, nbar, albbar = soft_trace(
            sph, tri, mat, ox, oy, oz, dx, dy, dz, mint)
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
            sox = pbar[0] + eps * nbar[0]
            soy = pbar[1] + eps * nbar[1]
            soz = pbar[2] + eps * nbar[2]
            dlx = tgx - sox
            dly = tgy - soy
            dlz = tgz - soz
            d2 = dlx * dlx + dly * dly + dlz * dlz
            dist = jnp.sqrt(jnp.maximum(d2, 1e-20))
            sdx, sdy, sdz = _normalize3(dlx, dly, dlz)
            vis = soft_vis(sph, tri, sox, soy, soz, sdx, sdy, sdz, dist)
            cosx = jnp.clip(sdx * nbar[0] + sdy * nbar[1] + sdz * nbar[2],
                            0.0, 1.0)
            shade = jnp.clip(ambient + vis * cosx, 0.0, 1.0)
            w = path_w * cov
            accr = accr + w * albbar[0] * shade
            accg = accg + w * albbar[1] * shade
            accb = accb + w * albbar[2] * shade
        return accr, accg, accb

    for depth in range(bounces + 1):
        if depth > 0:
            if russian_roulette:
                u0, _ = next_pair()
                if depth - 1 >= rr_start_depth:
                    p_srv = jnp.clip(jnp.maximum(tpr, jnp.maximum(tpg, tpb)),
                                     0.05, 1.0)
                    survive = u0 < p_srv
                    inv_p = 1.0 / p_srv
                    tpr = jnp.where(survive, tpr * inv_p, 0.0)
                    tpg = jnp.where(survive, tpg * inv_p, 0.0)
                    tpb = jnp.where(survive, tpb * inv_p, 0.0)
                    path_w = jnp.where(survive, path_w, 0.0)
            # bouncePaths (ref code.cl:581-598) from the blended surface
            (tx, ty, tz), (bx, by, bz) = _tangent_frame(*nbar)
            u0, u1 = next_pair()
            cdx, cdy = _concentric(u0, u1)
            cz = _safe_sqrt(1.0 - cdx * cdx - cdy * cdy)
            dx, dy, dz = _normalize3(cdx * tx + cdy * bx + cz * nbar[0],
                                     cdx * ty + cdy * by + cz * nbar[1],
                                     cdx * tz + cdy * bz + cz * nbar[2])
            ox = pbar[0] + eps * nbar[0]
            oy = pbar[1] + eps * nbar[1]
            oz = pbar[2] + eps * nbar[2]
            mint = zero
            path_w = path_w * cov

        cov, tbar, pbar, nbar, albbar = soft_trace(
            sph, tri, mat, ox, oy, oz, dx, dy, dz, mint)

        if depth == 0:
            # lightRender (ref code.cl:600-629): emitter credit on the
            # primary segment only; soft depth race vs the blended surface
            for li in range(n_lig):
                lpx, lpy, lpz = lig[li, 0], lig[li, 1], lig[li, 2]
                lnx, lny, lnz = lig[li, 3], lig[li, 4], lig[li, 5]
                if normalize_emitter:
                    ir, ig, ib = lig[li, 9], lig[li, 10], lig[li, 11]
                else:
                    ir, ig, ib = lig[li, 6], lig[li, 7], lig[li, 8]
                rad = lig[li, 12]
                den = dx * lnx + dy * lny + dz * lnz
                num = (lpx - ox) * lnx + (lpy - oy) * lny + (lpz - oz) * lnz
                # double-where side mask on the plane division (advisor
                # round-2 finding on diff/soft.py)
                goodl = jnp.abs(den) > 1e-12
                idiv = 1.0 / jnp.where(goodl, den, 1.0)
                t_l = jnp.where(goodl, num * idiv, 1e6)
                qx = ox + t_l * dx - lpx
                qy = oy + t_l * dy - lpy
                qz = oz + t_l * dz - lpz
                on_disk = jax.nn.sigmoid(
                    (rad * rad - (qx * qx + qy * qy + qz * qz)) / bw)
                front = jax.nn.sigmoid((t_l - mint) / bw)
                before = cov * jax.nn.sigmoid((tbar - t_l) / bw) \
                    + (1.0 - cov)
                lw = on_disk * front * before * goodl
                accr = accr + path_w * lw * ir
                accg = accg + path_w * lw * ig
                accb = accb + path_w * lw * ib
                path_w = path_w * (1.0 - lw)

        for li in range(n_lig):
            accr, accg, accb, tpr, tpg, tpb = nee_soft(
                li, accr, accg, accb, tpr, tpg, tpb,
                cov, path_w, pbar, nbar, albbar)

    return accr, accg, accb


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(ipar, par, sph, tri, mat, lig, *rest,
                n_rays: int, spp: int, width: int, bounces: int,
                n_sph: int, n_tri: int, n_mat: int, n_lig: int,
                two_sided: bool, normalize_emitter: bool,
                use_u: bool, seed: int, mode: str,
                russian_roulette: bool, rr_start_depth: int,
                remat: bool, diff_wrt: tuple = DIFF_ALL,
                bwd_sublanes: int = SUBLANES,
                soft_bandwidth: float = 0.0, soft_tau: float = 0.0,
                stream_tri: bool = False, stream_sph: bool = False,
                block: int = 0, diff_chunk: int = DIFF_CHUNK):
    rest = list(rest)
    # chunk-AABB tables as FLATTENED 1-D SMEM refs (2-D SMEM rows pad to
    # 512 B — megakernel._FlatTable); the overlap fns read them scalar-
    # wise (SMEM vector loads don't lower in Mosaic)
    tri_chunks = MK._FlatTable(rest.pop(0), 8) if stream_tri else None
    sph_chunks = MK._FlatTable(rest.pop(0), 8) if stream_sph else None
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

    soft_kw = {}
    if soft_bandwidth > 0.0:
        # edge-aware backward: differentiate the SOFT reformulation of the
        # schedule instead of the hard champion program (forward stays hard)
        soft_kw = dict(bandwidth=soft_bandwidth, tau=soft_tau)
    if soft_bandwidth <= 0.0:
        soft_kw = dict(tri_chunks=tri_chunks, sph_chunks=sph_chunks,
                       diff_chunk=diff_chunk)
    prog = functools.partial(
        _tile_program_soft if soft_bandwidth > 0.0 else _tile_program,
        pairs=pairs, ridf=ridf, in_range=in_range,
        spp=spp, width=width, bounces=bounces, n_sph=n_sph, n_tri=n_tri,
        n_mat=n_mat, n_lig=n_lig, two_sided=two_sided,
        normalize_emitter=normalize_emitter,
        russian_roulette=russian_roulette, rr_start_depth=rr_start_depth,
        mode=mode, block=block, **soft_kw)

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
                remat, diff_wrt=DIFF_ALL, bwd_sublanes=SUBLANES,
                soft_bandwidth=0.0, soft_tau=0.0,
                tri_chunks=None, sph_chunks=None, block=0,
                diff_chunk=DIFF_CHUNK):
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
              diff_wrt=tuple(diff_wrt), bwd_sublanes=bwd_sublanes,
              soft_bandwidth=soft_bandwidth, soft_tau=soft_tau,
              stream_tri=tri_chunks is not None,
              stream_sph=sph_chunks is not None, block=block,
              diff_chunk=diff_chunk)

    ray_block = pl.BlockSpec((bwd_sublanes, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    in_specs = [smem, smem, vmem, vmem, vmem, vmem]
    args = [ipar, par, sph, tri, mat, lig]
    if tri_chunks is not None:
        in_specs.append(smem)
        args.append(tri_chunks.astype(jnp.float32).reshape(-1))
    if sph_chunks is not None:
        in_specs.append(smem)
        args.append(sph_chunks.astype(jnp.float32).reshape(-1))
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
        # residuals live at 1024x1024 b5 (the soft/edge backward ~101 MB
        # at 512x512) — beyond the 16 MB default scoped window but within
        # v5e's physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=114 * 1024 * 1024),
    )(*args)


def _bwd_reference(par, ipar, sph, tri, mat, lig, g, u_planes, *,
                   spp, width, bounces, two_sided, normalize_emitter,
                   seed, mode, russian_roulette, rr_start_depth,
                   diff_wrt=("par", "sph", "tri", "mat", "lig"),
                   soft_bandwidth=0.0, soft_tau=0.0,
                   tri_chunks=None, sph_chunks=None, block=0,
                   diff_chunk=DIFF_CHUNK):
    """Plain-XLA cotangents: jax.vjp of _tile_program over the whole padded
    ray set as ONE tile. Used (a) on CPU/interpret, where running the
    backward Pallas kernel through the interpreter costs minutes per call,
    and (b) as the oracle the Pallas backward kernel is tested against.
    Requires u_planes (the on-core PRNG has no host analog).
    ``soft_bandwidth > 0`` differentiates the edge-aware soft program."""
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

    if soft_bandwidth > 0.0:
        # vec: vectorized chunk surfaces past the unroll budget — the
        # unrolled chunk graph made XLA compile time explode (round 4)
        soft_kw = dict(bandwidth=soft_bandwidth, tau=soft_tau, vec=True)
        prog = _tile_program_soft
    else:
        # value-level program: candidate generation in MATMUL form — XLA
        # maps it to the MXU (the Pallas kernel keeps the broadcast form)
        soft_kw = dict(tri_chunks=tri_chunks, sph_chunks=sph_chunks,
                       diff_chunk=diff_chunk, mm=True)
        prog = _tile_program

    def f(*sel_args):
        v = dict(vals)
        v.update(dict(zip(sel, sel_args)))
        return prog(
            v["par"], v["sph"], v["tri"], v["mat"], v["lig"],
            pairs, ridf, in_range,
            spp=spp, width=width, bounces=bounces,
            n_sph=sph.shape[0], n_tri=tri.shape[0],
            n_mat=mat.shape[0], n_lig=lig.shape[0],
            two_sided=two_sided, normalize_emitter=normalize_emitter,
            russian_roulette=russian_roulette,
            rr_start_depth=rr_start_depth, mode=mode, block=block,
            **soft_kw)

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
                  diff_wrt, bwd_sublanes, soft_bandwidth=0.0, soft_tau=0.0,
                  stream_tri=False, stream_sph=False, block=0,
                  diff_chunk=DIFF_CHUNK, grid_meta=None, bwd_xla=False,
                  bwd_cell=False):
    kw = dict(spp=spp, width=width, bounces=bounces, two_sided=two_sided,
              normalize_emitter=normalize_emitter, seed=seed,
              interpret=interpret, mode=mode,
              russian_roulette=russian_roulette,
              rr_start_depth=rr_start_depth)
    soft = dict(soft_bandwidth=soft_bandwidth, soft_tau=soft_tau,
                block=block)

    def fwd_kw(chunks, sphc):
        # streamed tables ride the forward streaming kernel (Morton chunks
        # + tile culling + SMEM DMA); the backward replays the same chunk
        # culling at the value level (_loop_diff windows)
        return dict(kw, block=block,
                    chunks=chunks if stream_tri else None,
                    sph_chunks=sphc if stream_sph else None)

    def bwd_chunks(chunks, sphc):
        return dict(tri_chunks=chunks if stream_tri else None,
                    sph_chunks=sphc if stream_sph else None,
                    diff_chunk=diff_chunk)

    def _primal(par, ipar, sph, tri, mat, lig, acc, u_planes, chunks, sphc,
                fwd_pack, record=False):
        rec_kw = dict(record=True, rec_sph_rows=sph.shape[0]) if record \
            else {}
        if grid_meta is None:
            return MK.pathtrace_pass_pallas(par, ipar, sph, tri, mat, lig,
                                            acc, u_planes, **rec_kw,
                                            **fwd_kw(chunks, sphc))
        # GRID mode: the primal is the production in-kernel grid pass over
        # the forward tables carried in ``fwd_pack`` (stop-gradient at the
        # call site); ``sph``/``tri`` here are the BACKWARD diff tables
        # (cell-major duplicated rows) and are not consumed by the forward
        start, streamed, tri_ns, sph_n = grid_meta
        fwd_tri, fwd_sph, tri_arrs, sph_arrs = fwd_pack
        tri_list = [(a[0], a[1], a[2], n, a[3], a[4])
                    for a, n in zip(tri_arrs, tri_ns)]
        sph_entry = ((sph_arrs[0], sph_arrs[1], sph_arrs[2], sph_n,
                      sph_arrs[3], sph_arrs[4]) if sph_n else None)
        grid = dict(start=start, streamed=streamed, tri=tri_list,
                    sph=sph_entry)
        if record:
            # per-grid DIFF-table row offsets: brute prefix [0, start),
            # then each grid's payload rows in order (the cell-major
            # streamed tables carry a GRID_CHUNK DMA pad that is not in
            # the diff table)
            offs, off = [], start
            for a in tri_arrs:
                offs.append(off)
                off += a[1].shape[0] - (MK.GRID_CHUNK if streamed else 0)
            rec_kw["rec_tri_offs"] = tuple(offs)
        return MK.pathtrace_pass_pallas(par, ipar, fwd_sph, fwd_tri, mat,
                                        lig, acc, u_planes, grid=grid,
                                        block=block, **rec_kw, **kw)

    @jax.custom_vjp
    def op(par, ipar, sph, tri, mat, lig, acc, u_planes, chunks, sphc,
           fwd_pack):
        return _primal(par, ipar, sph, tri, mat, lig, acc, u_planes,
                       chunks, sphc, fwd_pack)

    def fwd(par, ipar, sph, tri, mat, lig, acc, u_planes, chunks, sphc,
            fwd_pack):
        if bwd_cell:
            # CELL route: the recording forward (same kernel + champion
            # row-id / occlusion-bit planes) — the only traversal of the
            # whole train step
            out, ids, occs = _primal(par, ipar, sph, tri, mat, lig, acc,
                                     u_planes, chunks, sphc, fwd_pack,
                                     record=True)
            return out, (par, ipar, sph, tri, mat, lig, u_planes, chunks,
                         sphc, fwd_pack, ids, occs)
        out = _primal(par, ipar, sph, tri, mat, lig, acc, u_planes,
                      chunks, sphc, fwd_pack)
        return out, (par, ipar, sph, tri, mat, lig, u_planes, chunks, sphc,
                     fwd_pack, None, None)

    def bwd(res, g):
        (par, ipar, sph, tri, mat, lig, u_planes, chunks, sphc,
         fwd_pack, ids, occs) = res
        if bwd_cell:
            bkw = dict(kw)
            bkw.pop("interpret")
            if interpret:
                # value level (CPU): native gather + AD scatter — shallow
                # graph, needs u_planes (no host analog of the on-core PRNG)
                dpar, dsph, dtri, dmat, dlig = _bwd_champion(
                    par, ipar, sph, tri, mat, lig, g, u_planes, ids, occs,
                    diff_wrt=diff_wrt, block=block, **bkw)
            else:
                # accelerator: the fused Pallas champion kernel (one-hot
                # MXU gather/scatter over champion chunks, on-core PRNG
                # replay — no u-planes tensor, so the recording forward
                # keeps its PRNG-mode speed)
                dpar, dsph, dtri, dmat, dlig = _bwd_champ_pallas(
                    par, ipar, sph, tri, mat, lig, g, u_planes, ids, occs,
                    diff_wrt=diff_wrt, block=block,
                    bwd_sublanes=bwd_sublanes, interpret=False, **bkw)
        elif interpret or bwd_xla:
            # value-level transpose as ONE XLA program. On an accelerator
            # (bwd_xla) this is the fast route past the unroll budget: the
            # dense batched candidate sweep vectorizes across the whole
            # ray set with XLA's fusion, where the Pallas chunk sweep is
            # VPU- and cond-overhead-bound (measured v5e teapot 512^2:
            # ~3x the Pallas chunk backward). Windowless — at whole-array
            # granularity every chunk cond would be taken anyway.
            bkw = dict(kw)
            bkw.pop("interpret")
            win = bwd_chunks(None, None) if bwd_xla \
                else bwd_chunks(chunks, sphc)
            dpar, dsph, dtri, dmat, dlig = _bwd_reference(
                par, ipar, sph, tri, mat, lig, g, u_planes,
                diff_wrt=diff_wrt, **bkw, **soft, **win)
        else:
            dpar, dsph, dtri, dmat, dlig = _bwd_pallas(
                par, ipar, sph, tri, mat, lig, g, u_planes,
                remat=remat, diff_wrt=diff_wrt,
                bwd_sublanes=bwd_sublanes, **kw, **soft,
                **bwd_chunks(chunks, sphc))
        # slice off the dummy row added for empty tables
        def cut(d, t):
            return d[:t.shape[0]] if t.shape[0] else jnp.zeros_like(t)
        dipar = np.zeros(ipar.shape, jax.dtypes.float0)
        du = None if u_planes is None else jnp.zeros_like(u_planes)
        # chunk AABBs and the forward grid tables are culling/visit
        # metadata only — every value cotangent flows through the diff
        # tables, so theirs are zero (stop_gradient at the call site cuts
        # the dead transpose)
        return (dpar, dipar, cut(dsph, sph), cut(dtri, tri),
                cut(dmat, mat), cut(dlig, lig), g, du,
                jnp.zeros_like(chunks), jnp.zeros_like(sphc),
                jax.tree.map(jnp.zeros_like, fwd_pack))

    op.defvjp(fwd, bwd)
    return op


def pathtrace_pass_diff(par, ipar, sph, tri, mat, lig, acc, u_planes, *,
                        spp, width, bounces, two_sided, normalize_emitter,
                        seed, interpret=False, mode="path",
                        russian_roulette=False, rr_start_depth=0,
                        remat=True, diff_wrt=DIFF_ALL,
                        bwd_sublanes=SUBLANES,
                        soft_bandwidth=0.0, soft_tau=0.0,
                        chunks=None, sph_chunks=None, block=0,
                        grid=None, fwd_tri=None, fwd_sph=None,
                        diff_chunk=DIFF_CHUNK, bwd_xla=False,
                        bwd_cell=False):
    """Differentiable megakernel pass: primal = the fused forward kernel;
    backward = the fused recompute-VJP kernel above. Unrolled-table scenes
    only (see supported_diff in render/mega.py). ``diff_wrt`` restricts
    which parameter groups get real cotangents (others return zeros —
    opt-in via cfg.mega_grad_wrt; the BASELINE metric is geometry+albedo).

    ``soft_bandwidth > 0`` switches the backward to the EDGE-AWARE soft
    program (_tile_program_soft): the forward value stays the hard fused
    kernel, but cotangents are those of the reparameterized soft schedule,
    so silhouette/occlusion-boundary gradients are real instead of silent
    (cfg.mega_edge_bandwidth / cfg.mega_edge_tau).

    ``chunks``/``sph_chunks`` (per-chunk AABBs of the diff tables): the
    forward runs the STREAMING kernel; the backward scans the same tables
    chunk-by-chunk under the same conservative tile culling (_loop_diff
    windows) — this is what lifts supported_diff past the unroll budget
    (large meshes / molecules train through the megakernel).

    ``grid`` (the render/mega.grid_tables dict) + ``fwd_tri``/``fwd_sph``:
    GRID-mode training. The primal runs the production in-kernel grid
    pass on the forward tables; the backward scans the CELL-STRUCTURED
    diff tables passed as ``tri``/``sph`` (cell-major duplicated rows in
    front-to-back cell order, per-``diff_chunk`` AABBs in ``chunks``/
    ``sph_chunks`` clipped to their cells — render/mega.grid_diff_tables),
    replaying the forward's cell culling (ref DDA cell loops,
    code.cl:675-800). Cotangents flow through the diff tables' gather
    back to the original rows."""
    if soft_bandwidth > 0.0 and grid is not None:
        # EDGE x GRID (round 5): the primal is the grid kernel (fwd_pack);
        # the soft backward runs over the UN-duplicated value tables passed
        # as sph/tri — the caller (render/mega.py) must NOT pass cell-major
        # duplicated diff tables here (double-compositing)
        pass
    grid_meta = None
    fwd_pack = ()
    if grid is not None:
        sg = jax.lax.stop_gradient
        tri_ns = tuple(tuple(e[3]) for e in grid["tri"])
        sphg = grid.get("sph")
        sph_n = tuple(sphg[3]) if sphg else None
        tri_arrs = tuple((sg(e[0]), sg(e[1]), sg(e[2]), sg(e[4]),
                          sg(e[5])) for e in grid["tri"])
        sph_arrs = ((sg(sphg[0]), sg(sphg[1]), sg(sphg[2]), sg(sphg[4]),
                     sg(sphg[5])) if sphg else ())
        fwd_pack = (sg(fwd_tri), sg(fwd_sph), tri_arrs, sph_arrs)
        grid_meta = (int(grid["start"]), bool(grid["streamed"]), tri_ns,
                     sph_n)
    if bwd_xla and not interpret:
        assert u_planes is not None, \
            "the XLA backward replays draws from u_planes (no host PRNG)"
    if bwd_cell:
        assert u_planes is not None or not interpret, \
            "the champion (cell) backward on CPU replays draws from " \
            "u_planes (the Pallas kernel replays the on-core PRNG)"
        assert soft_bandwidth == 0.0, \
            "the champion backward is hard-gradient only (edge mode " \
            "needs the soft sweep)"
    op = _make_diff_op(spp, width, bounces, two_sided, normalize_emitter,
                       seed, interpret, mode, russian_roulette,
                       rr_start_depth, remat, tuple(diff_wrt),
                       bwd_sublanes, float(soft_bandwidth), float(soft_tau),
                       chunks is not None, sph_chunks is not None,
                       int(block), int(diff_chunk), grid_meta,
                       bool(bwd_xla), bool(bwd_cell))
    dummy = jnp.zeros((1, 8), jnp.float32)
    return op(par, ipar, sph, tri, mat, lig, acc, u_planes,
              dummy if chunks is None else chunks,
              dummy if sph_chunks is None else sph_chunks,
              fwd_pack)


def soft_pass_value(par, ipar, sph, tri, mat, lig, u_planes, *,
                    spp, width, bounces, two_sided, normalize_emitter,
                    mode="path", russian_roulette=False, rr_start_depth=0,
                    soft_bandwidth=1e-2, soft_tau=1e-2):
    """The soft program's accumulator DELTA (R, 3) as plain XLA — the
    function whose exact gradient the edge-aware backward returns. Used by
    the FD oracle tests (finite differences of THIS are well-posed
    everywhere, silhouettes included) and for bandwidth diagnostics."""
    R = u_planes.shape[1]
    P = -(-R // LANES) * LANES
    shape = (P // LANES, LANES)
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
    accr, accg, accb = _tile_program_soft(
        [par[i] for i in range(NPAR)], sph_n, tri_n, mat_n, lig_n,
        pairs, ridf, in_range,
        spp=spp, width=width, bounces=bounces,
        n_sph=sph.shape[0], n_tri=tri.shape[0],
        n_mat=mat.shape[0], n_lig=lig.shape[0],
        two_sided=two_sided, normalize_emitter=normalize_emitter,
        russian_roulette=russian_roulette, rr_start_depth=rr_start_depth,
        mode=mode, bandwidth=soft_bandwidth, tau=soft_tau, vec=True)
    return jnp.stack([accr.reshape(-1)[:R], accg.reshape(-1)[:R],
                      accb.reshape(-1)[:R]], axis=-1)
