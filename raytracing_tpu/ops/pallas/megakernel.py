"""The whole progressive path-tracing pass as ONE fused Pallas kernel.

Motivation (measured on v5e, cornell 1024x1024 spp1 b5): the stage-composed
XLA pipeline compiles to ~195 separate fusions + 63 reductions + 24
transcendental kernels per pass, each round-tripping the 1M-ray wavefront
buffers through HBM — ~7 GB of traffic for ~6 GFLOP of math, 35 ms/pass.
This kernel runs the ENTIRE Assign10 schedule (ref
Assign10-Path_Tracing/code.js:1806-1854 — initTrace, closest hit,
lightRender, NEE shadow+shade per light, bouncePaths x depth) per ray tile
with every intermediate in vector registers / VMEM. Per pass it reads the
scene tables (KB) and the accumulator tile and writes the accumulator back:
~24 MB of HBM traffic total, compute-bound on the VPU.

Scope: ALL production geometry paths — unrolled brute force (small scenes),
Morton-chunk streaming with tile-level AABB culling (large tables), and the
in-kernel uniform-grid mode (resident SMEM CSR or streamed cell-major HBM
rows, per-mesh nslabs, front-to-back cell order with tile-level early exit).
Training runs through this kernel too: ops/pallas/megakernel_grad.py wraps
it in a custom VJP (chunk-culled or cell-structured backward), so
`jax.grad` through render_pass_mega is defined for every supported_diff
configuration (render/mega.py gates).

Math is line-for-line the same as the XLA stages (render/stages.py,
render/camera.py, core/sampling.py), which themselves cite the reference
kernels (code.cl). Two RNG modes:

  * ``u_planes`` given — draws are read from a precomputed tensor with the
    exact slot layout of render/pathtracer._render_pass's pass-wide batched
    draw, so the kernel is verifiable against the XLA pipeline to float
    tolerance (tests do this in interpret mode on CPU).
  * ``u_planes=None`` — draws come from the on-core PRNG
    (pltpu.prng_random_bits), seeded per (render seed, pass index, tile):
    reproducible across runs at fixed tile size, zero HBM traffic. Images
    differ from the XLA path only statistically (different counter RNG —
    same sampler semantics; SURVEY quirk 6 replacement still holds: seeding
    is by logical identity, not launch geometry).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array
INF = jnp.inf

LANES = 128
SUBLANES = 32            # flat between 8 and 64 on v5e (compute-bound); 32 best
TILE = LANES * SUBLANES

# object loops with <= this many objects are unrolled with STATIC table
# indices: a dynamic VMEM scalar load compiles to load+rotate+extract chains
# (~5 vector ops per scalar), while static loads are CSE'd/hoisted once per
# kernel across all 12 trace/occlusion sites
UNROLL_OBJECTS = 64
# tables at most this many f32 go to SMEM (native scalar reads). This is
# what makes the fori_loop object path viable for medium scenes: with the
# table in SMEM a dynamic tri[i, j] read is one scalar-unit load (measured
# v5e, 1022 tris, 512x512 b5: 65 ms/pass vs 160 ms with the same loop
# reading VMEM). 32k f32 (= 1024 tris at 32 f32 each) verified to fit.
SMEM_TABLE_MAX = 36 * 1024
# triangle tables beyond the SMEM budget STREAM: Morton-sorted chunks of
# this many triangles, per-chunk AABBs in an SMEM cull table; each ray tile
# slab-tests a chunk's AABB against its live t-windows (vector test, scalar
# any-reduce) and only DMAs + intersects chunks some ray can still hit.
# This is the TPU-native analog of the reference's uniform grid (ref
# splitTriangleData binning, code.js:1643-1772; DDA code.cl:675-800):
# identical build-time spatial binning, consumed at tile granularity —
# the granularity at which a vector machine can actually skip work.
STREAM_CHUNK = 128
# triangle tables stream above the unroll budget. (Round-2 measurement,
# v5e 512x512 b5: the former SMEM-fori middle path ran teapot at 0.99x
# the XLA pipeline and compiled for ~17 minutes through the relay; the
# streaming path's tile culling lets wall-facing tiles skip the mesh
# outright and compiles an order of magnitude faster.)
STREAM_MIN_TRIS = UNROLL_OBJECTS
# STREAMED grid mode (tables beyond the SMEM budget): the cell-major
# duplicated object table lives in HBM (the reference's own re-vendored
# per-cell buffer layout, splitTriangleData code.js:1643-1772); a visited
# cell's rows are DMA'd in sub-chunks of this many 128-wide rows. Cells
# average tens of items, so a small chunk keeps the fetch tight.
# RT_GRID_CHUNK overrides for tuning (must divide the padded cell tables;
# render/mega._cell_major_table pads with GRID_CHUNK rows so any value
# set at import time is consistent).
import os as _os

GRID_CHUNK = int(_os.environ.get("RT_GRID_CHUNK", "32"))


class _FlatTable:
    """Scalar-read adapter over a FLATTENED 1-D SMEM table. 2-D SMEM
    windows pad every row to 512 bytes (measured: a (1022, 32) f32 table
    costs 512 KB of the ~1 MB SMEM; (1000, 6) cell bounds another 500 KB),
    so all scalar-indexed SMEM tables ride as 1-D refs and this adapter
    restores ``tab[i, j]`` indexing with a static column count."""

    def __init__(self, ref, ncols: int):
        self.ref = ref
        self.ncols = ncols

    def __getitem__(self, idx):
        i, j = idx
        return self.ref[i * self.ncols + j]


class _SlotView:
    """``tab[i, j] -> ref[slot, i, j]`` view of a double-buffered SMEM
    chunk (slot may be a traced value; SMEM scalar reads take dynamic
    leading indices)."""

    def __init__(self, ref, slot):
        self.ref = ref
        self.slot = slot

    def __getitem__(self, idx):
        i, j = idx
        return self.ref[self.slot, i, j]


def _loop_objects(n: int, body, init):
    """Unrolled (static indices) or fori_loop object iteration."""
    if n <= UNROLL_OBJECTS:
        c = init
        for i in range(n):
            c = body(i, c)
        return c
    return jax.lax.fori_loop(0, n, body, init)


def _loop_cells(grid_n: tuple, step):
    """Grid-cell iteration for the in-kernel uniform-grid mode. Small
    grids unroll with STATIC cell indices (static SMEM offset/AABB reads);
    larger ones run a fori_loop whose ``step`` body reads the per-cell CSR
    window and AABB with dynamic SMEM indices."""
    n_cells = grid_n[0] * grid_n[1] * grid_n[2]
    if n_cells <= UNROLL_OBJECTS:
        for ci in range(n_cells):
            step(ci, 0)
        return
    jax.lax.fori_loop(0, n_cells, step, 0)


def _loop_early(n: int, step, done_fn):
    """Iteration over [0, n) with tile-level EARLY EXIT — the TPU analog
    of the reference DDA's per-ray march break (code.cl:745-786): stop as
    soon as ``done_fn(ci)`` (a scalar predicate over the champion scratch,
    evaluated for the NEXT index) says no ray can gain from the remaining
    iterations. Small n unrolls with pl.when guards (static indices);
    larger n runs a while_loop with an i32 done flag in the carry (Mosaic
    cannot legalize i1 scalars in loop carries)."""
    if n <= UNROLL_OBJECTS:
        for ci in range(n):
            @pl.when(jnp.logical_not(done_fn(ci)))
            def _(ci=ci):
                step(ci, 0)
        return

    def cond(c):
        return (c[0] < n) & (c[1] == 0)

    def body(c):
        ci, _ = c
        step(ci, 0)
        nxt = ci + 1
        return (nxt, jnp.where(done_fn(nxt), jnp.int32(1), jnp.int32(0)))

    jax.lax.while_loop(cond, body, (jnp.int32(0),
                                    jnp.where(done_fn(0), jnp.int32(1),
                                              jnp.int32(0))))


def _slab6(lo0, lo1, lo2, hi0, hi1, hi2, ox, oy, oz, invdx, invdy, invdz):
    """Slab [near, far] of an AABB (6 scalars) along each ray."""
    t0x = (lo0 - ox) * invdx
    t1x = (hi0 - ox) * invdx
    t0y = (lo1 - oy) * invdy
    t1y = (hi1 - oy) * invdy
    t0z = (lo2 - oz) * invdz
    t1z = (hi2 - oz) * invdz
    near = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                   jnp.minimum(t0y, t1y)),
                       jnp.minimum(t0z, t1z))
    far = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                  jnp.maximum(t0y, t1y)),
                      jnp.maximum(t0z, t1z))
    return near, far

# scalar-parameter vector layout (SMEM f32)
_PAR = dict(eye=0, u=3, v=6, w=9, film_w=12, film_h=13, cols=14, rows=15,
            focal=16, lens_r=17, pmin=18, pmax=21, eps=24, ambient=25)
NPAR = 26


# ---------------------------------------------------------------------------
# small in-kernel math helpers (componentwise; mirror core/* exactly)
# ---------------------------------------------------------------------------

def _normalize3(x, y, z):
    """core.types.safe_normalize: guard the squared norm before rsqrt."""
    n2 = x * x + y * y + z * z
    inv = jax.lax.rsqrt(jnp.where(n2 > 0.0, n2, 1.0))
    return x * inv, y * inv, z * inv


def _cross(ax, ay, az, bx, by, bz):
    return ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx


def _concentric(u0, u1):
    """core.sampling.concentric_disk (ref concentric_distort code.cl:143-172)."""
    a = 2.0 * u0 - 1.0
    b = 2.0 * u1 - 1.0
    top = a * a > b * b
    safe_a = jnp.where(a == 0.0, 1.0, a)
    safe_b = jnp.where(b == 0.0, 1.0, b)
    radius = jnp.where(top, a, b)
    phi = jnp.where(top, (jnp.pi / 4.0) * (b / safe_a),
                    (jnp.pi / 2.0) - (jnp.pi / 4.0) * (a / safe_b))
    x = jnp.cos(phi) * radius
    y = jnp.sin(phi) * radius
    zero = (u0 == 0.0) & (u1 == 0.0)
    return jnp.where(zero, u0, x), jnp.where(zero, u1, y)


def _tangent_frame(nx, ny, nz):
    """core.types.tangent_frame: min-|component| trick, ties toward x
    (ref Light.calculateTBN code.js:301-320)."""
    ax, ay, az = jnp.abs(nx), jnp.abs(ny), jnp.abs(nz)
    mn = jnp.minimum(ax, jnp.minimum(ay, az))
    fx = ax == mn
    fy = (ay == mn) & ~fx
    fz = (az == mn) & ~fx & ~fy
    vx = jnp.where(fx, 1.0, nx)
    vy = jnp.where(fy, 1.0, ny)
    vz = jnp.where(fz, 1.0, nz)
    vx, vy, vz = _normalize3(vx, vy, vz)
    tx, ty, tz = _normalize3(*_cross(vx, vy, vz, nx, ny, nz))
    bx, by, bz = _normalize3(*_cross(nx, ny, nz, tx, ty, tz))
    return (tx, ty, tz), (bx, by, bz)


class _Draws:
    """Sequential (u0, u1) pair source: precomputed planes (test/verify
    mode) or the on-core PRNG. Slot order mirrors _render_pass's pass-wide
    tensor: lens, NEE per light (primary), then per depth: bounce,
    NEE per light."""

    def __init__(self, u_ref, shape):
        self.u_ref = u_ref
        self.shape = shape
        self.j = 0

    def skip(self):
        self.j += 1

    def pair(self):
        if self.u_ref is not None:
            u0 = self.u_ref[2 * self.j]
            u1 = self.u_ref[2 * self.j + 1]
        else:
            b0 = pltpu.prng_random_bits(self.shape)
            b1 = pltpu.prng_random_bits(self.shape)
            scale = jnp.float32(1.0 / (1 << 24))
            # LOGICAL shift: prng_random_bits yields signed i32, and an
            # arithmetic `>> 8` would sign-extend — half the draws came
            # out in [-0.5, 0) and biased every sampler in PRNG mode
            # (caught by the round-5 TPU golden tie, which the
            # u-planes-verified CPU path could never see)
            u0 = jax.lax.shift_right_logical(b0, 8).astype(jnp.float32) \
                * scale
            u1 = jax.lax.shift_right_logical(b1, 8).astype(jnp.float32) \
                * scale
        self.j += 1
        return u0, u1


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _render_pass_kernel(ipar, par, sph, tri, chk, mat, lig, *rest,
                        n_rays: int, spp: int, width: int, bounces: int,
                        n_sph: int, n_tri: int, n_mat: int, n_lig: int,
                        two_sided: bool, normalize_emitter: bool,
                        use_u: bool, seed: int, mode: str = "path",
                        russian_roulette: bool = False,
                        rr_start_depth: int = 0,
                        stream_tri: bool = False, n_chunks: int = 0,
                        tri_grids: tuple = (),
                        grid_streamed: bool = False, grid_start: int = 0,
                        sph_grid_n: tuple = (),
                        block: int = 0,
                        stream_sph: bool = False, n_sph_chunks: int = 0,
                        flat_sph: bool = False, flat_tri: bool = False,
                        flat_mat: bool = False, flat_lig: bool = False,
                        n_kernel_passes: int = 1,
                        record: bool = False, rec_sph_rows: int = 0,
                        rec_tri_offs: tuple = ()):
    # ``record``: CHAMPION RECORDING for the cell-marching backward
    # (ops/pallas/megakernel_grad.py "cell" route): every closest-hit
    # champion loop additionally tracks the winner's DIFF-TABLE row id
    # (spheres in [0, rec_sph_rows), triangles offset by rec_sph_rows —
    # grid payload rows use the per-grid offsets in rec_tri_offs), and
    # each trace segment / NEE occlusion result is written to extra
    # ray-plane outputs. The backward then re-derives the champion
    # surface analytically from the recorded row instead of re-sweeping
    # objects — the forward's cell march (this kernel, full speed) is
    # the only traversal in the whole train step.
    grid_tri = bool(tri_grids)
    # un-flatten SMEM tables (see _FlatTable): fixed packing widths
    if flat_sph:
        sph = _FlatTable(sph, 8)
    if flat_tri:
        tri = _FlatTable(tri, 32)
    if flat_mat:
        mat = _FlatTable(mat, 4)
    if flat_lig:
        lig = _FlatTable(lig, 20)
    chk = _FlatTable(chk, 8)          # stream-chunk AABBs: always SMEM
    rest = list(rest)
    tri_grid_args = []
    if grid_tri:
        # per-grid uniform-grid tables, one entry per (large) mesh — the
        # reference's per-mesh meshTrace dispatch with its own nslabs
        # (code.js:1293-1303). RESIDENT grids: CSR offsets (C+1,), item
        # ids into the SMEM tri table, geometry params [pmin xyz, cell
        # width xyz], tight per-cell AABBs (C, 6) in front-to-back visit
        # order (accel.grid.mega_order_grid). STREAMED grids: item ids are
        # replaced by a cell-major duplicated row table in HBM, DMA'd per
        # visited cell (tables beyond the SMEM budget).
        for _ in tri_grids:
            if grid_streamed:
                # (goff, gpar, gb, gtab, gdist) — gb flattened (SMEM row
                # padding); gdist = (C+1,) monotone eye->cell distance
                # bounds (closest-hit early exit, _loop_early)
                tri_grid_args.append((rest.pop(0), rest.pop(0),
                                      _FlatTable(rest.pop(0), 6),
                                      rest.pop(0), rest.pop(0)))
            else:
                # (goff, gitems, gpar, gb, gdist)
                a, b, c_, d, e_ = (rest.pop(0), rest.pop(0), rest.pop(0),
                                   rest.pop(0), rest.pop(0))
                tri_grid_args.append((a, b, c_, _FlatTable(d, 6), e_))
    sph_grid_args = None
    if sph_grid_n:
        # in-kernel SPHERE grid (big molecules; ref splitSphereData
        # code.js:1554-1641): always streamed (it exists precisely for
        # tables beyond SMEM). (goff, gpar, gb, gtab, gdist)
        sph_grid_args = (rest.pop(0), rest.pop(0),
                         _FlatTable(rest.pop(0), 6), rest.pop(0),
                         rest.pop(0))
    if stream_sph:
        # per-sphere-chunk AABBs, flattened SMEM
        schk = _FlatTable(rest.pop(0), 8)
    u_ref = rest.pop(0) if use_u else None
    acc_in = rest[0:3]
    acc_out = rest[3:6]
    if record:
        n_seg_rec = 1 + (bounces if mode == "path" else 0)
        n_occ_rec = n_lig * n_seg_rec
        rec_refs = rest[6:6 + n_seg_rec + n_occ_rec]
        scratch = rest[6 + n_seg_rec + n_occ_rec:]
    else:
        rec_refs = ()
        scratch = rest[6:]
    if stream_tri:
        smem_chunk = scratch.pop(0)  # SMEM triangle chunk buffer
    if stream_sph:
        smem_sph = scratch.pop(0)    # SMEM sphere chunk buffer
    gchunk_dma = grid_streamed or bool(sph_grid_n)
    if gchunk_dma:
        # (2, GRID_CHUNK, 128) double-buffered SMEM grid-cell sub-chunk
        # buffer + its own 2-slot DMA semaphore array
        smem_gchunk = scratch.pop(0)
        gdma_sem = scratch.pop(0)
    if stream_tri or stream_sph:
        dma_sem = scratch.pop(0)
    if stream_tri or stream_sph or grid_tri or sph_grid_n:
        (s_bt, s_bnx, s_bny, s_bnz, s_bm) = scratch[0:5]
        s_brid = scratch[5] if record else None

    shape = (SUBLANES, LANES)
    pid = pl.program_id(0)
    roff = ipar[1]                   # global ray offset of this shard
    def one_pass(p, accr, accg, accb):
        """The ENTIRE Assign10 schedule for progressive pass
        ``ipar[0] + p`` (ref executeRender, code.js:1806-1854): draws
        come from the on-core PRNG re-seeded per pass, so K passes in
        one kernel launch produce bit-identical accumulators to K
        host-dispatched launches — multi-pass accumulation keeps acc
        in registers/VMEM across passes (no per-pass HBM round-trip
        or dispatch; round-3 VERDICT item 4)."""
        if not use_u:
            # one mixed scalar: (render seed, pass, shard offset, tile) -> i32;
            # the offset term keeps shards of a multi-chip render decorrelated
            mixed = (jnp.int32(seed & 0x7FFFFFFF) * jnp.int32(1000003)
                     + (ipar[0] + p) * jnp.int32(40503) + roff * jnp.int32(131) + pid)
            pltpu.prng_seed(mixed)
        draws = _Draws(u_ref, shape)

        # ---- ray ids / pixel coordinates (f32 exact below 2^24, asserted by
        # the wrapper). ``rid`` is shard-local (bounds mask + block indexing);
        # pixel decode uses the GLOBAL id. ----------------------------------
        rid = ((pid * SUBLANES
                + jax.lax.broadcasted_iota(jnp.int32, shape, 0)) * LANES
               + jax.lax.broadcasted_iota(jnp.int32, shape, 1))
        in_range = rid < n_rays
        ridf = (rid + roff).astype(jnp.float32)
        sppf = jnp.float32(spp)
        pix = jnp.floor(ridf / sppf)
        samp = ridf - pix * sppf
        wf = jnp.float32(width)
        if block:
            # blocked pixel layout: consecutive ray slots fill a block x block
            # pixel square, so each (SUBLANES, LANES) tile covers a COMPACT
            # screen region — tile-level culling (grid cells, stream chunks)
            # then sees a narrow frustum instead of a full-width strip. The
            # host unpermutes the accumulator (render/mega._unblock_image).
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

        def P(name, off=0):
            return par[_PAR[name] + off]

        ex, ey, ez = P("eye"), P("eye", 1), P("eye", 2)
        ux, uy, uz = P("u"), P("u", 1), P("u", 2)
        vx, vy, vz = P("v"), P("v", 1), P("v", 2)
        wx, wy, wz = P("w"), P("w", 1), P("w", 2)
        eps = P("eps")

        # ---- film point -> pinhole dir -> focal point ----------------------
        # (render/camera.py film_point/focal_points; ref getRay code.cl:108-119,
        #  getFocalPoint code.cl:174-181)
        su = (-0.5 + (colf + 0.5) / P("cols")) * P("film_w")
        sv = (0.5 - (rowf + 0.5) / P("rows")) * P("film_h")
        cx = su * ux + sv * vx - wx
        cy = su * uy + sv * vy - wy
        cz = su * uz + sv * vz - wz
        px_, py_, pz_ = _normalize3(cx, cy, cz)
        fl = P("focal")
        pipd = -((ex - fl * wx) * wx + (ey - fl * wy) * wy + (ez - fl * wz) * wz)
        t_f = -((ex * wx + ey * wy + ez * wz) + pipd) / \
            (px_ * wx + py_ * wy + pz_ * wz)
        fpx = ex + t_f * px_
        fpy = ey + t_f * py_
        fpz = ez + t_f * pz_

        # ---- thin-lens origin + dir (ref getThinLensRay code.cl:183-197) ----
        if spp > 1:
            k = int(round(spp ** 0.5))
            draws.skip()                       # slot 0 reserved (XLA layout)
            si = jnp.floor(samp / k)
            sj = samp - si * k
            u0 = (sj + 0.5) / k
            u1 = (si + 0.5) / k
        else:
            u0, u1 = draws.pair()
        dx_, dy_ = _concentric(u0, u1)
        lr = P("lens_r")
        ox = ex + lr * (dx_ * ux + dy_ * vx)
        oy = ey + lr * (dx_ * uy + dy_ * vy)
        oz = ez + lr * (dx_ * uz + dy_ * vz)
        dx, dy, dz = _normalize3(fpx - ox, fpy - oy, fpz - oz)

        # ---- clip to scene AABB (render/camera.py clip_to_bounds;
        #      ref initTrace code.cl:495-501) -------------------------------
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

        # ---- closest hit over all geometry (ops/closest_hit.py;
        #      ref sphereTrace/triangleTrace champion loops) -----------------
        # large triangle sets run as fori_loop over SMEM; there, normal
        # interpolation is DEFERRED out of the champion loop (carry champion
        # beta/gamma/index, resolve the 9 vn reads in a cheap one-hot pass
        # afterward) — ~20% fewer VPU ops per triangle on the hot loop.
        # Streaming chunks interpolate inline (an O(n_tri) deferred pick pass
        # would defeat the culling).
        defer_interp = n_tri > UNROLL_OBJECTS and not stream_tri and not grid_tri

        def chunk_overlap(tab, c, ox, oy, oz, invdx, invdy, invdz, lo, hi):
            """Does any ray's [lo, hi] window overlap chunk c's AABB (row c of
            ``tab``: [pmin xyz, pmax xyz, ...])? Vector slab test against SMEM
            scalar bounds + scalar any-reduce — the tile-level culling test
            (grid analog; ~30 VPU ops/ray/chunk vs ~45*STREAM_CHUNK for the
            chunk's objects)."""
            t0x = (tab[c, 0] - ox) * invdx
            t1x = (tab[c, 3] - ox) * invdx
            t0y = (tab[c, 1] - oy) * invdy
            t1y = (tab[c, 4] - oy) * invdy
            t0z = (tab[c, 2] - oz) * invdz
            t1z = (tab[c, 5] - oz) * invdz
            near = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                           jnp.minimum(t0y, t1y)),
                               jnp.minimum(t0z, t1z))
            far = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                          jnp.maximum(t0y, t1y)),
                              jnp.maximum(t0z, t1z))
            return jnp.maximum(near, lo) <= jnp.minimum(far, hi)

        def safe_inv(d_):
            return 1.0 / jnp.where(d_ == 0.0, 1e-30, d_)

        def fetch_chunk(c):
            cp = pltpu.make_async_copy(
                tri.at[pl.ds(c * STREAM_CHUNK, STREAM_CHUNK), :],
                smem_chunk, dma_sem)
            cp.start()
            cp.wait()

        def fetch_sph_chunk(c):
            cp = pltpu.make_async_copy(
                sph.at[pl.ds(c * STREAM_CHUNK, STREAM_CHUNK), :],
                smem_sph, dma_sem)
            cp.start()
            cp.wait()

        def trace(ox, oy, oz, dx, dy, dz, mint, maxt):
            alive = mint != maxt
            a = dx * dx + dy * dy + dz * dz
            inv2a = 0.5 / a
            # o x d is loop-invariant across triangles — hoisted
            xx, xy_, xz_ = _cross(ox, oy, oz, dx, dy, dz)
            zero = jnp.zeros(shape)
            init = (inf2, zero, zero, zero, jnp.full(shape, -1.0),
                    zero, zero, jnp.full(shape, -1.0))
            if record:
                init = init + (jnp.full(shape, -1.0),)   # brid (diff row)

            def sph_body(i, c):
                if record:
                    bt, bnx, bny, bnz, bm, bbe, bga, bid, brid = c
                else:
                    bt, bnx, bny, bnz, bm, bbe, bga, bid = c
                scx, scy, scz = sph[i, 0], sph[i, 1], sph[i, 2]
                r, mf, msk = sph[i, 3], sph[i, 4], sph[i, 5]
                mx = ox - scx
                my = oy - scy
                mz = oz - scz
                b = 2.0 * (mx * dx + my * dy + mz * dz)
                cq = mx * mx + my * my + mz * mz - r * r
                dis = b * b - 4.0 * a * cq
                sq = jnp.sqrt(jnp.maximum(dis, 0.0))
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
                out = (jnp.where(better, t, bt),
                       jnp.where(better, hnx, bnx),
                       jnp.where(better, hny, bny),
                       jnp.where(better, hnz, bnz),
                       jnp.where(better, mf, bm),
                       bbe, bga,
                       jnp.where(better, -1.0, bid))
                if record:
                    rid = jnp.asarray(i, jnp.float32)
                    out = out + (jnp.where(better, rid, brid),)
                return out

            def tri_body(i, c):
                if record:
                    bt, bnx, bny, bnz, bm, bbe, bga, bid, brid = c
                else:
                    bt, bnx, bny, bnz, bm, bbe, bga, bid = c
                ngx, ngy, ngz = tri[i, 0], tri[i, 1], tri[i, 2]
                c1x, c1y, c1z = tri[i, 3], tri[i, 4], tri[i, 5]
                c2x, c2y, c2z = tri[i, 6], tri[i, 7], tri[i, 8]
                e1x, e1y, e1z = tri[i, 9], tri[i, 10], tri[i, 11]
                e2x, e2y, e2z = tri[i, 12], tri[i, 13], tri[i, 14]
                kk, mf, msk = tri[i, 15], tri[i, 16], tri[i, 17]
                # Moller-Trumbore, constant-split form (ops/intersect.py
                # triangle_ts_matmul; ref interTriangle code.cl:250-288)
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
                if record:
                    rid = jnp.asarray(i, jnp.float32) + float(rec_sph_rows)
                if defer_interp:
                    out = (jnp.where(better, t, bt), bnx, bny, bnz,
                           jnp.where(better, mf, bm),
                           jnp.where(better, beta, bbe),
                           jnp.where(better, gamma, bga),
                           jnp.where(better, jnp.asarray(i, jnp.float32), bid))
                    if record:
                        out = out + (jnp.where(better, rid, brid),)
                    return out
                # interpolated vertex normal (ref interp code.cl:405-411)
                alpha = 1.0 - beta - gamma
                hnx = alpha * tri[i, 18] + beta * tri[i, 21] + gamma * tri[i, 24]
                hny = alpha * tri[i, 19] + beta * tri[i, 22] + gamma * tri[i, 25]
                hnz = alpha * tri[i, 20] + beta * tri[i, 23] + gamma * tri[i, 26]
                hnx, hny, hnz = _normalize3(hnx, hny, hnz)
                out = (jnp.where(better, t, bt),
                       jnp.where(better, hnx, bnx),
                       jnp.where(better, hny, bny),
                       jnp.where(better, hnz, bnz),
                       jnp.where(better, mf, bm),
                       bbe, bga,
                       jnp.where(better, -1.0, bid))
                if record:
                    out = out + (jnp.where(better, rid, brid),)
                return out

            def make_tri_body5(tab, idx_map=None, rid_of=None):
                """Inline-interp tri body over a scalar-indexed table ``tab``
                (the DMA'd SMEM chunk, or the whole SMEM tri table with a
                DYNAMIC grid-cell item index) with 5-tuple champion carry.
                ``idx_map`` maps the loop index to the table row (resident
                grids: payload position -> item id); ``rid_of`` (record
                mode) maps the loop index to the DIFF-table row id carried
                as a 6th champion field."""

                def body(j, c):
                    i = idx_map(j) if idx_map is not None else j
                    if record:
                        bt, bnx, bny, bnz, bm, brid = c
                    else:
                        bt, bnx, bny, bnz, bm = c
                    ngx, ngy, ngz = tab[i, 0], tab[i, 1], tab[i, 2]
                    c1x, c1y, c1z = tab[i, 3], tab[i, 4], tab[i, 5]
                    c2x, c2y, c2z = tab[i, 6], tab[i, 7], tab[i, 8]
                    e1x, e1y, e1z = tab[i, 9], tab[i, 10], tab[i, 11]
                    e2x, e2y, e2z = tab[i, 12], tab[i, 13], tab[i, 14]
                    kk, mf, msk = tab[i, 15], tab[i, 16], tab[i, 17]
                    div = ngx * dx + ngy * dy + ngz * dz
                    side_ok = (div != 0.0) if two_sided else (div > 0.0)
                    idiv = 1.0 / jnp.where(div == 0.0, 1.0, div)
                    beta = (e2x * xx + e2y * xy_ + e2z * xz_
                            - (c2x * dx + c2y * dy + c2z * dz)) * idiv
                    gamma = ((c1x * dx + c1y * dy + c1z * dz)
                             - (e1x * xx + e1y * xy_ + e1z * xz_)) * idiv
                    t = (kk - (ngx * ox + ngy * oy + ngz * oz)) * idiv
                    okh = side_ok & (beta >= 0.0) & (beta <= 1.0) \
                        & (gamma >= 0.0) & (beta + gamma <= 1.0) \
                        & (t >= mint) & (t <= maxt) & (msk > 0.0) & alive
                    t = jnp.where(okh, t, inf2)
                    better = t < bt
                    alpha = 1.0 - beta - gamma
                    hnx = alpha * tab[i, 18] + beta * tab[i, 21] \
                        + gamma * tab[i, 24]
                    hny = alpha * tab[i, 19] + beta * tab[i, 22] \
                        + gamma * tab[i, 25]
                    hnz = alpha * tab[i, 20] + beta * tab[i, 23] \
                        + gamma * tab[i, 26]
                    hnx, hny, hnz = _normalize3(hnx, hny, hnz)
                    out = (jnp.where(better, t, bt),
                           jnp.where(better, hnx, bnx),
                           jnp.where(better, hny, bny),
                           jnp.where(better, hnz, bnz),
                           jnp.where(better, mf, bm))
                    if record:
                        out = out + (jnp.where(better, rid_of(j), brid),)
                    return out

                return body

            def make_sph_body5(tab, idx_map=None, rid_of=None):
                """Sphere champion body over a scalar-indexed table with
                5-tuple carry (streamed SMEM chunk rows)."""

                def body(j, c):
                    i = idx_map(j) if idx_map is not None else j
                    if record:
                        bt, bnx, bny, bnz, bm, brid = c
                    else:
                        bt, bnx, bny, bnz, bm = c
                    scx, scy, scz = tab[i, 0], tab[i, 1], tab[i, 2]
                    r, mf, msk = tab[i, 3], tab[i, 4], tab[i, 5]
                    mx = ox - scx
                    my = oy - scy
                    mz = oz - scz
                    b = 2.0 * (mx * dx + my * dy + mz * dz)
                    cq = mx * mx + my * my + mz * mz - r * r
                    dis = b * b - 4.0 * a * cq
                    sq = jnp.sqrt(jnp.maximum(dis, 0.0))
                    t0 = (-b - sq) * inv2a
                    t1 = (-b + sq) * inv2a
                    tmn = jnp.minimum(t0, t1)
                    tmx = jnp.maximum(t0, t1)
                    t = jnp.where((tmn >= mint) & (tmn <= maxt), tmn,
                                  jnp.where((tmx >= mint) & (tmx <= maxt),
                                            tmx, inf2))
                    t = jnp.where((dis >= 0.0) & (msk > 0.0) & alive, t, inf2)
                    better = t < bt
                    ts = jnp.where(better, t, 0.0)
                    hnx, hny, hnz = _normalize3(ox + ts * dx - scx,
                                                oy + ts * dy - scy,
                                                oz + ts * dz - scz)
                    out = (jnp.where(better, t, bt),
                           jnp.where(better, hnx, bnx),
                           jnp.where(better, hny, bny),
                           jnp.where(better, hnz, bnz),
                           jnp.where(better, mf, bm))
                    if record:
                        out = out + (jnp.where(better, rid_of(j), brid),)
                    return out

                return body

            def carry_read():
                c5 = [s_bt[:], s_bnx[:], s_bny[:], s_bnz[:], s_bm[:]]
                if record:
                    c5.append(s_brid[:])
                return tuple(c5)

            def carry_write(c):
                s_bt[:], s_bnx[:], s_bny[:], s_bnz[:], s_bm[:] = c[0:5]
                if record:
                    s_brid[:] = c[5]

            def stream_cell_loop(goff, gb, gtab, make_body5, rid_base=0.0):
                """Streamed-grid cell visit for the CLOSEST-HIT search: slab
                test vs the cell AABB against each ray's live [mint,
                min(maxt, champion)] window; visited cells DMA their
                cell-major rows in GRID_CHUNK sub-chunks (DOUBLE-BUFFERED —
                the next sub-chunk's fetch overlaps the current one's
                champion loop) and champion them with masked fori (count =
                CSR extent)."""

                def gchunk_dma_at(lo_off, k, slot):
                    # reconstructed for start and wait (guide's pattern)
                    return pltpu.make_async_copy(
                        gtab.at[pl.ds(lo_off + k * GRID_CHUNK,
                                      GRID_CHUNK), :],
                        smem_gchunk.at[slot], gdma_sem.at[slot])

                def cell_loop(ci, _):
                    lo_off = goff[ci]
                    hi_off = goff[ci + 1]
                    near, far = _slab6(gb[ci, 0], gb[ci, 1], gb[ci, 2],
                                       gb[ci, 3], gb[ci, 4], gb[ci, 5],
                                       ox, oy, oz, invdx, invdy, invdz)
                    hi = jnp.minimum(maxt, s_bt[:])
                    overlap = (jnp.maximum(near, mint)
                               <= jnp.minimum(far, hi)) & alive

                    @pl.when(jnp.any(overlap) & (lo_off < hi_off))
                    def _():
                        nsub = (hi_off - lo_off + GRID_CHUNK - 1) // GRID_CHUNK
                        gchunk_dma_at(lo_off, 0, 0).start()

                        def sub(k, _2):
                            slot = jax.lax.rem(k, 2)

                            @pl.when(k + 1 < nsub)
                            def _():
                                gchunk_dma_at(lo_off, k + 1,
                                              1 - slot).start()

                            gchunk_dma_at(lo_off, k, slot).wait()
                            cnt = jnp.minimum(jnp.int32(GRID_CHUNK),
                                              hi_off - k * GRID_CHUNK
                                              - lo_off)
                            # record: the diff-table row of sub-chunk slot
                            # jj is its cell-major table row + table offset
                            rid_of = (lambda jj:
                                      (lo_off + k * GRID_CHUNK + jj)
                                      .astype(jnp.float32) + rid_base)
                            body5 = make_body5(_SlotView(smem_gchunk, slot),
                                               rid_of=rid_of)
                            carry = carry_read()
                            carry = jax.lax.fori_loop(0, cnt, body5, carry)
                            carry_write(carry)
                            return 0

                        jax.lax.fori_loop(0, nsub, sub, 0)
                    return 0

                return cell_loop

            if sph_grid_n or grid_tri:
                # closest-hit EARLY EXIT support: a cell at eye-distance
                # >= gd can only produce t >= gd - |eye - o| for a ray
                # from origin o (|d| = 1), so once every ray's champion
                # window ends before that, remaining (front-to-back
                # sorted) cells cannot win — the reference DDA's march
                # break at tile granularity (code.cl:745-786)
                eyed = jnp.sqrt((ox - ex) ** 2 + (oy - ey) ** 2
                                + (oz - ez) ** 2)

                def mk_hit_done(gdist_ref):
                    def done(ci):
                        hi = jnp.minimum(maxt, s_bt[:])
                        gd = gdist_ref[ci]
                        return jnp.logical_not(
                            jnp.any(alive & (hi + eyed >= gd)))
                    return done

            def to_scratch(c):
                s_bt[:], s_bnx[:], s_bny[:], s_bnz[:], s_bm[:] = c[0:5]
                if record:
                    s_brid[:] = c[8]

            def from_scratch(c):
                out = (s_bt[:], s_bnx[:], s_bny[:], s_bnz[:], s_bm[:],
                       c[5], c[6], c[7])
                if record:
                    out = out + (s_brid[:],)
                return out

            c = init
            if n_sph and sph_grid_n:
                # in-kernel sphere grid: cells visited under the shrinking
                # champion window — the fix for dense-cloud bounce rays, where
                # Morton-chunk streaming's per-chunk AABBs all overlap but a
                # short champion window crosses only a few CELLS
                to_scratch(c)
                invdx, invdy, invdz = safe_inv(dx), safe_inv(dy), safe_inv(dz)
                sgoff, sgpar, sgb, sgtab, sgdist = sph_grid_args
                cell_loop = stream_cell_loop(sgoff, sgb, sgtab,
                                             make_sph_body5)
                gnear, gfar = _slab6(
                    sgpar[0], sgpar[1], sgpar[2],
                    sgpar[0] + float(sph_grid_n[0]) * sgpar[3],
                    sgpar[1] + float(sph_grid_n[1]) * sgpar[4],
                    sgpar[2] + float(sph_grid_n[2]) * sgpar[5],
                    ox, oy, oz, invdx, invdy, invdz)
                ghit = (jnp.maximum(gnear, mint)
                        <= jnp.minimum(gfar, jnp.minimum(maxt, s_bt[:]))) & alive

                @pl.when(jnp.any(ghit))
                def _():
                    _loop_early(sph_grid_n[0] * sph_grid_n[1]
                                * sph_grid_n[2], cell_loop,
                                mk_hit_done(sgdist))

                c = from_scratch(c)
            if n_sph and not stream_sph and not sph_grid_n:
                c = _loop_objects(n_sph, sph_body, c)
            if n_sph and stream_sph:
                # streamed spheres (big molecules): Morton chunks + per-chunk
                # AABB culling, same scheme as triangle streaming
                to_scratch(c)
                invdx, invdy, invdz = safe_inv(dx), safe_inv(dy), safe_inv(dz)

                def sph_chunk_loop(ci, _):
                    hi = jnp.minimum(maxt, s_bt[:])
                    overlap = chunk_overlap(schk, ci, ox, oy, oz,
                                            invdx, invdy, invdz, mint, hi)
                    overlap = overlap & alive

                    @pl.when(jnp.any(overlap))
                    def _():
                        fetch_sph_chunk(ci)
                        body = make_sph_body5(
                            smem_sph,
                            rid_of=lambda j: (ci * STREAM_CHUNK + j)
                            .astype(jnp.float32))
                        carry = carry_read()
                        carry = jax.lax.fori_loop(0, STREAM_CHUNK,
                                                  body, carry)
                        carry_write(carry)
                    return 0

                jax.lax.fori_loop(0, n_sph_chunks, sph_chunk_loop, 0)
                c = from_scratch(c)
            if n_tri and not stream_tri and not grid_tri:
                c = _loop_objects(n_tri, tri_body, c)
            if n_tri and stream_tri:
                # tile-level chunk culling: champion state parks in VMEM
                # scratch so chunks a tile cannot hit are skipped entirely
                # (pl.when over the scalar any-reduce)
                to_scratch(c)
                invdx, invdy, invdz = safe_inv(dx), safe_inv(dy), safe_inv(dz)

                def chunk_loop(ci, _):
                    bt_cur = s_bt[:]
                    hi = jnp.minimum(maxt, bt_cur)
                    overlap = chunk_overlap(chk, ci, ox, oy, oz,
                                            invdx, invdy, invdz, mint, hi)
                    overlap = overlap & alive

                    @pl.when(jnp.any(overlap))
                    def _():
                        fetch_chunk(ci)
                        body = make_tri_body5(
                            smem_chunk,
                            rid_of=lambda j: (ci * STREAM_CHUNK + j)
                            .astype(jnp.float32) + float(rec_sph_rows))
                        carry = carry_read()
                        carry = jax.lax.fori_loop(0, STREAM_CHUNK,
                                                  body, carry)
                        carry_write(carry)
                    return 0

                jax.lax.fori_loop(0, n_chunks, chunk_loop, 0)
                c = from_scratch(c)
            if grid_tri:
                # uniform-grid closest hit at TILE granularity (the TPU-native
                # DDA, ref sphereTrace/triangleTrace code.cl:675-935): scene
                # triangles [0, grid_start) run the brute loop (the reference's
                # triangleTrace vs per-mesh meshTrace dispatch split,
                # code.js:1293-1303 — face-spanning walls would bin into
                # O(n^2) cells each); gridded triangles are visited per cell:
                # a vector slab test of every ray's live [mint, min(maxt,
                # champion)] window against the cell AABB + a scalar any-reduce
                # decides whether the tile visits the cell's item list at all.
                # RESIDENT grids read items as DYNAMIC scalar indices into the
                # SMEM triangle table; STREAMED grids DMA the cell's rows from
                # the HBM cell-major table. One grid per large mesh, each with
                # its own resolution and AABB gate (per-mesh nslabs parity).
                # Cell visit order is storage order — correctness does not
                # depend on it (champion over binned items == brute force;
                # duplicated hits idempotent, SURVEY §7 quirk 9); shrinking
                # champion windows still cull back-of-scene cells.
                tri_body_pref = make_tri_body5(
                    tri, rid_of=lambda j: jnp.asarray(j, jnp.float32)
                    + float(rec_sph_rows))
                c_pref = c[0:5] + ((c[8],) if record else ())
                c_pref = _loop_objects(grid_start, tri_body_pref, c_pref)
                s_bt[:], s_bnx[:], s_bny[:], s_bnz[:], s_bm[:] = c_pref[0:5]
                if record:
                    s_brid[:] = c_pref[5]
                invdx, invdy, invdz = safe_inv(dx), safe_inv(dy), safe_inv(dz)

                def resident_cell_loop(goff, gitems, gb, rid_base):
                    # record: payload position j maps to diff row
                    # rid_base + j (cell-major diff table layout,
                    # render/mega.grid_diff_tables); table reads go
                    # through the item id gitems[j]
                    body = make_tri_body5(
                        tri, idx_map=lambda j: gitems[j],
                        rid_of=lambda j: jnp.asarray(j, jnp.float32)
                        + rid_base)

                    def cell_loop(ci, _):
                        lo_off = goff[ci]
                        hi_off = goff[ci + 1]
                        near, far = _slab6(gb[ci, 0], gb[ci, 1], gb[ci, 2],
                                           gb[ci, 3], gb[ci, 4], gb[ci, 5],
                                           ox, oy, oz, invdx, invdy, invdz)
                        hi = jnp.minimum(maxt, s_bt[:])
                        overlap = (jnp.maximum(near, mint)
                                   <= jnp.minimum(far, hi)) & alive

                        @pl.when(jnp.any(overlap) & (lo_off < hi_off))
                        def _():
                            carry = carry_read()
                            carry = jax.lax.fori_loop(lo_off, hi_off, body,
                                                      carry)
                            carry_write(carry)
                        return 0

                    return cell_loop

                for gi, gn in enumerate(tri_grids):
                    rid_base = float(rec_sph_rows
                                     + (rec_tri_offs[gi] if record else 0))
                    if grid_streamed:
                        (goff_g, gpar_g, gb_g, gtab_g,
                         gdist_g) = tri_grid_args[gi]
                        cell_loop = stream_cell_loop(
                            goff_g, gb_g, gtab_g, make_tri_body5,
                            rid_base=rid_base)
                    else:
                        (goff_g, gitems_g, gpar_g, gb_g,
                         gdist_g) = tri_grid_args[gi]
                        cell_loop = resident_cell_loop(goff_g, gitems_g,
                                                       gb_g, rid_base)
                    gnear, gfar = _slab6(
                        gpar_g[0], gpar_g[1], gpar_g[2],
                        gpar_g[0] + float(gn[0]) * gpar_g[3],
                        gpar_g[1] + float(gn[1]) * gpar_g[4],
                        gpar_g[2] + float(gn[2]) * gpar_g[5],
                        ox, oy, oz, invdx, invdy, invdz)
                    ghit = (jnp.maximum(gnear, mint)
                            <= jnp.minimum(gfar, jnp.minimum(maxt, s_bt[:]))) \
                        & alive

                    @pl.when(jnp.any(ghit))
                    def _(cell_loop=cell_loop, gn=gn, gdist_g=gdist_g):
                        _loop_early(gn[0] * gn[1] * gn[2], cell_loop,
                                    mk_hit_done(gdist_g))

                c = from_scratch(c)
            bt, bnx, bny, bnz, bm, bbe, bga, bid = c[0:8]
            brid = c[8] if record else None
            if defer_interp and n_tri:
                # one-hot vn fetch for the champion triangle, then interpolate
                # once (identical math/order to the inline form)
                zero = jnp.zeros(shape)
                vn = (zero,) * 9

                def pick(i, vn):
                    sel = bid == jnp.asarray(i, jnp.float32)
                    return tuple(jnp.where(sel, tri[i, 18 + j], vn[j])
                                 for j in range(9))

                vn = _loop_objects(n_tri, pick, vn)
                alpha = 1.0 - bbe - bga
                hnx = alpha * vn[0] + bbe * vn[3] + bga * vn[6]
                hny = alpha * vn[1] + bbe * vn[4] + bga * vn[7]
                hnz = alpha * vn[2] + bbe * vn[5] + bga * vn[8]
                hnx, hny, hnz = _normalize3(hnx, hny, hnz)
                is_tri = bid >= 0.0
                bnx = jnp.where(is_tri, hnx, bnx)
                bny = jnp.where(is_tri, hny, bny)
                bnz = jnp.where(is_tri, hnz, bnz)
            found = bm >= 0.0
            ts = jnp.where(found, bt, 0.0)
            hpx = ox + ts * dx
            hpy = oy + ts * dy
            hpz = oz + ts * dz
            new_maxt = jnp.where(found, bt, maxt)
            if record:
                return new_maxt, (hpx, hpy, hpz, bnx, bny, bnz, bm), brid
            return new_maxt, (hpx, hpy, hpz, bnx, bny, bnz, bm)

        def anyhit(ox, oy, oz, dx, dy, dz, mint, maxt):
            """Occlusion (ref *ShadowTrace code.cl:1073-1321; explicit bool).
            The fori_loop carry is f32 0/1 — Mosaic cannot legalize i1-vector
            loop carries."""
            alive = mint != maxt
            a = dx * dx + dy * dy + dz * dz
            inv2a = 0.5 / a
            xx, xy_, xz_ = _cross(ox, oy, oz, dx, dy, dz)

            def sph_body(i, occ):
                scx, scy, scz = sph[i, 0], sph[i, 1], sph[i, 2]
                r, msk = sph[i, 3], sph[i, 5]
                mx = ox - scx
                my = oy - scy
                mz = oz - scz
                b = 2.0 * (mx * dx + my * dy + mz * dz)
                cq = mx * mx + my * my + mz * mz - r * r
                dis = b * b - 4.0 * a * cq
                sq = jnp.sqrt(jnp.maximum(dis, 0.0))
                t0 = (-b - sq) * inv2a
                t1 = (-b + sq) * inv2a
                tmn = jnp.minimum(t0, t1)
                tmx = jnp.maximum(t0, t1)
                hit = ((tmn >= mint) & (tmn <= maxt)) | \
                      ((tmx >= mint) & (tmx <= maxt))
                hit = hit & (dis >= 0.0) & (msk > 0.0) & alive
                return jnp.where(hit, 1.0, occ)

            def tri_body(i, occ):
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
                return jnp.where(okh, 1.0, occ)

            def make_tri_occ_body(tab):
                def body(i, occ):
                    ngx, ngy, ngz = tab[i, 0], tab[i, 1], tab[i, 2]
                    c1x, c1y, c1z = tab[i, 3], tab[i, 4], tab[i, 5]
                    c2x, c2y, c2z = tab[i, 6], tab[i, 7], tab[i, 8]
                    e1x, e1y, e1z = tab[i, 9], tab[i, 10], tab[i, 11]
                    e2x, e2y, e2z = tab[i, 12], tab[i, 13], tab[i, 14]
                    kk, msk = tab[i, 15], tab[i, 17]
                    div = ngx * dx + ngy * dy + ngz * dz
                    side_ok = (div != 0.0) if two_sided else (div > 0.0)
                    idiv = 1.0 / jnp.where(div == 0.0, 1.0, div)
                    beta = (e2x * xx + e2y * xy_ + e2z * xz_
                            - (c2x * dx + c2y * dy + c2z * dz)) * idiv
                    gamma = ((c1x * dx + c1y * dy + c1z * dz)
                             - (e1x * xx + e1y * xy_ + e1z * xz_)) * idiv
                    t = (kk - (ngx * ox + ngy * oy + ngz * oz)) * idiv
                    okh = side_ok & (beta >= 0.0) & (beta <= 1.0) \
                        & (gamma >= 0.0) & (beta + gamma <= 1.0) \
                        & (t >= mint) & (t <= maxt) & (msk > 0.0) & alive
                    return jnp.where(okh, 1.0, occ)

                return body

            def make_sph_occ_body(tab):
                def body(i, occ):
                    scx, scy, scz = tab[i, 0], tab[i, 1], tab[i, 2]
                    r, msk = tab[i, 3], tab[i, 5]
                    mx = ox - scx
                    my = oy - scy
                    mz = oz - scz
                    b = 2.0 * (mx * dx + my * dy + mz * dz)
                    cq = mx * mx + my * my + mz * mz - r * r
                    dis = b * b - 4.0 * a * cq
                    sq = jnp.sqrt(jnp.maximum(dis, 0.0))
                    t0 = (-b - sq) * inv2a
                    t1 = (-b + sq) * inv2a
                    tmn = jnp.minimum(t0, t1)
                    tmx = jnp.maximum(t0, t1)
                    hit = ((tmn >= mint) & (tmn <= maxt)) | \
                          ((tmx >= mint) & (tmx <= maxt))
                    hit = hit & (dis >= 0.0) & (msk > 0.0) & alive
                    return jnp.where(hit, 1.0, occ)

                return body

            def stream_cell_loop_occ(goff, gb, gtab, make_body_occ):
                """Streamed-grid cell visit for OCCLUSION: cells whose AABB no
                still-unoccluded ray's segment overlaps are skipped; visited
                cells DMA their rows in GRID_CHUNK sub-chunks
                (double-buffered)."""

                def gchunk_dma_at(lo_off, k, slot):
                    return pltpu.make_async_copy(
                        gtab.at[pl.ds(lo_off + k * GRID_CHUNK,
                                      GRID_CHUNK), :],
                        smem_gchunk.at[slot], gdma_sem.at[slot])

                def cell_loop(ci, _):
                    lo_off = goff[ci]
                    hi_off = goff[ci + 1]
                    near, far = _slab6(gb[ci, 0], gb[ci, 1], gb[ci, 2],
                                       gb[ci, 3], gb[ci, 4], gb[ci, 5],
                                       ox, oy, oz, invdx, invdy, invdz)
                    free = s_bt[:] == 0.0
                    overlap = (jnp.maximum(near, mint)
                               <= jnp.minimum(far, maxt)) & alive & free

                    @pl.when(jnp.any(overlap) & (lo_off < hi_off))
                    def _():
                        nsub = (hi_off - lo_off + GRID_CHUNK - 1) // GRID_CHUNK
                        gchunk_dma_at(lo_off, 0, 0).start()

                        def sub(k, _2):
                            slot = jax.lax.rem(k, 2)

                            @pl.when(k + 1 < nsub)
                            def _():
                                gchunk_dma_at(lo_off, k + 1, 1 - slot).start()

                            gchunk_dma_at(lo_off, k, slot).wait()
                            cnt = jnp.minimum(jnp.int32(GRID_CHUNK),
                                              hi_off - k * GRID_CHUNK
                                              - lo_off)
                            body_occ = make_body_occ(_SlotView(smem_gchunk,
                                                               slot))
                            s_bt[:] = jax.lax.fori_loop(0, cnt, body_occ,
                                                        s_bt[:])
                            return 0

                        jax.lax.fori_loop(0, nsub, sub, 0)
                    return 0

                return cell_loop

            def occ_done(ci):
                # occlusion EARLY EXIT: once every live shadow ray is
                # occluded, remaining cells/chunks change nothing (the
                # tile form of the reference shadow DDA's first-hit
                # break, code.cl:1159/1286)
                return jnp.logical_not(jnp.any(alive & (s_bt[:] == 0.0)))

            occ = jnp.zeros(shape)
            if n_sph and sph_grid_n:
                s_bt[:] = occ
                invdx, invdy, invdz = safe_inv(dx), safe_inv(dy), safe_inv(dz)
                sgoff, sgpar, sgb, sgtab, _sgd = sph_grid_args
                cell_loop = stream_cell_loop_occ(sgoff, sgb, sgtab,
                                                 make_sph_occ_body)
                gnear, gfar = _slab6(
                    sgpar[0], sgpar[1], sgpar[2],
                    sgpar[0] + float(sph_grid_n[0]) * sgpar[3],
                    sgpar[1] + float(sph_grid_n[1]) * sgpar[4],
                    sgpar[2] + float(sph_grid_n[2]) * sgpar[5],
                    ox, oy, oz, invdx, invdy, invdz)
                ghit = (jnp.maximum(gnear, mint) <= jnp.minimum(gfar, maxt)) \
                    & alive

                @pl.when(jnp.any(ghit))
                def _():
                    _loop_early(sph_grid_n[0] * sph_grid_n[1]
                                * sph_grid_n[2], cell_loop, occ_done)

                occ = s_bt[:]
            if n_sph and not stream_sph and not sph_grid_n:
                occ = _loop_objects(n_sph, sph_body, occ)
            if n_sph and stream_sph:
                s_bt[:] = occ
                invdx, invdy, invdz = safe_inv(dx), safe_inv(dy), safe_inv(dz)
                sph_occ_smem = make_sph_occ_body(smem_sph)

                def sph_chunk_loop(ci, _):
                    free = s_bt[:] == 0.0
                    overlap = chunk_overlap(schk, ci, ox, oy, oz,
                                            invdx, invdy, invdz, mint, maxt)
                    overlap = overlap & alive & free

                    @pl.when(jnp.any(overlap))
                    def _():
                        fetch_sph_chunk(ci)
                        s_bt[:] = jax.lax.fori_loop(0, STREAM_CHUNK,
                                                    sph_occ_smem, s_bt[:])
                    return 0

                _loop_early(n_sph_chunks, sph_chunk_loop, occ_done)
                occ = s_bt[:]
            if n_tri and not stream_tri and not grid_tri:
                occ = _loop_objects(n_tri, tri_body, occ)
            if n_tri and stream_tri:
                s_bt[:] = occ
                invdx, invdy, invdz = safe_inv(dx), safe_inv(dy), safe_inv(dz)
                tri_body_smem = make_tri_occ_body(smem_chunk)

                def chunk_loop(ci, _):
                    free = s_bt[:] == 0.0      # not yet occluded
                    overlap = chunk_overlap(chk, ci, ox, oy, oz,
                                            invdx, invdy, invdz, mint, maxt)
                    overlap = overlap & alive & free

                    @pl.when(jnp.any(overlap))
                    def _():
                        fetch_chunk(ci)
                        s_bt[:] = jax.lax.fori_loop(0, STREAM_CHUNK,
                                                    tri_body_smem, s_bt[:])
                    return 0

                _loop_early(n_chunks, chunk_loop, occ_done)
                occ = s_bt[:]
            if grid_tri:
                # grid any-hit (ref *ShadowTrace code.cl:1073-1321): scene tris
                # brute, gridded tris per cell (one grid per mesh); cells whose
                # AABB no still-unoccluded ray's segment overlaps are skipped
                tri_occ_dyn = make_tri_occ_body(tri)
                occ = _loop_objects(grid_start, tri_occ_dyn, occ)
                s_bt[:] = occ
                invdx, invdy, invdz = safe_inv(dx), safe_inv(dy), safe_inv(dz)

                def resident_cell_loop_occ(goff, gitems, gb):
                    def cell_loop(ci, _):
                        lo_off = goff[ci]
                        hi_off = goff[ci + 1]
                        near, far = _slab6(gb[ci, 0], gb[ci, 1], gb[ci, 2],
                                           gb[ci, 3], gb[ci, 4], gb[ci, 5],
                                           ox, oy, oz, invdx, invdy, invdz)
                        free = s_bt[:] == 0.0
                        overlap = (jnp.maximum(near, mint)
                                   <= jnp.minimum(far, maxt)) & alive & free

                        @pl.when(jnp.any(overlap) & (lo_off < hi_off))
                        def _():
                            s_bt[:] = jax.lax.fori_loop(
                                lo_off, hi_off,
                                lambda j, oc: tri_occ_dyn(gitems[j], oc),
                                s_bt[:])
                        return 0

                    return cell_loop

                for gi, gn in enumerate(tri_grids):
                    if grid_streamed:
                        (goff_g, gpar_g, gb_g, gtab_g,
                         _gd) = tri_grid_args[gi]
                        cell_loop = stream_cell_loop_occ(
                            goff_g, gb_g, gtab_g, make_tri_occ_body)
                    else:
                        (goff_g, gitems_g, gpar_g, gb_g,
                         _gd) = tri_grid_args[gi]
                        cell_loop = resident_cell_loop_occ(goff_g, gitems_g,
                                                           gb_g)
                    gnear, gfar = _slab6(
                        gpar_g[0], gpar_g[1], gpar_g[2],
                        gpar_g[0] + float(gn[0]) * gpar_g[3],
                        gpar_g[1] + float(gn[1]) * gpar_g[4],
                        gpar_g[2] + float(gn[2]) * gpar_g[5],
                        ox, oy, oz, invdx, invdy, invdz)
                    ghit = (jnp.maximum(gnear, mint)
                            <= jnp.minimum(gfar, maxt)) & alive \
                        & (s_bt[:] == 0.0)

                    @pl.when(jnp.any(ghit))
                    def _(cell_loop=cell_loop, gn=gn):
                        _loop_early(gn[0] * gn[1] * gn[2], cell_loop,
                                    occ_done)

                occ = s_bt[:]
            return occ > 0.0

        def albedo_of(mf):
            """materials[mat_id].rgb, zeros for mat_id < 0
            (ops/closest_hit.py palette_lookup semantics)."""
            ar = jnp.zeros(shape)
            ag = jnp.zeros(shape)
            ab = jnp.zeros(shape)
            for m in range(n_mat):
                sel = mf == float(m)
                ar = jnp.where(sel, mat[m, 0], ar)
                ag = jnp.where(sel, mat[m, 1], ag)
                ab = jnp.where(sel, mat[m, 2], ab)
            return ar, ag, ab

        # ---- per-pass state -------------------------------------------------
        tpr = jnp.ones(shape)
        tpg = jnp.ones(shape)
        tpb = jnp.ones(shape)

        rec_ctr = [0, 0]    # [trace segment, occlusion slot]

        def rec_trace(rid):
            rec_refs[rec_ctr[0]][:] = rid
            rec_ctr[0] += 1

        def rec_occ(occ):
            rec_refs[n_seg_rec + rec_ctr[1]][:] = jnp.where(occ, 1.0, 0.0)
            rec_ctr[1] += 1

        if record:
            maxt, hit, rid = trace(ox, oy, oz, dx, dy, dz, mint, maxt)
            rec_trace(rid)
        else:
            maxt, hit = trace(ox, oy, oz, dx, dy, dz, mint, maxt)
        hpx, hpy, hpz, hnx, hny, hnz, matf = hit

        if mode == "direct":
            # Assign08 shade: ambient + clamped cosine toward a sampled light
            # point when unoccluded, times albedo (ref Assign08 code.cl:916-939;
            # render/direct.py). No emitter pass, no throughput, no bounces.
            ambient = P("ambient")
            valid = matf >= 0.0
            for li in range(n_lig):
                lpx, lpy, lpz = lig[li, 0], lig[li, 1], lig[li, 2]
                rad = lig[li, 12]
                tax, tay, taz = lig[li, 14], lig[li, 15], lig[li, 16]
                bax, bay, baz = lig[li, 17], lig[li, 18], lig[li, 19]
                u0, u1 = draws.pair()
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
                if record:
                    rec_occ(occ)
                cosx = jnp.clip(sdx * hnx + sdy * hny + sdz * hnz, 0.0, 1.0)
                shade = jnp.clip(ambient + jnp.where(occ, 0.0, cosx), 0.0, 1.0)
                ar, ag, ab = albedo_of(matf)
                accr = accr + jnp.where(valid, ar * shade, 0.0)
                accg = accg + jnp.where(valid, ag * shade, 0.0)
                accb = accb + jnp.where(valid, ab * shade, 0.0)
            return accr, accg, accb

        # ---- lightRender: emitter hits on the PRIMARY segment only
        #      (ref code.cl:600-629; render/stages.py light_render) ----------
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

        # ---- NEE + bounce schedule -----------------------------------------
        def nee(li, accr, accg, accb, tpr, tpg, tpb, matf):
            """initShadowTrace -> occlusion -> sceneRender for one light
            (ref code.cl:631-673, 1323-1364; render/stages.py nee_shade)."""
            lpx, lpy, lpz = lig[li, 0], lig[li, 1], lig[li, 2]
            lnx, lny, lnz = lig[li, 3], lig[li, 4], lig[li, 5]
            ir, ig, ib = lig[li, 6], lig[li, 7], lig[li, 8]
            rad, area = lig[li, 12], lig[li, 13]
            tax, tay, taz = lig[li, 14], lig[li, 15], lig[li, 16]
            bax, bay, baz = lig[li, 17], lig[li, 18], lig[li, 19]
            valid = matf >= 0.0
            u0, u1 = draws.pair()
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
            if record:
                rec_occ(occ)
            # geometric term uses distance to the light CENTER (quirk kept,
            # ref code.cl:1351-1356)
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
                li, accr, accg, accb, tpr, tpg, tpb, matf)

        for _depth in range(bounces):
            if russian_roulette:
                # stages.apply_russian_roulette: survive with p = max throughput
                # component (clipped), compensate 1/p. Slot consumed every depth
                # (layout stability); applied only past rr_start_depth.
                u0, _ = draws.pair()
                if _depth >= rr_start_depth:
                    p_srv = jnp.clip(jnp.maximum(tpr, jnp.maximum(tpg, tpb)),
                                     0.05, 1.0)
                    survive = u0 < p_srv
                    inv_p = 1.0 / p_srv
                    tpr = jnp.where(survive, tpr * inv_p, 0.0)
                    tpg = jnp.where(survive, tpg * inv_p, 0.0)
                    tpb = jnp.where(survive, tpb * inv_p, 0.0)
                    matf = jnp.where(survive, matf, -1.0)
            # bouncePaths (ref code.cl:581-598; render/stages.py bounce_paths)
            valid = matf >= 0.0
            snx = jnp.where(valid, hnx, 0.0)
            sny = jnp.where(valid, hny, 0.0)
            snz = jnp.where(valid, hnz, 1.0)
            (tx, ty, tz), (bx, by, bz) = _tangent_frame(snx, sny, snz)
            u0, u1 = draws.pair()
            cdx, cdy = _concentric(u0, u1)
            cz = jnp.sqrt(jnp.maximum(0.0, 1.0 - cdx * cdx - cdy * cdy))
            dx, dy, dz = _normalize3(cdx * tx + cdy * bx + cz * snx,
                                     cdx * ty + cdy * by + cz * sny,
                                     cdx * tz + cdy * bz + cz * snz)
            ox = hpx + eps * hnx
            oy = hpy + eps * hny
            oz = hpz + eps * hnz
            mint = jnp.where(valid, 0.0, inf2)
            maxt = inf2
            if record:
                maxt, hit, rid = trace(ox, oy, oz, dx, dy, dz, mint, maxt)
                rec_trace(rid)
            else:
                maxt, hit = trace(ox, oy, oz, dx, dy, dz, mint, maxt)
            hpx, hpy, hpz, hnx, hny, hnz, matf = hit
            for li in range(n_lig):
                accr, accg, accb, tpr, tpg, tpb = nee(
                    li, accr, accg, accb, tpr, tpg, tpb, matf)

        return accr, accg, accb

    acc0 = (acc_in[0][:], acc_in[1][:], acc_in[2][:])
    if n_kernel_passes == 1:
        accr, accg, accb = one_pass(0, *acc0)
    else:
        accr, accg, accb = jax.lax.fori_loop(
            0, n_kernel_passes, lambda p, c: one_pass(p, *c), acc0)
    acc_out[0][:] = accr
    acc_out[1][:] = accg
    acc_out[2][:] = accb


# ---------------------------------------------------------------------------
# host wrapper
# ---------------------------------------------------------------------------

def _pad_plane(x: Array, P: int) -> Array:
    """(R,) -> (P/LANES, LANES)."""
    R = x.shape[0]
    if P != R:
        x = jnp.concatenate([x, jnp.zeros((P - R,), x.dtype)])
    return x.reshape(P // LANES, LANES)


def pathtrace_pass_pallas(par: Array, ipar: Array, sph: Array, tri: Array,
                          mat: Array, lig: Array, acc: Array,
                          u_planes: Array | None, *,
                          spp: int, width: int, bounces: int,
                          two_sided: bool, normalize_emitter: bool,
                          seed: int, interpret: bool = False,
                          mode: str = "path",
                          russian_roulette: bool = False,
                          rr_start_depth: int = 0,
                          chunks: Array | None = None,
                          grid: tuple | None = None,
                          block: int = 0,
                          sph_chunks: Array | None = None,
                          n_passes: int = 1,
                          record: bool = False,
                          rec_sph_rows: int | None = None,
                          rec_tri_offs: tuple = ()) -> Array:
    """One progressive pass over ``acc`` (R, 3) -> new (R, 3).

    ``record=True``: champion recording for the cell-marching backward —
    returns ``(acc, ids, occs)`` where ids (n_seg, R) holds each trace
    segment's champion DIFF-table row (-1 miss; spheres in
    [0, rec_sph_rows), triangles offset by rec_sph_rows, grid payload rows
    by rec_tri_offs per grid) and occs (n_seg * n_lights, R) the NEE
    occlusion bits, both in schedule order. Single-pass only.

    par: (NPAR,) f32 scalars; ipar: (1,) i32 [pass_idx];
    sph (S, 8): [center xyz, radius, mat, mask, pad2];
    tri (T, 32): [n_geo, c1, c2, e1, e2, k, mat, mask, vn0, vn1, vn2, pad];
    mat (M, 4): rgba; lig (L, 20): [pos, normal, irr, irr_normalized,
    radius, area, tangent, bitangent];
    u_planes: (n_draws*2, R) precomputed uniforms or None for on-core PRNG.
    ipar: (2,) i32 [pass_idx, ray_offset] — ray_offset is the global index
    of this shard's first ray (0 single-device; shard_map passes
    axis_index * local_R).
    """
    R = acc.shape[0]
    assert R < (1 << 24), "megakernel pixel math is exact f32 below 2^24 rays"
    assert n_passes == 1 or u_planes is None, \
        "in-kernel multi-pass accumulation needs the on-core PRNG " \
        "(a u-planes tensor only carries one pass of draws)"
    P = -(-R // TILE) * TILE
    n_tiles = P // TILE

    acc_planes = [_pad_plane(acc[:, c], P) for c in range(3)]

    def nonempty(t: Array) -> Array:
        # zero-row VMEM operands fail Mosaic layout verification; the
        # matching n_* count is 0 so the dummy row is never read
        return t if t.shape[0] else jnp.zeros((1,) + t.shape[1:], t.dtype)

    stream_tri = chunks is not None and tri.shape[0] > 0
    # grids carry their own geometry (cell-major HBM rows in streamed
    # mode), so their presence alone activates grid mode: a mesh-only
    # scene whose brute prefix tri[:start] is EMPTY (start == 0, all
    # triangles grid-covered) must still render its grids
    grid_tri = grid is not None and bool(grid.get("tri"))
    sph_grid = grid.get("sph") if grid is not None else None
    grid_streamed = bool(grid.get("streamed")) if grid is not None else False
    stream_sph = sph_chunks is not None and sph.shape[0] > 0
    assert not (stream_tri and grid_tri), \
        "triangle table is either chunk-streamed or grid-mode, not both"
    assert not (stream_sph and sph_grid), \
        "sphere table is either chunk-streamed or grid-mode, not both"
    n_args = dict(n_rays=R, spp=spp, width=width, bounces=bounces,
                  n_sph=sph.shape[0], n_tri=tri.shape[0],
                  n_mat=mat.shape[0], n_lig=lig.shape[0],
                  two_sided=two_sided, normalize_emitter=normalize_emitter,
                  use_u=u_planes is not None, seed=seed, mode=mode,
                  russian_roulette=russian_roulette,
                  rr_start_depth=rr_start_depth,
                  stream_tri=stream_tri,
                  n_chunks=(tri.shape[0] // STREAM_CHUNK
                            if stream_tri else 0),
                  tri_grids=(tuple(tuple(e[3]) for e in grid["tri"])
                             if grid_tri else ()),
                  grid_streamed=grid_streamed,
                  grid_start=(grid["start"] if grid_tri else 0),
                  sph_grid_n=(tuple(sph_grid[3]) if sph_grid else ()),
                  block=block,
                  stream_sph=stream_sph,
                  n_sph_chunks=(sph.shape[0] // STREAM_CHUNK
                                if stream_sph else 0),
                  n_kernel_passes=n_passes,
                  record=record,
                  rec_sph_rows=(0 if not record else
                                (sph.shape[0] if rec_sph_rows is None
                                 else rec_sph_rows)),
                  rec_tri_offs=tuple(rec_tri_offs))
    if record:
        assert n_passes == 1, "champion recording is single-pass"
        n_seg_rec = 1 + (bounces if mode == "path" else 0)
        n_rec = n_seg_rec + n_seg_rec * n_args["n_lig"]
    else:
        n_rec = 0
    if stream_sph:
        assert sph.shape[0] % STREAM_CHUNK == 0, \
            "streaming sphere table must be padded to a chunk multiple"
        assert sph_chunks.shape[0] == sph.shape[0] // STREAM_CHUNK
    if block:
        assert width % block == 0, "blocked layout: width % block != 0"
    if stream_tri:
        assert tri.shape[0] % STREAM_CHUNK == 0, \
            "streaming tri table must be padded to a chunk multiple"
        assert chunks.shape[0] == tri.shape[0] // STREAM_CHUNK

    ray_block = pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    def table_spec(t: Array):
        # small tables ride SMEM: scalar reads come from the scalar unit
        # instead of a VMEM load+rotate+extract chain per element
        return smem if t.size <= SMEM_TABLE_MAX else vmem

    sph, tri, mat, lig = map(nonempty, (sph, tri, mat, lig))
    if chunks is None:
        chunks = jnp.zeros((1, 8), jnp.float32)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    tri_spec = any_spec if stream_tri \
        else (smem if (grid_tri and not grid_streamed) else table_spec(tri))
    sph_spec = any_spec if stream_sph else table_spec(sph)

    # SMEM tables ride FLATTENED (2-D SMEM windows pad rows to 512 B —
    # see _FlatTable); the kernel re-indexes with static column counts
    def maybe_flat(t, spec):
        return t.reshape(-1) if spec is smem else t

    n_args.update(flat_sph=sph_spec is smem, flat_tri=tri_spec is smem,
                  flat_mat=table_spec(mat) is smem,
                  flat_lig=table_spec(lig) is smem)
    in_specs = [smem, smem, sph_spec, tri_spec, smem,
                table_spec(mat), table_spec(lig)]
    args = [ipar, par, maybe_flat(sph, sph_spec), maybe_flat(tri, tri_spec),
            chunks.reshape(-1), maybe_flat(mat, table_spec(mat)),
            maybe_flat(lig, table_spec(lig))]
    if grid_tri:
        if not grid_streamed:
            # RESIDENT grids: CSR offsets + item ids into the SMEM tri
            # table + [pmin, cell width] + tight cell AABBs — SMEM scalars
            # (flattened; render/mega.GRID_RESIDENT_MAX governs the total)
            assert tri.size <= 4 * SMEM_TABLE_MAX, \
                "resident grid-mode triangle table must be SMEM-resident"
        for (goff, payload, gpar_g, _n, gb_g, gdist_g) in grid["tri"]:
            if grid_streamed:
                # STREAMED grids: cell-major duplicated row table in HBM
                # (the reference's per-cell buffer layout), padded with
                # >= GRID_CHUNK zero rows so fixed-size DMA never overruns
                in_specs += [smem, smem, smem, any_spec, smem]
                args += [goff.astype(jnp.int32),
                         gpar_g.astype(jnp.float32),
                         gb_g.astype(jnp.float32).reshape(-1),
                         payload.astype(jnp.float32),
                         gdist_g.astype(jnp.float32)]
            else:
                gitems = payload
                if gitems.shape[0] == 0:
                    gitems = jnp.zeros((1,), jnp.int32)
                in_specs += [smem, smem, smem, smem, smem]
                args += [goff.astype(jnp.int32), gitems.astype(jnp.int32),
                         gpar_g.astype(jnp.float32),
                         gb_g.astype(jnp.float32).reshape(-1),
                         gdist_g.astype(jnp.float32)]
    if sph_grid:
        sgoff, sgtab, sgpar, _sn, sgb, sgdist = sph_grid
        in_specs += [smem, smem, smem, any_spec, smem]
        args += [sgoff.astype(jnp.int32), sgpar.astype(jnp.float32),
                 sgb.astype(jnp.float32).reshape(-1),
                 sgtab.astype(jnp.float32),
                 sgdist.astype(jnp.float32)]
    if stream_sph:
        in_specs.append(smem)
        args.append(sph_chunks.astype(jnp.float32).reshape(-1))
    if u_planes is not None:
        D2 = u_planes.shape[0]
        u3 = jnp.stack([_pad_plane(u_planes[j], P) for j in range(D2)])
        in_specs.append(pl.BlockSpec((D2, SUBLANES, LANES),
                                     lambda i: (0, i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(u3)
    in_specs += [ray_block] * 3
    args += acc_planes
    n_in = len(args)

    scratch_shapes = []
    if stream_tri:
        scratch_shapes.append(
            pltpu.SMEM((STREAM_CHUNK, tri.shape[1]), jnp.float32))
    if stream_sph:
        scratch_shapes.append(
            pltpu.SMEM((STREAM_CHUNK, sph.shape[1]), jnp.float32))
    if grid_streamed or sph_grid:
        scratch_shapes.append(
            pltpu.SMEM((2, GRID_CHUNK, 128), jnp.float32))
        scratch_shapes.append(pltpu.SemaphoreType.DMA((2,)))
    if stream_tri or stream_sph:
        scratch_shapes.append(pltpu.SemaphoreType.DMA)
    if stream_tri or stream_sph or grid_tri or sph_grid:
        scratch_shapes += [
            pltpu.VMEM((SUBLANES, LANES), jnp.float32),   # s_bt / occ
            pltpu.VMEM((SUBLANES, LANES), jnp.float32),   # s_bnx
            pltpu.VMEM((SUBLANES, LANES), jnp.float32),   # s_bny
            pltpu.VMEM((SUBLANES, LANES), jnp.float32),   # s_bnz
            pltpu.VMEM((SUBLANES, LANES), jnp.float32),   # s_bm
        ]
        if record:
            scratch_shapes.append(
                pltpu.VMEM((SUBLANES, LANES), jnp.float32))   # s_brid

    out = pl.pallas_call(
        functools.partial(_render_pass_kernel, **n_args),
        out_shape=tuple(jax.ShapeDtypeStruct((P // LANES, LANES), jnp.float32)
                        for _ in range(3 + n_rec)),
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=(ray_block,) * (3 + n_rec),
        input_output_aliases={n_in - 3: 0, n_in - 2: 1, n_in - 1: 2},
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(*args)
    acc_out = jnp.stack([p.reshape(-1)[:R] for p in out[0:3]], axis=-1)
    if not record:
        return acc_out
    flat = [p.reshape(-1)[:R] for p in out[3:]]
    ids = jnp.stack(flat[0:n_seg_rec])
    occs = (jnp.stack(flat[n_seg_rec:]) if n_rec > n_seg_rec
            else jnp.zeros((0, R), jnp.float32))
    return acc_out, ids, occs
