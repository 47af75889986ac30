"""Megakernel pass driver: Scene -> packed tables -> fused Pallas pass.

The production forward path for brute-force scenes (cfg.use_megakernel):
one Pallas kernel per progressive pass instead of ~280 XLA kernels
(see ops/pallas/megakernel.py for the cost analysis). The XLA stage
pipeline (render/pathtracer.py) remains the differentiable/training path
and the oracle this one is tested against.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.config import RenderConfig
from ..core.types import Scene, replace, tangent_frame
from ..ops import intersect as I
from ..ops.pallas import megakernel as MK
from .stages import _all_triangles

Array = jax.Array


def _morton_codes(centroid: Array, pmin: Array, pmax: Array) -> Array:
    """30-bit Morton code of AABB centroids (10 bits/axis). Spatially sorts
    triangles so fixed-size chunks are compact in space — the build-time
    binning step of the TPU-native accel path (the analog of the
    reference's splitTriangleData cell binning, code.js:1643-1772, consumed
    at ray-tile granularity instead of per-ray DDA)."""
    ext = jnp.maximum(pmax - pmin, 1e-20)
    q = jnp.clip((centroid - pmin) / ext * 1024.0, 0.0, 1023.0)
    q = q.astype(jnp.uint32)

    def spread(x):
        # interleave: insert two zero bits between each of the 10 bits
        x = (x | (x << 16)) & jnp.uint32(0x030000FF)
        x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
        x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
        x = (x | (x << 2)) & jnp.uint32(0x09249249)
        return x

    return (spread(q[:, 0]) | (spread(q[:, 1]) << 1)
            | (spread(q[:, 2]) << 2)).astype(jnp.uint32)


def tri_chunk_tables(scene: Scene, tri: Array, tris) -> tuple[Array, Array]:
    """(tri_sorted, chunks) for the streaming kernel: triangles reordered
    by Morton code, padded to a STREAM_CHUNK multiple, plus per-chunk
    conservative AABBs (nc, 8) [pmin xyz, pmax xyz, pad2] for the SMEM
    cull table. Padding rows keep mask=0 and an empty (inverted) AABB."""
    T = tris.count
    v = tris.v                                    # (T, 3, 3) raw verts
    cen = v.mean(1)
    order = jnp.argsort(_morton_codes(cen, scene.bounds.pmin,
                                      scene.bounds.pmax))
    tri_s = tri[order]
    v_s = v[order]
    # rows padded to the full 128-lane width: chunk DMA slices must be
    # aligned to the (1, 128) memref tiling
    if tri_s.shape[1] < 128:
        tri_s = jnp.concatenate(
            [tri_s, jnp.zeros((T, 128 - tri_s.shape[1]), tri.dtype)], -1)
    C = MK.STREAM_CHUNK
    Tp = -(-T // C) * C
    if Tp != T:
        pad_rows = jnp.zeros((Tp - T, tri_s.shape[1]), tri.dtype)
        tri_s = jnp.concatenate([tri_s, pad_rows])
        v_s = jnp.concatenate(
            [v_s, jnp.full((Tp - T, 3, 3), jnp.nan, v.dtype)])
    nc = Tp // C
    vc = v_s.reshape(nc, C * 3, 3)
    lo = jnp.nan_to_num(jnp.nanmin(vc, axis=1), nan=jnp.inf,
                        posinf=jnp.inf, neginf=-jnp.inf)
    hi = jnp.nan_to_num(jnp.nanmax(vc, axis=1), nan=-jnp.inf,
                        posinf=jnp.inf, neginf=-jnp.inf)
    chunks = jnp.concatenate([lo, hi, jnp.zeros((nc, 2))], -1)
    return tri_s.astype(jnp.float32), chunks.astype(jnp.float32)


def sph_chunk_tables(sph: Array, scene: Scene) -> tuple[Array, Array]:
    """(sph_sorted, chunks) for the sphere streaming path (big molecules):
    spheres reordered by Morton code of their centers, padded to a
    STREAM_CHUNK multiple (mask=0 pad rows), plus per-chunk conservative
    AABBs (nc, 8) [pmin xyz, pmax xyz, pad2] for the SMEM cull table.
    The reference's sphere grid (splitSphereData, code.js:1554-1641)
    serves the same molecules; here the binning is consumed per ray tile."""
    S = sph.shape[0]
    cen = sph[:, 0:3]
    order = jnp.argsort(_morton_codes(cen, scene.bounds.pmin,
                                      scene.bounds.pmax))
    sph_s = sph[order]
    # rows padded to the full 128-lane width: chunk DMA slices must be
    # aligned to the (1, 128) memref tiling (same as tri_chunk_tables)
    if sph_s.shape[1] < 128:
        sph_s = jnp.concatenate(
            [sph_s, jnp.zeros((S, 128 - sph_s.shape[1]), sph.dtype)], -1)
    C = MK.STREAM_CHUNK
    Sp = -(-S // C) * C
    if Sp != S:
        sph_s = jnp.concatenate(
            [sph_s, jnp.zeros((Sp - S, sph_s.shape[1]), sph.dtype)])
    nc = Sp // C
    cen_s = sph_s[:, 0:3].reshape(nc, C, 3)
    rad_s = sph_s[:, 3].reshape(nc, C)
    msk_s = sph_s[:, 5].reshape(nc, C)
    big = jnp.where(msk_s[..., None] > 0, 1.0, -1.0)
    lo = jnp.min(jnp.where(big > 0, cen_s - rad_s[..., None],
                           jnp.inf), axis=1)
    hi = jnp.max(jnp.where(big > 0, cen_s + rad_s[..., None],
                           -jnp.inf), axis=1)
    chunks = jnp.concatenate([lo, hi, jnp.zeros((nc, 2))], -1)
    return sph_s.astype(jnp.float32), chunks.astype(jnp.float32)


def scene_tables(scene: Scene, cfg: RenderConfig
                 ) -> tuple[Array, Array, Array, Array, Array]:
    """(par, sph, tri, mat, lig) packed for the kernel. Pure jnp — safe to
    trace; tables are tiny (KB) and live whole in VMEM."""
    cam = replace(scene.camera, cols=cfg.width, rows=cfg.height)
    scal = [cam.width, cam.height, float(cam.cols), float(cam.rows),
            scene.focal_length, scene.lens_radius]
    par = jnp.concatenate([
        cam.eye, cam.u, cam.v, cam.w,
        jnp.stack([jnp.asarray(s, jnp.float32).reshape(()) for s in scal]),
        scene.bounds.pmin, scene.bounds.pmax,
        jnp.asarray([cfg.shadow_eps, cfg.ambient], jnp.float32),
    ]).astype(jnp.float32)
    assert par.shape[0] == MK.NPAR

    sp = scene.spheres
    sph = jnp.concatenate([
        sp.center, sp.radius[:, None],
        sp.mat_id[:, None].astype(jnp.float32),
        sp.mask[:, None].astype(jnp.float32),
        jnp.zeros((sp.count, 2)),
    ], axis=-1).astype(jnp.float32)

    tris = _all_triangles(scene)
    tc = I.tri_constants(tris.v)
    T = tris.count
    tri = jnp.concatenate([
        tc.n_geo, tc.c1, tc.c2, tc.e1, tc.e2, tc.k[:, None],
        tris.mat_id[:, None].astype(jnp.float32),
        tris.mask[:, None].astype(jnp.float32),
        tris.vn.reshape(T, 9),
        jnp.zeros((T, 5)),
    ], axis=-1).astype(jnp.float32)

    mat = scene.materials.astype(jnp.float32)

    lg = scene.lights
    t_ax, b_ax = tangent_frame(lg.normal)
    irr_n = lg.irradiance / jnp.maximum(
        jnp.linalg.norm(lg.irradiance, axis=-1, keepdims=True), 1e-20)
    lig = jnp.concatenate([
        lg.position, lg.normal, lg.irradiance, irr_n,
        lg.radius[:, None], lg.area[:, None], t_ax, b_ax,
    ], axis=-1).astype(jnp.float32)
    return par, sph, tri, mat, lig


# element budget for RESIDENT grid mode (flattened SMEM tables): triangle
# table + CSR items + cell AABBs/offsets, ~480 KB of the ~1 MB SMEM
GRID_RESIDENT_MAX = 120 * 1000


def _gpar_of(g) -> Array:
    nv = jnp.asarray(g.n, jnp.float32)
    width = (g.pmax - g.pmin) / nv
    width = jnp.where(width <= 0.0, 1e-30, width)
    return jnp.concatenate([g.pmin, width]).astype(jnp.float32)


def _gdist_of(g, eye: Array) -> Array:
    """(C + 1,) monotone lower bound on the eye->cell-box distance in
    VISIT order (cells are front-to-back for the current eye, so
    dist(center) - half_diagonal is nondecreasing): the kernel's
    closest-hit cell loop EARLY-EXITS once every ray's champion window
    ends before the next cell can start (megakernel._loop_early) — the
    tile-granular form of the reference DDA's march break
    (code.cl:745-786). Last entry +inf terminates; plain builds without
    stored centers get -inf (never exit, always correct)."""
    C = int(g.cell_offsets.shape[0]) - 1
    cen = getattr(g, "cell_centers", None)
    if cen is None:
        d = jnp.full((C,), -jnp.inf, jnp.float32)
    else:
        nv = jnp.asarray(g.n, jnp.float32)
        width = jnp.where((g.pmax - g.pmin) / nv <= 0.0, 1e-30,
                          (g.pmax - g.pmin) / nv)
        half_diag = 0.5 * jnp.linalg.norm(width)
        d = jnp.linalg.norm(cen - eye[None, :], axis=-1) - half_diag
        # enforce monotonicity (defensive: visit order is dist-sorted by
        # fresh ordering, but a stale build-time order must stay safe)
        d = jax.lax.associative_scan(jnp.minimum, d[::-1])[::-1]
    return jnp.concatenate([d, jnp.full((1,), jnp.inf, jnp.float32)]) \
        .astype(jnp.float32)


def _cell_major_table(rows: Array, g) -> Array:
    """Cell-major duplicated row table for a STREAMED grid: gather the
    packed object rows by the grid's CSR payload (items concatenated per
    cell in visit order — exactly the reference's re-vendored per-cell
    buffers, splitTriangleData code.js:1643-1772), pad columns to the
    128-lane DMA tiling and append GRID_CHUNK zero rows so fixed-size
    cell DMAs never overrun."""
    tab = rows[g.item_indices]          # indices absolute into ``rows``
    if tab.shape[1] < 128:
        tab = jnp.concatenate(
            [tab, jnp.zeros((tab.shape[0], 128 - tab.shape[1]),
                            tab.dtype)], -1)
    pad = jnp.zeros((MK.GRID_CHUNK, 128), tab.dtype)
    return jnp.concatenate([tab, pad]).astype(jnp.float32)


def _fresh_grid(g, eye: Array):
    """Re-derive the front-to-back cell permutation for the CURRENT eye —
    a TRACED argsort over the stored cell centers plus a CSR regather, so
    orbit animation and camera training keep the early-exit culling the
    build-time order gave the build-time eye (round-3 VERDICT weak #4;
    correctness never depended on order — grid == brute is tested — this
    is performance freshness). Cheap: ~n_cells log n_cells + one payload
    gather, negligible against a render pass. No-op for single-cell grids
    or plain builds (no stored centers)."""
    import dataclasses
    cen = getattr(g, "cell_centers", None)
    ncells = int(g.cell_offsets.shape[0]) - 1
    if cen is None or ncells <= 1:
        return g
    perm = jnp.argsort(jnp.linalg.norm(cen - eye[None, :], axis=-1),
                       stable=True)
    off = g.cell_offsets.astype(jnp.int32)
    counts = (off[1:] - off[:-1])[perm]
    new_off = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(counts).astype(jnp.int32)])
    npay = g.item_indices.shape[0]
    if npay:
        row = jnp.arange(npay, dtype=jnp.int32)
        # visit cell of each NEW payload row, then its source row in the
        # OLD payload: old_offsets[perm[cell]] + within-cell offset
        cell_new = jnp.searchsorted(new_off, row, side="right") \
            .astype(jnp.int32) - 1
        src = off[perm[cell_new]] + (row - new_off[cell_new])
        new_pay = g.item_indices[src]
    else:
        new_pay = g.item_indices
    return dataclasses.replace(
        g, cell_offsets=new_off, item_indices=new_pay,
        cell_bounds=g.cell_bounds[perm], cell_centers=cen[perm])


def fresh_scene_grids(scene: Scene) -> Scene:
    """Scene with every megakernel grid re-ordered front-to-back for the
    scene's CURRENT camera eye (see _fresh_grid)."""
    eye = jnp.asarray(scene.camera.eye, jnp.float32)
    rep = {}
    if scene.folded_tri_grid:
        rep["folded_tri_grid"] = tuple(_fresh_grid(g, eye)
                                       for g in scene.folded_tri_grid)
    if scene.mega_sph_grid is not None:
        rep["mega_sph_grid"] = _fresh_grid(scene.mega_sph_grid, eye)
    return replace(scene, **rep) if rep else scene


def grid_tables(scene: Scene, tri: Array, sph: Array
                ) -> tuple[dict, Array, Array]:
    """Megakernel grid-mode tables -> (grid_dict, tri_table, sph_table).

    grid_dict = {"start", "streamed", "tri": [(goff, payload, gpar, n,
    cell_bounds), ...], "sph": (goff, gtab, gpar, n, cell_bounds) | None}
    — one entry per large mesh (per-mesh nslabs from the XML, the
    reference's meshTrace dispatch) from accel.prepare_grids +
    mega_order_grid (front-to-back cells, tight per-cell AABBs).

    RESIDENT (whole tri table fits SMEM): payload = CSR item ids into the
    SMEM table; tri is returned unchanged. STREAMED (big assets): payload
    = the cell-major duplicated HBM row table and ``tri`` shrinks to the
    brute prefix (scene tris/walls — triangles below ``start``).

    A mega sphere grid (molecule-scale scenes) is attached when the
    sphere table is beyond the SMEM budget and prepare_grids built one;
    the returned sph table is then a dummy row (the kernel reads spheres
    only from the grid's cell-major table)."""
    grids = scene.folded_tri_grid or ()
    # resident mode must fit the SMEM budget with EVERYTHING it parks
    # there: the packed triangle table, the per-grid CSR item tables,
    # cell AABBs and offsets. All SMEM tables ride flattened (2-D SMEM
    # windows pad rows to 512 B — megakernel._FlatTable), so the budget
    # is true element count; ~480 KB of the ~1 MB SMEM is allotted here.
    res_cost = tri.size + sum(
        int(g.item_indices.shape[0]) + 7 * (g.n[0] * g.n[1] * g.n[2])
        for g in grids)
    streamed = bool(grids) and res_cost > GRID_RESIDENT_MAX
    tri_list = []
    start = grids[0].start if grids else tri.shape[0]
    eye = jnp.asarray(scene.camera.eye, jnp.float32)
    for g in grids:
        # streamed: gather the grid's cell-major rows from the FULL packed
        # table (item indices are absolute into the fold)
        payload = (_cell_major_table(tri, g) if streamed
                   else g.item_indices)
        tri_list.append((g.cell_offsets, payload, _gpar_of(g), g.n,
                         g.cell_bounds, _gdist_of(g, eye)))
    sph_entry = None
    if (scene.mega_sph_grid is not None
            and sph.size > MK.SMEM_TABLE_MAX):
        gs = scene.mega_sph_grid
        sgtab = _cell_major_table(sph, gs)
        sph_entry = (gs.cell_offsets, sgtab, _gpar_of(gs), gs.n,
                     gs.cell_bounds, _gdist_of(gs, eye))
        sph = jnp.zeros((1, 8), jnp.float32)
    if streamed:
        tri = tri[:start]
    grid = dict(start=start if tri_list else 0, streamed=streamed,
                tri=tri_list, sph=sph_entry)
    return grid, tri, sph


# GRID-mode differentiable row budget: the diff tables duplicate rows
# across cells (the reference's own re-vendored per-cell layout). Round 5:
# the production CELL backward's graph is table-size-independent (dynamic
# champion-chunk loops + native gather/scatter), so the cap now only
# bounds diff-table memory (rows x 32 f32; 32k rows = 4 MB) — it covers
# the 9,018-atom molecule's 25,750 duplicated sphere rows. The legacy
# chunk backward (mega_bwd_impl="pallas"/"xla") emits one cond block per
# DIFF_CHUNK rows per trace segment and should not be forced past the old
# 16384 budget.
GRID_DIFF_MAX = 32768


def _diff_chunk_for(n_rows: int) -> int:
    """Backward chunk granularity: fine (32-row) chunks give cell-tight
    culling windows for teapot-class tables; big streamed assets coarsen
    to 128 to bound the cond-chunk count (compile time and jaxpr size)."""
    return 32 if n_rows <= 4096 else 128


def _chunk_aabbs_of(clip_lo: Array, clip_hi: Array, C: int) -> Array:
    """(nch, 8) per-chunk AABB unions of per-row [clip_lo, clip_hi) boxes,
    chunked every C rows; pad rows carry inverted boxes so pure-padding
    chunks never overlap any ray window."""
    n = clip_lo.shape[0]
    nch = -(-n // C)
    if nch * C != n:
        pad = nch * C - n
        clip_lo = jnp.concatenate(
            [clip_lo, jnp.full((pad, 3), jnp.inf, clip_lo.dtype)])
        clip_hi = jnp.concatenate(
            [clip_hi, jnp.full((pad, 3), -jnp.inf, clip_hi.dtype)])
    lo = clip_lo.reshape(nch, C, 3).min(1)
    hi = clip_hi.reshape(nch, C, 3).max(1)
    return jnp.concatenate([lo, hi, jnp.zeros((nch, 2))],
                           -1).astype(jnp.float32)


def _cell_of_rows(g) -> Array:
    """Visit-order cell index of each CSR payload row (rows are stored
    cell-major: offsets[c] <= j < offsets[c+1] => cell c)."""
    npay = g.item_indices.shape[0]
    return jnp.searchsorted(g.cell_offsets, jnp.arange(npay, dtype=jnp.int32),
                            side="right").astype(jnp.int32) - 1


def grid_diff_tables(scene: Scene, tri_full: Array, sph_full: Array,
                     grid: dict):
    """Backward tables for GRID-mode training — the cell-structured twin
    of grid_tables (VERDICT round-3 headline item).

    The diff triangle table is the brute prefix [0, start) followed by
    each grid's CELL-MAJOR duplicated rows in front-to-back visit order
    (exactly the row sets the forward's cell loops intersect, ref DDA
    code.cl:675-800), gathered DIFFERENTIABLY from the packed table so AD
    scatters duplicated-row cotangents back onto the original rows.
    Per-chunk AABBs are unions over the chunk's rows of
    (row AABB ∩ owning cell's tight bounds) — chunk culling in the
    backward then skips cells the way the forward does, and the
    front-to-back order lets the shrinking champion window drop
    behind-the-hit cells entirely.

    Returns (diff_tri, tri_chunks, diff_sph, sph_chunks, diff_chunk);
    chunk tables are None when the corresponding table is small enough to
    unroll."""
    from ..ops.pallas import megakernel as MKm
    sg = jax.lax.stop_gradient
    grids = scene.folded_tri_grid or ()
    start = grid["start"] if grids else tri_full.shape[0]

    diff_tri = tri_full
    tri_chunks = None
    n_tri_rows = tri_full.shape[0]
    if grids:
        tris = _all_triangles(scene)
        v = sg(tris.v)
        row_lo = v.min(1)
        row_hi = v.max(1)
        gidx = [jnp.arange(start, dtype=jnp.int32)]
        clip_lo = [row_lo[:start]]
        clip_hi = [row_hi[:start]]
        for g in grids:
            cells = _cell_of_rows(g)
            cb = sg(g.cell_bounds)
            gidx.append(g.item_indices.astype(jnp.int32))
            clip_lo.append(jnp.maximum(row_lo[g.item_indices],
                                       cb[cells, 0:3]))
            clip_hi.append(jnp.minimum(row_hi[g.item_indices],
                                       cb[cells, 3:6]))
        gidx = jnp.concatenate(gidx)
        n_tri_rows = int(gidx.shape[0])
        diff_tri = tri_full[gidx]

    diff_sph = sph_full
    sph_chunks = None
    n_sph_rows = sph_full.shape[0]
    sphg = grid.get("sph")
    if sphg is not None:
        gs = scene.mega_sph_grid
        cen = sg(scene.spheres.center)
        rad = sg(scene.spheres.radius)[:, None]
        s_lo = cen - rad
        s_hi = cen + rad
        cells = _cell_of_rows(gs)
        cb = sg(gs.cell_bounds)
        sidx = gs.item_indices.astype(jnp.int32)
        n_sph_rows = int(sidx.shape[0])
        diff_sph = sph_full[sidx]
        C = _diff_chunk_for(max(n_tri_rows, n_sph_rows))
        sph_chunks = _chunk_aabbs_of(
            jnp.maximum(s_lo[sidx], cb[cells, 0:3]),
            jnp.minimum(s_hi[sidx], cb[cells, 3:6]), C)
    C = _diff_chunk_for(max(n_tri_rows, n_sph_rows))
    if grids and n_tri_rows > MKm.UNROLL_OBJECTS:
        tri_chunks = _chunk_aabbs_of(jnp.concatenate(clip_lo),
                                     jnp.concatenate(clip_hi), C)
    if sphg is None and n_sph_rows > MKm.UNROLL_OBJECTS:
        # brute spheres past the unroll budget: plain chunk AABBs (no
        # cells; masked rows get inverted boxes)
        cen = sg(scene.spheres.center)
        rad = sg(scene.spheres.radius)[:, None]
        live = sg(scene.spheres.mask)[:, None]
        sph_chunks = _chunk_aabbs_of(
            jnp.where(live, cen - rad, jnp.inf),
            jnp.where(live, cen + rad, -jnp.inf), C)
    return diff_tri, tri_chunks, diff_sph, sph_chunks, C


def _effective_block(cfg: RenderConfig) -> int:
    """cfg.mega_block when it tiles the film exactly, else 0 (row-major)."""
    b = cfg.mega_block
    if b and cfg.width % b == 0 and cfg.height % b == 0:
        return b
    return 0


def _ray_perms(cfg: RenderConfig, block: int) -> tuple[Array, Array]:
    """(slot_to_row, row_to_slot) ray-index maps between the kernel's
    blocked slot order and row-major ray order (spp-aware). ``acc`` stays
    row-major as the package-wide invariant; render_pass_mega gathers
    through these around the kernel call."""
    H, W, B, spp = cfg.height, cfg.width, block, cfg.spp
    s = jnp.arange(H * W, dtype=jnp.int32)
    # pixel shown by slot s (the kernel's block decode)
    bid = s // (B * B)
    w_in = s - bid * (B * B)
    brow = bid // (W // B)
    bcol = bid - brow * (W // B)
    py = brow * B + w_in // B
    px = bcol * B + (w_in - (w_in // B) * B)
    pix_of_slot = py * W + px
    # slot showing pixel p (inverse formula)
    p = s
    py2 = p // W
    px2 = p - py2 * W
    brow2 = py2 // B
    bcol2 = px2 // B
    slot_of_pix = (brow2 * (W // B) + bcol2) * (B * B) \
        + (py2 - brow2 * B) * B + (px2 - bcol2 * B)
    if spp == 1:
        return pix_of_slot, slot_of_pix
    samp = jnp.arange(spp, dtype=jnp.int32)
    s2r = (pix_of_slot[:, None] * spp + samp[None, :]).reshape(-1)
    r2s = (slot_of_pix[:, None] * spp + samp[None, :]).reshape(-1)
    return s2r, r2s


def _unblock_pixels(per_pix: Array, cfg: RenderConfig, block: int) -> Array:
    """Gather slot-ordered per-pixel values (blocked layout) back to
    row-major pixel order. Inverse of the kernel's block decode."""
    H, W, B = cfg.height, cfg.width, block
    p = jnp.arange(H * W, dtype=jnp.int32)
    py = p // W
    px = p - py * W
    brow = py // B
    bcol = px // B
    bid = brow * (W // B) + bcol
    w_in = (py - brow * B) * B + (px - bcol * B)
    return per_pix[bid * (B * B) + w_in]


def supported(scene: Scene | None, cfg: RenderConfig) -> bool:
    """The megakernel covers the default brute-force path. Small scenes
    (<= UNROLL_OBJECTS per type) unroll with static SMEM table reads;
    larger triangle sets STREAM (Morton chunks + tile-level AABB culling +
    SMEM DMA — v5e 512x512 b5: house_of_parliament 9,144 tris at ~4x the
    XLA stage pipeline). ``cfg.use_grid`` scenes run the in-kernel
    uniform-grid mode (tile-level cell culling over the folded CSR grid —
    the TPU-native DDA) when the grid was prepared and the triangle table
    fits SMEM; otherwise they take the XLA grid pipeline. Russian roulette
    runs in-kernel (BASELINE.json config 5). Sphere tables must still fit
    SMEM (~4.5k spheres); bigger molecule scenes take the XLA pipeline.
    With ``scene=None`` only the config is checked (build-time call sites)."""
    ok = (not cfg.replicate_stale_poi and cfg.total_rays < (1 << 24))
    if scene is None or not ok:
        return ok
    from ..render.stages import _all_triangles
    tri_count = _all_triangles(scene).count
    if cfg.use_grid:
        # grid mode needs a prepared folded grid when triangles exist;
        # tables beyond SMEM run the STREAMED grid (cell-major HBM rows,
        # per-cell DMA) — no size cap any more
        if tri_count and scene.folded_tri_grid is None:
            return False
    # object tables of any size are covered: SMEM-resident up to the
    # budget, Morton-chunk STREAMING with tile-level AABB culling beyond it
    # (triangles AND spheres — big molecules like 3IZ4's 9,018 atoms
    # stream; the large-scene production path since round 2)
    return (scene.spheres.count <= (1 << 20) and tri_count <= (1 << 20))


# the differentiable megakernel covers tables up to this many objects per
# type: the backward runs a checkpointed chunked lax.scan over the (Morton-
# streamed) VMEM table with the forward's conservative chunk culling
# (megakernel_grad._loop_diff). The cap bounds the backward's jaxpr size
# (one cond+scan block per DIFF_CHUNK chunk per trace segment).
DIFF_TABLE_MAX = 4096


def supported_diff(scene: Scene | None, cfg: RenderConfig) -> bool:
    """Whether the DIFFERENTIABLE megakernel (custom VJP, fused recompute
    backward — ops/pallas/megakernel_grad.py) covers this render. Tables
    up to UNROLL_OBJECTS unroll statically (round-2 path); larger tables
    (teapot-class meshes, molecules) run the chunk-scanned backward with
    the streaming forward as primal, up to DIFF_TABLE_MAX objects/type.
    GRID-mode scenes (round 4) train through the CELL-STRUCTURED backward
    (grid_diff_tables): the primal is the production grid kernel, the
    backward replays the cell culling over cell-major duplicated diff
    tables up to GRID_DIFF_MAX rows/type. The EDGE-AWARE backward
    (cfg.mega_edge_bandwidth) covers non-grid tables to DIFF_TABLE_MAX
    (chunked soft compositing) and is excluded for grid mode."""
    if not supported(scene, cfg):
        return False
    from ..render.stages import _all_triangles
    if cfg.use_grid:
        if cfg.mega_edge_bandwidth > 0.0:
            # EDGE x GRID (round 5): the soft backward runs over the
            # UN-duplicated tables (the grid primal is unchanged), so the
            # gate is the plain DIFF_TABLE_MAX budget — plus a prepared
            # grid so the primal exists
            if scene is None:
                return True
            if _all_triangles(scene).count and scene.folded_tri_grid is None:
                return False
            return (scene.spheres.count <= DIFF_TABLE_MAX
                    and _all_triangles(scene).count <= DIFF_TABLE_MAX)
        if scene is None:
            return True
        grids = scene.folded_tri_grid or ()
        tri_rows = 0
        if grids:
            tri_rows = grids[0].start + sum(
                int(g.item_indices.shape[0]) for g in grids)
        elif _all_triangles(scene).count:
            return False          # grid mode without a prepared grid
        if tri_rows > GRID_DIFF_MAX:
            return False
        if (scene.mega_sph_grid is not None
                and scene.spheres.count * 8 > MK.SMEM_TABLE_MAX):
            return int(scene.mega_sph_grid.item_indices.shape[0]) \
                <= GRID_DIFF_MAX
        return scene.spheres.count <= DIFF_TABLE_MAX
    if scene is None:
        return True
    # round 4: the edge-aware soft backward covers the full DIFF budget
    # too (chunk-local compositing + cross-chunk merge past the unroll
    # budget — megakernel_grad soft_trace)
    limit = DIFF_TABLE_MAX
    return (scene.spheres.count <= limit
            and _all_triangles(scene).count <= limit)


def bwd_impl_for(scene: Scene, cfg: RenderConfig) -> str:
    """Which backward the megakernel VJP runs (cfg.mega_bwd_impl):

    "cell" — the CHAMPION (cell-marching) backward (round 5): the
    forward kernel RECORDS each trace segment's champion diff-table row
    and each NEE occlusion bit while marching its cells at full speed;
    the backward gathers the champion rows, differentiates the shading
    chain, and scatter-adds row cotangents — no object sweep at all
    (the hard gradient flows only through champions; occlusion is a
    step function). The production route for every scene past the
    unroll budget, grid mode included.

    "pallas" — the fused recompute kernel (candidates stay in VMEM):
    fastest for UNROLLED cornell-class tables (its per-row sweep is
    cheap at <= 64 objects, and it needs no u-planes tensor — the
    on-core PRNG replays draws).

    "xla" — the dense value-level transpose as one XLA program with
    MXU matmul-form candidates (round-4 measure: 4x slower than the
    Pallas chunk backward on teapot — kept as the sweep-based oracle).
    EDGE mode past the unroll budget auto-routes here (the vectorized
    chunked soft program needs the full sweep by construction)."""
    if cfg.mega_bwd_impl != "auto":
        return cfg.mega_bwd_impl
    if cfg.mega_edge_bandwidth > 0.0:
        if scene is not None:
            from ..render.stages import _all_triangles
            if (scene.spheres.count > MK.UNROLL_OBJECTS
                    or _all_triangles(scene).count > MK.UNROLL_OBJECTS):
                return "xla"
        return "pallas"
    if cfg.use_grid:
        return "cell"
    if scene is not None:
        from ..render.stages import _all_triangles
        if (scene.spheres.count > MK.UNROLL_OBJECTS
                or _all_triangles(scene).count > MK.UNROLL_OBJECTS):
            return "cell"
    return "pallas"


def render_pass_mega(scene: Scene, state: dict, cfg: RenderConfig,
                     u_planes: Array | None = None,
                     interpret: bool | None = None,
                     ray_offset: Array | int = 0,
                     n_passes: int = 1) -> dict:
    """One progressive pass, megakernel edition. Same state contract as
    pathtracer._render_pass. Scenes within the supported_diff budget
    (unrolled, streamed to DIFF_TABLE_MAX, grid-mode to GRID_DIFF_MAX)
    route through the custom-VJP op (jax.grad works;
    ops/pallas/megakernel_grad.py); beyond those budgets the pass is
    forward-only.

    Under shard_map, ``state['acc']`` is the shard-local slice and
    ``ray_offset`` the global index of its first ray (axis_index * local_R):
    pixel decode and PRNG decorrelation use the global id."""
    assert supported(scene, cfg), \
        "megakernel: unsupported config (grid/stale-POI/ray-count)"
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    assert n_passes == 1 or (u_planes is None and not interpret), \
        "in-kernel multi-pass needs the on-core PRNG (TPU, no u_planes)"
    _impl = (bwd_impl_for(scene, cfg)
             if n_passes == 1 and supported_diff(scene, cfg) else None)
    bwd_xla = _impl == "xla"
    # the cell route's Pallas backward replays the on-core PRNG, so on an
    # accelerator the recording forward keeps its PRNG-mode speed (no
    # u-planes tensor); CPU/interpret still materializes draws
    bwd_cell = _impl == "cell"
    if (interpret or bwd_xla) and u_planes is None:
        # interpret mode cannot lower the on-core PRNG (pltpu.prng_seed has
        # no CPU rule); draw the pass-wide threefry tensor instead — this is
        # also what makes CPU output bit-identical to the XLA pipeline.
        # The XLA backward route needs the same tensor on accelerators (it
        # replays draws at the value level; no host analog of the on-core
        # PRNG exists).
        # Sharded: draw the GLOBAL tensor (key/passes are replicated, so all
        # shards agree) and slice this shard's rays.
        u_planes = u_planes_for_pass(state["key"], state["passes"], cfg,
                                     scene.lights.count)
        local = state["acc"].shape[0]
        if local != cfg.total_rays or not isinstance(ray_offset, int):
            # zero-pad so the last shard's window exists even when the ray
            # axis was padded to a multiple of the shard count (clamped
            # dynamic_slice would otherwise shift its draws)
            u_planes = jnp.pad(u_planes, ((0, 0), (0, local)))
            u_planes = jax.lax.dynamic_slice_in_dim(
                u_planes, jnp.asarray(ray_offset, jnp.int32), local, axis=1)
    par, sph, tri, mat, lig = scene_tables(scene, cfg)
    chunks = grid = sphc = None
    grid_diff_kw = {}
    if cfg.use_grid:
        # camera-fresh front-to-back cell order (traced; orbit / camera
        # training keep early-exit culling)
        scene = fresh_scene_grids(scene)
        tri_full, sph_full = tri, sph
        grid, tri, sph = grid_tables(scene, tri, sph)
        if supported_diff(scene, cfg) and n_passes == 1:
            if cfg.mega_edge_bandwidth > 0.0:
                # EDGE-AWARE x GRID (round 5): primal = the grid kernel on
                # the forward tables; backward = the chunked SOFT program
                # over the UN-DUPLICATED full tables (cell-major duplicated
                # diff rows would composite the same surface twice and bias
                # the blend). Morton-sort keeps soft chunks spatially
                # compact; AD un-permutes cotangents through the gather.
                dtri = tri_full
                if tri_full.shape[0] > MK.UNROLL_OBJECTS:
                    dtri, _ = tri_chunk_tables(scene, tri_full,
                                               _all_triangles(scene))
                grid_diff_kw = dict(grid=grid, fwd_tri=tri, fwd_sph=sph)
                tri, sph = dtri, sph_full
            else:
                # GRID-mode training: primal = the grid kernel on the
                # forward tables; backward = cell-structured diff tables
                # (see grid_diff_tables). The op's tri/sph ARE the diff
                # tables.
                dtri, chunks, dsph, sphc, dchunk = grid_diff_tables(
                    scene, tri_full, sph_full, grid)
                grid_diff_kw = dict(grid=grid, fwd_tri=tri, fwd_sph=sph,
                                    diff_chunk=dchunk)
                tri, sph = dtri, dsph
    elif tri.shape[0] > MK.STREAM_MIN_TRIS:
        tri, chunks = tri_chunk_tables(scene, tri, _all_triangles(scene))
    if (not grid_diff_kw and sphc is None
            and sph.size > MK.SMEM_TABLE_MAX):
        # molecules without a mega sphere grid fall back to Morton-chunk
        # streaming (grid-covered sphere tables were already swapped out;
        # grid-DIFF sphere tables keep their cell order)
        sph, sphc = sph_chunk_tables(sph, scene)
    ipar = jnp.stack([jnp.asarray(state["passes"], jnp.int32),
                      jnp.asarray(ray_offset, jnp.int32)])
    kw = dict(spp=cfg.spp, width=cfg.width, bounces=cfg.bounces,
              two_sided=cfg.two_sided_triangles,
              normalize_emitter=cfg.normalize_emitter,
              seed=cfg.seed, interpret=interpret,
              russian_roulette=cfg.russian_roulette,
              rr_start_depth=cfg.rr_start_depth)
    if supported_diff(scene, cfg) and n_passes == 1:
        # differentiable path (custom VJP; same primal kernel — streaming
        # for large tables — with the fused recompute backward,
        # ops/pallas/megakernel_grad.py). jax.grad through this render
        # works; gradients flow to camera, spheres, triangles, materials
        # and lights via the scene_tables packing (streamed tables are
        # un-permuted by AD through the Morton gather). Blocked pixel
        # layout is honored (single-shard): the gathers are part of the
        # traced graph, so AD un-permutes the cotangents itself.
        from ..ops.pallas.megakernel_grad import pathtrace_pass_diff
        tau = cfg.mega_edge_tau or cfg.mega_edge_bandwidth
        blk = _effective_block(cfg)
        if blk and (state["acc"].shape[0] != cfg.total_rays
                    or not isinstance(ray_offset, int) or ray_offset != 0):
            blk = 0          # sharded acc: permutation would cross shards
        acc_in = state["acc"]
        if blk:
            s2r, r2s = _ray_perms(cfg, blk)
            acc_in = acc_in[s2r]
            if u_planes is not None:
                u_planes = u_planes[:, s2r]
        acc = pathtrace_pass_diff(par, ipar, sph, tri, mat, lig,
                                  acc_in, u_planes,
                                  diff_wrt=cfg.mega_grad_wrt,
                                  bwd_sublanes=(cfg.mega_bwd_sublanes
                                                or (8 if bwd_cell else 32)),
                                  soft_bandwidth=cfg.mega_edge_bandwidth,
                                  soft_tau=tau, chunks=chunks,
                                  sph_chunks=sphc, block=blk,
                                  bwd_xla=bwd_xla and not interpret,
                                  bwd_cell=bwd_cell,
                                  **grid_diff_kw, **kw)
        if blk:
            acc = acc[r2s]
    else:
        # blocked pixel layout (forward-only, single-shard): acc stays
        # row-major as the package invariant; gather to slot order around
        # the kernel (~1% of a pass) so tile culling sees compact frustums
        blk = _effective_block(cfg)
        if blk and (state["acc"].shape[0] != cfg.total_rays
                    or not isinstance(ray_offset, int) or ray_offset != 0):
            blk = 0          # sharded acc: permutation would cross shards
        acc_in = state["acc"]
        if blk:
            s2r, r2s = _ray_perms(cfg, blk)
            acc_in = acc_in[s2r]
            if u_planes is not None:
                u_planes = u_planes[:, s2r]
        acc = MK.pathtrace_pass_pallas(par, ipar, sph, tri, mat, lig,
                                       acc_in, u_planes,
                                       chunks=chunks, grid=grid,
                                       block=blk, sph_chunks=sphc,
                                       n_passes=n_passes, **kw)
        if blk:
            acc = acc[r2s]
    return {"acc": acc, "key": state["key"],
            "passes": state["passes"] + n_passes}


def render_direct_mega(scene: Scene, cfg: RenderConfig,
                       key: Array | None = None,
                       u_planes: Array | None = None,
                       interpret: bool | None = None,
                       n_passes: int = 1) -> Array:
    """Assign08/09 direct-lighting render through the fused kernel
    (render/direct.py semantics: ambient + clamped cosine, mean over spp,
    1/n_lights divisor).

    ``n_passes > 1``: progressive accumulation of independent estimates
    (fresh light-disk / lens samples each pass — soft shadows and DoF
    converge) with zero host dispatches between passes; the in-kernel PRNG
    is decorrelated per pass through ``ipar[0]``."""
    import jax.numpy as jnp

    from ..core import rng
    assert supported(scene, cfg)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if key is None:
        key = rng.base_key(cfg.seed)
    par, sph, tri, mat, lig = scene_tables(scene, cfg)
    chunks = grid = sphc = None
    if cfg.use_grid:
        scene = fresh_scene_grids(scene)
        grid, tri, sph = grid_tables(scene, tri, sph)
    elif tri.shape[0] > MK.STREAM_MIN_TRIS:
        tri, chunks = tri_chunk_tables(scene, tri, _all_triangles(scene))
    if sph.size > MK.SMEM_TABLE_MAX:
        sph, sphc = sph_chunk_tables(sph, scene)

    blk = _effective_block(cfg)
    # blocked layout: the kernel consumes draws in SLOT order — gather
    # row-major u_planes through s2r exactly like render_pass_mega, so
    # draw-for-draw parity with render/direct.py holds regardless of
    # mega_block (advisor round-2 finding)
    s2r = _ray_perms(cfg, blk)[0] if blk else None

    def one_pass(pass_idx, acc, up, n_kp=1):
        if up is not None and s2r is not None:
            up = up[:, s2r]
        ipar = jnp.stack([jnp.asarray(pass_idx, jnp.int32), jnp.int32(0)])
        return MK.pathtrace_pass_pallas(
            par, ipar, sph, tri, mat, lig, acc, up,
            spp=cfg.spp, width=cfg.width, bounces=0,
            two_sided=cfg.two_sided_triangles,
            normalize_emitter=cfg.normalize_emitter,
            seed=cfg.seed, interpret=interpret, mode="direct",
            chunks=chunks, grid=grid, block=blk, sph_chunks=sphc,
            n_passes=n_kp)

    acc0 = jnp.zeros((cfg.total_rays, 3), jnp.float32)
    if n_passes == 1:
        if interpret and u_planes is None:
            u_planes = u_planes_for_direct(key, cfg, scene.lights.count)
        acc = one_pass(0, acc0, u_planes)
    elif u_planes is None and not interpret:
        # PRNG mode on a real accelerator: ALL K passes inside one kernel
        # launch (acc resident in VMEM, per-pass reseed) — bit-identical
        # to the host loop below, minus its per-pass dispatch + HBM
        # round-trip fixed costs
        acc = one_pass(0, acc0, None, n_kp=n_passes)
    else:
        def body(p, acc):
            up = u_planes
            if interpret and u_planes is None:
                up = u_planes_for_direct(rng.pass_key(key, p), cfg,
                                         scene.lights.count)
            return one_pass(p, acc, up)

        acc = jax.lax.fori_loop(0, n_passes, body, acc0)
    n_lights = max(scene.lights.count, 1)
    per_pix = acc.reshape(cfg.height * cfg.width, cfg.spp, 3).mean(1)
    if blk:
        per_pix = _unblock_pixels(per_pix, cfg, blk)
    img = per_pix.reshape(cfg.height, cfg.width, 3) / (n_lights * n_passes)
    return jnp.clip(img, 0.0, 1.0)


def u_planes_for_direct(key: Array, cfg: RenderConfig,
                        n_lights: int) -> Array:
    """Exact draws of render/direct.py in kernel plane layout:
    lens pair (draw_key LENS), then one pair per light (draw_key LIGHT)."""
    from ..core import rng
    R = cfg.total_rays
    rows = []
    lens = jax.random.uniform(rng.draw_key(key, rng.LENS), (R, 2)) \
        if cfg.spp == 1 else jnp.zeros((R, 2))
    rows += [lens[:, 0], lens[:, 1]]
    for li in range(n_lights):
        u = rng.uniform2(rng.draw_key(key, rng.LIGHT, 0, li), R)
        rows += [u[:, 0], u[:, 1]]
    return jnp.stack(rows)


def u_planes_for_pass(key: Array, passes: Array, cfg: RenderConfig,
                      n_lights: int) -> Array:
    """The pass-wide uniform tensor in the kernel's plane layout —
    EXACTLY the draws _render_pass makes (verification mode)."""
    from ..core import rng
    from .pathtracer import pass_draw_count
    kp = rng.pass_key(key, passes)
    n_draws = pass_draw_count(cfg, n_lights)
    u_all = jax.random.uniform(kp, (cfg.total_rays, n_draws, 2))
    return u_all.transpose(1, 2, 0).reshape(n_draws * 2, cfg.total_rays)
