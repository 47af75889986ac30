"""Uniform-grid (n^3 cells) acceleration structure — build side.

Reproduces the reference's CSR binning exactly
(ref splitSphereData Assign10-Path_Tracing/code.js:1554-1641,
splitTriangleData code.js:1643-1772, splitMeshData code.js:899-1045):
  * each object is binned into EVERY cell overlapped by its AABB
    (floor((aabb - grid_min) / cell_width), clamped to [0, n-1]);
  * cells are laid out iz-major (cell = iz*n^2 + iy*n + ix);
  * `cell_offsets` is the CSR prefix array with n^3 + 1 entries;
  * object duplication across cells is intentional (hits are idempotent,
    SURVEY §7 quirk 9).

On top of the CSR arrays we derive a **padded dense** (n_cells, K) index
table for the TPU traversal: dynamic-length per-cell loops are replaced by
fixed-K masked intersections (SURVEY §7: "fixed-trip-count DDA or padded
per-cell lists").

Build runs on host (numpy); a C++ fast path lives in native/ for large
scenes (same layout, bit-identical offsets).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from typing import Any

from ..core.types import _pytree_dataclass, static_field

Array = jax.Array


@_pytree_dataclass
class Grid:
    """Device-side grid tables. ``items`` indexes into the ORIGINAL object
    arrays (the reference instead re-orders object buffers cell-by-cell;
    indexing keeps the object arrays differentiable and unduplicated)."""
    cell_offsets: Array   # (ncells + 1,) int32 CSR (parity with boxSize buffers)
    item_indices: Array   # (total_refs,) int32 CSR payload
    items: Array          # (ncells, K) int32 padded with -1
    pmin: Array           # (3,)
    pmax: Array           # (3,)
    n: tuple = static_field(default=(1, 1, 1))   # (nx, ny, nz) per axis
    max_per_cell: int = static_field(default=0)
    start: int = static_field(default=0)  # first index of the folded
    #                                       triangle array this grid covers
    #                                       (megakernel grid mode: indices
    #                                       below run the brute loop — the
    #                                       reference's scene-tris-vs-mesh
    #                                       dispatch split, code.js:1293-1303)
    cell_bounds: Any = None  # (ncells, 6) TIGHT per-cell AABB [lo, hi] of
    #                          the binned items clipped to the cell, in
    #                          VISIT order (mega_order_grid); None on plain
    #                          builds
    cell_centers: Any = None  # (ncells, 3) geometric cell centers in VISIT
    #                           order — lets render-time code recompute a
    #                           front-to-back permutation for the CURRENT
    #                           eye (render/mega._fresh_grid; orbit/camera
    #                           training stay optimally ordered)


def _n3(n) -> tuple[int, int, int]:
    """Normalize a resolution spec: int -> cubic, 3-seq -> per axis. The
    reference's 1-D slab scheme (Assign06 code.js:459-513) is the (n, 1, 1)
    degenerate case; Assign07+ is cubic."""
    if isinstance(n, (tuple, list)):
        nx, ny, nz = (int(v) for v in n)
        return (nx, ny, nz)
    return (int(n),) * 3


def _bin_csr_python(lo: np.ndarray, hi: np.ndarray, pmin: np.ndarray,
                    pmax: np.ndarray, n):
    """numpy binning -> (offsets (ncells+1,), payload) CSR arrays."""
    nx, ny, nz = _n3(n)
    nv = np.asarray([nx, ny, nz])
    ncells = nx * ny * nz
    width = (pmax - pmin) / nv
    width = np.where(width <= 0, 1e-30, width)
    min_box = np.clip(np.floor((lo - pmin[None, :]) / width[None, :]),
                      0, nv - 1).astype(np.int64)
    max_box = np.clip(np.floor((hi - pmin[None, :]) / width[None, :]),
                      0, nv - 1).astype(np.int64)

    cells: list[list[int]] = [[] for _ in range(ncells)]
    for i in range(lo.shape[0]):
        for iz in range(min_box[i, 2], max_box[i, 2] + 1):
            for iy in range(min_box[i, 1], max_box[i, 1] + 1):
                for ix in range(min_box[i, 0], max_box[i, 0] + 1):
                    cells[iz * ny * nx + iy * nx + ix].append(i)

    offsets = np.zeros(ncells + 1, np.int32)
    for c, lst in enumerate(cells):
        offsets[c + 1] = offsets[c] + len(lst)
    payload = (np.concatenate([np.asarray(lst, np.int32) for lst in cells])
               if offsets[-1] else np.zeros(0, np.int32))
    return offsets, payload


def build_grid(lo: np.ndarray, hi: np.ndarray, pmin, pmax, n,
               use_native: bool = True) -> Grid:
    """Build from object AABBs. lo/hi: (O, 3) float; pmin/pmax: grid bounds;
    n: int (cubic) or (nx, ny, nz)."""
    pmin = np.asarray(pmin, np.float32).reshape(3)
    pmax = np.asarray(pmax, np.float32).reshape(3)
    lo = np.asarray(lo, np.float32).reshape(-1, 3)
    hi = np.asarray(hi, np.float32).reshape(-1, 3)
    n = _n3(n)
    ncells = n[0] * n[1] * n[2]

    csr = None
    if use_native:
        try:
            from ..native import gridbuild as _native
            csr = _native.bin_csr(lo, hi, pmin, pmax, n)
        except Exception:
            csr = None
    if csr is None:
        csr = _bin_csr_python(lo, hi, pmin, pmax, n)
    offsets, payload = csr

    counts = np.diff(offsets)
    K = max(int(counts.max()) if counts.size else 0, 1)
    items = np.full((ncells, K), -1, np.int32)
    for c in range(ncells):
        items[c, :counts[c]] = payload[offsets[c]:offsets[c + 1]]

    return Grid(cell_offsets=jnp.asarray(offsets),
                item_indices=jnp.asarray(payload),
                items=jnp.asarray(items),
                pmin=jnp.asarray(pmin), pmax=jnp.asarray(pmax),
                n=n, max_per_cell=K)


def mega_order_grid(grid: Grid, lo: np.ndarray, hi: np.ndarray,
                    eye, index_offset: int = 0) -> Grid:
    """Prepare a grid for the megakernel's in-kernel traversal:

      * cells re-ordered front-to-back by distance from the camera eye to
        the cell center, so champions form in the first visited cells and
        the shrinking ``min(maxt, champion)`` window culls the rest — the
        tile-granular analog of the reference DDA's early exit
        (code.cl:745-786);
      * per-cell TIGHT AABBs (union of the binned items' boxes clipped to
        the cell) for the kernel's slab test — boundary cells shrink to
        their occupied corner.

    ``lo/hi``: (O, 3) item AABBs in the grid's LOCAL index space;
    ``index_offset`` is added to the stored item indices (folded-array
    offset). Only the megakernel consumes the result — the XLA DDA
    (accel/traverse.py) addresses cells by computed id and must use the
    plain build.

    The build-time order targets the build-time ``eye``; the stored
    ``cell_centers`` let the megakernel driver recompute the permutation
    for the CURRENT eye per render (render/mega._fresh_grid, a traced
    argsort + CSR regather), so camera motion (orbit, camera training)
    keeps optimal early-exit culling."""
    nx, ny, nz = grid.n
    ncells = nx * ny * nz
    pmin = np.asarray(grid.pmin)
    pmax = np.asarray(grid.pmax)
    width = (pmax - pmin) / np.asarray([nx, ny, nz])
    width = np.where(width <= 0, 1e-30, width)
    offsets = np.asarray(grid.cell_offsets)
    payload = np.asarray(grid.item_indices)

    iz, rem = np.divmod(np.arange(ncells), ny * nx)
    iy, ix = np.divmod(rem, nx)
    cell_lo = pmin[None, :] + np.stack([ix, iy, iz], -1) * width[None, :]
    centers = cell_lo + 0.5 * width[None, :]
    order = np.argsort(np.linalg.norm(centers - np.asarray(eye)[None, :],
                                      axis=-1), kind="stable")

    counts = np.diff(offsets)[order]
    new_off = np.zeros(ncells + 1, np.int32)
    np.cumsum(counts, out=new_off[1:])
    new_pay = np.concatenate(
        [payload[offsets[c]:offsets[c + 1]] for c in order]) \
        if payload.size else payload
    bounds = np.zeros((ncells, 6), np.float32)
    for k, c in enumerate(order):
        ids = payload[offsets[c]:offsets[c + 1]]
        if ids.size:
            blo = np.maximum(lo[ids].min(0), cell_lo[c])
            bhi = np.minimum(hi[ids].max(0), cell_lo[c] + width)
            bounds[k, :3] = blo
            bounds[k, 3:] = bhi
    return dataclasses.replace(
        grid,
        cell_offsets=jnp.asarray(new_off),
        item_indices=jnp.asarray(new_pay.astype(np.int32) + index_offset),
        cell_bounds=jnp.asarray(bounds),
        cell_centers=jnp.asarray(centers[order].astype(np.float32)),
        start=index_offset)


def sphere_aabbs(centers: np.ndarray, radii: np.ndarray):
    c = np.asarray(centers, np.float32)
    r = np.asarray(radii, np.float32)[:, None]
    return c - r, c + r


def triangle_aabbs(v: np.ndarray):
    v = np.asarray(v, np.float32)
    return v.min(1), v.max(1)


def build_sphere_grid(spheres, pmin, pmax, n: int) -> Grid:
    """ref splitSphereData (code.js:1554-1641). Note the reference stores
    radius^2 in the re-ordered buffer (code.js:1601); we keep indices, the
    squared-radius convention lives in the intersection op."""
    lo, hi = sphere_aabbs(np.asarray(spheres.center), np.asarray(spheres.radius))
    return build_grid(lo, hi, pmin, pmax, n)


def build_triangle_grid(tris, pmin, pmax, n: int) -> Grid:
    """ref splitTriangleData (code.js:1643-1772) / splitMeshData
    (code.js:899-1045, per-mesh nslabs)."""
    lo, hi = triangle_aabbs(np.asarray(tris.v))
    return build_grid(lo, hi, pmin, pmax, n)
