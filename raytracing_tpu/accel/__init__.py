"""Acceleration structures: uniform grid build + DDA traversal."""
from __future__ import annotations

from ..core.types import Scene, replace
from .grid import Grid, build_sphere_grid, build_triangle_grid

__all__ = ["Grid", "build_sphere_grid", "build_triangle_grid",
           "prepare_grids"]


def prepare_grids(scene: Scene, n_slabs: int | tuple = 1) -> Scene:
    """Build all acceleration grids host-side (the analog of preRender's
    splitSphereData/splitTriangleData calls, ref code.js:1784-1804;
    per-mesh grids use each mesh's own nslabs, code.js:899-1045)."""
    sphere_grid = None
    triangle_grid = None
    if scene.spheres.count:
        sphere_grid = build_sphere_grid(scene.spheres,
                                        scene.sphere_bounds_min,
                                        scene.sphere_bounds_max, n_slabs)
    if scene.triangles.count:
        triangle_grid = build_triangle_grid(scene.triangles,
                                            scene.triangle_bounds_min,
                                            scene.triangle_bounds_max, n_slabs)
    meshes = tuple(
        replace(m, grid=build_triangle_grid(m.tris, m.bounds_min,
                                            m.bounds_max, m.nslabs))
        for m in scene.meshes)
    return replace(scene, sphere_grid=sphere_grid,
                   triangle_grid=triangle_grid, meshes=meshes)
