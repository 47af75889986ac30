"""Differentiable megakernel (custom VJP) vs the XLA stage pipeline.

The custom VJP's primal is the fused forward kernel; its backward is either
the fused Pallas recompute-VJP kernel (TPU) or the plain-XLA reference
cotangents (CPU/interpret — same _tile_program, one big tile). With
identical u-planes the gradients must match the XLA pipeline's to float
tolerance for every parameter group the scene tables carry: camera scalars,
sphere centers/radii, triangle vertices, materials, lights.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracing_tpu import RenderConfig
from raytracing_tpu.models.scenes import cornell_box, sphere_field
from raytracing_tpu.render import pathtracer
from raytracing_tpu.render.mega import (render_pass_mega, supported_diff,
                                        u_planes_for_pass)


@pytest.fixture(scope="module")
def scene():
    return cornell_box(cols=32, rows=24)


def _grads(scene, cfg, pass_fn):
    state0 = pathtracer.init_state(cfg)

    def loss(params):
        sp = dataclasses.replace(scene.spheres, center=params["center"],
                                 radius=params["radius"])
        tr = dataclasses.replace(scene.triangles, v=params["tv"])
        lg = dataclasses.replace(scene.lights, irradiance=params["irr"],
                                 position=params["lpos"])
        sc = dataclasses.replace(scene, spheres=sp, triangles=tr, lights=lg,
                                 materials=params["mat"],
                                 camera=dataclasses.replace(
                                     scene.camera, eye=params["eye"]))
        st = pass_fn(sc, state0)
        return jnp.mean(st["acc"] ** 2)

    params = {"center": scene.spheres.center, "radius": scene.spheres.radius,
              "tv": scene.triangles.v, "mat": scene.materials,
              "irr": scene.lights.irradiance, "lpos": scene.lights.position,
              "eye": scene.camera.eye}
    return jax.value_and_grad(loss)(params)


def _compare(scene, cfg, rtol_v=1e-5, max_viol=0.0):
    """``max_viol``: tolerated fraction of per-component violations. At
    cornell scale gradients match componentwise (0.0); at hundreds of
    objects a handful of silhouette pixels flip champion between the two
    implementations' float expression orders, re-routing those pixels'
    cotangents — the aggregate direction must still agree (cosine gate)."""
    state0 = pathtracer.init_state(cfg)
    u = u_planes_for_pass(state0["key"], state0["passes"], cfg,
                          scene.lights.count)
    vx, gx = _grads(scene, cfg,
                    lambda sc, st: pathtracer._render_pass(sc, st, cfg))
    vm, gm = _grads(scene, cfg,
                    lambda sc, st: render_pass_mega(sc, st, cfg, u_planes=u,
                                                    interpret=True))
    np.testing.assert_allclose(float(vm), float(vx), rtol=rtol_v)
    for k in gx:
        a, b = np.asarray(gx[k]), np.asarray(gm[k])
        if a.size == 0:
            continue
        assert np.isfinite(b).all(), k
        scale = max(np.abs(a).max(), 1e-8)
        if max_viol == 0.0:
            np.testing.assert_allclose(b, a, rtol=5e-3, atol=5e-3 * scale,
                                       err_msg=k)
        else:
            # champion flips are float-level (FMA contraction inside the
            # compiled scan body vs the stage pipeline's fusions — the
            # BASELINE.md cross-backend noise class): a flipped silhouette
            # pixel re-routes its whole cotangent to the other object, so
            # the gate is directional + magnitude agreement
            na, nb = np.linalg.norm(a), np.linalg.norm(b)
            cos = (a * b).sum() / max(na * nb, 1e-20)
            assert cos > 0.99, f"{k}: cosine {cos}"
            assert 0.8 < nb / max(na, 1e-20) < 1.25, f"{k}: norms {na} {nb}"
        if np.abs(a).max() > 0:
            assert np.abs(b).max() > 0, f"{k}: mega grad identically zero"


def test_diff_grads_match_xla_direct_segment(scene):
    # bounces=0: primary hit + emitter + NEE only
    _compare(scene, RenderConfig(width=32, height=24, spp=1, bounces=0))


def test_diff_grads_match_xla_bounced(scene):
    _compare(scene, RenderConfig(width=32, height=24, spp=1, bounces=1))


def test_diff_grads_match_xla_rr(scene):
    _compare(scene, RenderConfig(width=32, height=24, spp=1, bounces=2,
                                 russian_roulette=True, rr_start_depth=1))


def test_diff_gating():
    from raytracing_tpu.render.mega import DIFF_TABLE_MAX
    cfg = RenderConfig(width=8, height=8)
    assert supported_diff(cornell_box(cols=8, rows=8), cfg)
    # beyond the unroll budget: the chunk-scanned backward covers it now
    assert supported_diff(sphere_field(65, cols=8, rows=8), cfg)
    # grid configs are diff-supported at build time since round 4 (the
    # scene-level check gates on prepared grids + row budgets)
    assert supported_diff(None, RenderConfig(width=8, height=8,
                                             use_grid=True))
    # the edge-aware backward covers the full diff budget since round 4
    # (chunk-local soft compositing past the unroll budget)
    cfg_edge = RenderConfig(width=8, height=8, mega_edge_bandwidth=1e-2)
    assert supported_diff(cornell_box(cols=8, rows=8), cfg_edge)
    assert supported_diff(sphere_field(65, cols=8, rows=8), cfg_edge)
    assert not supported_diff(sphere_field(DIFF_TABLE_MAX + 1, cols=8,
                                           rows=8), cfg_edge)
    assert DIFF_TABLE_MAX > 64


def _subdivide_triangles(scene, k):
    """Split every scene triangle into k^2 coplanar sub-triangles with the
    SAME union geometry (orientation preserved, vn barycentrically
    interpolated) — a big-table scene whose image is pixel-identical to
    the original's, for exercising the streamed/scanned paths."""
    from raytracing_tpu.core.types import Triangles

    v = np.asarray(scene.triangles.v)
    vn = np.asarray(scene.triangles.vn)
    mat = np.asarray(scene.triangles.mat_id)
    vs, vns, mats = [], [], []
    for t in range(v.shape[0]):
        p0, p1, p2 = v[t]
        n0, n1, n2 = vn[t]

        def pt(a, b):
            return (p0 + (p1 - p0) * (a / k) + (p2 - p0) * (b / k),
                    n0 + (n1 - n0) * (a / k) + (n2 - n0) * (b / k))

        for a in range(k):
            for b in range(k - a):
                q = [pt(a, b), pt(a + 1, b), pt(a, b + 1)]
                vs.append([x[0] for x in q])
                vns.append([x[1] for x in q])
                mats.append(mat[t])
                if a + b < k - 1:
                    q = [pt(a + 1, b), pt(a + 1, b + 1), pt(a, b + 1)]
                    vs.append([x[0] for x in q])
                    vns.append([x[1] for x in q])
                    mats.append(mat[t])
    tris = Triangles(v=jnp.asarray(np.asarray(vs, np.float32)),
                     vn=jnp.asarray(np.asarray(vns, np.float32)),
                     mat_id=jnp.asarray(np.asarray(mats, np.int32)),
                     mask=jnp.ones(len(vs), bool))
    return dataclasses.replace(scene, triangles=tris)


def test_diff_grads_match_xla_streamed_tris(scene):
    """LARGE triangle table (360 tris > UNROLL_OBJECTS): forward streams
    (Morton chunks + tile culling + SMEM DMA), backward runs the chunked
    lax.scan with the same conservative chunk culling
    (megakernel_grad._loop_diff windows). Grads must still match the XLA
    stage pipeline on the identical subdivided geometry."""
    big = _subdivide_triangles(scene, k=6)          # 10 -> 360 triangles
    cfg = RenderConfig(width=32, height=24, spp=1, bounces=1)
    assert supported_diff(big, cfg)
    _compare(big, cfg)


def test_diff_blocked_layout_matches_unblocked(scene):
    """cfg.mega_block through the DIFFERENTIABLE path (round-2 weak #5:
    blocking used to silently drop under diff): values and grads must
    match the unblocked render — the s2r/r2s gathers are in the traced
    graph, so AD un-permutes the cotangents."""
    cfg0 = RenderConfig(width=32, height=24, spp=1, bounces=1)
    cfgB = dataclasses.replace(cfg0, mega_block=8)
    state0 = pathtracer.init_state(cfg0)
    u = u_planes_for_pass(state0["key"], state0["passes"], cfg0,
                          scene.lights.count)
    v0, g0 = _grads(scene, cfg0,
                    lambda sc, st: render_pass_mega(sc, st, cfg0,
                                                    u_planes=u,
                                                    interpret=True))
    vB, gB = _grads(scene, cfgB,
                    lambda sc, st: render_pass_mega(sc, st, cfgB,
                                                    u_planes=u,
                                                    interpret=True))
    np.testing.assert_allclose(float(vB), float(v0), rtol=1e-6)
    for k in g0:
        np.testing.assert_allclose(np.asarray(gB[k]), np.asarray(g0[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def test_diff_grads_match_xla_large_sphere_table():
    """Sphere table past the unroll budget (200 spheres): the backward
    scans chunks (no AABB windows — spheres below the streaming threshold
    ride the forward's SMEM fori path). At 32x24 nearly every pixel of the
    dense cloud is a silhouette pixel, so champion-flip noise is at its
    worst — the gate is aggregate (cosine + norm), with componentwise
    exactness already pinned by the streamed-triangle test above."""
    sc = sphere_field(200, cols=32, rows=24)
    # value rtol loosened: at 200 objects the kernel's scalar-form math
    # vs the XLA pipeline's matmul-form accumulates ~1e-4 relative float
    # drift (same champion, different expression order)
    _compare(sc, RenderConfig(width=32, height=24, spp=1, bounces=1),
             rtol_v=1e-3, max_viol=0.01)


def test_diff_wrt_subset(scene):
    """cfg.mega_grad_wrt restricts cotangents: selected groups match the
    full-gradient run, unselected return zeros."""
    cfg_full = RenderConfig(width=32, height=24, spp=1, bounces=1)
    cfg_sub = dataclasses.replace(cfg_full, mega_grad_wrt=("sph", "mat"))
    state0 = pathtracer.init_state(cfg_full)
    u = u_planes_for_pass(state0["key"], state0["passes"], cfg_full,
                          scene.lights.count)
    _, g_full = _grads(scene, cfg_full,
                       lambda sc, st: render_pass_mega(sc, st, cfg_full,
                                                       u_planes=u,
                                                       interpret=True))
    _, g_sub = _grads(scene, cfg_sub,
                      lambda sc, st: render_pass_mega(sc, st, cfg_sub,
                                                      u_planes=u,
                                                      interpret=True))
    for k in ["center", "radius", "mat"]:
        np.testing.assert_allclose(np.asarray(g_sub[k]),
                                   np.asarray(g_full[k]), rtol=1e-6,
                                   err_msg=k)
    for k in ["tv", "irr", "lpos", "eye"]:
        assert (np.asarray(g_sub[k]) == 0).all(), k
        assert np.abs(np.asarray(g_full[k])).max() > 0, k


@pytest.mark.slow
@pytest.mark.parametrize("bwd_sublanes", [32, 8])
def test_bwd_pallas_kernel_matches_reference(bwd_sublanes):
    """The actual backward Pallas kernel (interpret mode) vs the plain-XLA
    reference cotangents: same tile program, so the only differences are
    the tile decomposition and the in-kernel accumulation order."""
    from raytracing_tpu.ops.pallas.megakernel_grad import (_bwd_pallas,
                                                           _bwd_reference)
    from raytracing_tpu.render.mega import scene_tables

    scene = sphere_field(3, cols=16, rows=16)
    cfg = RenderConfig(width=16, height=16, spp=1, bounces=0)
    par, sph, tri, mat, lig = scene_tables(scene, cfg)
    ipar = jnp.array([0, 0], jnp.int32)
    state0 = pathtracer.init_state(cfg)
    u = u_planes_for_pass(state0["key"], state0["passes"], cfg,
                          scene.lights.count)
    rng = np.random.default_rng(3)
    g = jnp.asarray(rng.normal(size=(cfg.total_rays, 3)).astype(np.float32))
    kw = dict(spp=cfg.spp, width=cfg.width, bounces=cfg.bounces,
              two_sided=cfg.two_sided_triangles,
              normalize_emitter=cfg.normalize_emitter, seed=cfg.seed,
              mode="path", russian_roulette=False, rr_start_depth=0)
    ref = _bwd_reference(par, ipar, sph, tri, mat, lig, g, u, **kw)
    got = _bwd_pallas(par, ipar, sph, tri, mat, lig, g, u,
                      interpret=True, remat=False,
                      bwd_sublanes=bwd_sublanes, **kw)
    names = ["dpar", "dsph", "dtri", "dmat", "dlig"]
    for name, a, b in zip(names, ref, got):
        a, b = np.asarray(a), np.asarray(b)[:a.shape[0]]
        scale = max(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-4 * scale,
                                   err_msg=name)


# ---------------------------------------------------------------------------
# GRID-mode training (round 4): cell-structured backward
# ---------------------------------------------------------------------------

def _grads_mesh(scene, cfg, pass_fn):
    """Gradient probe for mesh scenes: perturbs large-mesh vertices (the
    reference's flagship differentiable target, cornell_teapot.xml:209-226),
    sphere centers and materials."""
    state0 = pathtracer.init_state(cfg)
    large_i = [i for i, m in enumerate(scene.meshes) if m.tris.count > 64]

    def loss(params):
        meshes = list(scene.meshes)
        for i in large_i:
            m = meshes[i]
            meshes[i] = dataclasses.replace(
                m, tris=dataclasses.replace(m.tris, v=params[f"mesh{i}"]))
        sp = dataclasses.replace(scene.spheres, center=params["center"])
        sc = dataclasses.replace(scene, meshes=tuple(meshes), spheres=sp,
                                 materials=params["mat"])
        st = pass_fn(sc, state0)
        return jnp.mean(st["acc"] ** 2)

    params = {"mat": scene.materials, "center": scene.spheres.center}
    params.update({f"mesh{i}": scene.meshes[i].tris.v for i in large_i})
    return jax.value_and_grad(loss)(params)


def _grid_scene(cols, rows, n=3):
    import os

    from raytracing_tpu.accel import prepare_grids
    from raytracing_tpu.io.scene_xml import load_scene
    from raytracing_tpu.models.assignments import REF_ROOT
    xml = os.path.join(REF_ROOT,
                       "Assign10-Path_Tracing/scenes/cornell_teapot.xml")
    if not os.path.exists(xml):
        pytest.skip("reference cornell_teapot.xml not available")
    return prepare_grids(load_scene(xml, cols, rows), n, mesh_slabs=n)


def _compare_grid(scene, cfg):
    """Grid-mode megakernel grads vs an INDEPENDENT oracle: the brute XLA
    stage pipeline (use_megakernel=False, use_grid=False — binned items
    champion identically to brute force, quirk 9, and the draw layout does
    not depend on the traversal mode). The original form passed the shared
    cfg to _render_pass, whose use_megakernel=True routed the 'oracle'
    through the megakernel itself — oracle == DUT. Aggregate gate: mesh
    scenes at tiny resolutions are silhouette-dense, the BASELINE.md
    champion-flip noise class."""
    state0 = pathtracer.init_state(cfg)
    u = u_planes_for_pass(state0["key"], state0["passes"], cfg,
                          scene.lights.count)
    cfg_x = dataclasses.replace(cfg, use_megakernel=False, use_grid=False)
    vx, gx = _grads_mesh(scene, cfg,
                         lambda sc, st: pathtracer._render_pass(sc, st,
                                                                cfg_x))
    vm, gm = _grads_mesh(scene, cfg,
                         lambda sc, st: render_pass_mega(sc, st, cfg,
                                                         u_planes=u,
                                                         interpret=True))
    np.testing.assert_allclose(float(vm), float(vx), rtol=1e-3)
    for k in gx:
        a, b = np.asarray(gx[k]), np.asarray(gm[k])
        if a.size == 0:
            continue
        assert np.isfinite(b).all(), k
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        cos = (a * b).sum() / max(na * nb, 1e-20)
        assert cos > 0.99, f"{k}: cosine {cos}"
        assert 0.8 < nb / max(na, 1e-20) < 1.25, f"{k}: norms {na} {nb}"
        if np.abs(a).max() > 0:
            assert np.abs(b).max() > 0, f"{k}: mega grad identically zero"


def test_diff_grads_grid_mode_teapot():
    """GRID-mode training through the megakernel VJP (VERDICT round-3
    headline): primal = the in-kernel grid pass; backward = the
    cell-structured diff tables (cell-major duplicated rows, per-chunk
    cell-clipped AABB culling). Grads must match the XLA grid pipeline
    with identical draws."""
    # n=2 per-mesh grid and 16x12: the XLA grid PIPELINE's gradient (the
    # oracle side) compiles a graph deep enough that XLA's CPU compiler
    # overflows an 8 MB thread stack at n=3/24x18 (segfault at default
    # ulimit; conftest raises the soft limit as well) and takes ~9 min on
    # 2 CPUs. The smaller instance exercises the same code paths: mesh-
    # instanced XML scene, cell-major diff tables, cell-clipped chunk
    # culling, mesh-vertex/sphere/material grads.
    scene = _grid_scene(16, 12, n=2)
    cfg = RenderConfig(width=16, height=12, spp=1, bounces=1,
                       use_grid=True, use_megakernel=True)
    assert supported_diff(scene, cfg)
    _compare_grid(scene, cfg)


def test_diff_grads_grid_streamed_matches_resident(monkeypatch):
    """STREAMED-grid training (house-class assets): the backward diff
    tables are identical to the resident ones, and the primal is the
    (tested-equal) streamed pass — grads must equal the resident-mode
    grads exactly."""
    from raytracing_tpu.render import mega as MG
    scene = _grid_scene(16, 12)
    cfg = RenderConfig(width=16, height=12, spp=1, bounces=0,
                       use_grid=True, use_megakernel=True)
    state0 = pathtracer.init_state(cfg)
    u = u_planes_for_pass(state0["key"], state0["passes"], cfg,
                          scene.lights.count)

    def run():
        return _grads_mesh(scene, cfg,
                           lambda sc, st: render_pass_mega(
                               sc, st, cfg, u_planes=u, interpret=True))

    v_res, g_res = run()
    monkeypatch.setattr(MG, "GRID_RESIDENT_MAX", 64)
    v_str, g_str = run()
    monkeypatch.undo()
    np.testing.assert_allclose(float(v_str), float(v_res), rtol=1e-6)
    for k in g_res:
        np.testing.assert_allclose(np.asarray(g_str[k]),
                                   np.asarray(g_res[k]),
                                   rtol=1e-5, atol=1e-7, err_msg=k)


def test_diff_gating_grid():
    """Grid scenes are diff-supported when prepared and within the
    GRID_DIFF_MAX duplicated-row budget; since round 5 EDGE mode covers
    grid scenes too (soft backward over the un-duplicated tables) within
    the plain DIFF_TABLE_MAX budget."""
    from raytracing_tpu.render.mega import DIFF_TABLE_MAX, GRID_DIFF_MAX
    cfg = RenderConfig(width=8, height=8, use_grid=True,
                       use_megakernel=True)
    # build-time (scene=None) check is optimistic for grid configs now —
    # the scene-level check still gates on prepared grids and row budgets
    assert supported_diff(None, cfg)
    scene = _grid_scene(8, 8)
    assert supported_diff(scene, cfg)
    cfg_edge = dataclasses.replace(cfg, mega_edge_bandwidth=1e-2)
    assert supported_diff(scene, cfg_edge)      # round-5 edge x grid
    assert not supported_diff(
        sphere_field(DIFF_TABLE_MAX + 1, cols=8, rows=8), cfg_edge)
    assert GRID_DIFF_MAX >= 4096


# ---------------------------------------------------------------------------
# CHAMPION (cell-marching) backward (round 5): the production route past
# the unroll budget — forward records champion rows + occlusion bits, the
# backward is gather + shading VJP + scatter (no object sweep)
# ---------------------------------------------------------------------------

def test_cell_backward_matches_pipeline_cornell(scene):
    """Forced cell route on the unrolled cornell scene: cotangents must
    equal the XLA stage pipeline componentwise (same champions, same
    shading chain — the champion program re-derives the surface with the
    kernel's exact formulas)."""
    cfg = RenderConfig(width=32, height=24, spp=1, bounces=2,
                       mega_bwd_impl="cell")
    _compare(scene, cfg)


def test_cell_backward_matches_pipeline_rr(scene):
    cfg = RenderConfig(width=32, height=24, spp=1, bounces=2,
                       russian_roulette=True, rr_start_depth=1,
                       mega_bwd_impl="cell")
    _compare(scene, cfg)


def test_cell_backward_streamed_teapot():
    """Cell route on a Morton-STREAMED table (teapot, 992 tris): the
    recorded champion ids index the streamed (sorted) diff table; AD
    through the Morton gather un-permutes the cotangents. Compared against
    the sweep-based reference backward on the same megakernel primal, so
    the gate is componentwise (identical draws, identical champions)."""
    from raytracing_tpu.models.scenes import big_mesh_scene
    scene = big_mesh_scene("teapot.json", cols=24, rows=16)
    cfg = RenderConfig(width=24, height=16, spp=1, bounces=1)
    state0 = pathtracer.init_state(cfg)
    u = u_planes_for_pass(state0["key"], state0["passes"], cfg,
                          scene.lights.count)

    def run(impl):
        c = dataclasses.replace(cfg, mega_bwd_impl=impl)
        return _grads_mesh(scene, c,
                           lambda sc, st: render_pass_mega(
                               sc, st, c, u_planes=u, interpret=True))

    v_ref, g_ref = run("xla")
    v_cell, g_cell = run("cell")
    np.testing.assert_allclose(float(v_cell), float(v_ref), rtol=1e-6)
    for k in g_ref:
        a, b = np.asarray(g_ref[k]), np.asarray(g_cell[k])
        if a.size == 0:
            continue
        scale = max(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(b, a, rtol=5e-3, atol=5e-3 * scale,
                                   err_msg=k)


def test_cell_backward_sphere_grid(monkeypatch):
    """Cell route through the in-kernel SPHERE GRID (molecule training):
    SMEM_TABLE_MAX is shrunk so a 64-sphere field builds a mega sphere
    grid and the kernel streams cell-major sphere rows — the recorded
    champion ids must index the cell-major diff table (duplicated rows,
    scatter back through the grid gather)."""
    from raytracing_tpu.accel import prepare_grids
    from raytracing_tpu.ops.pallas import megakernel as MKm
    scene = sphere_field(64, cols=24, rows=16)
    cfg = RenderConfig(width=24, height=16, spp=1, bounces=1,
                       use_grid=True, mega_bwd_impl="cell")
    cfg_x = dataclasses.replace(cfg, use_grid=False, mega_bwd_impl="auto")
    state0 = pathtracer.init_state(cfg)
    u = u_planes_for_pass(state0["key"], state0["passes"], cfg,
                          scene.lights.count)
    vx, gx = _grads(scene, cfg,
                    lambda sc, st: pathtracer._render_pass(sc, st, cfg_x))
    monkeypatch.setattr(MKm, "SMEM_TABLE_MAX", 64)
    sc_g = prepare_grids(scene, 2)
    assert sc_g.mega_sph_grid is not None
    assert supported_diff(sc_g, cfg)
    vm, gm = _grads(sc_g, cfg,
                    lambda sc, st: render_pass_mega(sc, st, cfg,
                                                    u_planes=u,
                                                    interpret=True))
    monkeypatch.undo()
    np.testing.assert_allclose(float(vm), float(vx), rtol=1e-3)
    for k in gx:
        a, b = np.asarray(gx[k]), np.asarray(gm[k])
        if a.size == 0 or np.abs(a).max() == 0:
            continue
        assert np.isfinite(b).all(), k
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        cos = (a * b).sum() / max(na * nb, 1e-20)
        assert cos > 0.99, f"{k}: cosine {cos}"
        assert 0.8 < nb / max(na, 1e-20) < 1.25, f"{k}: norms {na} {nb}"


@pytest.mark.slow
def test_bwd_champ_pallas_matches_value_level():
    """The Pallas champion kernel (interpret) vs the value-level champion
    backward: same recorded ids/occs, same draws. Gate is aggregate
    (cosine + norm): the two compile the same math under different tile
    shapes, so a boundary ray can flip a recomputed window compare
    (champion-flip noise class, BASELINE.md) and reroute its cotangent."""
    from raytracing_tpu.ops.pallas import megakernel as MKm
    from raytracing_tpu.ops.pallas import megakernel_grad as MG
    from raytracing_tpu.render.mega import scene_tables

    cfg = RenderConfig(width=32, height=24, spp=1, bounces=1)
    sc = cornell_box(cols=32, rows=24)
    state0 = pathtracer.init_state(cfg)
    u = u_planes_for_pass(state0["key"], state0["passes"], cfg,
                          sc.lights.count)
    par, sph, tri, mat, lig = scene_tables(sc, cfg)
    ipar = jnp.zeros((2,), jnp.int32)
    acc0 = jnp.zeros((cfg.total_rays, 3), jnp.float32)
    kw = dict(spp=1, width=32, bounces=1, two_sided=False,
              normalize_emitter=True, seed=cfg.seed)
    _, ids, occs = MKm.pathtrace_pass_pallas(
        par, ipar, sph, tri, mat, lig, acc0, u, record=True,
        interpret=True, **kw)
    rng = np.random.default_rng(5)
    g = jnp.asarray(rng.normal(size=(cfg.total_rays, 3)).astype(np.float32))
    bkw = dict(mode="path", russian_roulette=False, rr_start_depth=0, **kw)
    ref = MG._bwd_champion(par, ipar, sph, tri, mat, lig, g, u, ids, occs,
                           **bkw)
    got = MG._bwd_champ_pallas(par, ipar, sph, tri, mat, lig, g, u, ids,
                               occs, interpret=True, **bkw)
    for name, a, b in zip(["dpar", "dsph", "dtri", "dmat", "dlig"],
                          ref, got):
        a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
        assert np.isfinite(b).all(), name
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na == 0:
            assert nb == 0, name
            continue
        cos = (a * b).sum() / max(na * nb, 1e-20)
        assert cos > 0.9999, f"{name}: cosine {cos}"
        assert 0.99 < nb / na < 1.01, f"{name}: norms {na} {nb}"
