"""Megakernel (whole-pass fused Pallas kernel) vs the XLA stage pipeline.

Verification mode feeds the kernel the EXACT uniform draws the XLA pass
makes (render/mega.py u_planes_for_pass), so images must match to float
tolerance; internal-PRNG mode is checked statistically.
Runs in Pallas interpret mode on the CPU test mesh (conftest pins
JAX_PLATFORMS=cpu).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracing_tpu import RenderConfig
from raytracing_tpu.models.scenes import cornell_box
from raytracing_tpu.render import pathtracer
from raytracing_tpu.render.mega import (render_pass_mega, supported,
                                        u_planes_for_pass)


@pytest.fixture(scope="module")
def small_scene():
    return cornell_box(cols=64, rows=48)


def _run_xla(scene, cfg, n_passes=1):
    state = pathtracer.init_state(cfg)
    for _ in range(n_passes):
        state = pathtracer._render_pass(scene, state, cfg)
    return state


def _run_mega_verify(scene, cfg, n_passes=1):
    state = pathtracer.init_state(cfg)
    for _ in range(n_passes):
        u = u_planes_for_pass(state["key"], state["passes"], cfg,
                              scene.lights.count)
        state = render_pass_mega(scene, state, cfg, u_planes=u,
                                 interpret=True)
    return state


@pytest.mark.parametrize("bounces", [0, 2])
def test_matches_xla_pipeline_same_draws(small_scene, bounces):
    cfg = RenderConfig(width=64, height=48, spp=1, bounces=bounces)
    ref = _run_xla(small_scene, cfg)
    got = _run_mega_verify(small_scene, cfg)
    np.testing.assert_allclose(np.asarray(got["acc"]),
                               np.asarray(ref["acc"]),
                               rtol=2e-4, atol=2e-4)
    assert int(got["passes"]) == 1


def test_matches_xla_spp4(small_scene):
    cfg = RenderConfig(width=32, height=24, spp=4, bounces=1)
    ref = _run_xla(small_scene, cfg)
    got = _run_mega_verify(small_scene, cfg)
    np.testing.assert_allclose(np.asarray(got["acc"]),
                               np.asarray(ref["acc"]),
                               rtol=2e-4, atol=2e-4)


def test_two_passes_accumulate(small_scene):
    cfg = RenderConfig(width=32, height=24, spp=1, bounces=1)
    ref = _run_xla(small_scene, cfg, n_passes=2)
    got = _run_mega_verify(small_scene, cfg, n_passes=2)
    np.testing.assert_allclose(np.asarray(got["acc"]),
                               np.asarray(ref["acc"]),
                               rtol=5e-4, atol=5e-4)
    assert int(got["passes"]) == 2


def test_config_gating(small_scene):
    ok = RenderConfig(width=8, height=8)
    assert supported(small_scene, ok)
    assert not supported(small_scene, RenderConfig(width=8, height=8,
                                                   use_grid=True))
    # RR runs in-kernel since round 2 (BASELINE.json config 5 as specified)
    assert supported(small_scene,
                     RenderConfig(width=8, height=8, russian_roulette=True))
    # object tables of ANY size are covered since sphere streaming: SMEM
    # tables up to the budget, Morton-chunk streaming beyond it (big
    # molecules included) — only absurd counts (>2^20) are rejected
    from raytracing_tpu.models.scenes import sphere_field
    from raytracing_tpu.ops.pallas import megakernel as MK
    assert supported(sphere_field(64, cols=8, rows=8), ok)
    assert supported(sphere_field(65, cols=8, rows=8), ok)
    streams = MK.SMEM_TABLE_MAX // 8 + 1
    assert supported(sphere_field(streams, cols=8, rows=8), ok)


def test_rr_matches_xla_pipeline_same_draws(small_scene):
    """Russian roulette in-kernel vs the XLA stage pipeline with identical
    draws (BASELINE.json config 5 as specified: RR termination)."""
    cfg = RenderConfig(width=32, height=24, spp=1, bounces=3,
                       russian_roulette=True, rr_start_depth=1)
    ref = _run_xla(small_scene, cfg)
    got = _run_mega_verify(small_scene, cfg)
    np.testing.assert_allclose(np.asarray(got["acc"]),
                               np.asarray(ref["acc"]),
                               rtol=2e-4, atol=2e-4)


def test_rr_unbiased(small_scene):
    """RR is an unbiased estimator: the mean radiance with RR termination
    must match the fixed-depth estimate within MC noise (survivors are
    compensated by 1/p)."""
    passes = 48
    cfg_rr = RenderConfig(width=32, height=24, spp=1, bounces=3,
                          russian_roulette=True, rr_start_depth=0, seed=7)
    cfg_no = RenderConfig(width=32, height=24, spp=1, bounces=3, seed=7)
    st_rr = pathtracer.render_passes(small_scene,
                                     pathtracer.init_state(cfg_rr),
                                     cfg_rr, passes)
    st_no = pathtracer.render_passes(small_scene,
                                     pathtracer.init_state(cfg_no),
                                     cfg_no, passes)
    a = np.asarray(st_rr["acc"]) / passes
    b = np.asarray(st_no["acc"]) / passes
    assert np.isfinite(a).all()
    # global mean energy agreement (the unbiasedness statement); per-pixel
    # variance is higher with RR by construction
    np.testing.assert_allclose(a.mean(), b.mean(), rtol=0.03)


def test_sharded_megakernel_matches_single_device(small_scene):
    """8-device CPU mesh: shard_map'd megakernel render must equal the
    single-device megakernel render (same global threefry planes, shards
    slice by ray offset)."""
    from raytracing_tpu.parallel import mesh as pm

    cfg = RenderConfig(width=64, height=48, spp=1, bounces=1,
                       use_megakernel=True)
    scene = small_scene

    single = pathtracer.init_state(cfg)
    for _ in range(2):
        single = render_pass_mega(scene, single, cfg, interpret=True)

    m = pm.make_mesh(8)
    sc = pm.replicate_scene(scene, m)
    st = pm.shard_state(pathtracer.init_state(cfg), m)
    fn = pm.sharded_render_passes(m, cfg, n_passes=2)
    st = fn(sc, st)
    got, ref = np.asarray(st["acc"]), np.asarray(single["acc"])
    # same hit/credit pattern exactly; values to fp-reassociation tolerance
    assert ((got != 0) == (ref != 0)).all()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=2e-5)
    assert int(st["passes"]) == 2


@pytest.mark.parametrize("spp,lens", [(1, 0.0), (4, 0.1)])
def test_direct_mode_matches_xla(small_scene, spp, lens):
    """Direct-lighting megakernel vs render_direct with identical draws
    (Assign08 pinhole and Assign09 thin-lens/spp4 shapes)."""
    import dataclasses

    import jax.numpy as jnp

    from raytracing_tpu.core import rng
    from raytracing_tpu.render.direct import render_direct
    from raytracing_tpu.render.mega import (render_direct_mega,
                                            u_planes_for_direct)

    scene = dataclasses.replace(small_scene,
                                lens_radius=jnp.float32(lens))
    cfg = RenderConfig(width=32, height=24, spp=spp, bounces=0)
    key = rng.base_key(cfg.seed)
    ref = render_direct(scene, cfg)
    u = u_planes_for_direct(key, cfg, scene.lights.count)
    got = render_direct_mega(scene, cfg, key=key, u_planes=u,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_streaming_chunks_match_xla(small_scene, monkeypatch):
    """The large-scene STREAMING path (Morton chunks + tile-level AABB
    culling + SMEM DMA) vs the XLA pipeline with identical draws. Streaming
    is forced by shrinking the SMEM budget so a 310-triangle scene spans 3
    chunks."""
    import dataclasses

    from raytracing_tpu.core.types import Triangles, make_triangles
    from raytracing_tpu.ops.pallas import megakernel as MK

    rng = np.random.default_rng(5)
    T = 300
    base = rng.uniform(-0.9, 0.9, (T, 1, 3)).astype(np.float32)
    v = base + rng.uniform(-0.08, 0.08, (T, 3, 3)).astype(np.float32)
    n = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    vn = np.broadcast_to(n[:, None, :], (T, 3, 3)).copy()
    tris = make_triangles(v, vn, rng.integers(0, 5, T).astype(np.int32))
    base_t = small_scene.triangles
    scene = dataclasses.replace(small_scene, triangles=Triangles(
        v=jnp.concatenate([base_t.v, tris.v]),
        vn=jnp.concatenate([base_t.vn, tris.vn]),
        mat_id=jnp.concatenate([base_t.mat_id, tris.mat_id]),
        mask=jnp.concatenate([base_t.mask, tris.mask])))
    cfg = RenderConfig(width=32, height=24, spp=1, bounces=1,
                       two_sided_triangles=True)
    state0 = pathtracer.init_state(cfg)
    u = u_planes_for_pass(state0["key"], state0["passes"], cfg,
                          scene.lights.count)
    monkeypatch.setattr(MK, "SMEM_TABLE_MAX", 64)
    got = render_pass_mega(scene, state0, cfg, u_planes=u, interpret=True)
    monkeypatch.undo()
    ref = pathtracer._render_pass(scene, state0, cfg)
    np.testing.assert_allclose(np.asarray(got["acc"]),
                               np.asarray(ref["acc"]),
                               rtol=3e-4, atol=3e-4)


def test_multi_pass_statistics_jitted(small_scene):
    """Megakernel routed through the jitted multi-pass program
    (render_passes with cfg.use_megakernel, the production call path) vs
    the XLA pipeline over the same number of passes. On CPU the kernel
    substitutes pass-wide threefry planes for the on-core PRNG (no
    interpret-mode lowering for pltpu.prng_seed), so this checks the
    jit+fori_loop routing and the MC estimate, not the TPU PRNG itself."""
    cfg_m = RenderConfig(width=32, height=24, spp=1, bounces=1,
                         use_megakernel=True)
    cfg_x = RenderConfig(width=32, height=24, spp=1, bounces=1)
    passes = 8
    state = pathtracer.render_passes(small_scene,
                                     pathtracer.init_state(cfg_m),
                                     cfg_m, passes)
    ref = pathtracer.render_passes(small_scene,
                                   pathtracer.init_state(cfg_x),
                                   cfg_x, passes)
    a = np.asarray(state["acc"]) / passes
    b = np.asarray(ref["acc"]) / passes
    assert int(state["passes"]) == passes
    assert np.isfinite(a).all()
    # loose statistical agreement of the MC estimate
    np.testing.assert_allclose(a.mean(), b.mean(), rtol=0.15)


def _teapot_scene(cols=48, rows=36, n_slabs=4):
    import os

    from raytracing_tpu.accel import prepare_grids
    from raytracing_tpu.io.scene_xml import load_scene
    from raytracing_tpu.models.assignments import REF_ROOT
    xml = os.path.join(REF_ROOT,
                       "Assign10-Path_Tracing/scenes/cornell_teapot.xml")
    if not os.path.exists(xml):
        pytest.skip("reference cornell_teapot.xml not available "
                    "(set RT_REFERENCE_DIR)")
    scene = load_scene(xml, cols, rows)
    # override the XML per-mesh nslabs (teapot 10^3) so interpret-mode
    # traversals stay cheap; XML fidelity is covered by the dedicated
    # per-mesh-nslabs tests below
    return prepare_grids(scene, n_slabs, mesh_slabs=n_slabs)


def test_grid_mode_matches_xla_grid_and_brute():
    """In-kernel uniform-grid mode (tile-level cell culling, per-mesh
    dispatch split, front-to-back CSR + tight cell bounds) vs (a) the XLA
    grid pipeline and (b) the brute/streaming megakernel, identical draws
    — grid == brute (hits idempotent, SURVEY §7 quirk 9)."""
    import dataclasses

    from raytracing_tpu.render.direct import render_direct
    scene = _teapot_scene()
    cfg_g = RenderConfig(width=48, height=36, spp=1, bounces=0,
                         use_grid=True, n_slabs=4, use_megakernel=True)
    assert supported(scene, cfg_g)
    cfg_x = dataclasses.replace(cfg_g, use_megakernel=False)
    cfg_b = dataclasses.replace(cfg_g, use_grid=False)
    img_g = np.asarray(render_direct(scene, cfg_g))
    img_x = np.asarray(render_direct(scene, cfg_x))
    img_b = np.asarray(render_direct(scene, cfg_b))
    np.testing.assert_allclose(img_g, img_x, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(img_g, img_b, rtol=2e-4, atol=2e-4)


def test_grid_mode_pathtracer_matches_xla(small_scene):
    """Grid mode through the full path-tracing schedule (bounces) vs the
    XLA pipeline with identical draws — cornell has no meshes, so the
    folded grid covers the scene triangles (start=0)."""
    from raytracing_tpu.accel import prepare_grids
    scene = prepare_grids(small_scene, 2)
    cfg = RenderConfig(width=64, height=48, spp=1, bounces=2,
                       use_grid=True, n_slabs=2, use_megakernel=True)
    assert supported(scene, cfg)
    ref = _run_xla(scene, cfg)
    got = _run_mega_verify(scene, cfg)
    np.testing.assert_allclose(np.asarray(got["acc"]),
                               np.asarray(ref["acc"]),
                               rtol=2e-4, atol=2e-4)


def test_blocked_layout_matches_row_major():
    """mega_block pixel tiling: render_direct_mega itself gathers the
    row-major draws to slot order, so the SAME u_planes tensor must yield
    the EXACT same image with blocking on and off (draw-for-draw parity
    with render/direct.py regardless of mega_block)."""
    import dataclasses

    from raytracing_tpu.core import rng
    from raytracing_tpu.render.mega import (render_direct_mega,
                                            u_planes_for_direct)
    W = H = 8
    B = 4
    scene = _teapot_scene(W, H)
    cfg0 = RenderConfig(width=W, height=H, spp=1, bounces=0, use_grid=True,
                        n_slabs=4, use_megakernel=True, mega_block=0)
    cfgB = dataclasses.replace(cfg0, mega_block=B)
    key = rng.base_key(cfg0.seed)
    up_row = u_planes_for_direct(key, cfg0, scene.lights.count)
    img0 = np.asarray(render_direct_mega(scene, cfg0, u_planes=up_row))
    imgB = np.asarray(render_direct_mega(scene, cfgB, u_planes=up_row))
    np.testing.assert_array_equal(img0, imgB)


def test_sphere_streaming_matches_unstreamed(monkeypatch):
    """Big-molecule sphere STREAMING (Morton chunks + per-chunk AABB
    culling + SMEM DMA) must reproduce the unstreamed megakernel EXACTLY
    (same math, same visit semantics; chunk culling is conservative).
    Streaming is forced by shrinking the SMEM budget."""
    from raytracing_tpu.models.scenes import sphere_field
    from raytracing_tpu.ops.pallas import megakernel as MK
    scene = sphere_field(300, cols=32, rows=24)
    cfg = RenderConfig(width=32, height=24, spp=1, bounces=1)
    st = pathtracer.init_state(cfg)
    u = u_planes_for_pass(st["key"], st["passes"], cfg, scene.lights.count)
    ref = render_pass_mega(scene, st, cfg, u_planes=u, interpret=True)
    monkeypatch.setattr(MK, "SMEM_TABLE_MAX", 64)
    got = render_pass_mega(scene, st, cfg, u_planes=u, interpret=True)
    monkeypatch.undo()
    np.testing.assert_array_equal(np.asarray(got["acc"]),
                                  np.asarray(ref["acc"]))
    # and the XLA pipeline agrees outside champion-tie noise (different fp
    # association flips near-exact depth ties on a few silhouette rays)
    xla = pathtracer._render_pass(scene, st, cfg)
    d = np.abs(np.asarray(got["acc"]) - np.asarray(xla["acc"])).max(-1)
    assert (d < 1e-3).mean() > 0.98


def _shift_mesh(m, d, nslabs):
    import dataclasses
    d = jnp.asarray(d, jnp.float32)
    tris = dataclasses.replace(m.tris, v=m.tris.v + d)
    return dataclasses.replace(m, tris=tris, bounds_min=m.bounds_min + d,
                               bounds_max=m.bounds_max + d, nslabs=nslabs)


def _two_teapot_scene(cols=16, rows=12, ns=(3, 4)):
    """Two large-mesh instances with DIFFERENT per-mesh grid resolutions
    (the reference's per-mesh nslabs dispatch, code.js:1293-1303)."""
    import dataclasses
    import os

    from raytracing_tpu.accel import prepare_grids
    from raytracing_tpu.io.scene_xml import load_scene
    from raytracing_tpu.models.assignments import REF_ROOT
    xml = os.path.join(REF_ROOT,
                       "Assign10-Path_Tracing/scenes/cornell_teapot.xml")
    if not os.path.exists(xml):
        pytest.skip("reference cornell_teapot.xml not available")
    scene = load_scene(xml, cols, rows)
    large = [m for m in scene.meshes if m.tris.count > 64]
    small = tuple(m for m in scene.meshes if m.tris.count <= 64)
    assert len(large) == 1
    tp = large[0]
    m1 = _shift_mesh(tp, [-0.25, 0.0, 0.0], ns[0])
    m2 = _shift_mesh(tp, [0.3, 0.35, -0.1], ns[1])
    scene = dataclasses.replace(scene, meshes=small + (m1, m2))
    return prepare_grids(scene, 2, mesh_slabs="xml")


def test_grid_mode_per_mesh_nslabs_matches_brute():
    """Multiple in-kernel grids, one per large mesh, each with its OWN
    resolution (per-mesh nslabs; ref meshTrace dispatch): the multi-grid
    render must equal the brute megakernel exactly (hits idempotent)."""
    import dataclasses
    scene = _two_teapot_scene()
    cfg_g = RenderConfig(width=16, height=12, spp=1, bounces=0,
                         use_grid=True, use_megakernel=True)
    cfg_b = dataclasses.replace(cfg_g, use_grid=False)
    assert supported(scene, cfg_g)
    assert len(scene.folded_tri_grid) == 2
    assert scene.folded_tri_grid[0].n == (3, 3, 3)
    assert scene.folded_tri_grid[1].n == (4, 4, 4)
    st = pathtracer.init_state(cfg_g)
    u = u_planes_for_pass(st["key"], st["passes"], cfg_g,
                          scene.lights.count)
    img_g = render_pass_mega(scene, st, cfg_g, u_planes=u, interpret=True)
    img_b = render_pass_mega(scene, st, cfg_b, u_planes=u, interpret=True)
    np.testing.assert_allclose(np.asarray(img_g["acc"]),
                               np.asarray(img_b["acc"]),
                               rtol=1e-5, atol=1e-6)


def test_grid_streamed_matches_resident(monkeypatch):
    """STREAMED grid mode (cell-major HBM row table + per-cell DMA, for
    tables beyond the SMEM budget) must reproduce the resident grid mode
    EXACTLY — forced by shrinking the resident-grid budget."""
    from raytracing_tpu.render import mega as MG
    scene = _teapot_scene(16, 12, n_slabs=3)
    cfg = RenderConfig(width=16, height=12, spp=1, bounces=0,
                       use_grid=True, use_megakernel=True)
    st = pathtracer.init_state(cfg)
    u = u_planes_for_pass(st["key"], st["passes"], cfg, scene.lights.count)
    ref = render_pass_mega(scene, st, cfg, u_planes=u, interpret=True)
    monkeypatch.setattr(MG, "GRID_RESIDENT_MAX", 256)
    got = render_pass_mega(scene, st, cfg, u_planes=u, interpret=True)
    monkeypatch.undo()
    np.testing.assert_array_equal(np.asarray(got["acc"]),
                                  np.asarray(ref["acc"]))


def test_sphere_grid_matches_brute(monkeypatch):
    """In-kernel SPHERE grid (molecule-scale scenes; ref splitSphereData)
    must reproduce the brute megakernel exactly. Activated by forcing the
    sphere table past the (shrunk) SMEM budget with a prepared
    mega_sph_grid."""
    import dataclasses

    from raytracing_tpu.accel import prepare_grids
    from raytracing_tpu.models.scenes import sphere_field
    from raytracing_tpu.ops.pallas import megakernel as MK
    scene = sphere_field(300, cols=24, rows=16)
    cfg = RenderConfig(width=24, height=16, spp=1, bounces=1)
    st = pathtracer.init_state(cfg)
    u = u_planes_for_pass(st["key"], st["passes"], cfg, scene.lights.count)
    ref = render_pass_mega(scene, st, cfg, u_planes=u, interpret=True)

    # shrink the SMEM budget BEFORE the build: prepare_grids gates the mega
    # sphere grid on the same threshold grid_tables uses at render time
    monkeypatch.setattr(MK, "SMEM_TABLE_MAX", 64)
    scene_g = prepare_grids(scene, 1)
    assert scene_g.mega_sph_grid is not None
    cfg_g = dataclasses.replace(cfg, use_grid=True)
    got = render_pass_mega(scene_g, st, cfg_g, u_planes=u, interpret=True)
    monkeypatch.undo()
    np.testing.assert_array_equal(np.asarray(got["acc"]),
                                  np.asarray(ref["acc"]))


def _mesh_only_scene(cols=16, rows=12, nslabs=3):
    """A scene whose ONLY geometry is one large mesh: every triangle is
    grid-covered, so the streamed grid's brute prefix tri[:start] is EMPTY
    (start == 0) — the configuration of the big_mesh_scene house/teapot
    assets that stream."""
    import dataclasses
    import os

    from raytracing_tpu.accel import prepare_grids
    from raytracing_tpu.core.types import build_scene
    from raytracing_tpu.io.scene_xml import load_scene
    from raytracing_tpu.models.assignments import REF_ROOT
    xml = os.path.join(REF_ROOT,
                       "Assign10-Path_Tracing/scenes/cornell_teapot.xml")
    if not os.path.exists(xml):
        pytest.skip("reference cornell_teapot.xml not available")
    full = load_scene(xml, cols, rows)
    teapot = [m for m in full.meshes if m.tris.count > 64][0]
    teapot = dataclasses.replace(teapot, nslabs=nslabs)
    scene = build_scene(camera=full.camera, meshes=(teapot,),
                        lights=full.lights, materials=full.materials,
                        focal_length=float(full.focal_length))
    return prepare_grids(scene, 1, mesh_slabs="xml")


def test_grid_streamed_mesh_only_empty_brute_prefix(monkeypatch):
    """STREAMED grid mode with an EMPTY brute prefix (mesh-only scene,
    grid_start == 0) must still render the mesh — round-3 advisor HIGH
    finding: the grid_tri guard keyed on the shrunk tri table and silently
    dropped every grid, rendering geometry-free images."""
    from raytracing_tpu.render import mega as MG
    scene = _mesh_only_scene()
    assert scene.triangles.count == 0
    assert scene.folded_tri_grid[0].start == 0
    cfg = RenderConfig(width=16, height=12, spp=1, bounces=0,
                       use_grid=True, use_megakernel=True)
    assert supported(scene, cfg)
    st = pathtracer.init_state(cfg)
    u = u_planes_for_pass(st["key"], st["passes"], cfg, scene.lights.count)
    ref = render_pass_mega(scene, st, cfg, u_planes=u, interpret=True)
    assert np.abs(np.asarray(ref["acc"])).max() > 0.0, \
        "resident grid render must see the mesh"
    monkeypatch.setattr(MG, "GRID_RESIDENT_MAX", 64)
    got = render_pass_mega(scene, st, cfg, u_planes=u, interpret=True)
    monkeypatch.undo()
    np.testing.assert_array_equal(np.asarray(got["acc"]),
                                  np.asarray(ref["acc"]))
