"""Edge-aware gradients in the PRODUCTION megakernel VJP path.

The megakernel's custom VJP can differentiate the soft (reparameterized)
reformulation of the whole Assign10 schedule instead of the hard champion
program (cfg.mega_edge_bandwidth > 0; ops/pallas/megakernel_grad.py
_tile_program_soft): silhouette / shadow-boundary / emitter-edge gradients
become real while the forward image stays the hard fused kernel.

These tests pin down the BASELINE.json north-star clause
("reparameterized/edge-aware sampling ... pixel+gradient allclose"):

  * the soft program converges to the hard kernel as bandwidth -> 0;
  * FD-allclose of an UNMASKED full-image loss at 512x512 wrt sphere
    centers AND wall vertices (silhouette pixels included);
  * jax.grad through render_pass_mega with edge mode == the soft oracle;
  * interior (albedo) gradients agree with the hard backward;
  * a silhouette-recovery optimization riding the production VJP converges.

All gradient evaluations run EAGERLY (no jit): XLA-CPU compile of the
whole-tile vjp takes minutes (measured 310 s at 64x48 on the 2-core test
box) while eager evaluation of the same graph takes seconds at 512x512.
On TPU the backward runs as the fused Pallas kernel instead.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracing_tpu import RenderConfig
from raytracing_tpu.models.scenes import cornell_box
from raytracing_tpu.render import pathtracer
from raytracing_tpu.render.mega import (render_pass_mega, scene_tables,
                                        u_planes_for_pass)
from raytracing_tpu.ops.pallas.megakernel_grad import (_bwd_reference,
                                                       soft_pass_value)


def _setup(width, height, bounces=1):
    cfg = RenderConfig(width=width, height=height, spp=1, bounces=bounces)
    scene = cornell_box(cols=width, rows=height)
    st = pathtracer.init_state(cfg)
    u = u_planes_for_pass(st["key"], st["passes"], cfg, scene.lights.count)
    return cfg, scene, st, u


def test_edge_soft_converges_to_hard():
    """As bandwidth, tau -> 0 the soft program's accumulator converges to
    the hard megakernel's, pixelwise except a shrinking silhouette set."""
    cfg, scene, st, u = _setup(32, 24)
    par, sph, tri, mat, lig = scene_tables(scene, cfg)
    ipar = jnp.array([0, 0], jnp.int32)
    kw = dict(spp=1, width=cfg.width, bounces=1, two_sided=False,
              normalize_emitter=True)
    hard = np.asarray(render_pass_mega(scene, st, cfg, u_planes=u,
                                       interpret=True)["acc"])
    fracs = []
    for bw in (1e-2, 1e-3, 1e-4):
        soft = np.asarray(soft_pass_value(par, ipar, sph, tri, mat, lig, u,
                                          soft_bandwidth=bw, soft_tau=bw,
                                          **kw))
        fracs.append(float((np.abs(soft - hard).max(-1) > 1e-2).mean()))
    # differing-pixel fraction shrinks to the silhouette measure
    assert fracs[0] > fracs[1] > fracs[2]
    assert fracs[2] < 0.01


def test_edge_fd_unmasked_fullimage_512():
    """FD-allclose of an UNMASKED 512x512 full-image loss wrt sphere
    centers AND wall vertices — silhouette pixels included, no interior
    masking. The loss is a fixed random-weighted mean of the soft value
    (the exact function whose gradient the edge-aware backward returns).
    Top-|grad| components agree with central differences; small
    components carry sub-pixel sampling ripple (silhouettes span ~6 px at
    this bandwidth), so the gate is top-3 per group + the median."""
    cfg, scene, st, u = _setup(512, 512)
    ipar = jnp.array([0, 0], jnp.int32)
    BW = 5e-2
    kw = dict(spp=1, width=cfg.width, bounces=1, two_sided=False,
              normalize_emitter=True, soft_bandwidth=BW, soft_tau=BW)
    W = jax.random.normal(jax.random.PRNGKey(7),
                          (cfg.total_rays, 3)) * 0.5 + 1.0

    def L(center, v):
        sc = dataclasses.replace(
            scene,
            spheres=dataclasses.replace(scene.spheres, center=center),
            triangles=dataclasses.replace(scene.triangles, v=v))
        p_, s_, t_, m_, l_ = scene_tables(sc, cfg)
        return jnp.mean(soft_pass_value(p_, ipar, s_, t_, m_, l_, u, **kw)
                        * W)

    c0, v0 = scene.spheres.center, scene.triangles.v
    gc, gv = jax.grad(L, argnums=(0, 1))(c0, v0)
    gc, gv = np.asarray(gc), np.asarray(gv)
    assert np.isfinite(gc).all() and np.isfinite(gv).all()
    assert np.abs(gc).max() > 0 and np.abs(gv).max() > 0

    def fd(f, x0, idx, eps=2e-3):
        x0 = np.asarray(x0)
        xp = x0.copy()
        xp[idx] += eps
        xm = x0.copy()
        xm[idx] -= eps
        return (float(f(jnp.asarray(xp))) - float(f(jnp.asarray(xm)))) \
            / (2 * eps)

    rels_c, rels_v = [], []
    for k in np.argsort(-np.abs(gc).ravel())[:4]:
        idx = np.unravel_index(k, gc.shape)
        g_fd = fd(lambda x: L(x, v0), c0, idx)
        rels_c.append(abs(gc[idx] - g_fd) / max(abs(g_fd), 1e-12))
    for k in np.argsort(-np.abs(gv).ravel())[:4]:
        idx = np.unravel_index(k, gv.shape)
        g_fd = fd(lambda x: L(c0, x), v0, idx)
        rels_v.append(abs(gv[idx] - g_fd) / max(abs(g_fd), 1e-12))
    # top-3 per group tight; median over all probes tight
    assert max(rels_c[:3]) < 0.15, rels_c
    assert max(rels_v[:3]) < 0.15, rels_v
    assert np.median(rels_c + rels_v) < 0.10, (rels_c, rels_v)


def test_edge_backward_production_wiring():
    """jax.grad THROUGH render_pass_mega with cfg.mega_edge_bandwidth
    (hard fused forward + soft backward via the custom VJP) must equal the
    soft oracle's gradient exactly — same scene_tables packing, same draw
    layout, same program."""
    cfg, scene, st, u = _setup(16, 12)
    cfg = dataclasses.replace(cfg, use_megakernel=True,
                              mega_edge_bandwidth=2e-2)
    ipar = jnp.array([0, 0], jnp.int32)
    kw = dict(spp=1, width=cfg.width, bounces=1, two_sided=False,
              normalize_emitter=True, soft_bandwidth=2e-2, soft_tau=2e-2)

    def loss_prod(center):
        sc = dataclasses.replace(
            scene, spheres=dataclasses.replace(scene.spheres, center=center))
        out = render_pass_mega(sc, st, cfg, u_planes=u, interpret=True)
        return jnp.sum(out["acc"])

    def loss_soft(center):
        sc = dataclasses.replace(
            scene, spheres=dataclasses.replace(scene.spheres, center=center))
        p_, s_, t_, m_, l_ = scene_tables(sc, cfg)
        return jnp.sum(soft_pass_value(p_, ipar, s_, t_, m_, l_, u, **kw))

    g_prod = np.asarray(jax.grad(loss_prod)(scene.spheres.center))
    g_soft = np.asarray(jax.grad(loss_soft)(scene.spheres.center))
    np.testing.assert_allclose(g_prod, g_soft, rtol=1e-6, atol=1e-7)
    assert np.abs(g_prod).max() > 0


def test_edge_interior_matches_hard():
    """In the interior (away from silhouettes) the soft gradients must
    agree with the hard backward's — albedo/material cotangents aggregate
    over the whole image and are interior-dominated, so at sub-pixel
    bandwidth the two backends match closely (VERDICT round-2 weak #4)."""
    cfg, scene, st, u = _setup(48, 36)
    par, sph, tri, mat, lig = scene_tables(scene, cfg)
    ipar = jnp.array([0, 0], jnp.int32)
    g = jnp.ones((cfg.total_rays, 3))
    kw = dict(spp=1, width=cfg.width, bounces=1, two_sided=False,
              normalize_emitter=True, seed=cfg.seed, mode="path",
              russian_roulette=False, rr_start_depth=0)
    hard = _bwd_reference(par, ipar, sph, tri, mat, lig, g, u, **kw)
    soft = _bwd_reference(par, ipar, sph, tri, mat, lig, g, u,
                          soft_bandwidth=2e-3, soft_tau=2e-3, **kw)
    dmat_h, dmat_s = np.asarray(hard[3]), np.asarray(soft[3])
    scale = np.abs(dmat_h).max()
    assert scale > 0
    np.testing.assert_allclose(dmat_s[:, :3], dmat_h[:, :3],
                               atol=0.06 * scale, rtol=0.06)


def test_edge_silhouette_optim_converges():
    """Silhouette recovery THROUGH THE PRODUCTION VJP: hard megakernel
    forward + edge-aware backward recovers a sphere offset whose
    silhouette barely overlaps the target — the regime where the hard
    backward is silent (examples/silhouette_optim.py, engine='mega')."""
    from examples.silhouette_optim import optimize

    start_err, final_err = optimize(engine="mega", width=16, height=12,
                                    steps=6, offset=(0.22, -0.12),
                                    lr=4e-2, bandwidth=4e-2)
    assert final_err < 0.7 * start_err, (start_err, final_err)


# ---------------------------------------------------------------------------
# CHUNKED edge-aware backward (round 4): tables past the unroll budget
# ---------------------------------------------------------------------------

def _big_setup(width, height):
    """Subdivided cornell (360 tris > UNROLL_OBJECTS): the chunk-local
    soft compositing path (megakernel_grad.soft_trace chunked branch)."""
    from test_megakernel_grad import _subdivide_triangles
    cfg, scene, st, u = _setup(width, height)
    return cfg, _subdivide_triangles(scene, k=6), st, u


def test_edge_chunked_converges_to_hard():
    """The chunked two-level composite (chunk-local pairwise + cross-chunk
    merge) must converge to the hard render as bandwidth -> 0, same as the
    global composite does."""
    cfg, big, st, u = _big_setup(32, 24)
    par, sph, tri, mat, lig = scene_tables(big, cfg)
    assert tri.shape[0] > 64
    ipar = jnp.array([0, 0], jnp.int32)
    kw = dict(spp=1, width=cfg.width, bounces=1, two_sided=False,
              normalize_emitter=True)
    hard = np.asarray(render_pass_mega(big, st, cfg, u_planes=u,
                                       interpret=True)["acc"])
    fracs = []
    for bw in (1e-2, 1e-3, 1e-4):
        soft = np.asarray(soft_pass_value(par, ipar, sph, tri, mat, lig, u,
                                          soft_bandwidth=bw, soft_tau=bw,
                                          **kw))
        fracs.append(float((np.abs(soft - hard).max(-1) > 1e-2).mean()))
    assert fracs[0] > fracs[2]
    assert fracs[2] < 0.02, fracs


def test_edge_chunked_fd_unmasked():
    """FD-allclose of the CHUNKED soft program (unmasked random-weighted
    image loss) wrt a sphere center and a triangle vertex — the chunked
    composite is a well-posed smooth function in its own right, so its AD
    gradient must match central differences at its top components."""
    cfg, big, st, u = _big_setup(48, 36)
    ipar = jnp.array([0, 0], jnp.int32)
    BW = 5e-2
    kw = dict(spp=1, width=cfg.width, bounces=1, two_sided=False,
              normalize_emitter=True, soft_bandwidth=BW, soft_tau=BW)
    W = jax.random.normal(jax.random.PRNGKey(11),
                          (cfg.total_rays, 3)) * 0.5 + 1.0

    def L(center, v):
        sc = dataclasses.replace(
            big,
            spheres=dataclasses.replace(big.spheres, center=center),
            triangles=dataclasses.replace(big.triangles, v=v))
        p_, s_, t_, m_, l_ = scene_tables(sc, cfg)
        return jnp.mean(soft_pass_value(p_, ipar, s_, t_, m_, l_, u, **kw)
                        * W)

    c0, v0 = big.spheres.center, big.triangles.v
    gc, gv = jax.grad(L, argnums=(0, 1))(c0, v0)
    gc, gv = np.asarray(gc), np.asarray(gv)
    assert np.isfinite(gc).all() and np.isfinite(gv).all()
    assert np.abs(gc).max() > 0 and np.abs(gv).max() > 0

    def fd_dir(group, x0, d, eps=1e-3):
        # DIRECTIONAL central difference: per-component FD of this f32
        # program is unreliable (the loss is jagged at the 1e-6 scale, and
        # single components have |dL| ~ 2*eps*g_i ~ 1e-5 — measured rels
        # bounce non-monotonically in eps); a random direction sums the
        # whole group's gradient mass, so the difference signal is ~|g|
        # and the check is well-conditioned. eps stays well under the soft
        # bandwidth (5e-2) to avoid sigmoid-curvature truncation error.
        x0 = np.asarray(x0)
        args = {"center": c0, "v": v0}
        fp = dict(args)
        fp[group] = jnp.asarray(x0 + eps * d)
        fm = dict(args)
        fm[group] = jnp.asarray(x0 - eps * d)
        return (float(L(fp["center"], fp["v"]))
                - float(L(fm["center"], fm["v"]))) / (2 * eps)

    rng_np = np.random.default_rng(7)
    rels = []
    for group, g in (("center", gc), ("v", gv)):
        x0 = c0 if group == "center" else v0
        for _ in range(4):
            d = rng_np.standard_normal(g.shape).astype(np.float32)
            d /= np.linalg.norm(d)
            ad = float((g * d).sum())
            g_fd = fd_dir(group, x0, d)
            rels.append(abs(ad - g_fd) / max(abs(g_fd), 1e-12))
    assert np.median(rels[:4]) < 0.10, rels    # sphere centers
    assert np.median(rels[4:]) < 0.10, rels    # triangle vertices
    assert max(rels) < 0.5, rels


def test_edge_chunked_production_wiring():
    """jax.grad through render_pass_mega with cfg.mega_edge_bandwidth on a
    PAST-THE-UNROLL-BUDGET scene: the production path Morton-sorts the
    triangle table for the streaming forward, so the soft oracle must be
    evaluated on the SAME sorted table; sphere-center gradients then match
    exactly."""
    from raytracing_tpu.render import mega as MG
    from raytracing_tpu.render.stages import _all_triangles
    cfg, big, st, u = _big_setup(16, 12)
    cfg = dataclasses.replace(cfg, use_megakernel=True,
                              mega_edge_bandwidth=2e-2)
    from raytracing_tpu.render.mega import supported_diff
    assert supported_diff(big, cfg)
    ipar = jnp.array([0, 0], jnp.int32)
    kw = dict(spp=1, width=cfg.width, bounces=1, two_sided=False,
              normalize_emitter=True, soft_bandwidth=2e-2, soft_tau=2e-2)
    p_, s_, t_, m_, l_ = scene_tables(big, cfg)
    tri_sorted, _ = MG.tri_chunk_tables(big, t_, _all_triangles(big))

    def loss_prod(center):
        sc = dataclasses.replace(
            big, spheres=dataclasses.replace(big.spheres, center=center))
        out = render_pass_mega(sc, st, cfg, u_planes=u, interpret=True)
        return jnp.sum(out["acc"])

    def loss_soft(center):
        sc = dataclasses.replace(
            big, spheres=dataclasses.replace(big.spheres, center=center))
        _, s2, _, m2, l2 = scene_tables(sc, cfg)
        return jnp.sum(soft_pass_value(p_, ipar, s2, tri_sorted, m2, l2,
                                       u, **kw))

    g_prod = np.asarray(jax.grad(loss_prod)(big.spheres.center))
    g_soft = np.asarray(jax.grad(loss_soft)(big.spheres.center))
    np.testing.assert_allclose(g_prod, g_soft, rtol=1e-5, atol=1e-7)
    assert np.abs(g_prod).max() > 0


def test_edge_grid_mode_teapot():
    """EDGE-AWARE x GRID (round-5 VERDICT item 5): jax.grad through
    render_pass_mega with use_grid AND mega_edge_bandwidth on the
    reference cornell_teapot scene (per-mesh XML nslabs). The primal is
    the in-kernel grid pass; the backward is the chunked soft program
    over the UN-duplicated Morton-sorted tables. Gate: (a) production
    grads == the soft oracle's (same packing; AD un-permutes the Morton
    gather), (b) FD-allclose of the soft value wrt a teapot vertex and a
    sphere center (the VERDICT done criterion)."""
    import os

    from raytracing_tpu.accel import prepare_grids
    from raytracing_tpu.io.scene_xml import load_scene
    from raytracing_tpu.models.assignments import REF_ROOT
    from raytracing_tpu.render.mega import supported_diff

    xml = os.path.join(REF_ROOT,
                       "Assign10-Path_Tracing/scenes/cornell_teapot.xml")
    if not os.path.exists(xml):
        pytest.skip("reference cornell_teapot.xml not available")
    scene = prepare_grids(load_scene(xml, 16, 12), 2, mesh_slabs="xml")
    BW = 2e-2
    cfg = RenderConfig(width=16, height=12, spp=1, bounces=1,
                       use_grid=True, use_megakernel=True,
                       mega_edge_bandwidth=BW)
    assert supported_diff(scene, cfg)
    st = pathtracer.init_state(cfg)
    u = u_planes_for_pass(st["key"], st["passes"], cfg, scene.lights.count)
    ipar = jnp.array([0, 0], jnp.int32)
    kw = dict(spp=1, width=cfg.width, bounces=1, two_sided=False,
              normalize_emitter=True, soft_bandwidth=BW, soft_tau=BW)
    mesh_i = [i for i, m in enumerate(scene.meshes) if m.tris.count > 64]
    assert mesh_i, "cornell_teapot must carry a large mesh instance"

    def with_params(center, mv):
        meshes = list(scene.meshes)
        for i in mesh_i:
            m = meshes[i]
            meshes[i] = dataclasses.replace(
                m, tris=dataclasses.replace(m.tris, v=mv))
        return dataclasses.replace(
            scene, meshes=tuple(meshes),
            spheres=dataclasses.replace(scene.spheres, center=center))

    def loss_prod(center, mv):
        out = render_pass_mega(with_params(center, mv), st, cfg,
                               u_planes=u, interpret=True)
        return jnp.sum(out["acc"])

    def loss_soft(center, mv):
        # the production path Morton-sorts the table before the chunked
        # soft program (chunk partitions differ between orderings), so
        # the oracle must composite over the SAME sorted table
        from raytracing_tpu.render import mega as MG
        from raytracing_tpu.render.stages import _all_triangles
        sc = with_params(center, mv)
        p_, s_, t_, m_, l_ = scene_tables(sc, cfg)
        t_sorted, _ = MG.tri_chunk_tables(sc, t_, _all_triangles(sc))
        return jnp.sum(soft_pass_value(p_, ipar, s_, t_sorted, m_, l_,
                                       u, **kw))

    c0 = scene.spheres.center
    mv0 = scene.meshes[mesh_i[0]].tris.v
    gc_p, gm_p = jax.grad(loss_prod, argnums=(0, 1))(c0, mv0)
    gc_s, gm_s = jax.grad(loss_soft, argnums=(0, 1))(c0, mv0)
    gc_p, gm_p = np.asarray(gc_p), np.asarray(gm_p)
    gc_s, gm_s = np.asarray(gc_s), np.asarray(gm_s)
    assert np.isfinite(gc_p).all() and np.isfinite(gm_p).all()
    assert np.abs(gc_p).max() > 0 and np.abs(gm_p).max() > 0
    np.testing.assert_allclose(gc_p, gc_s, rtol=1e-5,
                               atol=1e-6 * max(np.abs(gc_s).max(), 1e-9))
    np.testing.assert_allclose(gm_p, gm_s, rtol=1e-5,
                               atol=1e-6 * max(np.abs(gm_s).max(), 1e-9))

    # FD spot checks of the soft value (well-posed everywhere): the
    # top-|grad| sphere-center component and teapot-vertex component
    def fd(f, x0, idx, eps):
        x0 = np.asarray(x0)
        xp = x0.copy()
        xp[idx] += eps
        xm = x0.copy()
        xm[idx] -= eps
        return (float(f(jnp.asarray(xp))) - float(f(jnp.asarray(xm)))) \
            / (2 * eps)

    # the XML scene spans a [-1,1] box, so eps must be well under the
    # 2e-2 bandwidth or FD reads curvature, not slope (measured: at
    # eps=2e-3 the central difference is 1.6x the true derivative,
    # converging to it by 4e-4)
    idx_c = np.unravel_index(np.argmax(np.abs(gc_s)), gc_s.shape)
    g_fd = fd(lambda x: loss_soft(x, mv0), c0, idx_c, 4e-4)
    assert abs(gc_s[idx_c] - g_fd) / max(abs(g_fd), 1e-9) < 0.12, \
        (gc_s[idx_c], g_fd)
    idx_m = np.unravel_index(np.argmax(np.abs(gm_s)), gm_s.shape)
    g_fd = fd(lambda x: loss_soft(c0, x), mv0, idx_m, 4e-4)
    assert abs(gm_s[idx_m] - g_fd) / max(abs(g_fd), 1e-9) < 0.12, \
        (gm_s[idx_m], g_fd)
