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


def _compare(scene, cfg):
    state0 = pathtracer.init_state(cfg)
    u = u_planes_for_pass(state0["key"], state0["passes"], cfg,
                          scene.lights.count)
    vx, gx = _grads(scene, cfg,
                    lambda sc, st: pathtracer._render_pass(sc, st, cfg))
    vm, gm = _grads(scene, cfg,
                    lambda sc, st: render_pass_mega(sc, st, cfg, u_planes=u,
                                                    interpret=True))
    np.testing.assert_allclose(float(vm), float(vx), rtol=1e-5)
    for k in gx:
        a, b = np.asarray(gx[k]), np.asarray(gm[k])
        assert np.isfinite(b).all(), k
        scale = max(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(b, a, rtol=5e-3, atol=5e-3 * scale,
                                   err_msg=k)
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
    cfg = RenderConfig(width=8, height=8)
    assert supported_diff(cornell_box(cols=8, rows=8), cfg)
    # beyond the unroll budget -> XLA pipeline for training
    assert not supported_diff(sphere_field(65, cols=8, rows=8), cfg)
    assert not supported_diff(None, RenderConfig(width=8, height=8,
                                                 use_grid=True))


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
