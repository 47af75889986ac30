"""Roofline / cycles-per-segment accounting for the megakernel (PERF.md).

Counts the VPU work of one megakernel pass STATICALLY: traces the
value-based tile program (ops/pallas/megakernel_grad._tile_program — the
line-for-line mirror of the fused kernel's math) and tallies elementwise
primitives per ray. Combined with measured segs/s/chip this yields achieved
VPU ops/s vs the v5e peak.

Run on CPU (tracing only):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/roofline.py
"""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from raytracing_tpu import RenderConfig
from raytracing_tpu.models.scenes import cornell_box
from raytracing_tpu.render import pathtracer
from raytracing_tpu.render.mega import scene_tables, u_planes_for_pass
from raytracing_tpu.ops.pallas.megakernel_grad import (
    _materialize_draws, _pad_plane, _tile_program, LANES, NPAR)

# one VPU lane-op per element for these; transcendentals cost more slots
ELEMENTWISE = {
    "add", "sub", "mul", "div", "max", "min", "and", "or", "not", "xor",
    "select_n", "eq", "ne", "lt", "le", "gt", "ge", "floor", "abs", "neg",
    "sign", "convert_element_type", "integer_pow", "clamp",
}
TRANSCENDENTAL = {"sqrt", "rsqrt", "exp", "log", "sin", "cos", "tanh",
                  "logistic"}


def count_ops(jaxpr, R):
    """Tally per-ray elementwise / transcendental ops in a closed jaxpr
    (counting only full-tile-sized outputs; scalars are free on the scalar
    unit)."""
    ew = tr = other = 0

    def walk(jx):
        nonlocal ew, tr, other
        for eqn in jx.eqns:
            for sub in eqn.params.values():
                if hasattr(sub, "jaxpr"):
                    walk(sub.jaxpr)
            out_elems = max((int(np.prod(v.aval.shape))
                             for v in eqn.outvars), default=0)
            if out_elems < R:          # scalar-unit work
                continue
            n = out_elems // R
            nm = eqn.primitive.name
            if nm in ELEMENTWISE:
                ew += n
            elif nm in TRANSCENDENTAL:
                tr += n
            elif nm in ("reduce_max", "reduce_min", "reduce_sum",
                        "reduce_and", "reduce_or", "broadcast_in_dim",
                        "reshape", "squeeze", "slice", "concatenate",
                        "iota", "stop_gradient", "copy"):
                pass                    # layout/free-ish
            else:
                other += n

    walk(jaxpr)
    return ew, tr, other


def tile_jaxpr(cfg, scene, mode="path"):
    st = pathtracer.init_state(cfg)
    u = u_planes_for_pass(st["key"], st["passes"], cfg, scene.lights.count)
    par, sph, tri, mat, lig = scene_tables(scene, cfg)
    R = cfg.total_rays
    P = -(-R // LANES) * LANES
    shape = (P // LANES, LANES)
    u3 = jnp.stack([_pad_plane(u[j], P) for j in range(u.shape[0])])
    pairs = _materialize_draws(u3, shape, spp=cfg.spp,
                               n_lig=scene.lights.count,
                               bounces=cfg.bounces if mode == "path" else 0,
                               rr=cfg.russian_roulette, mode=mode)
    rid = (jax.lax.broadcasted_iota(jnp.int32, shape, 0) * LANES
           + jax.lax.broadcasted_iota(jnp.int32, shape, 1))
    ridf = rid.astype(jnp.float32)

    def f(par_v, sph_v, tri_v, mat_v, lig_v):
        return _tile_program(
            [par_v[i] for i in range(NPAR)], sph_v, tri_v, mat_v, lig_v,
            pairs, ridf, rid < R,
            spp=cfg.spp, width=cfg.width,
            bounces=cfg.bounces if mode == "path" else 0,
            n_sph=sph.shape[0], n_tri=tri.shape[0],
            n_mat=mat.shape[0], n_lig=lig.shape[0],
            two_sided=cfg.two_sided_triangles,
            normalize_emitter=cfg.normalize_emitter,
            russian_roulette=cfg.russian_roulette,
            rr_start_depth=cfg.rr_start_depth, mode=mode)

    return jax.make_jaxpr(f)(par, sph, tri, mat, lig), P


def report(name, cfg, scene, mode, segs_per_ray, measured_segs_s):
    jx, P = tile_jaxpr(cfg, scene, mode)
    ew, tr, other = count_ops(jx.jaxpr, P)
    total = ew + 7 * tr + other       # ~7 VPU slots per transcendental
    per_seg = total / segs_per_ray
    # v5e VPU: 8x128 lanes x 4 ALUs x 0.94 GHz
    peak = 8 * 128 * 4 * 0.94e9
    achieved = measured_segs_s * per_seg
    print(f"{name:28s} ops/ray/pass={total:6d} (ew {ew}, transc {tr}, "
          f"other {other})  ops/segment={per_seg:7.1f}  "
          f"measured={measured_segs_s:.2e} segs/s  "
          f"achieved={achieved:.2e} op/s = {100 * achieved / peak:.0f}% "
          f"of VPU peak")
    return per_seg, achieved, peak


def main():
    scene = cornell_box(cols=64, rows=48)
    L = scene.lights.count
    # measured round-3 numbers (BENCH_CONFIG=N / BENCH_MODE)
    measured = {
        "config5_path_b5": float(os.environ.get("M5", 3.57e9)),
        "config2_direct": float(os.environ.get("M2", 2.75e9)),
        "config4_thinlens_spp4": float(os.environ.get("M4", 3.04e9)),
    }
    cfg5 = RenderConfig(width=64, height=48, spp=1, bounces=5)
    report("config5 path b5", cfg5, scene, "path",
           (1 + L) * 6, measured["config5_path_b5"])
    cfg2 = RenderConfig(width=64, height=48, spp=1, bounces=0)
    report("config2 direct", cfg2, scene, "direct",
           1 + L, measured["config2_direct"])
    cfg4 = RenderConfig(width=64, height=48, spp=4, bounces=0)
    report("config4 thin-lens spp4", cfg4, scene, "direct",
           1 + L, measured["config4_thinlens_spp4"])


if __name__ == "__main__":
    main()
