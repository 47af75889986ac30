"""Multi-chip sharding: ray-axis data parallelism + object-axis
"tensor parallelism" over a jax.sharding.Mesh.

The reference's only parallel axis is the NDRange over rays on one OpenCL
device (SURVEY §2.4). The TPU-native scaling design (new, per BASELINE.json):

  * 'rays' axis  — shard the wavefront ray/accumulator buffers across chips
                   (the NDRange analog). Scene read-only state is replicated,
                   so the forward pass needs NO communication at all.
  * 'obj' axis   — optionally shard the *object* axis: each chip intersects
                   its object shard and champions are combined with an
                   all-gather + min-reduce (the ray-tracing analog of TP).
  * gradients    — parameters (geometry/materials/camera) are replicated;
                   jit-with-shardings inserts the psum over 'rays' in the
                   backward pass automatically, overlapped by XLA's
                   latency-hiding scheduler.

Multi-host: call init_distributed() (jax.distributed.initialize) first; the
same code then spans hosts with DCN between slices.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import RenderConfig
from ..core.types import Scene
from ..render import pathtracer

Array = jax.Array


def init_distributed(**kw) -> None:
    """Multi-host entry (no-op if single-process). NOTE: must run before
    anything initializes the XLA backend — so the no-kwargs probe must not
    itself touch jax.process_count() until after the decision."""
    if not kw:
        if jax.process_count() == 1:
            return
    jax.distributed.initialize(**kw)


def make_mesh(n_devices: int | None = None, obj_parallel: int = 1) -> Mesh:
    """1-D or 2-D device mesh: ('rays',) or ('rays', 'obj')."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = np.asarray(devs[:n])
    if obj_parallel > 1:
        assert n % obj_parallel == 0
        grid = devs.reshape(n // obj_parallel, obj_parallel)
        return Mesh(grid, ("rays", "obj"))
    return Mesh(devs.reshape(n), ("rays",))


def _state_sharding(mesh: Mesh) -> dict:
    ray_axes = "rays"
    return {
        "acc": NamedSharding(mesh, P(ray_axes, None)),
        "key": NamedSharding(mesh, P()),
        "passes": NamedSharding(mesh, P()),
    }


def shard_state(state: dict, mesh: Mesh) -> dict:
    sh = _state_sharding(mesh)
    out = {}
    for k, v in state.items():
        try:
            out[k] = jax.device_put(v, sh[k])
        except ValueError:
            # ray count not divisible by the shard count: device_put
            # refuses uneven shardings — leave the entry unplaced; the
            # render fns shard it on entry (megakernel path pads the ray
            # axis per-shard, GSPMD path partitions unevenly itself)
            out[k] = v
    return out


def replicate_scene(scene: Scene, mesh: Mesh) -> Scene:
    rep = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, rep), scene)


def sharded_render_passes(mesh: Mesh, cfg: RenderConfig, n_passes: int):
    """Compile a render-passes fn whose ray-indexed state is sharded over the
    'rays' mesh axis. Scene is replicated; forward needs no collectives.

    cfg.use_megakernel routes through shard_map (GSPMD cannot partition a
    pallas_call): each shard runs the fused kernel on its local ray slice
    with the global ray offset for pixel decode + PRNG decorrelation."""
    sh = _state_sharding(mesh)
    from ..render import mega

    fn_gspmd = jax.jit(
        lambda scene, state: pathtracer.render_passes(scene, state, cfg,
                                                      n_passes),
        in_shardings=(None, sh),   # scene keeps its (replicated) placement
        out_shardings=sh,
    )
    if not (cfg.use_megakernel and mega.supported(None, cfg)):
        return fn_gspmd

    from jax import shard_map

    n_shards = mesh.shape["rays"]
    R = cfg.total_rays
    local_r = -(-R // n_shards)          # ceil: pad, don't assert
    r_pad = local_r * n_shards

    def local_passes(scene, state):
        off = jax.lax.axis_index("rays") * local_r
        for _ in range(n_passes):
            state = mega.render_pass_mega(scene, state, cfg, ray_offset=off)
        return state

    spec_state = {"acc": P("rays", None), "key": P(), "passes": P()}
    fn_mega = jax.jit(shard_map(
        local_passes, mesh=mesh,
        in_specs=(P(), spec_state), out_specs=spec_state,
        check_vma=False))

    def fn_mega_padded(scene, state):
        # non-divisible resolutions: pad the ray axis so every shard gets
        # an equal slice; the kernel's in-range mask keeps padding lanes
        # dead (global ids beyond the real ray count land in discarded
        # accumulator slots)
        if r_pad != R:
            acc = state["acc"]
            pad = jnp.zeros((r_pad - R,) + acc.shape[1:], acc.dtype)
            state = {**state, "acc": jnp.concatenate([acc, pad])}
        out = fn_mega(scene, state)
        if r_pad != R:
            out = {**out, "acc": out["acc"][:R]}
        return out

    def fn(scene, state):
        # scene-size check happens at call time: big scenes (beyond the
        # kernel's unroll budget) take the GSPMD stage-pipeline path
        if mega.supported(scene, cfg):
            return fn_mega_padded(scene, state)
        return fn_gspmd(scene, state)
    return fn


# ---------------------------------------------------------------------------
# Differentiable training step (the BASELINE.json fwd+bwd metric)
# ---------------------------------------------------------------------------

def apply_default_params(scene: Scene, params: dict) -> Scene:
    """Default parameterization: {center, radius, materials} (any subset)
    over the scene's spheres/materials — the BASELINE.json geometry+albedo
    set. Any other inverse-rendering parameterization (triangle vertices,
    camera, lights — all supported by the VJPs) is a custom
    ``apply_params``."""
    import dataclasses
    spheres = scene.spheres
    if "center" in params or "radius" in params:
        spheres = dataclasses.replace(
            spheres,
            center=params.get("center", spheres.center),
            radius=params.get("radius", spheres.radius))
        scene = dataclasses.replace(scene, spheres=spheres)
    if "materials" in params:
        scene = dataclasses.replace(scene, materials=params["materials"])
    return scene


def make_train_step(mesh: Mesh, cfg: RenderConfig, *,
                    loss_fn=None, apply_params=None):
    """Inverse-rendering step over the device mesh.

    ``apply_params(scene, params) -> Scene`` maps an arbitrary parameter
    pytree onto the scene (default: {center, radius, materials});
    ``loss_fn(img, target) -> scalar`` is the image loss (default: L2).
    Rays are sharded over the mesh, params replicated.

    Two execution paths:
      * ``cfg.use_megakernel`` + scene within the diff-megakernel budget:
        the progressive pass runs as a shard_map whose local body invokes
        the fused custom-VJP megakernel (ops/pallas/megakernel_grad.py) on
        this shard's ray slice; shard_map's transpose psums the parameter
        cotangents over 'rays' automatically (replicated in_spec).
      * otherwise the XLA stage pipeline under GSPMD (psum inserted by
        jit-with-shardings).
    """
    sh = _state_sharding(mesh)
    rep = NamedSharding(mesh, P())
    if loss_fn is None:
        loss_fn = lambda img, target: jnp.mean((img - target) ** 2)  # noqa: E731
    if apply_params is None:
        apply_params = apply_default_params

    from ..render import mega

    def make_step(render_pass):
        def loss(params, scene: Scene, state: dict, target: Array):
            sc = apply_params(scene, params)
            new_state = render_pass(sc, state)
            img = pathtracer.image(new_state, cfg)
            return loss_fn(img, target), new_state

        grad_fn = jax.value_and_grad(loss, has_aux=True)

        @partial(jax.jit,
                 in_shardings=(rep, None, sh, rep),
                 out_shardings=((rep, sh), rep))
        def step(params, scene, state, target):
            (l, new_state), grads = grad_fn(params, scene, state, target)
            return (l, new_state), grads

        return step

    step_gspmd = make_step(
        lambda scene, state: pathtracer._render_pass(scene, state, cfg))
    if not (cfg.use_megakernel and mega.supported_diff(None, cfg)):
        return step_gspmd

    from jax import shard_map

    n_shards = mesh.shape["rays"]
    R = cfg.total_rays
    local_r = -(-R // n_shards)
    r_pad = local_r * n_shards

    def local_pass(scene, state):
        off = jax.lax.axis_index("rays") * local_r
        return mega.render_pass_mega(scene, state, cfg, ray_offset=off)

    spec_state = {"acc": P("rays", None), "key": P(), "passes": P()}
    mega_pass = shard_map(local_pass, mesh=mesh,
                          in_specs=(P(), spec_state),
                          out_specs=spec_state, check_vma=False)

    def mega_pass_padded(scene, state):
        if r_pad != R:
            acc = state["acc"]
            pad = jnp.zeros((r_pad - R,) + acc.shape[1:], acc.dtype)
            state = {**state, "acc": jnp.concatenate([acc, pad])}
        out = mega_pass(scene, state)
        if r_pad != R:
            out = {**out, "acc": out["acc"][:R]}
        return out

    step_mega = make_step(mega_pass_padded)

    def step(params, scene, state, target):
        # scene-size check at call time: scenes beyond the diff-megakernel
        # budget train through the GSPMD stage pipeline
        if mega.supported_diff(scene, cfg):
            return step_mega(params, scene, state, target)
        return step_gspmd(params, scene, state, target)

    return step
