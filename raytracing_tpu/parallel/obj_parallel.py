"""Object-parallel closest hit — the ray-tracing analog of tensor
parallelism.

Rays are replicated over the 'obj' mesh axis while the OBJECT arrays are
sharded; each chip finds its local champion and the global champion is the
min-reduce of (t, global_idx) pairs over the axis (one small all-gather of
(n_shards, R) — rides ICI).

Use when the scene is too large to replicate in HBM, or combined with the
'rays' axis in a 2-D mesh (rays x obj) for very large scenes at very high
resolutions. For replicable scenes, plain ray-sharding (parallel/mesh.py)
needs no communication at all and is preferred.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core.types import Rays, Spheres
from ..ops.closest_hit import Champion, closest_hit_spheres

Array = jax.Array
INF = jnp.inf


def closest_hit_spheres_objsharded(rays: Rays, spheres: Spheres, mesh: Mesh,
                                   axis: str = "obj") -> Champion:
    """Champion search with spheres sharded over ``axis``. Sphere count must
    be divisible by the axis size (pad with mask=False entries)."""
    n_shards = mesh.shape[axis]
    S = spheres.count
    assert S % n_shards == 0, f"pad sphere count {S} to a multiple of {n_shards}"
    shard_size = S // n_shards

    ray_spec = P()          # rays replicated over the obj axis
    obj_spec = P(axis)      # objects sharded along axis 0

    @partial(shard_map, mesh=mesh,
             in_specs=(Rays(o=ray_spec, d=ray_spec, mint=ray_spec,
                            maxt=ray_spec),
                       Spheres(center=obj_spec, radius=obj_spec,
                               mat_id=obj_spec, mask=obj_spec)),
             out_specs=(ray_spec, ray_spec),
             check_vma=False)
    def local_search(rays_l, spheres_l):
        ch = closest_hit_spheres(rays_l, spheres_l)
        offset = jax.lax.axis_index(axis).astype(jnp.int32) * shard_size
        gidx = jnp.where(ch.valid, ch.idx + offset, -1)
        # gather all shards' champions and min-reduce
        ts = jax.lax.all_gather(ch.t, axis)         # (n_shards, R)
        ids = jax.lax.all_gather(gidx, axis)        # (n_shards, R)
        win = jnp.argmin(ts, axis=0)                # (R,)
        rr = jnp.arange(ts.shape[1])
        return ts[win, rr], ids[win, rr]

    best_t, best_i = local_search(rays, spheres)
    valid = jnp.isfinite(best_t) & rays.alive
    return Champion(t=jnp.where(valid, best_t, INF),
                    idx=jnp.where(valid, best_i, -1), valid=valid)
