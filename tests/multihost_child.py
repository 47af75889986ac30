"""Child process for the 2-process jax.distributed smoke test.

Usage: python multihost_child.py <proc_id> <coordinator> <out_npz>

Each process owns 4 virtual CPU devices; the global mesh spans 8 devices
across the two processes (SURVEY §2.4 multi-host row: jax.distributed over
DCN — here the coordination service over localhost). Process 0 writes the
gathered accumulator for the parent to compare against a single-process
render.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    proc_id = int(sys.argv[1])
    coordinator = sys.argv[2]
    out_path = sys.argv[3]

    from raytracing_tpu.parallel.mesh import init_distributed
    init_distributed(coordinator_address=coordinator, num_processes=2,
                     process_id=proc_id)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, jax.devices()

    import numpy as np
    from jax.experimental import multihost_utils

    from raytracing_tpu import RenderConfig
    from raytracing_tpu.models.scenes import cornell_box
    from raytracing_tpu.parallel import mesh as pm
    from raytracing_tpu.render import pathtracer

    cfg = RenderConfig(width=32, height=24, spp=1, bounces=1, seed=4)
    scene = cornell_box(cols=cfg.width, rows=cfg.height)

    m = pm.make_mesh(8)
    # state is created ON device directly in its sharded layout (no host
    # scatter needed); the host-local scene pytree is passed uncommitted —
    # identical on both processes, treated as replicated
    state = jax.jit(lambda: pathtracer.init_state(cfg),
                    out_shardings=pm._state_sharding(m))()
    fn = pm.sharded_render_passes(m, cfg, n_passes=2)
    out = fn(scene, state)

    acc = multihost_utils.process_allgather(out["acc"], tiled=True)
    if proc_id == 0:
        np.savez(out_path, acc=np.asarray(acc))
    multihost_utils.sync_global_devices("done")
    print(f"proc {proc_id} OK", flush=True)


if __name__ == "__main__":
    main()
