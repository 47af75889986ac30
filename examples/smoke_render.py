import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np, jax.numpy as jnp
# public package-boundary usage
from raytracing_tpu.core.types import Camera, Rays, make_spheres, AABB
from raytracing_tpu.render.camera import pixel_grid, pinhole_rays
from raytracing_tpu.ops.closest_hit import closest_hit_spheres, sphere_hit_attrs

cam = Camera.look_at(eye=[0,0,3], lookat=[0,0,0], vup=[0,1,0], fov_deg=60, cols=60, rows=30)
sp = make_spheres([[ -0.7,0,0],[0.7,0,0]], [0.6,0.4], [0,1])
col, row = pixel_grid(cam)
rays = pinhole_rays(cam, col, row)
ch = closest_hit_spheres(rays, sp)
p, n, mat = sphere_hit_attrs(rays, sp, ch)
shade = jnp.where(ch.valid, jnp.einsum('j,ij->i', cam.w, n), 0.0)
img = np.array(shade).reshape(30,60)
chars = " .:-=+*#%@"
for r in img:
    print("".join(chars[int(max(0,min(0.999,v))*10)] for v in r))
print("valid hits:", int(np.array(ch.valid).sum()), "/", 30*60)
print("mat ids seen:", sorted(set(np.array(mat)[np.array(ch.valid)].tolist())))

# probe 1: empty sphere batch
from raytracing_tpu.core.types import Spheres
ch0 = closest_hit_spheres(rays, Spheres.empty())
print("probe empty scene: any valid =", bool(np.array(ch0.valid).any()))
# probe 2: dead rays
dead = Rays.dead(rays.n)
chd = closest_hit_spheres(dead, sp)
print("probe dead rays: any valid =", bool(np.array(chd.valid).any()))
# probe 3: jit-compile the whole pipeline (XLA trace check)
@jax.jit
def pipe(spheres):
    r = pinhole_rays(cam, col, row)
    c = closest_hit_spheres(r, spheres)
    _, nn, _ = sphere_hit_attrs(r, spheres, c)
    return jnp.where(c.valid, jnp.einsum('j,ij->i', cam.w, nn), 0.0).sum()
print("probe jit:", float(pipe(sp)))
# probe 4: gradient through the pipeline wrt sphere centers
g = jax.grad(lambda c: pipe(Spheres(center=c, radius=sp.radius, mat_id=sp.mat_id, mask=sp.mask)))(sp.center)
print("probe grad wrt centers:", np.array(g))
