"""Camera / primary-ray generation vs oracle (ref code.cl:90-197,
code.js:175-277)."""
import numpy as np
import jax.numpy as jnp

from raytracing_tpu.core.types import AABB, Camera
from raytracing_tpu.render.camera import (
    clip_to_bounds, focal_points, generate_primary_rays, parallel_rays,
    pinhole_rays, pixel_grid, thin_lens_rays,
)
import oracle


def make_cam(cols=16, rows=12):
    return Camera.look_at([1.0, 2.0, 5.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0],
                          55.0, cols, rows)


def test_lookat_basis():
    cam = make_cam()
    u, v, w = np.array(cam.u), np.array(cam.v), np.array(cam.w)
    eye = np.array(cam.eye)
    for a in (u, v, w):
        np.testing.assert_allclose(np.linalg.norm(a), 1, atol=1e-6)
    # W = normalize(eye - lookat) (ref code.js:212-213)
    np.testing.assert_allclose(w, eye / np.linalg.norm(eye), atol=1e-6)
    assert abs(u @ w) < 1e-6 and abs(u @ v) < 1e-6 and abs(v @ w) < 1e-6
    # height = 2 tan(fov/2)
    np.testing.assert_allclose(float(cam.height),
                               2 * np.tan(np.deg2rad(55 / 2)), rtol=1e-6)
    np.testing.assert_allclose(float(cam.width),
                               float(cam.height) * 16 / 12, rtol=1e-6)


def test_pinhole_matches_oracle():
    cam = make_cam()
    col, row = pixel_grid(cam)
    rays = pinhole_rays(cam, col, row)
    o, d = np.array(rays.o), np.array(rays.d)
    for idx in [0, 5, 16 * 12 - 1, 100]:
        oo, dd = oracle.pinhole_ray(
            np.array(cam.eye), np.array(cam.u), np.array(cam.v),
            np.array(cam.w), float(cam.width), float(cam.height),
            16, 12, float(col[idx]), float(row[idx]))
        np.testing.assert_allclose(o[idx], oo, atol=1e-6)
        np.testing.assert_allclose(d[idx], dd, atol=1e-5)


def test_parallel_rays_direction():
    cam = make_cam()
    col, row = pixel_grid(cam)
    rays = parallel_rays(cam, col, row)
    d = np.array(rays.d)
    np.testing.assert_allclose(d, -np.array(cam.w)[None, :].repeat(192, 0),
                               atol=1e-6)


def test_focal_point_on_plane():
    cam = make_cam()
    col, row = pixel_grid(cam)
    fp = np.array(focal_points(cam, col, row, 3.0))
    # all focal points lie on the plane at distance 3 along -W
    w = np.array(cam.w)
    pip = np.array(cam.eye) - 3.0 * w
    dist = (fp - pip[None, :]) @ w
    np.testing.assert_allclose(dist, 0.0, atol=1e-4)


def test_thin_lens_zero_radius_equals_pinhole():
    cam = make_cam()
    col, row = pixel_grid(cam)
    pin = pinhole_rays(cam, col, row)
    fp = focal_points(cam, col, row, 2.5)
    lens = thin_lens_rays(cam, fp, 0.0, jnp.full((192, 2), 0.77))
    np.testing.assert_allclose(np.array(lens.o), np.array(pin.o), atol=1e-6)
    np.testing.assert_allclose(np.array(lens.d), np.array(pin.d), atol=1e-4)


def test_thin_lens_origin_on_lens_disk():
    cam = make_cam()
    col, row = pixel_grid(cam)
    fp = focal_points(cam, col, row, 2.5)
    import jax
    uv = jax.random.uniform(jax.random.PRNGKey(0), (192, 2))
    lens = thin_lens_rays(cam, fp, 0.1, uv)
    off = np.array(lens.o) - np.array(cam.eye)[None, :]
    # origin offsets lie in the (U, V) plane within lens radius
    assert np.abs(off @ np.array(cam.w)).max() < 1e-6
    assert (np.linalg.norm(off, axis=-1) <= 0.1 + 1e-6).all()


def test_clip_to_bounds_kills_misses():
    cam = Camera.look_at([0, 0, 5], [0, 0, 0], [0, 1, 0], 60.0, 8, 8)
    col, row = pixel_grid(cam)
    rays = pinhole_rays(cam, col, row)
    bounds = AABB(pmin=jnp.array([-0.5, -0.5, -0.5]),
                  pmax=jnp.array([0.5, 0.5, 0.5]))
    clipped = clip_to_bounds(rays, bounds)
    alive = np.array(clipped.alive)
    assert alive.any() and not alive.all()
    tmin, tmax, ok = (np.array(x) for x in
                      oracle.aabb_window(np.array(rays.o), np.array(rays.d),
                                         [-0.5] * 3, [0.5] * 3))
    # agreement wherever the oracle window has positive measure (tangent
    # grazes are legitimately degenerate -> dead either way)
    solid = ok & (tmax - tmin > 1e-5)
    assert (alive[solid]).all()
    assert (~alive[~ok]).all()


def test_generate_primary_spp_layout():
    cam = Camera.look_at([0, 0, 5], [0, 0, 0], [0, 1, 0], 60.0, 4, 4)
    bounds = AABB(pmin=jnp.array([-1.0, -1.0, -1.0]),
                  pmax=jnp.array([1.0, 1.0, 1.0]))
    rays = generate_primary_rays(cam, bounds, 5.0, 0.05, 4, None)
    assert rays.n == 4 * 4 * 4     # pixel-major, sample-minor
    # sub-rays of one pixel share no origin with lens radius > 0 but all
    # roughly aim at the same focal point
    d = np.array(rays.d).reshape(16, 4, 3)
    spread_within = np.linalg.norm(d.std(axis=1), axis=-1).mean()
    spread_across = np.linalg.norm(d.mean(axis=1).std(axis=0), axis=-1)
    assert spread_within < spread_across


def test_orbit_preserves_distance():
    bounds = AABB(pmin=jnp.array([-1.0, -1.0, -1.0]),
                  pmax=jnp.array([1.0, 1.0, 1.0]))
    cam = Camera.auto_frame(bounds, 32, 32)
    for ang in (30.0, 90.0, 180.0):
        c2 = cam.orbit(bounds, ang)
        d = np.linalg.norm(np.array(c2.eye) - np.array(bounds.center))
        np.testing.assert_allclose(d, float(bounds.diagonal), rtol=1e-5)
        np.testing.assert_allclose(np.linalg.norm(np.array(c2.w)), 1,
                                   atol=1e-6)
