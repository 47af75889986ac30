"""Sampler properties (ref code.cl:132-172, 482-509, 545-579)."""
import numpy as np
import jax
import jax.numpy as jnp

from raytracing_tpu.core import rng as R
from raytracing_tpu.core.sampling import (
    concentric_disk, cosine_hemisphere, distort, stratified_lens_coords,
)
from raytracing_tpu.core.types import tangent_frame


def test_distort_range_and_zero_pin():
    u = jnp.array([[0.0, 0.0], [0.5, 0.5], [1.0, 1.0], [0.25, 0.75]])
    out = np.array(distort(u))
    assert (out[0] == 0).all()          # (0,0) pinned (ref code.cl:133-135)
    np.testing.assert_allclose(out[1], [0, 0], atol=1e-7)
    np.testing.assert_allclose(out[2], [1, 1])
    np.testing.assert_allclose(out[3], [-0.5, 0.5])


def test_concentric_disk_in_unit_disk(rng):
    u = jnp.array(rng.uniform(0, 1, (2000, 2)).astype(np.float32))
    xy = np.array(concentric_disk(u))
    r = np.linalg.norm(xy, axis=-1)
    assert r.max() <= 1.0 + 1e-5
    # area-preserving: mean radius^2 of uniform square -> uniform disk ~ 0.5
    assert abs((r ** 2).mean() - 0.5) < 0.03
    # corners map to the unit circle diagonals
    c = np.array(concentric_disk(jnp.array([[1.0, 1.0]])))[0]
    np.testing.assert_allclose(np.linalg.norm(c), 1.0, atol=1e-6)
    # zero pinned
    z = np.array(concentric_disk(jnp.array([[0.0, 0.0]])))[0]
    assert (z == 0).all()


def test_stratified_lens_grid():
    c = np.array(stratified_lens_coords(4))
    assert c.shape == (4, 2)
    # 2x2 cell centers, x fastest (ref initTrace loop order code.cl:487-505)
    np.testing.assert_allclose(
        c, [[0.25, 0.25], [0.75, 0.25], [0.25, 0.75], [0.75, 0.75]])
    c9 = np.array(stratified_lens_coords(9))
    assert c9.shape == (9, 2)
    np.testing.assert_allclose(c9[0], [1 / 6, 1 / 6])


def test_tangent_frame_orthonormal(rng):
    n = rng.normal(size=(500, 3))
    n = jnp.array((n / np.linalg.norm(n, axis=-1, keepdims=True)
                   ).astype(np.float32))
    t, b = tangent_frame(n)
    t, b, n = np.array(t), np.array(b), np.array(n)
    np.testing.assert_allclose(np.linalg.norm(t, axis=-1), 1, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(b, axis=-1), 1, atol=1e-5)
    assert np.abs((t * n).sum(-1)).max() < 1e-5
    assert np.abs((b * n).sum(-1)).max() < 1e-5
    assert np.abs((t * b).sum(-1)).max() < 1e-5


def test_cosine_hemisphere_distribution(rng):
    n = jnp.array([[0.0, 0.0, 1.0]] * 20000)
    u = jnp.array(rng.uniform(0, 1, (20000, 2)).astype(np.float32))
    d = np.array(cosine_hemisphere(n, u))
    assert (d[:, 2] >= -1e-6).all()                  # upper hemisphere
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1, atol=1e-5)
    # E[cos theta] = 2/3 for cosine-weighted sampling
    assert abs(d[:, 2].mean() - 2 / 3) < 0.01
    # azimuthal symmetry
    assert abs(d[:, 0].mean()) < 0.01 and abs(d[:, 1].mean()) < 0.01


def test_rng_reproducible_and_decorrelated():
    k = R.base_key(42)
    a = np.array(R.uniform2(R.draw_key(R.pass_key(k, 3), R.LENS), 100))
    b = np.array(R.uniform2(R.draw_key(R.pass_key(k, 3), R.LENS), 100))
    c = np.array(R.uniform2(R.draw_key(R.pass_key(k, 4), R.LENS), 100))
    d = np.array(R.uniform2(R.draw_key(R.pass_key(k, 3), R.LIGHT), 100))
    assert (a == b).all()
    assert not (a == c).all()
    assert not (a == d).all()
