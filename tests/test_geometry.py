import jax.numpy as jnp
import numpy as np

from ptx import geometry


def _tri(a, b, c):
    a = np.asarray(a, np.float32)
    return a, np.asarray(b, np.float32) - a, np.asarray(c, np.float32) - a


def test_triangle_hit_center():
    a, e1, e2 = _tri([0, 0, 0], [1, 0, 0], [0, 1, 0])
    orig = jnp.array([0.25, 0.25, 1.0])
    dirn = jnp.array([0.0, 0.0, -1.0])
    t, beta, gamma, ok = geometry.moller_trumbore(orig, dirn, a, e1, e2)
    assert bool(ok)
    np.testing.assert_allclose(t, 1.0, rtol=1e-6)
    np.testing.assert_allclose([beta, gamma], [0.25, 0.25], atol=1e-6)


def test_triangle_miss_outside_and_behind():
    a, e1, e2 = _tri([0, 0, 0], [1, 0, 0], [0, 1, 0])
    # Outside barycentric range.
    t, *_ , ok = geometry.moller_trumbore(
        jnp.array([2.0, 2.0, 1.0]), jnp.array([0.0, 0.0, -1.0]), a, e1, e2
    )
    assert not bool(ok) and float(t) == float(geometry.INF)
    # Behind the ray.
    t, *_, ok = geometry.moller_trumbore(
        jnp.array([0.25, 0.25, -1.0]), jnp.array([0.0, 0.0, -1.0]), a, e1, e2
    )
    assert not bool(ok)


def test_triangle_parallel_ray():
    a, e1, e2 = _tri([0, 0, 0], [1, 0, 0], [0, 1, 0])
    t, *_, ok = geometry.moller_trumbore(
        jnp.array([0.0, 0.0, 1.0]), jnp.array([1.0, 0.0, 0.0]), a, e1, e2
    )
    assert not bool(ok)


def test_triangle_epsilon_bias_favours_edge_hits():
    # A ray exactly on an edge should hit thanks to the +eps bias
    # (reference triangle.cpp:166-176).
    a, e1, e2 = _tri([0, 0, 0], [1, 0, 0], [0, 1, 0])
    t, *_, ok = geometry.moller_trumbore(
        jnp.array([0.0, 0.5, 1.0]), jnp.array([0.0, 0.0, -1.0]), a, e1, e2
    )
    assert bool(ok)


def test_triangle_batched_broadcast():
    a, e1, e2 = _tri([0, 0, 0], [1, 0, 0], [0, 1, 0])
    tris_a = jnp.stack([jnp.asarray(a), jnp.asarray(a) + 5.0])
    tris_e1 = jnp.stack([jnp.asarray(e1)] * 2)
    tris_e2 = jnp.stack([jnp.asarray(e2)] * 2)
    orig = jnp.array([[0.25, 0.25, 1.0], [0.1, 0.1, 2.0]])
    dirn = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    # [R, N] broadcast.
    t, beta, gamma, ok = geometry.moller_trumbore(
        orig[:, None, :], dirn[:, None, :], tris_a[None], tris_e1[None], tris_e2[None]
    )
    assert t.shape == (2, 2)
    assert bool(ok[0, 0]) and not bool(ok[0, 1])
    np.testing.assert_allclose(t[1, 0], 2.0, rtol=1e-6)


def test_aabb_hit_miss_inside():
    bmin = jnp.array([0.0, 0.0, 0.0])
    bmax = jnp.array([1.0, 1.0, 1.0])
    near, far, hit = geometry.aabb_intersect(
        jnp.array([0.5, 0.5, 2.0]), jnp.array([0.0, 0.0, -1.0]), bmin, bmax
    )
    assert bool(hit)
    np.testing.assert_allclose(near, 1.0, rtol=1e-6)
    # Ray starting inside.
    near, far, hit = geometry.aabb_intersect(
        jnp.array([0.5, 0.5, 0.5]), jnp.array([0.0, 0.0, -1.0]), bmin, bmax
    )
    assert bool(hit) and float(near) < 0.0
    # Miss.
    _, _, hit = geometry.aabb_intersect(
        jnp.array([2.0, 2.0, 2.0]), jnp.array([0.0, 0.0, -1.0]), bmin, bmax
    )
    assert not bool(hit)
    # Axis-parallel ray in-plane (zero direction component).
    _, _, hit = geometry.aabb_intersect(
        jnp.array([0.5, 0.5, 2.0]), jnp.array([0.0, 1.0, 0.0]), bmin, bmax
    )
    assert not bool(hit)


def test_transform_ray():
    basis = jnp.asarray(np.diag([2.0, 2.0, 2.0]).astype(np.float32))
    origin = jnp.array([1.0, 0.0, 0.0])
    o, d = geometry.transform_ray(
        jnp.array([[1.0, 0.0, 0.0]]), jnp.array([[0.0, 3.0, 0.0]]), basis, origin
    )
    np.testing.assert_allclose(o, [[3.0, 0.0, 0.0]], atol=1e-6)
    np.testing.assert_allclose(d, [[0.0, 1.0, 0.0]], atol=1e-6)


def test_pad_triangles():
    a = np.zeros((5, 3), np.float32)
    pa, pe1, pe2, valid = geometry.pad_triangles(a, a.copy(), a.copy(), 8)
    assert pa.shape == (8, 3)
    assert valid.sum() == 5 and not valid[5:].any()
