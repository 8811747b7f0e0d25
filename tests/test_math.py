import jax.numpy as jnp
import numpy as np

from ptx import math as pmath


def test_dot_cross_normalize():
    a = jnp.array([[1.0, 0.0, 0.0], [1.0, 2.0, 3.0]])
    b = jnp.array([[0.0, 1.0, 0.0], [4.0, 5.0, 6.0]])
    np.testing.assert_allclose(pmath.dot(a, b), [0.0, 32.0], rtol=1e-6)
    np.testing.assert_allclose(
        pmath.cross(a, b), np.cross(np.asarray(a), np.asarray(b)), rtol=1e-6
    )
    n = pmath.normalize(b)
    np.testing.assert_allclose(pmath.length(n), [1.0, 1.0], rtol=1e-5)


def test_reflect():
    incident = jnp.array([[1.0, -1.0, 0.0]])
    normal = jnp.array([[0.0, 1.0, 0.0]])
    out = pmath.reflect(incident, normal)
    np.testing.assert_allclose(out, [[1.0, 1.0, 0.0]], atol=1e-6)


def test_aces_range():
    x = jnp.linspace(0.0, 100.0, 64).reshape(-1, 1) * jnp.ones((1, 3))
    y = pmath.tonemap_approx_aces(x)
    assert float(jnp.min(y)) >= 0.0 and float(jnp.max(y)) <= 1.0
    # Monotone and saturating toward 1.
    assert float(y[-1, 0]) > 0.95


def test_srgb_roundtrip():
    x = jnp.linspace(0.0, 1.0, 32)
    np.testing.assert_allclose(
        pmath.srgb_decode(pmath.srgb_encode(x)), x, atol=1e-5
    )


def test_equirectangular_proj_center():
    # +X axis maps to u=0.5 (atan2(0,1)=0), v=0.5.
    uv = pmath.equirectangular_proj(jnp.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(uv, [0.5, 0.5], atol=1e-6)


def test_orthonormal_basis():
    rng = np.random.default_rng(0)
    n = rng.normal(size=(256, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    t, b = pmath.orthonormal_basis(jnp.asarray(n))
    np.testing.assert_allclose(pmath.dot(t, jnp.asarray(n)), 0.0, atol=1e-5)
    np.testing.assert_allclose(pmath.dot(b, jnp.asarray(n)), 0.0, atol=1e-5)
    np.testing.assert_allclose(pmath.dot(t, b), 0.0, atol=1e-5)
    np.testing.assert_allclose(pmath.length(t), 1.0, atol=1e-5)
