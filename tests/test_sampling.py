import jax.numpy as jnp
import numpy as np

from ptx import math as pmath
from ptx import sampling


def _ids(n, seed=0):
    return np.arange(n, dtype=np.uint32), np.zeros(n, dtype=np.uint32)


def test_uniform_range_and_determinism():
    pix, samp = _ids(4096)
    u1 = sampling.uniform(pix, samp, bounce=0, purpose=1)
    u2 = sampling.uniform(pix, samp, bounce=0, purpose=1)
    np.testing.assert_array_equal(u1, u2)
    assert float(jnp.min(u1)) >= 0.0 and float(jnp.max(u1)) < 1.0
    # Roughly uniform mean/var.
    assert abs(float(jnp.mean(u1)) - 0.5) < 0.02
    assert abs(float(jnp.var(u1)) - 1.0 / 12.0) < 0.01


def test_uniform_decorrelated_across_purpose_and_bounce():
    pix, samp = _ids(4096)
    a = sampling.uniform(pix, samp, 0, 1)
    b = sampling.uniform(pix, samp, 0, 2)
    c = sampling.uniform(pix, samp, 1, 1)
    assert abs(float(jnp.corrcoef(a, b)[0, 1])) < 0.05
    assert abs(float(jnp.corrcoef(a, c)[0, 1])) < 0.05


def test_cone_vec_within_cone():
    n = jnp.broadcast_to(
        pmath.normalize(jnp.array([0.3, -0.5, 0.81])), (1024, 3)
    )
    u = jnp.linspace(0.0, 0.999, 1024)
    cos_theta = jnp.full((1024,), 0.9)
    v = sampling.cone_vec(u, cos_theta, n)
    np.testing.assert_allclose(pmath.length(v), 1.0, atol=1e-5)
    np.testing.assert_allclose(pmath.dot(v, n), 0.9, atol=1e-5)


def test_importance_diffuse_is_cosine_weighted():
    n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (200_000, 3))
    pix, samp = _ids(200_000)
    u1 = sampling.uniform(pix, samp, 0, 1)
    u2 = sampling.uniform(pix, samp, 0, 2)
    d = sampling.importance_diffuse(u1, u2, n)
    cos = pmath.dot(d, n)
    assert float(jnp.min(cos)) >= -1e-4
    # E[cos] for pdf cos/pi over hemisphere is 2/3.
    assert abs(float(jnp.mean(cos)) - 2.0 / 3.0) < 0.01
    # Azimuthal symmetry.
    assert abs(float(jnp.mean(d[:, 0]))) < 0.01
    assert abs(float(jnp.mean(d[:, 1]))) < 0.01


def test_importance_specular_mirror_limit():
    # For tiny roughness the sampled direction approaches the mirror direction.
    n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (1000, 3))
    out = jnp.broadcast_to(pmath.normalize(jnp.array([0.5, 0.0, 0.8])), (1000, 3))
    pix, samp = _ids(1000)
    u1 = sampling.uniform(pix, samp, 0, 1)
    u2 = sampling.uniform(pix, samp, 0, 2)
    d = sampling.importance_specular(u1, u2, n, out, jnp.full((1000,), 0.05))
    mirror = pmath.reflect(-out, n)
    assert float(jnp.mean(pmath.dot(d, mirror))) > 0.999


def test_fresnel_grazing_and_normal():
    n = jnp.array([[0.0, 0.0, 1.0]])
    # Normal incidence: F ~= f0 = ((ior-1)/(ior+1))^2.
    out = jnp.array([[0.0, 0.0, 1.0]])
    f = sampling.fresnel(out, out, 1.33)
    f0 = ((1.33 - 1) / (1.33 + 1)) ** 2
    np.testing.assert_allclose(f, [f0], atol=1e-5)
    # Grazing: F -> 1.
    grazing_in = pmath.normalize(jnp.array([[1.0, 0.0, 0.02]]))
    grazing_out = pmath.normalize(jnp.array([[-1.0, 0.0, 0.02]]))
    f = sampling.fresnel(grazing_out, grazing_in, 1.33)
    assert float(f[0]) > 0.9


def test_pdf_diffuse():
    n = jnp.array([[0.0, 0.0, 1.0]])
    i = pmath.normalize(jnp.array([[0.0, 0.6, 0.8]]))
    np.testing.assert_allclose(
        sampling.pdf_diffuse(n, i), [0.8 / np.pi], rtol=1e-5
    )


def test_pdf_specular_positive_and_peaked():
    n = jnp.array([[0.0, 0.0, 1.0]])
    out = pmath.normalize(jnp.array([[0.3, 0.0, 0.954]]))
    mirror = pmath.reflect(-out, n)
    off = pmath.normalize(mirror + jnp.array([[0.5, 0.5, 0.0]]))
    p_mirror = sampling.pdf_specular(n, out, mirror, jnp.array([0.1]))
    p_off = sampling.pdf_specular(n, out, off, jnp.array([0.1]))
    assert float(p_mirror[0]) > float(p_off[0]) > 0.0


def test_ggx_importance_matches_pdf_moments():
    # Monte Carlo check: directions from importance_specular should have
    # higher average pdf_specular than uniform hemisphere directions.
    n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (50_000, 3))
    out = jnp.broadcast_to(pmath.normalize(jnp.array([0.2, 0.1, 0.97])), (50_000, 3))
    rough = jnp.full((50_000,), 0.3)
    pix, samp = _ids(50_000)
    u1 = sampling.uniform(pix, samp, 0, 1)
    u2 = sampling.uniform(pix, samp, 0, 2)
    d = sampling.importance_specular(u1, u2, n, out, rough)
    up = pmath.dot(d, n) > 0
    p_sampled = sampling.pdf_specular(n, out, d, rough)
    mean_sampled = float(jnp.mean(jnp.where(up, p_sampled, 0.0)))
    d_uni = sampling.importance_diffuse(u1, u2, n)
    p_uni = sampling.pdf_specular(n, out, d_uni, rough)
    mean_uni = float(jnp.mean(p_uni))
    assert mean_sampled > mean_uni
