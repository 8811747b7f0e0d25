"""Gradient correctness (finite difference vs autodiff) and inverse rendering."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ptx import render as R
from ptx.config import RenderConfig
from ptx.diff import inverse

CORNELL = "/root/reference/path-tracer-core/scenes/cornell-box/cornell.gltf"


@pytest.fixture(scope="module")
def cornell():
    return R.load_scene(CORNELL)


def _cfg(**kw):
    # bounces=2 keeps Russian roulette inactive (rr only starts below
    # bounces-2), so the loss is smooth in the material parameters and finite
    # differences are exact.
    base = dict(width=24, height=24, samples=1, bounces=2, intersector="brute")
    base.update(kw)
    return RenderConfig(**base)


def test_grad_matches_finite_difference_albedo(cornell):
    fs, static = cornell
    cfg = _cfg()
    n_pixels = cfg.width * cfg.height
    target = jnp.zeros((n_pixels, 3))

    loss_fn = jax.jit(
        inverse.make_loss_fn(static, cfg, target, ("mat_albedo",))
    )
    params = {"mat_albedo": fs.mat_albedo}
    grad = jax.jit(jax.grad(loss_fn))(params, fs, jnp.int32(0))["mat_albedo"]

    eps = 1e-3
    # Check several (material, channel) entries incl. the red wall.
    for mi, ci in [(0, 0), (1, 0), (1, 1), (3, 2)]:
        delta = jnp.zeros_like(fs.mat_albedo).at[mi, ci].set(eps)
        lp = loss_fn({"mat_albedo": fs.mat_albedo + delta}, fs, jnp.int32(0))
        lm = loss_fn({"mat_albedo": fs.mat_albedo - delta}, fs, jnp.int32(0))
        fd = (lp - lm) / (2 * eps)
        ad = grad[mi, ci]
        np.testing.assert_allclose(ad, fd, rtol=2e-2, atol=1e-6)


def test_grad_matches_finite_difference_emissive(cornell):
    fs, static = cornell
    cfg = _cfg()
    n_pixels = cfg.width * cfg.height
    target = jnp.full((n_pixels, 3), 0.5)

    loss_fn = jax.jit(
        inverse.make_loss_fn(static, cfg, target, ("mat_emissive",))
    )
    params = {"mat_emissive": fs.mat_emissive}
    grad = jax.jit(jax.grad(loss_fn))(params, fs, jnp.int32(0))["mat_emissive"]
    # The light material's emissive must have a nonzero gradient.
    assert float(jnp.abs(grad[3]).sum()) > 0.0

    eps = 1e-3
    delta = jnp.zeros_like(fs.mat_emissive).at[3, 0].set(eps)
    lp = loss_fn({"mat_emissive": fs.mat_emissive + delta}, fs, jnp.int32(0))
    lm = loss_fn({"mat_emissive": fs.mat_emissive - delta}, fs, jnp.int32(0))
    fd = (lp - lm) / (2 * eps)
    np.testing.assert_allclose(grad[3, 0], fd, rtol=2e-2, atol=1e-6)


def test_inverse_recovers_albedo(cornell):
    """Perturb the albedos; gradient descent must recover them near-exactly
    (the deterministic counter RNG makes the loss optimum the true params)."""
    fs, static = cornell
    cfg = _cfg(samples=2)
    n_pixels = cfg.width * cfg.height

    sample_fn = R.make_sample_fn(static, cfg)
    target = jnp.zeros((n_pixels, 3))
    for s in range(cfg.samples):
        radiance, _ = sample_fn(fs, jnp.int32(s))
        target = target + radiance
    target = target / cfg.samples

    init = {"mat_albedo": jnp.full_like(fs.mat_albedo, 0.5)}
    params, history = inverse.optimize(
        fs, static, cfg, target, init, steps=100, lr=0.1,
        param_clip={"mat_albedo": (0.0, 1.0)},
    )
    assert history[-1] < 1e-4
    # All identifiable materials (the light's albedo is unobservable behind
    # its own emission) recover to within 2e-2.
    got = np.asarray(params["mat_albedo"])
    true = np.asarray(fs.mat_albedo)
    for mi in (0, 1, 2, 4):
        np.testing.assert_allclose(got[mi], true[mi], atol=2e-2)


def test_grad_through_scene_sharding(cornell):
    """Gradients must flow through the shard_map psum-min reduce."""
    from ptx.parallel import dist, mesh as pmesh
    from jax.sharding import PartitionSpec as P

    fs, static = cornell
    cfg = _cfg()
    plan = pmesh.Plan(dp=2, tp=4, scene_sharded=True)
    meshdev = pmesh.make_mesh(plan)
    from ptx.render import get_backend

    base_closest, base_any = get_backend(static, cfg)
    closest = dist.sharded_closest(base_closest)
    any_hit = dist.sharded_any_hit(base_any)
    from ptx.integrator.wavefront import make_integrator

    integrator = make_integrator(static, cfg, closest, any_hit, differentiable=True)
    n_pixels = cfg.width * cfg.height
    fs_specs = pmesh.scene_shardings(meshdev, True)

    inner = jax.shard_map(
        integrator,
        mesh=meshdev,
        in_specs=(fs_specs, P(pmesh.AXIS_RAYS), P(pmesh.AXIS_RAYS)),
        out_specs=(P(pmesh.AXIS_RAYS), P(pmesh.AXIS_RAYS)),
        check_vma=False,
    )

    def loss(albedo):
        fs2 = fs._replace(mat_albedo=albedo)
        pixel_ids = jnp.arange(n_pixels, dtype=jnp.int32)
        sample_ids = jnp.zeros((n_pixels,), jnp.int32)
        radiance, _ = inner(fs2, pixel_ids, sample_ids)
        return jnp.mean(radiance**2)

    g_sharded = jax.jit(jax.grad(loss))(fs.mat_albedo)

    # Same loss single-device.
    from ptx.kernels.intersect import make_brute

    integrator_s = make_integrator(static, cfg, *make_brute(), differentiable=True)

    def loss_s(albedo):
        fs2 = fs._replace(mat_albedo=albedo)
        pixel_ids = jnp.arange(n_pixels, dtype=jnp.int32)
        sample_ids = jnp.zeros((n_pixels,), jnp.int32)
        radiance, _ = integrator_s(fs2, pixel_ids, sample_ids)
        return jnp.mean(radiance**2)

    g_single = jax.jit(jax.grad(loss_s))(fs.mat_albedo)
    np.testing.assert_allclose(g_sharded, g_single, rtol=1e-4, atol=1e-7)


def test_grad_matches_finite_difference_vertices(cornell):
    """d loss / d vertex positions (SURVEY capability #8: `d pixel / d
    vertices`). Interior-point gradients: hit distance, position, and
    barycentrics are differentiable through Moller-Trumbore; the discrete
    hit assignment is held fixed, which a small symmetric FD respects as
    long as no silhouette crosses a ray (true for a uniform translation of
    the whole scene geometry tested here)."""
    fs, static = cornell
    cfg = _cfg()
    target = jnp.zeros((cfg.width * cfg.height, 3))
    loss_fn = inverse.make_loss_fn(static, cfg, target, ("tri_a",))
    params = {"tri_a": fs.tri_a}
    g = jax.grad(loss_fn)(params, fs, jnp.int32(0))["tri_a"]
    assert np.isfinite(np.asarray(g)).all()

    # FD along a global +y translation of every triangle anchor.
    eps = 1e-3
    dirn = jnp.zeros_like(fs.tri_a).at[:, 1].set(1.0)
    lp = loss_fn({"tri_a": fs.tri_a + eps * dirn}, fs, jnp.int32(0))
    lm = loss_fn({"tri_a": fs.tri_a - eps * dirn}, fs, jnp.int32(0))
    fd = (lp - lm) / (2 * eps)
    ad = jnp.sum(g * dirn)
    np.testing.assert_allclose(float(ad), float(fd), rtol=0.08, atol=1e-6)
