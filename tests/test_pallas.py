"""Pallas kernel correctness vs the pure-JAX oracle (interpret mode in CI)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ptx import render as R
from ptx.config import RenderConfig
from ptx.kernels import intersect as brute
from ptx.kernels import intersect_pallas as kp
from ptx.scene import camera as pcamera

CORNELL = "/root/reference/path-tracer-core/scenes/cornell-box/cornell.gltf"


@pytest.fixture(scope="module")
def cornell():
    return R.load_scene(CORNELL)


def _rays(fs, n=48 * 48, w=48, h=48):
    pix = jnp.arange(n, dtype=jnp.int32)
    smp = jnp.zeros_like(pix)
    return pcamera.generate_rays(fs, pix, smp, w, h)


def test_pallas_closest_matches_brute(cornell):
    fs, static = cornell
    orig, dirn = _rays(fs)
    hp = kp.closest_pallas(fs, orig, dirn, interpret=True)
    hr = brute.brute_closest_attrs(fs, orig, dirn)
    np.testing.assert_array_equal(np.asarray(hp.hit), np.asarray(hr.hit))
    m = np.asarray(hr.hit)
    np.testing.assert_allclose(
        np.asarray(hp.t)[m], np.asarray(hr.t)[m], rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(hp.position)[m], np.asarray(hr.position)[m],
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_array_equal(np.asarray(hp.mat_id)[m], np.asarray(hr.mat_id)[m])


def test_pallas_any_matches_brute(cornell):
    fs, static = cornell
    orig, dirn = _rays(fs)
    ah = kp.any_pallas(fs, orig, dirn, interpret=True)
    hr = brute.brute_any(fs, orig, dirn)
    np.testing.assert_array_equal(np.asarray(ah), np.asarray(hr))


def test_pallas_unaligned_ray_count(cornell):
    # 577 rays: not a multiple of the 256-ray block; padding must be exact.
    fs, static = cornell
    orig, dirn = _rays(fs, n=577, w=577, h=1)
    hp = kp.closest_pallas(fs, orig, dirn, interpret=True)
    hr = brute.brute_closest_attrs(fs, orig, dirn)
    np.testing.assert_array_equal(np.asarray(hp.hit), np.asarray(hr.hit))
    assert hp.t.shape == (577,)


def test_pallas_render_matches_brute(cornell):
    fs, static = cornell
    cfg_b = RenderConfig(width=32, height=32, samples=2, bounces=2,
                         intersector="brute")
    cfg_p = RenderConfig(width=32, height=32, samples=2, bounces=2,
                         intersector="pallas")
    a = R.render(fs, static, cfg_b)
    b = R.render(fs, static, cfg_p)
    np.testing.assert_allclose(a.color, b.color, rtol=1e-4, atol=1e-5)


def test_exact_gate_pallas_matches_xla_gate():
    """The VMEM-resident Pallas slab gate must produce bit-identical
    gates and entry distances to the pure-XLA reference formulation."""
    import numpy as np

    from ptx.kernels import intersect_pallas as ip

    rng = np.random.default_rng(7)
    rays = np.zeros((256, 8), np.float32)
    rays[:, 0:3] = rng.normal(size=(256, 3)) * 2
    d = rng.normal(size=(256, 3)).astype(np.float32)
    rays[:, 3:6] = d / np.linalg.norm(d, axis=1, keepdims=True)
    rays[7, 3:6] = [1.0, 0.0, 0.0]  # axis-aligned: exercises the 1/0 path
    boxes = np.zeros((64, 8), np.float32)
    lo = rng.normal(size=(64, 3)) * 3
    boxes[:, 0:3] = lo
    boxes[:, 3:6] = lo + rng.random((64, 3)) * 2
    g1, n1 = ip._exact_gate(jnp.asarray(rays), jnp.asarray(boxes))
    g2, n2 = ip._exact_gate_pallas(
        jnp.asarray(rays), jnp.asarray(boxes), interpret=True
    )
    assert bool(jnp.all(g1 == g2))
    assert bool(jnp.all(jnp.where(g1, n1, 0.0) == jnp.where(g2, n2, 0.0)))


def test_frustum_gate_is_conservative_over_exact():
    """The >2M-tri plan path: every (block, tile) the exact per-ray gate
    admits must be admitted by the interval-arithmetic frustum gate, and the
    frustum entry distance must lower-bound the exact one (safe for
    front-to-back ordering and the kernel's early exit)."""
    import numpy as np

    from ptx.kernels import intersect_pallas as ip

    rng = np.random.default_rng(3)
    rays = np.zeros((512, 8), np.float32)
    rays[:, 0:3] = rng.normal(size=(512, 3)) * 2
    d = rng.normal(size=(512, 3)).astype(np.float32)
    rays[:, 3:6] = d / np.linalg.norm(d, axis=1, keepdims=True)
    boxes = np.zeros((96, 8), np.float32)
    lo = rng.normal(size=(96, 3)) * 3
    boxes[:, 0:3] = lo
    boxes[:, 3:6] = lo + rng.random((96, 3)) * 2

    ge, ne = ip._exact_gate(jnp.asarray(rays), jnp.asarray(boxes))
    gf, nf = ip._frustum_gate(jnp.asarray(rays), jnp.asarray(boxes))
    ge, ne, gf, nf = map(np.asarray, (ge, ne, gf, nf))
    assert (gf | ~ge).all()  # exact-admitted => frustum-admitted
    both = ge & gf
    assert (nf[both] <= ne[both] + 1e-4).all()  # lower-bounds the entry


def test_frustum_plan_sweep_matches_brute(cornell, monkeypatch):
    """Force the frustum plan on a small scene (threshold lowered) and
    require the full sweep to still match brute exactly — the >2M-tri
    configuration in miniature."""
    from ptx.kernels import intersect_pallas as ip

    fs, static = cornell
    orig, dirn = _rays(fs)
    monkeypatch.setattr(ip, "FRUSTUM_PLAN_TILES", 0)
    monkeypatch.setattr(ip, "SMALL_TILES", 0)
    hp = ip.closest_pallas(fs, orig, dirn, interpret=True)
    hr = brute.brute_closest_attrs(fs, orig, dirn)
    np.testing.assert_array_equal(np.asarray(hp.hit), np.asarray(hr.hit))
    m = np.asarray(hr.hit)
    np.testing.assert_allclose(
        np.asarray(hp.t)[m], np.asarray(hr.t)[m], rtol=1e-5
    )
