"""End-to-end coverage on jack-of-blades: directional sun NEE, textures,
alpha-mode opacity, BVH over a 58k-triangle scene."""

import numpy as np
import pytest

from ptx import render as R
from ptx.config import RenderConfig
from ptx.scene import gltf

JACK = "/root/reference/path-tracer-core/scenes/jack-of-blades/jack-of-blades.gltf"


@pytest.fixture(scope="module")
def jack_scene():
    return gltf.load(JACK)


def test_jack_sun_light(jack_scene):
    sun = jack_scene.sun
    assert sun is not None
    # energy = color * intensity (load_gltf.cpp:126); intensity ~= 50.
    assert 40.0 < float(sun.energy.max()) <= 60.0
    np.testing.assert_allclose(np.linalg.norm(sun.direction), 1.0, atol=1e-5)
    assert abs(sun.angular_radius - 0.004732) < 1e-6


def test_jack_materials_textures(jack_scene):
    mats = jack_scene.materials
    assert len(mats) == 6
    # Alpha-mode materials carry the base-color texture as opacity texture.
    alpha_mats = [m for m in mats if m.opacity_tex >= 0]
    assert len(alpha_mats) >= 4
    for m in alpha_mats:
        assert m.opacity_tex == m.albedo_tex
    # All base-color textures decoded as sRGB.
    for m in mats:
        if m.albedo_tex >= 0:
            assert jack_scene.images[m.albedo_tex].srgb


def test_jack_render_bvh():
    fs, static = R.load_scene(JACK)
    assert static.has_sun and static.has_textures
    assert static.n_tris == 58740
    cfg = RenderConfig(width=48, height=36, samples=1, bounces=2,
                       intersector="bvh")
    res = R.render(fs, static, cfg)
    assert np.isfinite(res.color).all()
    assert res.color.min() >= 0.0
    # Sun-lit scene: substantial energy in frame.
    assert res.color.mean() > 0.05
    # Deterministic.
    res2 = R.render(fs, static, cfg)
    np.testing.assert_array_equal(res.color, res2.color)


def test_jack_render_golden():
    """Golden-image lock on the richest shading configuration (textures,
    sun NEE, shadow catcher, normal maps): generated once by a
    parity-verified build, any future drift fails here.  Delete the .npy to
    regenerate after an intentional semantic change."""
    import os

    golden_path = os.path.join(
        os.path.dirname(__file__), "golden", "jack_24x18_s2_b3.npy"
    )
    cfg = RenderConfig(width=24, height=18, samples=2, bounces=3,
                       intersector="bvh")
    fs, static = R.load_scene(JACK, quirks=cfg.quirks)
    res = R.render(fs, static, cfg)
    if not os.path.exists(golden_path):
        np.save(golden_path, res.color)
        pytest.skip("golden image generated")
    golden = np.load(golden_path)
    np.testing.assert_allclose(res.color, golden, rtol=1e-4, atol=1e-5)
