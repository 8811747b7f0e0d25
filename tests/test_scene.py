import numpy as np
import jax.numpy as jnp

from ptx.scene import gltf
from ptx.scene.flatten import flatten
from ptx.scene import camera as pcamera
from ptx.scene import textures
from ptx import render as R

CORNELL = "/root/reference/path-tracer-core/scenes/cornell-box/cornell.gltf"


def test_load_cornell_counts():
    scene = gltf.load(CORNELL)
    assert len(scene.materials) == 5
    names = [m.name for m in scene.materials]
    assert names == ["white", "red", "green", "light", "metal"]
    assert scene.sun is None
    assert scene.camera is not None
    assert abs(scene.camera.yfov - 0.6911112070083618) < 1e-6
    # Default metallic is 1 when unspecified (glTF spec) — the `metal` sphere.
    assert scene.materials[4].metallic == 1.0
    assert scene.materials[3].emissive == (1.0, 1.0, 1.0)
    assert scene.materials[0].emissive == (0.0, 0.0, 0.0)
    assert scene.materials[3].emissive_strength == 10.0
    n_tris = sum(len(p.indices) for p in scene.primitives)
    assert n_tris == 1008


def test_partial_loading_scene_work():
    full = gltf.load(CORNELL)
    # Restrict to a single mesh's primitive 0 — the partitioner hook
    # (reference load_gltf.cpp:95-105).
    name = full.primitives[0].mesh_name
    part = gltf.load(CORNELL, scene_work={name: [0]})
    assert len(part.primitives) == 1
    assert part.primitives[0].mesh_name == name


def test_flatten_shapes_and_padding():
    scene = gltf.load(CORNELL)
    fs, static = flatten(scene, pad_multiple=256)
    assert static.n_tris == 1008
    assert static.n_tris_padded == 1024
    assert fs.tri_a.shape == (1024, 3)
    assert fs.tri_valid.sum() == 1008
    assert not static.has_sun and not static.has_textures
    # Padding slots are degenerate.
    assert np.all(fs.tri_e1[1008:] == 0)


def test_camera_center_ray():
    fs, static = R.load_scene(CORNELL)
    # Center pixel of an odd-sized image with jitter disabled points along
    # the camera's -Z axis.
    w = h = 65
    center = (h // 2) * w + w // 2
    o, d = pcamera.generate_rays(
        fs, jnp.array([center]), jnp.array([0]), w, h,
        first_sample_centered=True,
    )
    fwd = -np.asarray(fs.cam_basis)[:, 2]
    fwd /= np.linalg.norm(fwd)
    # Half-pixel offset from exact center -> small but tight tolerance.
    assert float(np.dot(np.asarray(d)[0], fwd)) > 0.999
    np.testing.assert_allclose(np.asarray(o)[0], np.asarray(fs.cam_origin))


def test_texture_bilinear_sampling():
    # Build a minimal FlatScene-like pack: a 2x2 texture (slots 0/1 dummies).
    fs, static = R.load_scene(CORNELL)
    tex2 = np.array(
        [[1.0, 0.0, 0.0, 1.0], [0.0, 1.0, 0.0, 1.0],
         [0.0, 0.0, 1.0, 1.0], [1.0, 1.0, 1.0, 1.0]],
        np.float32,
    )
    fs = fs._replace(
        tex_texels=jnp.concatenate([fs.tex_texels[:2], jnp.asarray(tex2)]),
        tex_offset=jnp.array([0, 1, 2], jnp.int32),
        tex_width=jnp.array([1, 1, 2], jnp.int32),
        tex_height=jnp.array([1, 1, 2], jnp.int32),
    )
    # Texel centers: uv=(0.25, 0.75) is the exact center of texel (0,0) after
    # the V flip -> pure red.
    out = textures.sample_texture(fs, jnp.array([2]), jnp.array([[0.25, 0.75]]))
    np.testing.assert_allclose(out[0, :3], [1, 0, 0], atol=1e-6)
    # Center of the texture blends all four texels equally.
    out = textures.sample_texture(fs, jnp.array([2]), jnp.array([[0.5, 0.5]]))
    np.testing.assert_allclose(out[0, :3], [0.5, 0.5, 0.5], atol=1e-6)
    # Dummy slots: white and flat-normal.
    out = textures.sample_texture(fs, jnp.array([0, 1]), jnp.array([[0.3, 0.3]] * 2))
    np.testing.assert_allclose(out[0], [1, 1, 1, 1], atol=1e-6)
    np.testing.assert_allclose(out[1], [0.5, 0.5, 1, 1], atol=1e-6)
