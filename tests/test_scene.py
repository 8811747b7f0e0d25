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


def _write_minimal_gltf(tmp_path, cameras, cam_nodes, lights=(), light_nodes=(),
                        extra_nodes=()):
    """A loadable glTF: one triangle + configurable camera/light nodes.

    ``cam_nodes``: list of (camera_index, translation) node specs;
    ``light_nodes``: list of (light_index, rotation_quat) specs;
    ``extra_nodes``: list of (name, translation) plain nodes.
    """
    import base64
    import json

    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    buf = pos.tobytes()
    nodes = [{"mesh": 0, "name": "tri"}]
    for ci, t in cam_nodes:
        nodes.append({"camera": ci, "translation": list(t),
                      "name": f"camnode{ci}"})
    for li, q in light_nodes:
        nodes.append({
            "extensions": {"KHR_lights_punctual": {"light": li}},
            "rotation": list(q), "name": f"lightnode{li}",
        })
    for name, t in extra_nodes:
        nodes.append({"name": name, "translation": list(t)})
    g = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": list(range(len(nodes)))}],
        "nodes": nodes,
        "cameras": list(cameras),
        "meshes": [{"name": "tri", "primitives": [
            {"attributes": {"POSITION": 0}}]}],
        "buffers": [{"byteLength": len(buf),
                     "uri": "data:application/octet-stream;base64,"
                            + base64.b64encode(buf).decode()}],
        "bufferViews": [{"buffer": 0, "byteOffset": 0, "byteLength": len(buf)}],
        "accessors": [{"bufferView": 0, "componentType": 5126, "count": 3,
                       "type": "VEC3",
                       "min": [0, 0, 0], "max": [1, 1, 0]}],
    }
    if lights:
        g["extensions"] = {"KHR_lights_punctual": {"lights": list(lights)}}
        g["extensionsUsed"] = ["KHR_lights_punctual"]
    p = tmp_path / "two_cam.gltf"
    p.write_text(json.dumps(g))
    return str(p)


def _perspective(name):
    return {"name": name, "type": "perspective",
            "perspective": {"yfov": 0.7, "znear": 0.1}}


def test_camera_bound_by_name_last_match_wins(tmp_path):
    """Reference parity (load_gltf.cpp:67-72,111-115): entities are named
    after their referenced camera and the binding matches cameras[0]'s NAME,
    each match overwriting — so with two same-named cameras the LAST
    matching node (here the one referencing camera #1) supplies the
    transform, while yfov always comes from cameras[0]."""
    path = _write_minimal_gltf(
        tmp_path,
        cameras=[_perspective("Cam"), _perspective("Cam")],
        cam_nodes=[(0, (1.0, 0.0, 0.0)), (1, (0.0, 5.0, 0.0))],
    )
    sd = gltf.load(path)
    np.testing.assert_allclose(sd.camera.world_origin, [0.0, 5.0, 0.0])


def test_camera_bound_by_name_distinct_names(tmp_path):
    """Sponza's shape: two cameras with distinct names — the node whose
    referenced camera IS cameras[0] matches regardless of node order."""
    path = _write_minimal_gltf(
        tmp_path,
        cameras=[_perspective("CamA"), _perspective("CamB")],
        # Node referencing camera 1 comes LAST; it must not win.
        cam_nodes=[(0, (1.0, 0.0, 0.0)), (1, (0.0, 5.0, 0.0))],
    )
    sd = gltf.load(path)
    np.testing.assert_allclose(sd.camera.world_origin, [1.0, 0.0, 0.0])


def test_plain_node_named_like_camera_binds(tmp_path):
    """A mesh-less node whose NAME equals cameras[0]'s name also matches
    (the reference compares entity names, not camera references) and, being
    later in preorder, overwrites the real camera node's binding."""
    path = _write_minimal_gltf(
        tmp_path,
        cameras=[_perspective("Cam.001")],
        cam_nodes=[(0, (1.0, 0.0, 0.0))],
        extra_nodes=[("Cam.001", (0.0, 0.0, 9.0))],
    )
    sd = gltf.load(path)
    np.testing.assert_allclose(sd.camera.world_origin, [0.0, 0.0, 9.0])


def test_sun_requires_light_zero_directional(tmp_path):
    """The reference hardcodes sun_light_index=0: when light #0 is a point
    light, there is NO sun even though light #1 is directional
    (load_gltf.cpp:14-15,36-46)."""
    path = _write_minimal_gltf(
        tmp_path,
        cameras=[_perspective("Cam")],
        cam_nodes=[(0, (0.0, 0.0, 0.0))],
        lights=[{"name": "P", "type": "point", "intensity": 1.0},
                {"name": "S", "type": "directional", "intensity": 3.0}],
        light_nodes=[(0, (0, 0, 0, 1)), (1, (0, 0, 0, 1))],
    )
    sd = gltf.load(path)
    assert sd.sun is None

    # And with the directional light first, the sun binds with its energy.
    path2 = _write_minimal_gltf(
        tmp_path,
        cameras=[_perspective("Cam")],
        cam_nodes=[(0, (0.0, 0.0, 0.0))],
        lights=[{"name": "S", "type": "directional", "intensity": 3.0,
                 "color": [1.0, 0.5, 0.25]}],
        light_nodes=[(0, (0, 0, 0, 1))],
    )
    sd2 = gltf.load(path2)
    assert sd2.sun is not None
    np.testing.assert_allclose(sd2.sun.energy, [3.0, 1.5, 0.75])
