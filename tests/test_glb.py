"""GLB container + sparse-accessor support (reference parity: cgltf parses
both — third_party/cgltf/custom_cgltf.h; SURVEY.md §7 capability #1).

The GLB test round-trips the bundled cornell scene: repackage its JSON+bin
as a binary .glb in a temp dir, load both, and require identical flattened
geometry.
"""

import json
import os
import struct

import numpy as np

from ptx.scene import gltf as G

CORNELL = "/root/reference/path-tracer-core/scenes/cornell-box/cornell.gltf"


def _pack_glb(gltf_dict: dict, bin_data: bytes) -> bytes:
    js = json.dumps(gltf_dict).encode("utf-8")
    js += b" " * ((-len(js)) % 4)
    bn = bin_data + b"\x00" * ((-len(bin_data)) % 4)
    total = 12 + 8 + len(js) + 8 + len(bn)
    out = struct.pack("<III", 0x46546C67, 2, total)
    out += struct.pack("<II", len(js), 0x4E4F534A) + js
    out += struct.pack("<II", len(bn), 0x004E4942) + bn
    return out


def _cornell_as_glb(tmp_path) -> str:
    with open(CORNELL) as f:
        doc = json.load(f)
    base = os.path.dirname(CORNELL)
    with open(os.path.join(base, doc["buffers"][0]["uri"]), "rb") as f:
        bin_data = f.read()
    doc["buffers"][0].pop("uri")
    glb_path = str(tmp_path / "cornell.glb")
    with open(glb_path, "wb") as f:
        f.write(_pack_glb(doc, bin_data))
    return glb_path


def test_glb_roundtrip_matches_gltf(tmp_path):
    glb_path = _cornell_as_glb(tmp_path)
    a = G.load(CORNELL)
    b = G.load(glb_path)
    assert len(a.primitives) == len(b.primitives)
    for pa, pb in zip(a.primitives, b.primitives):
        np.testing.assert_array_equal(pa.positions, pb.positions)
        np.testing.assert_array_equal(pa.indices, pb.indices)
        np.testing.assert_array_equal(pa.normals, pb.normals)
    assert [m.name for m in a.materials] == [m.name for m in b.materials]
    np.testing.assert_allclose(a.camera.world_origin, b.camera.world_origin)


def test_sparse_accessor_scatter():
    """glTF 2.0 §3.6.2.3: sparse values scattered over the dense base
    (zeros when the accessor has no bufferView)."""
    base = np.arange(12, dtype=np.float32).reshape(4, 3)
    idx = np.array([1, 3], np.uint16)
    vals = np.array([[10, 11, 12], [13, 14, 15]], np.float32)
    buf = base.tobytes() + idx.tobytes() + vals.tobytes()
    doc = {
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": 48, "byteLength": 4},
            {"buffer": 0, "byteOffset": 52, "byteLength": 24},
        ],
        "accessors": [
            {
                "bufferView": 0,
                "componentType": 5126,
                "count": 4,
                "type": "VEC3",
                "sparse": {
                    "count": 2,
                    "indices": {"bufferView": 1, "componentType": 5123},
                    "values": {"bufferView": 2},
                },
            },
            # Sparse over an accessor with NO bufferView: zeros base.
            {
                "componentType": 5126,
                "count": 4,
                "type": "VEC3",
                "sparse": {
                    "count": 2,
                    "indices": {"bufferView": 1, "componentType": 5123},
                    "values": {"bufferView": 2},
                },
            },
        ],
    }
    out = G._read_accessor(doc, [buf], 0)
    expect = base.copy()
    expect[[1, 3]] = vals
    np.testing.assert_array_equal(out, expect)

    out2 = G._read_accessor(doc, [buf], 1)
    expect2 = np.zeros((4, 3), np.float32)
    expect2[[1, 3]] = vals
    np.testing.assert_array_equal(out2, expect2)


def test_glb_render_smoke(tmp_path):
    """A GLB scene renders through the full pipeline."""
    from ptx import render as R
    from ptx.config import RenderConfig

    glb_path = _cornell_as_glb(tmp_path)
    cfg = RenderConfig(width=16, height=16, samples=2, bounces=2,
                       intersector="brute")
    res = R.render_gltf(glb_path, cfg)
    assert res.image.shape == (16, 16, 4)
    assert res.color.max() > 0.0
