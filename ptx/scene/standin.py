"""Stand-in geometry for scenes whose buffer payload isn't bundled.

The reference's *default worker fixture* is sponza-new
(``path-tracer-core/events/event.json:8-36``) — but the repo ships only
``scene.gltf`` (49 KB of JSON) and 38 MB of textures; the 11.9 MB
``sponza.bin`` geometry buffer the glTF references is absent, so the scene
cannot load as authored (in the reference either: its worker downloads the
buffer from S3 at run time, ``load_gltf.cpp:180-185``).

To still exercise the many-primitive + many-texture pipeline on sponza's
*real* metadata (24 primitives, 24 materials, 70 textures, the punctual sun,
both cameras), :func:`materialize` builds the scene in a writable directory
with a **deterministic generated** ``.bin``: every accessor is filled
honoring its exact byte layout (offsets, strides, component types) with
plausible values — positions a seeded triangle soup inside a sponza-scaled
box, unit normals, valid indices, [0,1) UVs.  Geometry is synthetic; scene
*structure* (counts, materials, texture wiring, lights) is the real thing.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np

SPONZA_DIR = "/root/reference/path-tracer-core/scenes/sponza-new"

# Ribbon tuning (see the POSITION branch of generate_bin): sized so a
# camera inside the soup sees BOTH geometry and open sky (measured primary
# hit rate ~0.3-0.7 on sponza) — an enclosing soup renders pitch black (no
# light ever enters), an empty one tests nothing.
RIBBON_JITTER = 0.01  # vertex jitter, fraction of the scene half-extent
INDEX_WINDOW = 4      # index window width => triangle size
FREQ_RANGE = (3, 9)   # space-curve frequency band

# Bump when generate_bin's output changes for a fixed seed — stamped next
# to the cached .bin so stale caches regenerate (ADVICE r4: materialize
# used to return the old seed's geometry for any new seed).
GENERATOR_VERSION = 1

_COMPONENT_DTYPES = {
    5120: np.int8, 5121: np.uint8, 5122: np.int16,
    5123: np.uint16, 5125: np.uint32, 5126: np.float32,
}
_TYPE_NCOMP = {
    "SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4,
    "MAT2": 4, "MAT3": 9, "MAT4": 16,
}


def _accessor_view(buf: bytearray, gltf: dict, acc: dict) -> np.ndarray:
    """Writable [count, ncomp] strided view of one accessor's elements."""
    view = gltf["bufferViews"][acc["bufferView"]]
    dt = np.dtype(_COMPONENT_DTYPES[acc["componentType"]])
    ncomp = _TYPE_NCOMP[acc["type"]]
    base = view.get("byteOffset", 0) + acc.get("byteOffset", 0)
    stride = view.get("byteStride") or dt.itemsize * ncomp
    return np.ndarray(
        (acc["count"], ncomp), dtype=dt, buffer=memoryview(buf),
        offset=base, strides=(stride, dt.itemsize),
    )


def _local_matrix(node: dict) -> np.ndarray:
    if "matrix" in node:
        return np.asarray(node["matrix"], np.float64).reshape(4, 4).T
    t = node.get("translation", [0.0, 0.0, 0.0])
    x, y, z, w = node.get("rotation", [0.0, 0.0, 0.0, 1.0])
    s = node.get("scale", [1.0, 1.0, 1.0])
    rot = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ], np.float64)
    m = np.eye(4)
    m[:3, :3] = rot * np.asarray(s, np.float64)[None, :]
    m[:3, 3] = t
    return m


def _world_matrices(gltf: dict) -> Dict[int, np.ndarray]:
    nodes = gltf.get("nodes", [])
    world: Dict[int, np.ndarray] = {}

    def walk(i: int, parent: np.ndarray):
        world[i] = parent @ _local_matrix(nodes[i])
        for c in nodes[i].get("children", []):
            walk(c, world[i])

    for root in gltf["scenes"][gltf.get("scene", 0)].get("nodes", []):
        walk(root, np.eye(4))
    return world


def generate_bin(gltf: dict, seed: int = 0) -> bytes:
    """A valid buffer for ``gltf``'s accessor table (single-buffer scenes).

    Positions are generated in *world space* — a box centered on the scene's
    cameras, so primary rays actually hit the soup — then mapped into each
    mesh's local frame through its instancing node's inverse world transform
    (a Blender-exported sponza node carries a ~0.008 uniform scale: filling
    mesh-local space naively puts the whole scene in a 0.1-unit blob the
    camera never sees).
    """
    if len(gltf.get("buffers", [])) != 1:
        raise ValueError("stand-in generation supports single-buffer scenes")
    buf = bytearray(gltf["buffers"][0]["byteLength"])
    rng = np.random.default_rng(seed)

    world = _world_matrices(gltf)
    nodes = gltf.get("nodes", [])
    cams = np.array([
        world[i][:3, 3] for i in world if "camera" in nodes[i]
    ])
    center = cams.mean(axis=0) if len(cams) else np.zeros(3)
    spread = (np.linalg.norm(cams - center, axis=1).max()
              if len(cams) else 0.0)
    half = max(5.0, 2.0 * float(spread))
    lo = (center - half).astype(np.float32)
    hi = (center + half).astype(np.float32)

    # First instancing node's world matrix per mesh (shared accessors are
    # filled once; good enough for a stand-in).
    mesh_world: Dict[int, np.ndarray] = {}
    for i in world:
        m = nodes[i].get("mesh")
        if m is not None and m not in mesh_world:
            mesh_world[m] = world[i]

    filled = set()
    inv_w = np.eye(4)

    def fill(acc_idx: int, kind: str, n_pos: int = 0):
        if acc_idx is None or acc_idx in filled:
            return
        filled.add(acc_idx)
        acc = gltf["accessors"][acc_idx]
        if "bufferView" not in acc:
            return
        out = _accessor_view(buf, gltf, acc)
        n = acc["count"]
        if kind == "POSITION":
            # A ribbon of positions along a smooth seeded space curve (plus
            # jitter): with window-local indices below this yields SMALL
            # triangles — rays both hit geometry (textured shading, sun NEE)
            # and escape it (env light).  Fully random positions + indices
            # would instead build box-sized triangles: an opaque unlit
            # tangle that renders pitch black.
            t = np.linspace(0.0, 2.0 * np.pi, n, dtype=np.float32)
            freq = rng.integers(*FREQ_RANGE, 3).astype(np.float32)
            phase = rng.random(3, dtype=np.float32) * 2.0 * np.pi
            amp = (0.3 + 0.6 * rng.random(3, dtype=np.float32)) * half
            p = (center.astype(np.float32)
                 + amp[None, :]
                 * np.sin(t[:, None] * freq[None, :] + phase[None, :]))
            p += (rng.random((n, 3), np.float32) - 0.5) * (
                RIBBON_JITTER * half
            )
            p = p @ inv_w[:3, :3].T.astype(np.float32) + inv_w[:3, 3].astype(
                np.float32
            )
            out[:] = p.astype(out.dtype)
        elif kind == "NORMAL":
            v = rng.standard_normal((n, 3)).astype(np.float32)
            v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-6)
            out[:] = v.astype(out.dtype)
        elif kind == "TANGENT":
            v = rng.standard_normal((n, 3)).astype(np.float32)
            v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-6)
            w = np.where(rng.random(n) < 0.5, -1.0, 1.0).astype(np.float32)
            out[:] = np.concatenate([v, w[:, None]], axis=1).astype(out.dtype)
        elif kind == "INDICES":
            # Window-local triples: each triangle's three vertices come from
            # a small window of the position ribbon (small triangles).
            n_tri = -(-n // 3)
            w = INDEX_WINDOW
            base = rng.integers(0, max(n_pos - w, 1), n_tri)
            idx = (np.repeat(base, 3)[:n]
                   + rng.integers(0, w, n)).astype(np.int64)
            out[:, 0] = np.minimum(idx, max(n_pos - 1, 0)).astype(out.dtype)
        elif kind.startswith("TEXCOORD"):
            out[:] = rng.random((n, out.shape[1]), np.float32).astype(out.dtype)
        else:  # COLOR_*, WEIGHTS_*, anything else: benign constants
            out[:] = np.ones_like(out) if out.dtype == np.float32 else 0

    for mesh_idx, mesh in enumerate(gltf.get("meshes", [])):
        w = mesh_world.get(mesh_idx, np.eye(4))
        try:
            inv_w = np.linalg.inv(w)
        except np.linalg.LinAlgError:
            inv_w = np.eye(4)
        for prim in mesh.get("primitives", []):
            attrs = prim.get("attributes", {})
            n_pos = (
                gltf["accessors"][attrs["POSITION"]]["count"]
                if "POSITION" in attrs else 0
            )
            for name, a in attrs.items():
                fill(a, "POSITION" if name == "POSITION" else name)
            fill(prim.get("indices"), "INDICES", n_pos=n_pos)
    return bytes(buf)


def materialize(out_dir: str, scene_dir: str = SPONZA_DIR,
                gltf_name: Optional[str] = None, seed: int = 0) -> str:
    """Build a loadable copy of ``scene_dir`` in ``out_dir``: the glTF JSON
    is copied, texture dirs are symlinked, and the missing buffer is
    generated.  Returns the path of the glTF.  Idempotent (seeded)."""
    os.makedirs(out_dir, exist_ok=True)
    if gltf_name is None:
        names = [f for f in os.listdir(scene_dir) if f.endswith(".gltf")]
        assert len(names) == 1, names
        gltf_name = names[0]
    src = os.path.join(scene_dir, gltf_name)
    with open(src) as f:
        gltf = json.load(f)

    dst = os.path.join(out_dir, gltf_name)
    if not os.path.exists(dst):
        with open(dst, "w") as f:
            json.dump(gltf, f)
    for entry in os.listdir(scene_dir):
        p = os.path.join(scene_dir, entry)
        link = os.path.join(out_dir, entry)
        if os.path.isdir(p) and not os.path.exists(link):
            os.symlink(p, link)

    uri = gltf["buffers"][0]["uri"]
    bin_path = os.path.join(out_dir, uri)
    # The stamp records what the cached .bin was generated from; a seed or
    # generator change regenerates instead of silently serving stale
    # geometry (ADVICE r4 low).
    stamp_path = bin_path + ".gen.json"
    want = {"seed": int(seed), "version": GENERATOR_VERSION}
    have = None
    if os.path.exists(stamp_path):
        try:
            with open(stamp_path) as f:
                have = json.load(f)
        except (OSError, ValueError):
            have = None
    if not os.path.exists(bin_path) or have != want:
        data = generate_bin(gltf, seed=seed)
        tmp = bin_path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, bin_path)
        with open(stamp_path, "w") as f:
            json.dump(want, f)
    return dst


def sponza_standin(cache_dir: Optional[str] = None) -> str:
    """The sponza-new stand-in, built once into a per-user cache dir."""
    if cache_dir is None:
        base = (os.environ.get("XDG_CACHE_HOME")
                or os.path.expanduser("~/.cache"))
        cache_dir = os.path.join(base, "ptx-scenes", "sponza-new")
    return materialize(cache_dir)
