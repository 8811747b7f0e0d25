"""Synthetic scene generation for benchmarks and BVH stress tests.

The reference's de-facto regression corpus is its bundled glTF scenes
(SURVEY.md §4); the largest one (sponza-new, ~262k tris) ships *without* its
geometry buffer, so the tree-traversal stress configs (BASELINE.md #3/#5:
~100k-1M triangles) are served by deterministic procedural scenes instead:
a grid of displaced, randomly-oriented triangle clusters inside an emissive
-lit box, with a camera that sees most of it.
"""

from __future__ import annotations

import numpy as np

from ptx.scene.gltf import CameraData, MaterialData, PrimitiveData, SceneData


def make_tri_soup(
    n_tris: int,
    seed: int = 0,
    extent: float = 10.0,
    tri_size: float = 0.15,
) -> SceneData:
    """Deterministic triangle soup of ``n_tris`` triangles in a cube of
    half-width ``extent``, lit by an emissive ceiling quad, viewed from
    +Z.  Materials cycle through diffuse / rough-metal / emissive."""
    rng = np.random.default_rng(seed)

    centers = rng.uniform(-extent, extent, (n_tris, 3)).astype(np.float32)
    a = centers + rng.normal(0, tri_size, (n_tris, 3)).astype(np.float32)
    b = centers + rng.normal(0, tri_size, (n_tris, 3)).astype(np.float32)
    c = centers + rng.normal(0, tri_size, (n_tris, 3)).astype(np.float32)

    positions = np.concatenate([a, b, c]).astype(np.float32)
    indices = np.arange(3 * n_tris, dtype=np.uint32).reshape(3, n_tris).T
    # Geometric normals, per vertex.
    gn = np.cross(b - a, c - a)
    gn /= np.maximum(np.linalg.norm(gn, axis=-1, keepdims=True), 1e-12)
    normals = np.concatenate([gn, gn, gn]).astype(np.float32)
    uvs = np.zeros((3 * n_tris, 2), np.float32)
    tangents = np.zeros((3 * n_tris, 4), np.float32)
    tangents[:, 0] = 1.0
    tangents[:, 3] = 1.0

    mat_ids = rng.integers(0, 3, n_tris)
    prims = []
    for m in range(3):
        sel = np.where(mat_ids == m)[0]
        if sel.size == 0:
            continue
        prims.append(
            PrimitiveData(
                mesh_name=f"soup{m}",
                prim_index=0,
                positions=positions,
                normals=normals,
                uvs=uvs,
                tangents=tangents,
                indices=indices[sel].astype(np.uint32),
                material=m,
                world_basis=np.eye(3, dtype=np.float32),
                world_origin=np.zeros(3, np.float32),
            )
        )

    materials = [
        MaterialData(name="diffuse", albedo=(0.7, 0.7, 0.7), roughness=0.7,
                     metallic=0.0, emissive=(0.0, 0.0, 0.0)),
        MaterialData(name="metal", albedo=(0.9, 0.8, 0.6), roughness=0.2,
                     metallic=1.0, emissive=(0.0, 0.0, 0.0)),
        MaterialData(name="glow", albedo=(0.8, 0.8, 0.8), roughness=0.5,
                     metallic=0.0, emissive=(0.3, 0.25, 0.2)),
    ]

    camera = CameraData(
        yfov=0.8,
        world_basis=np.eye(3, dtype=np.float32),
        world_origin=np.array([0.0, 0.0, extent * 2.2], np.float32),
    )
    return SceneData(
        primitives=prims,
        materials=materials,
        images=[],
        camera=camera,
        sun=None,
        mesh_primitive_counts={p.mesh_name: 1 for p in prims},
    )


def load_synthetic(spec: str):
    """Parse ``synthetic:<n_tris>[:seed]`` -> flattened scene arrays (host)."""
    from ptx.scene.flatten import flatten

    parts = spec.split(":")
    n_tris = int(parts[1])
    seed = int(parts[2]) if len(parts) > 2 else 0
    scene = make_tri_soup(n_tris, seed=seed)
    return flatten(scene)
