"""Scene partitioner — the sharding planner of the preprocessor Lambda.

Re-implements O5 (``preprocessor-function/preprocess/preprocessor.py:14-111``)
against the local filesystem: walk the glTF scene's nodes, estimate each
primitive's memory footprint (vertex/index buffer-view byte lengths plus the
byte size of every texture its material references — the reference issues an
S3 ``head_object`` per texture; we ``stat`` the file), and greedily assign
primitives to workers by either a per-worker memory budget or an equal
primitive count.

The output ``{worker_id: {mesh_name: [primitive ids]}}`` feeds
``ptx.scene.gltf.load(scene_work=...)`` — the same contract as the
reference's ``worker_info.scene_work`` payload
(``src/models/work_info.hpp:11-15``) — and, on-device, drives which triangle
ranges land on which mesh axis shard.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Optional


@dataclasses.dataclass
class WorkerShard:
    work: Dict[str, List[int]]  # mesh name -> primitive indices
    total_size_gb: float


@dataclasses.dataclass
class SplitScene:
    split_work: Dict[int, WorkerShard]
    total_size_gb: float

    def to_json(self) -> str:
        return json.dumps(
            {
                "split_work": {
                    k: {"work": v.work, "total_size": v.total_size_gb}
                    for k, v in self.split_work.items()
                },
                "total_size": self.total_size_gb,
            }
        )


def _texture_size(gltf: dict, base_dir: str, tex_info) -> int:
    """File size of the texture's image (reference ``get_texture_size``,
    ``preprocessor.py:104-111``, S3 head_object -> local stat)."""
    if not tex_info:
        return 0
    tex = gltf.get("textures", [])[tex_info["index"]]
    src = tex.get("source")
    if src is None:
        return 0
    uri = gltf["images"][src].get("uri")
    if not uri or uri.startswith("data:"):
        return 0
    path = os.path.join(base_dir, uri)
    try:
        return os.stat(path).st_size
    except OSError:
        return 0


def _primitive_size(gltf: dict, base_dir: str, prim: dict) -> int:
    """Vertex-attribute buffer views + material texture bytes
    (reference ``get_primitive_size``, ``preprocessor.py:77-102``)."""
    views = gltf.get("bufferViews", [])
    accessors = gltf.get("accessors", [])

    def attr_size(acc_idx) -> int:
        if acc_idx is None:
            return 0
        acc = accessors[acc_idx]
        if "bufferView" not in acc:
            return 0
        return views[acc["bufferView"]].get("byteLength", 0)

    attrs = prim.get("attributes", {})
    size = sum(
        attr_size(attrs.get(k))
        for k in ("POSITION", "NORMAL", "TANGENT", "TEXCOORD_0")
    )

    mat_idx = prim.get("material")
    if mat_idx is not None:
        mat = gltf["materials"][mat_idx]
        pbr = mat.get("pbrMetallicRoughness", {})
        size += sum(
            _texture_size(gltf, base_dir, t)
            for t in (
                mat.get("normalTexture"),
                mat.get("occlusionTexture"),
                mat.get("emissiveTexture"),
                pbr.get("baseColorTexture"),
                pbr.get("metallicRoughnessTexture"),
            )
        )
    return size


def split_scene(
    path: str,
    num_workers: Optional[int] = 1,
    memory_per_worker_gb: Optional[float] = None,
) -> SplitScene:
    """Greedy primitive assignment (reference ``get_split_scene``,
    ``preprocessor.py:26-75``): advance to the next worker when either the
    per-worker memory budget or the equal-count threshold is reached."""
    if num_workers is not None and num_workers < 1:
        raise ValueError(f"num_workers must be >= 1, got {num_workers}")
    if memory_per_worker_gb is not None and memory_per_worker_gb <= 0:
        raise ValueError("memory_per_worker_gb must be positive")
    base_dir = os.path.dirname(os.path.abspath(path))
    with open(path) as f:
        gltf = json.load(f)

    scene = gltf["scenes"][gltf.get("scene", 0)]
    nodes = gltf.get("nodes", [])
    meshes = gltf.get("meshes", [])

    # Pass 1: total primitive count over *root* nodes with meshes (the
    # reference only walks scene.nodes, not children — preserved).
    total_primitives = sum(
        len(meshes[nodes[i]["mesh"]].get("primitives", []))
        for i in scene.get("nodes", [])
        if "mesh" in nodes[i]
    )

    split: Dict[int, WorkerShard] = {}
    worker_id = 1
    current_size = 0.0
    current_primitive = 0
    total_size = 0.0

    for node_idx in scene.get("nodes", []):
        node = nodes[node_idx]
        if "mesh" not in node:
            continue
        mesh = meshes[node["mesh"]]
        mesh_name = mesh.get("name", f"mesh{node['mesh']}")
        for prim_id, prim in enumerate(mesh.get("primitives", [])):
            current_primitive += 1
            prim_size = _primitive_size(gltf, base_dir, prim) * 1e-9
            total_size += prim_size

            shard = split.setdefault(worker_id, WorkerShard(work={}, total_size_gb=0.0))
            shard.work.setdefault(mesh_name, []).append(prim_id)
            shard.total_size_gb += prim_size

            over_memory = (
                memory_per_worker_gb is not None
                and (current_size + prim_size) >= memory_per_worker_gb
            )
            over_count = (
                num_workers is not None
                and current_primitive >= total_primitives / num_workers
            )
            if over_memory or over_count:
                worker_id += 1
                current_size = 0.0
                current_primitive = 0
            else:
                current_size += prim_size

    return SplitScene(split_work=split, total_size_gb=total_size)
