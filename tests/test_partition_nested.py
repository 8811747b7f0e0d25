"""Partitioner/loader agreement on NESTED scene graphs (VERDICT r3 #7).

The reference partitioner walks only ``scene.nodes`` (root level,
``preprocessor.py:37-49``) while its loader recurses into children
(``load_gltf.cpp:62-140``) — child-node meshes would never be assigned and
every worker's filter would silently drop them.  ptx diverges deliberately:
``partition.split_scene`` walks the SAME DFS pre-order as ``gltf.load``, so
shards are exhaustive and disjoint on any tree shape, and distinct meshes
sharing a name (which the name-keyed scene_work contract cannot represent)
fail loud instead of silently mis-sharding.
"""

import json
import os
import shutil

import pytest

from ptx.parallel import partition
from ptx.scene import gltf as G

CORNELL = "/root/reference/path-tracer-core/scenes/cornell-box/cornell.gltf"


def _nested_cornell(tmp_path) -> str:
    """Cornell with every former root mesh node re-parented under one
    identity 'group' node — same world geometry, nested graph."""
    with open(CORNELL) as f:
        doc = json.load(f)
    base = os.path.dirname(CORNELL)
    shutil.copy(os.path.join(base, doc["buffers"][0]["uri"]), tmp_path)

    scene = doc["scenes"][doc.get("scene", 0)]
    mesh_roots = [i for i in scene["nodes"] if "mesh" in doc["nodes"][i]]
    other_roots = [i for i in scene["nodes"] if "mesh" not in doc["nodes"][i]]
    group_idx = len(doc["nodes"])
    doc["nodes"].append({"name": "group", "children": mesh_roots})
    scene["nodes"] = [group_idx] + other_roots

    path = str(tmp_path / "nested.gltf")
    with open(path, "w") as f:
        json.dump(doc, f)
    return path


def test_nested_shards_are_exhaustive_and_disjoint(tmp_path):
    path = _nested_cornell(tmp_path)
    split = partition.split_scene(path, num_workers=2)
    assert len(split.split_work) >= 2
    seen = set()
    for shard in split.split_work.values():
        for name, prims in shard.work.items():
            for p in prims:
                assert (name, p) not in seen
                seen.add((name, p))
    # All 7 cornell primitives assigned despite living one level deep.
    assert len(seen) == 7


def test_nested_union_of_partial_loads_covers_the_scene(tmp_path):
    path = _nested_cornell(tmp_path)
    full = G.load(path)
    assert len(full.primitives) == 7  # loader recurses: nothing lost

    split = partition.split_scene(path, num_workers=2)
    loaded = [
        G.load(path, scene_work=shard.work)
        for shard in split.split_work.values()
    ]
    assert sum(len(s.primitives) for s in loaded) == len(full.primitives)
    for s in loaded:
        assert 0 < len(s.primitives) < len(full.primitives)


def test_distinct_meshes_sharing_a_name_fail_loud(tmp_path):
    with open(CORNELL) as f:
        doc = json.load(f)
    base = os.path.dirname(CORNELL)
    shutil.copy(os.path.join(base, doc["buffers"][0]["uri"]), tmp_path)
    names = [m.get("name") for m in doc["meshes"]]
    assert len(set(names)) == len(names)
    doc["meshes"][1]["name"] = doc["meshes"][0]["name"]

    path = str(tmp_path / "collide.gltf")
    with open(path, "w") as f:
        json.dump(doc, f)
    with pytest.raises(ValueError, match="share the name"):
        partition.split_scene(path, num_workers=2)


def test_random_nested_graphs_shard_exhaustively(tmp_path):
    """Fuzz: random node trees (meshes at arbitrary depth, multi-primitive
    meshes, childless groups, camera mixed in) must always produce
    exhaustive, disjoint shards matching the loader's own walk."""
    import numpy as np

    rng = np.random.default_rng(11)
    with open(CORNELL) as f:
        base = json.load(f)
    shutil.copy(
        os.path.join(os.path.dirname(CORNELL), base["buffers"][0]["uri"]),
        tmp_path,
    )

    for trial in range(6):
        doc = json.loads(json.dumps(base))
        nodes = doc["nodes"]
        scene = doc["scenes"][doc.get("scene", 0)]
        mesh_nodes = [i for i in scene["nodes"] if "mesh" in nodes[i]]
        other = [i for i in scene["nodes"] if "mesh" not in nodes[i]]
        # Random forest: each mesh node hangs off the root list or a random
        # earlier group node, up to a few levels deep.
        groups = []
        roots = list(other)
        for i in mesh_nodes:
            if groups and rng.random() < 0.6:
                parent = int(rng.choice(groups))
                nodes[parent].setdefault("children", []).append(i)
            elif rng.random() < 0.5:
                g = len(nodes)
                nodes.append({"name": f"g{trial}_{g}"})
                groups.append(g)
                roots.append(g)
                nodes[g].setdefault("children", []).append(i)
            else:
                roots.append(i)
        scene["nodes"] = roots

        path = str(tmp_path / f"fuzz{trial}.gltf")
        with open(path, "w") as f:
            json.dump(doc, f)

        n_workers = int(rng.integers(1, 5))
        split = partition.split_scene(path, num_workers=n_workers)
        assigned = [
            (name, p)
            for s in split.split_work.values()
            for name, prims in s.work.items()
            for p in prims
        ]
        assert len(assigned) == 7, f"trial {trial}: {assigned}"
        assert len(set(assigned)) == 7

        full = G.load(path)
        loaded = sum(
            len(G.load(path, scene_work=s.work).primitives)
            for s in split.split_work.values()
        )
        assert loaded == len(full.primitives) == 7, f"trial {trial}"
