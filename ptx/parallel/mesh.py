"""Device mesh setup and the sharding planner.

Replaces the reference's orchestration layer (L4): the preprocessor Lambda
that sized the worker fleet from a memory budget and fanned out async invokes
(``app.py:77-155``, ``preprocessor.py:64-69``) becomes a host-side *planner*
that inspects scene size vs per-chip HBM and picks a mesh shape:

* ``dp`` (ray/tile axis)   — the reference's sample/pixel parallelism: rays
  sharded across chips, scene replicated, no per-ray collective.
* ``tp`` (scene axis)      — the reference's scene/geometry parallelism:
  triangles sharded, every chip intersects the whole ray wavefront against
  its shard, hits min-reduced over ICI (the SNS/SQS design of W5, done for
  real).

No control plane is needed — SPMD replaces async Lambda invokes, and
``jax.distributed.initialize`` + the mesh replaces the SNS topic / SQS queue
fabric (``app.py:12-75``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_RAYS = "dp"
AXIS_SCENE = "tp"

# Bytes per triangle across the FlatScene SoA arrays:
# 3x tri (a/e1/e2) + 3x normal + 3x tangent = 9 vec3 + 3 uv (vec2) = 33 f32
# + mat_id i32 + valid byte.
_BYTES_PER_TRI = 33 * 4 + 4 + 1


@dataclasses.dataclass(frozen=True)
class Plan:
    """Execution plan: mesh shape and whether the scene is sharded."""

    dp: int
    tp: int
    scene_sharded: bool

    @property
    def n_devices(self) -> int:
        return self.dp * self.tp


def scene_bytes(n_tris: int, n_texels: int = 0) -> int:
    return n_tris * _BYTES_PER_TRI + n_texels * 16


def plan(
    n_tris: int,
    n_devices: Optional[int] = None,
    n_texels: int = 0,
    hbm_bytes_per_chip: int = 16 * 2**30,
    scene_budget_fraction: float = 0.25,
    force_tp: Optional[int] = None,
) -> Plan:
    """Choose a mesh shape (the ``get_split_scene`` decision of
    ``preprocessor.py:64-69``, driven by HBM instead of Lambda memory).

    The scene is replicated while it fits in ``scene_budget_fraction`` of a
    chip's HBM (pure ray parallelism — fastest); otherwise the scene axis
    grows by powers of two until each shard fits.
    """
    if n_devices is None:
        n_devices = jax.device_count()
    if force_tp is not None:
        tp = force_tp
    else:
        budget = hbm_bytes_per_chip * scene_budget_fraction
        tp = 1
        while scene_bytes(n_tris // tp, n_texels) > budget and tp < n_devices:
            tp *= 2
    tp = min(tp, n_devices)
    while n_devices % tp:
        tp += 1  # round up to the next divisor to keep the mesh rectangular
    return Plan(dp=n_devices // tp, tp=tp, scene_sharded=tp > 1)


def make_mesh(p: Plan, devices: Optional[Sequence] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()[: p.n_devices]
    arr = np.asarray(devices).reshape(p.dp, p.tp)
    return Mesh(arr, (AXIS_RAYS, AXIS_SCENE))


def scene_shardings(mesh: Mesh, scene_sharded: bool):
    """Per-leaf PartitionSpecs for a FlatScene: triangle-indexed arrays split
    along the scene axis, the rest (materials, textures, camera) replicated."""
    from ptx.scene.flatten import FlatScene

    tri_fields = {
        "tri_a", "tri_e1", "tri_e2", "tri_valid",
        "n0", "n1", "n2", "t0", "t1", "t2",
        "uv0", "uv1", "uv2", "mat_id", "tri_attrs",
    }
    spec = {}
    for field in FlatScene._fields:
        if scene_sharded and field in tri_fields:
            spec[field] = P(AXIS_SCENE)
        else:
            spec[field] = P()
    return FlatScene(**spec)


def shard_scene(fs, mesh: Mesh, scene_sharded: bool):
    """Place a FlatScene on the mesh according to the plan."""
    specs = scene_shardings(mesh, scene_sharded)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), fs, specs
    )
