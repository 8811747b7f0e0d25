"""Bounding the stochastic-opacity truncation divergence.

The reference re-enqueues opacity passthroughs indefinitely (a passthrough
does not consume a bounce — ``shading_worker.cpp:54-63``), so a ray can cross
arbitrarily many translucent surfaces.  The wavefront loop is
liveness-driven (it exits as soon as every lane is dead) but must carry a
*static* iteration cap for XLA: ``cfg.opacity_extra_iters`` extra trips
beyond ``cfg.bounces``.

The divergence is sharp, not gradual: a ray that transmits through a
``d``-deep stack needs exactly ``d`` passthrough iterations (plus one to
shade what's behind), so a cap ``E >= d`` reproduces the un-truncated result
*bit-for-bit* while ``E < d`` loses that ray's entire remaining
contribution.  What bounds the *image* error in real scenes is the
transmission weighting: reaching crossing ``k`` happens with probability
``(1 - opacity)^k``, so radiance carried past the cap is at most
``(1 - opacity)^E`` of the primary wavefront.  These tests measure both
facts on worst-case stacked-transparency scenes.
"""

import numpy as np
import pytest

from ptx import render as R
from ptx.config import RenderConfig
from ptx.scene.flatten import flatten
from ptx.scene.gltf import CameraData, MaterialData, PrimitiveData, SceneData


def stacked_planes_scene(n_planes, opacity):
    """``n_planes`` full-frame translucent quads stacked along -Z in front of
    an emissive backdrop; the camera looks straight through the stack, so
    every transmitted primary ray crosses exactly ``n_planes`` surfaces."""
    prims = []

    def quad(z, half, mesh, mat):
        positions = np.array(
            [[-half, -half, z], [half, -half, z],
             [half, half, z], [-half, half, z]], np.float32
        )
        normals = np.tile(np.array([0, 0, 1], np.float32), (4, 1))
        uvs = np.zeros((4, 2), np.float32)
        tangents = np.zeros((4, 4), np.float32)
        tangents[:, 0] = 1.0
        tangents[:, 3] = 1.0
        indices = np.array([[0, 1, 2], [0, 2, 3]], np.uint32)
        return PrimitiveData(
            mesh_name=mesh, prim_index=0, positions=positions,
            normals=normals, uvs=uvs, tangents=tangents, indices=indices,
            material=mat, world_basis=np.eye(3, dtype=np.float32),
            world_origin=np.zeros(3, np.float32),
        )

    for i in range(n_planes):
        prims.append(quad(-float(i + 1), 30.0, f"plane{i}", 0))
    prims.append(quad(-float(n_planes + 2), 60.0, "backdrop", 1))

    materials = [
        MaterialData(name="veil", albedo=(0.0, 0.0, 0.0), opacity=opacity,
                     roughness=1.0, metallic=0.0, emissive=(0.0, 0.0, 0.0)),
        MaterialData(name="glow", albedo=(0.0, 0.0, 0.0), opacity=1.0,
                     roughness=1.0, metallic=0.0, emissive=(1.0, 0.5, 0.25)),
    ]
    camera = CameraData(
        yfov=0.6,
        world_basis=np.eye(3, dtype=np.float32),
        world_origin=np.array([0.0, 0.0, 4.0], np.float32),
    )
    scene = SceneData(
        primitives=prims, materials=materials, images=[], camera=camera,
        sun=None,
        mesh_primitive_counts={p.mesh_name: 1 for p in prims},
    )
    return flatten(scene)


def _mean_radiance(fs, static, extra_iters, samples=32):
    cfg = RenderConfig(
        width=8, height=8, samples=samples, bounces=1,
        opacity_extra_iters=extra_iters, intersector="brute",
        environment_factor=(0.0, 0.0, 0.0),
    )
    return R.render(fs, static, cfg).color.mean()


@pytest.mark.parametrize("depth", [2, 6, 12])
def test_cap_at_stack_depth_is_exact_below_it_truncates(depth):
    """E >= depth reproduces the oracle bit-for-bit; E = depth - 1 loses the
    whole transmitted contribution (the divergence is per-ray
    all-or-nothing)."""
    fs, static = stacked_planes_scene(depth, opacity=0.3)
    assert static.has_translucent
    oracle = _mean_radiance(fs, static, extra_iters=64)
    assert oracle > 1e-3  # light gets through (pass prob 0.7 per plane)

    exact = _mean_radiance(fs, static, extra_iters=depth)
    truncated = _mean_radiance(fs, static, extra_iters=depth - 1)
    assert exact == oracle
    assert truncated == 0.0


def test_transmission_weighting_bounds_real_scene_error():
    """In a transmission-weighted mix of stack depths, the radiance lost to a
    cap E is the deeper-than-E tail: measured divergence must sit under the
    ``(1 - opacity)^E`` envelope and shrink monotonically with E."""
    opacity = 0.5
    depths = [2, 6, 12]
    scenes = [stacked_planes_scene(d, opacity) for d in depths]
    oracles = [_mean_radiance(fs, st, extra_iters=64) for fs, st in scenes]
    total = sum(oracles)
    assert total > 0

    errs = {}
    for extra in (4, 8, 16):
        vals = [_mean_radiance(fs, st, extra_iters=extra)
                for fs, st in scenes]
        errs[extra] = (total - sum(vals)) / total
    # Monotone improvement, envelope respected, converged by E=16.
    assert errs[4] >= errs[8] >= errs[16] == 0.0
    assert errs[4] > 0.0  # the 6- and 12-deep stacks truncate at E=4
    for extra in (4, 8):
        # Lost radiance <= transmission past E crossings, relative to the
        # *shallowest* stack's transmission that dominates the total.
        envelope = (1 - opacity) ** extra / (1 - opacity) ** min(depths)
        assert errs[extra] <= envelope


def test_default_cap_is_safe_for_a_deep_stack():
    """The shipped default absorbs a 16-deep stack exactly."""
    fs, static = stacked_planes_scene(16, opacity=0.3)
    default = RenderConfig().opacity_extra_iters
    assert default >= 17
    oracle = _mean_radiance(fs, static, extra_iters=64, samples=16)
    got = _mean_radiance(fs, static, extra_iters=default, samples=16)
    assert got == oracle
