"""Pallas TPU intersection kernels.

The reference's innermost hot loop is the per-leaf triangle sweep
(``geometry/triangle.cpp:120-190`` driven by ``mesh.cpp:376-401``).  On TPU
the equivalent "speed-of-light" shape is a fused [ray-block x tri-tile]
Moller-Trumbore sweep living entirely in VMEM:

* grid = (R/RB, N/TT): ray blocks stay resident while triangle tiles stream
  HBM -> VMEM (Pallas double-buffers the tile fetches automatically),
* the [RB, TT] intersection matrix never touches HBM — the pure-XLA brute
  backend materializes it (hundreds of MB at wavefront sizes), which is why
  it is HBM-bound; here it exists only as VPU registers/VMEM scratch,
* the running (min distance, argmin index) is carried in the output block
  across triangle tiles — the cross-tile reduce analog of the reference's
  per-UUID min map (``intersection_worker.cpp:78-110``).

The kernel returns (t, winning triangle index); barycentrics are recomputed
for the single winning triangle outside the kernel (one MT evaluation per
ray — cheaper than gathering them across lanes inside).

Layout: rays ride the *sublane* axis (RB = 256 rows), triangles the *lane*
axis (TT = 512 columns); per-component broadcasts are [RB,1] x [1,TT] fused
multiply-adds on the VPU.  Triangle SoA is packed as a [16, N] matrix (rows
0-8 = a, e1, e2 components; 16 for sublane alignment).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ptx import geometry
from ptx import math as pmath
from ptx.scene.flatten import FlatScene, SceneStatic

RB = 256  # rays per block (sublanes)
TT = 512  # triangles per tile (lanes)
INF = 3.0e38  # python float: jnp constants can't be captured inside kernels
EPS = float(pmath.EPS)


def _mt_matrix(rays, tris):
    """[RB, TT] Moller-Trumbore distances (INF where no hit).

    ``rays``: [RB, 8] (ox oy oz dx dy dz _ _); ``tris``: [16, TT] (rows:
    ax ay az e1x e1y e1z e2x e2y e2z ...).
    """
    ox, oy, oz = rays[:, 0:1], rays[:, 1:2], rays[:, 2:3]
    dx, dy, dz = rays[:, 3:4], rays[:, 4:5], rays[:, 5:6]
    ax, ay, az = tris[0:1, :], tris[1:2, :], tris[2:3, :]
    e1x, e1y, e1z = tris[3:4, :], tris[4:5, :], tris[5:6, :]
    e2x, e2y, e2z = tris[6:7, :], tris[7:8, :], tris[8:9, :]

    # pvec = dir x e2
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = 1.0 / det
    # tvec = orig - a
    tx = ox - ax
    ty = oy - ay
    tz = oz - az
    beta = (tx * px + ty * py + tz * pz) * inv_det
    # qvec = tvec x e1
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    gamma = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det

    ok = (
        (beta >= -EPS)
        & (beta <= 1.0 + EPS)
        & (gamma >= -EPS)
        & (beta + gamma <= 1.0 + EPS)
        & (t >= 0.0)
        & jnp.isfinite(t)
    )
    return jnp.where(ok, t, INF)


def _tile_gate(rays, boxes_ref, j, best_t):
    """Block-wide tile cull: can ANY lane's ray hit this tile's AABB closer
    than its current best?  Triangles are BVH-ordered (see pack_tris), so a
    512-triangle tile is spatially local and the gate skips most tiles for
    most ray blocks — packet traversal without per-lane divergence."""
    ox, oy, oz = rays[:, 0:1], rays[:, 1:2], rays[:, 2:3]
    dx, dy, dz = rays[:, 3:4], rays[:, 4:5], rays[:, 5:6]
    bx0, by0, bz0 = boxes_ref[j, 0], boxes_ref[j, 1], boxes_ref[j, 2]
    bx1, by1, bz1 = boxes_ref[j, 3], boxes_ref[j, 4], boxes_ref[j, 5]

    def slab(o, d, lo, hi):
        inv = 1.0 / d
        t0 = (lo - o) * inv
        t1 = (hi - o) * inv
        lo_t = jnp.minimum(t0, t1)
        hi_t = jnp.maximum(t0, t1)
        lo_t = jnp.where(jnp.isnan(lo_t), -jnp.inf, lo_t)
        hi_t = jnp.where(jnp.isnan(hi_t), jnp.inf, hi_t)
        return lo_t, hi_t

    lx, hx = slab(ox, dx, bx0, bx1)
    ly, hy = slab(oy, dy, by0, by1)
    lz, hz = slab(oz, dz, bz0, bz1)
    near = jnp.maximum(jnp.maximum(lx, ly), lz)
    far = jnp.minimum(jnp.minimum(hx, hy), hz)
    hit = (far >= jnp.maximum(near, 0.0)) & (near < best_t)
    return jnp.any(hit)


def _closest_kernel(rays_ref, tris_ref, box_ref, t_ref, idx_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        t_ref[:] = jnp.full_like(t_ref, INF)
        idx_ref[:] = jnp.zeros_like(idx_ref)

    @pl.when(_tile_gate(rays_ref[:], box_ref, j, t_ref[:]))
    def _test():
        t = _mt_matrix(rays_ref[:], tris_ref[:])  # [RB, TT]
        tmin = jnp.min(t, axis=1, keepdims=True)  # [RB, 1]
        arg = jnp.argmin(t, axis=1).astype(jnp.int32)[:, None]
        closer = tmin < t_ref[:]
        t_ref[:] = jnp.where(closer, tmin, t_ref[:])
        idx_ref[:] = jnp.where(closer, j * TT + arg, idx_ref[:])


def _any_kernel(rays_ref, tris_ref, box_ref, hit_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        hit_ref[:] = jnp.zeros_like(hit_ref)

    not_done = jnp.any(hit_ref[:] == 0)
    gate = _tile_gate(
        rays_ref[:], box_ref, j,
        jnp.where(hit_ref[:] > 0, -INF, INF),  # settled lanes never gate in
    )

    @pl.when(not_done & gate)
    def _test():
        t = _mt_matrix(rays_ref[:], tris_ref[:])
        any_hit = jnp.any(t < INF, axis=1, keepdims=True)
        hit_ref[:] = hit_ref[:] | any_hit.astype(jnp.int32)


def _pack_rays(orig, dirn):
    r = orig.shape[0]
    r_pad = -(-r // RB) * RB
    rays = jnp.zeros((r_pad, 8), jnp.float32)
    rays = rays.at[:r, 0:3].set(orig)
    rays = rays.at[:r, 3:6].set(dirn)
    # Padding rays get a unit direction so no NaNs flow through the kernel.
    if r_pad > r:
        rays = rays.at[r:, 3].set(1.0)
    return rays, r_pad


def pack_tris(fs: FlatScene):
    """[16, N'] triangle component matrix + [n_tiles, 8] tile AABBs,
    N' padded to the tile size.  Zero columns are degenerate (det = 0 ->
    INF) and never hit; padding-tile boxes are empty (min > max) and never
    pass the gate.

    Expecting BVH-ordered triangles (ptx.accel.build_bvh) for tight tile
    boxes; unordered input stays correct, just culls less.
    """
    n = fs.tri_a.shape[0]
    n_pad = -(-n // TT) * TT
    tris = jnp.zeros((16, n_pad), jnp.float32)
    tris = tris.at[0:3, :n].set(fs.tri_a.T)
    tris = tris.at[3:6, :n].set(fs.tri_e1.T)
    tris = tris.at[6:9, :n].set(fs.tri_e2.T)

    n_tiles = n_pad // TT
    a = tris[0:3].T.reshape(n_tiles, TT, 3)
    b = a + tris[3:6].T.reshape(n_tiles, TT, 3)
    c = a + tris[6:9].T.reshape(n_tiles, TT, 3)
    valid = (
        jnp.arange(n_pad).reshape(n_tiles, TT, 1) < fs.tri_valid.shape[0]
    ) & fs.tri_valid[
        jnp.minimum(jnp.arange(n_pad), fs.tri_valid.shape[0] - 1)
    ].reshape(n_tiles, TT, 1)
    big = jnp.float32(INF)
    lo = jnp.min(jnp.where(valid, jnp.minimum(jnp.minimum(a, b), c), big), axis=1)
    hi = jnp.max(jnp.where(valid, jnp.maximum(jnp.maximum(a, b), c), -big), axis=1)
    boxes = jnp.zeros((n_tiles, 8), jnp.float32)
    boxes = boxes.at[:, 0:3].set(lo)
    boxes = boxes.at[:, 3:6].set(hi)
    return tris, boxes


def _grid_call(kernel, rays, tris, boxes, out_shapes, interpret):
    r_pad = rays.shape[0]
    n_pad = tris.shape[1]
    grid = (r_pad // RB, n_pad // TT)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((RB, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, TT), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # all tile boxes resident
        ],
        out_specs=tuple(
            pl.BlockSpec((RB, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
            for _ in out_shapes
        )
        if len(out_shapes) > 1
        else pl.BlockSpec((RB, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=tuple(out_shapes) if len(out_shapes) > 1 else out_shapes[0],
        interpret=interpret,
    )(rays, tris, boxes)


def closest_pallas(fs: FlatScene, orig, dirn, interpret: bool = False):
    """Closest-hit via the Pallas sweep; returns the Hit attribute payload."""
    from ptx.kernels.intersect import attrs_from_indices

    r = orig.shape[0]
    rays, r_pad = _pack_rays(orig, dirn)
    tris, boxes = pack_tris(fs)
    t, idx = _grid_call(
        _closest_kernel,
        rays,
        tris,
        boxes,
        [
            jax.ShapeDtypeStruct((r_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((r_pad, 1), jnp.int32),
        ],
        interpret,
    )
    t = t[:r, 0]
    tri = idx[:r, 0]
    # Recompute barycentrics for the single winning triangle per ray.
    _, beta, gamma, _ = geometry.moller_trumbore(
        orig, dirn, fs.tri_a[tri], fs.tri_e1[tri], fs.tri_e2[tri]
    )
    hit = t < INF
    return attrs_from_indices(fs, t, tri, beta, gamma, hit)


def any_pallas(fs: FlatScene, orig, dirn, interpret: bool = False):
    r = orig.shape[0]
    rays, r_pad = _pack_rays(orig, dirn)
    tris, boxes = pack_tris(fs)
    hit = _grid_call(
        _any_kernel,
        rays,
        tris,
        boxes,
        [jax.ShapeDtypeStruct((r_pad, 1), jnp.int32)],
        interpret,
    )
    return hit[:r, 0] > 0


def make_backend(static: Optional[SceneStatic] = None, interpret: Optional[bool] = None):
    """(closest, any_hit) pair.  ``interpret`` defaults to True off-TPU so the
    same code path runs (slowly but exactly) in CPU CI."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def closest(fs, orig, dirn):
        return closest_pallas(fs, orig, dirn, interpret)

    def any_hit(fs, orig, dirn):
        return any_pallas(fs, orig, dirn, interpret)

    return closest, any_hit
