"""Pallas TPU intersection kernels.

The reference's innermost hot loop is the per-leaf triangle sweep
(``geometry/triangle.cpp:120-190`` driven by the KD-tree walk at
``mesh.cpp:300-401``).  The TPU-native equivalent is a *block traversal*:

1. Triangles are BVH-ordered (``ptx.accel``), so a TT-wide tile of
   consecutive triangles is spatially local and has a tight AABB
   (``pack_tris``).
2. An XLA pre-pass (``_plan_tiles``) slab-tests every ray against every tile
   box, reduces to per-[ray-block x tile] gates, and sorts each block's
   surviving tiles front-to-back by entry distance.  This is the per-ray
   KD/BVH walk hoisted to block granularity, where the TPU can do it as one
   dense [R, T] vector op instead of a divergent per-lane tree walk.
3. The Pallas kernel consumes the plan via *scalar prefetch*: the triangle
   BlockSpec's index map reads the next tile id for this ray block from
   SMEM, so only gated tiles are ever DMA'd HBM->VMEM (skipped steps repeat
   the previous index and cost no copy); a block-level early-exit
   (this tile's min entry >= the block's worst best-hit) reproduces the
   reference's front-to-back ``dist <= max_dist`` pruning
   (``mesh.cpp:336-369``).
4. Inside a visited tile, a fused [RB x TT] Baldwin-Weber test matrix
   (precomputed per-triangle plane + barycentric rows — measured 1.29x over
   Moller-Trumbore on the instruction-issue-bound kernel, tools/bw_mt.py)
   lives entirely in VMEM/registers; the running (min distance, argmin
   triangle) is carried in the output block across tiles — the cross-tile
   analog of the reference's per-UUID min map
   (``intersection_worker.cpp:78-110``).

Rays ride the *sublane* axis (RB rows), triangles the *lane* axis (TT
columns); per-component broadcasts are [RB,1] x [1,TT] fused multiply-adds
on the VPU.  Barycentrics are recomputed for the single winning triangle
outside the kernel (one MT evaluation per ray — cheaper than gathering them
across lanes inside).

Block coherence (and therefore culling quality) is the caller's job: see
``ptx.kernels.sorting`` (per-bounce morton sort + dead-ray parking).
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

RB = 128  # rays per block (sublanes; 128 beat 256/64 on the jack sweep)
TT = 512  # triangles per tile (lanes)
INF = 3.0e38  # python float: jnp constants can't be captured inside kernels
EPS = float(pmath.EPS)


def _test_matrix(rays, tris):
    """[RB, TT] ray-triangle hit distances (INF where no hit) via the
    Baldwin-Weber precomputed-transform test.

    ``rays``: [RB, 8] (ox oy oz dx dy dz _ _); ``tris``: [16, TT] packed by
    :func:`_bw_rows` (rows 0-2 unit plane normal, 3 plane d, 4-7/8-11 the
    barycentric rows T1/T2 of inv([e1 e2 n]) with translation).

    Measured 1.29x over the Moller-Trumbore formulation on the 262k-tri
    sweep (tools/bw_mt.py): the kernel is instruction-issue-bound and BW is
    ~29 vector instructions per element vs MT's ~45, for 12 floats/tri
    instead of 9 (both fit the 16-row tile DMA unit).  The kernel only
    SELECTS the winner (t is truncated to 14 mantissa bits by the packed-min
    key regardless); exact t/barycentrics come from the epilogue's
    Moller-Trumbore recompute, so BW's slightly different edge rounding can
    flip near-ties only — same class of flips the packed key already makes.

    The exact VPU divide costs ~5% of the whole sweep (measured); one Newton
    step on the hardware reciprocal estimate restores f32 accuracy.  No
    isfinite() term: a degenerate (zeroed) column makes n.dir = 0, t/beta
    NaN, and every NaN comparison is False, so ``ok`` already rejects it.
    """
    ox, oy, oz = rays[:, 0:1], rays[:, 1:2], rays[:, 2:3]
    dx, dy, dz = rays[:, 3:4], rays[:, 4:5], rays[:, 5:6]
    nx, ny, nz, d = tris[0:1], tris[1:2], tris[2:3], tris[3:4]
    t1x, t1y, t1z, t1w = tris[4:5], tris[5:6], tris[6:7], tris[7:8]
    t2x, t2y, t2z, t2w = tris[8:9], tris[9:10], tris[10:11], tris[11:12]

    nd = nx * dx + ny * dy + nz * dz
    no = nx * ox + ny * oy + nz * oz + d
    r0 = pl.reciprocal(nd, approx=True)
    inv = r0 * (2.0 - nd * r0)
    t = -(no * inv)
    px = ox + t * dx
    py = oy + t * dy
    pz = oz + t * dz
    beta = t1x * px + t1y * py + t1z * pz + t1w
    gamma = t2x * px + t2y * py + t2z * pz + t2w
    ok = (
        (jnp.minimum(beta, gamma) >= -EPS)
        & (beta <= 1.0 + EPS)
        & (beta + gamma <= 1.0 + EPS)
        & (t >= 0.0)
    )
    return jnp.where(ok, t, INF)


def _bw_rows(a, e1, e2, xp):
    """[12, N] Baldwin-Weber component rows for :func:`_test_matrix`.

    Rows 0-2: UNIT plane normal (normalized: an unnormalized sliver normal
    amplifies cancellation in n.o + d enough to flip winners by far more
    than the packed-min truncation — measured 0.23 vs 0.05 max relative
    winner-t divergence on the 262k random soup, tools/bw_mt.py), row 3:
    plane d, rows 4-7 / 8-11: barycentric rows T1/T2 of inv([e1 e2 n]) with
    translation.  Degenerate triangles zero out entirely: n.dir = 0 makes t
    NaN and the kernel mask rejects NaN columns.

    ``xp`` is numpy (attach_tiles, host-side) or jax.numpy (pack_tris,
    traced for scene-sharded in-call packs).
    """
    f32 = xp.float32
    n = xp.cross(e1, e2)
    nl = xp.sqrt(xp.sum(n * n, axis=1, keepdims=True))
    ok = nl[:, 0] > f32(1e-30)
    safe = xp.maximum(nl, f32(1e-30))
    nn = n / safe
    d = -xp.einsum("ij,ij->i", nn, a)
    # Closed-form rows of inv([e1 e2 nn]): row_i = cross of the other two
    # columns over det, and det = e1.(e2 x nn) = (e1 x e2).nn = |e1 x e2|.
    # (A generic batched linalg.inv cost 63 ms per traced in-call pack on
    # TPU — the scene-sharded sweeps pack per call.)
    t1 = xp.cross(e2, nn) / safe
    t2 = xp.cross(nn, e1) / safe
    t1w = -xp.einsum("ij,ij->i", t1, a)
    t2w = -xp.einsum("ij,ij->i", t2, a)
    zero = xp.zeros_like(d)
    rows = xp.stack([
        *(xp.where(ok, nn[:, i], zero) for i in range(3)),
        xp.where(ok, d, zero),
        *(xp.where(ok, t1[:, i], zero) for i in range(3)),
        xp.where(ok, t1w, zero),
        *(xp.where(ok, t2[:, i], zero) for i in range(3)),
        xp.where(ok, t2w, zero),
    ])
    return rows.astype(xp.float32)


def pack_tris(fs: FlatScene):
    """[n_tiles, 16, TT] tile-major triangle component stack (each tile one
    contiguous 32 KB DMA unit; rows 0-11 = Baldwin-Weber components
    (:func:`_bw_rows`), 16 rows for sublane alignment) + [n_tiles, 8] tile
    AABBs.  Zero columns are degenerate (n.dir = 0 -> NaN -> rejected) and
    never hit.  NOTE: a padding tile's inverted box (min > max) does NOT
    cull — the slab test's per-axis min/max swap makes an inverted box
    equivalent to all-space, so it gates in for *every* ray (ADVICE r4).
    Harmless: its one grind per block is idempotent (all-degenerate
    columns) and sorts at near=0, but don't rely on empty boxes gating out.

    Expecting BVH-ordered triangles (ptx.accel.build_bvh) for tight tile
    boxes; unordered input stays correct, just culls less.
    """
    n = fs.tri_a.shape[0]
    n_pad = -(-n // TT) * TT
    pad = n_pad - n
    a_p = jnp.concatenate(
        [fs.tri_a, jnp.zeros((pad, 3), jnp.float32)]
    ) if pad else fs.tri_a
    e1_p = jnp.concatenate(
        [fs.tri_e1, jnp.zeros((pad, 3), jnp.float32)]
    ) if pad else fs.tri_e1
    e2_p = jnp.concatenate(
        [fs.tri_e2, jnp.zeros((pad, 3), jnp.float32)]
    ) if pad else fs.tri_e2
    tris = jnp.zeros((16, n_pad), jnp.float32)
    tris = tris.at[0:12].set(_bw_rows(a_p, e1_p, e2_p, jnp))

    n_tiles = n_pad // TT
    a = a_p.reshape(n_tiles, TT, 3)
    b = (a_p + e1_p).reshape(n_tiles, TT, 3)
    c = (a_p + e2_p).reshape(n_tiles, TT, 3)
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
    tiles = tris.reshape(16, n_tiles, TT).transpose(1, 0, 2)
    return tiles, boxes


def attach_tiles(fs: FlatScene) -> FlatScene:
    """Attach pre-packed traversal tiles to the scene (``fs.ptiles`` /
    ``fs.pboxes``) so per-call sweeps skip the 16-row repack — called once
    from ``ptx.render.ensure_accel`` after the BVH ordering is final.

    Pure numpy: the pack is transposes + min/max + batched 3x3 inverses, and
    doing it eagerly with jnp would dispatch ~20 individually-compiled ops
    through the device (minutes of one-time compile on a tunneled TPU vs
    milliseconds here)."""
    import numpy as np

    tri_a = np.asarray(fs.tri_a, np.float32)
    tri_e1 = np.asarray(fs.tri_e1, np.float32)
    tri_e2 = np.asarray(fs.tri_e2, np.float32)
    tri_valid = np.asarray(fs.tri_valid, bool)
    n = tri_a.shape[0]
    n_pad = -(-n // TT) * TT
    n_tiles = n_pad // TT
    pad = n_pad - n
    if pad:
        tri_a = np.concatenate([tri_a, np.zeros((pad, 3), np.float32)])
        tri_e1 = np.concatenate([tri_e1, np.zeros((pad, 3), np.float32)])
        tri_e2 = np.concatenate([tri_e2, np.zeros((pad, 3), np.float32)])
    tris = np.zeros((16, n_pad), np.float32)
    tris[0:12] = _bw_rows(tri_a, tri_e1, tri_e2, np)

    a = tri_a.reshape(n_tiles, TT, 3)
    b = (tri_a + tri_e1).reshape(n_tiles, TT, 3)
    c = (tri_a + tri_e2).reshape(n_tiles, TT, 3)
    valid = np.zeros((n_pad,), bool)
    valid[: tri_valid.shape[0]] = tri_valid
    valid = valid.reshape(n_tiles, TT, 1)
    big = np.float32(INF)
    lo = np.min(np.where(valid, np.minimum(np.minimum(a, b), c), big), axis=1)
    hi = np.max(np.where(valid, np.maximum(np.maximum(a, b), c), -big), axis=1)
    boxes = np.zeros((n_tiles, 8), np.float32)
    boxes[:, 0:3] = lo
    boxes[:, 3:6] = hi
    tiles = np.ascontiguousarray(tris.reshape(16, n_tiles, TT).transpose(1, 0, 2))
    return fs._replace(ptiles=tiles, pboxes=boxes)


def _scene_tiles(fs: FlatScene):
    """The scene's traversal tiles: pre-packed when attached (and packed at
    the current TT), else packed in-call (scene-sharded scenes, tests)."""
    if fs.ptiles.shape[0] > 0 and fs.ptiles.shape[2] == TT:
        return fs.ptiles, fs.pboxes
    return pack_tris(fs)


# Above this tile count the exact per-ray plan (O(rays x tiles)) switches to
# the conservative per-block frustum plan (O(blocks x tiles)).  The exact
# gate is tighter (fewer tiles swept), so it wins while affordable — the
# crossover sits around 2M triangles.
FRUSTUM_PLAN_TILES = 4096


def _frustum_gate(rays, boxes):
    """Conservative per-[block x tile] (gated, min-entry) via interval
    arithmetic over each block's 6D ray bounds.

    Every quantity over-approximates the block's real ray set, so a tile any
    real ray could enter always gates in (results stay exact); ``near_blk``
    lower-bounds every real entry distance (safe for ordering and the
    kernel's early exit).  O(B x T) instead of O(B x RB x T): at 1M
    triangles this is the difference between a ~20 ms and a sub-ms plan.
    """
    r_pad = rays.shape[0]
    nb = r_pad // RB
    o = rays[:, 0:3].reshape(nb, RB, 3)
    d = rays[:, 3:6].reshape(nb, RB, 3)
    olo, ohi = o.min(axis=1)[:, None, :], o.max(axis=1)[:, None, :]  # [B,1,3]
    dlo, dhi = d.min(axis=1)[:, None, :], d.max(axis=1)[:, None, :]

    # Interval reciprocal of the direction range (spanning 0 -> everything).
    pos = dlo > 0.0
    neg = dhi < 0.0
    ilo = jnp.where(pos, 1.0 / dhi, jnp.where(neg, 1.0 / dlo, -jnp.inf))
    ihi = jnp.where(pos, 1.0 / dlo, jnp.where(neg, 1.0 / dhi, jnp.inf))

    def imul(alo, ahi, blo, bhi):
        cands = jnp.stack([alo * blo, alo * bhi, ahi * blo, ahi * bhi])
        lo = jnp.min(jnp.where(jnp.isnan(cands), jnp.inf, cands), axis=0)
        hi = jnp.max(jnp.where(jnp.isnan(cands), -jnp.inf, cands), axis=0)
        return lo, hi

    blo = boxes[None, :, 0:3]  # [1,T,3]
    bhi = boxes[None, :, 3:6]
    # s0 = boxlo - o, s1 = boxhi - o as intervals, then t = s * (1/d).
    t0lo, t0hi = imul(blo - ohi, blo - olo, ilo, ihi)
    t1lo, t1hi = imul(bhi - ohi, bhi - olo, ilo, ihi)
    # Per-axis slab near/far intervals (min/max are monotone).
    tnear_lo = jnp.minimum(t0lo, t1lo)
    tfar_hi = jnp.maximum(t0hi, t1hi)
    near_lo = jnp.max(tnear_lo, axis=-1)  # [B, T]
    far_hi = jnp.min(tfar_hi, axis=-1)
    enter = jnp.maximum(near_lo, 0.0)
    gated = far_hi >= enter
    return gated, jnp.where(gated, enter, INF)


def _exact_gate(rays, boxes):
    """Exact per-ray slab tests reduced to the block level."""
    r_pad = rays.shape[0]
    nb = r_pad // RB
    o = rays[:, 0:3].reshape(nb, RB, 1, 3)
    inv_d = 1.0 / rays[:, 3:6].reshape(nb, RB, 1, 3)
    lo = boxes[None, None, :, 0:3]
    hi = boxes[None, None, :, 3:6]
    t0 = (lo - o) * inv_d
    t1 = (hi - o) * inv_d
    tl = jnp.minimum(t0, t1)
    th = jnp.maximum(t0, t1)
    tl = jnp.where(jnp.isnan(tl), -jnp.inf, tl)
    th = jnp.where(jnp.isnan(th), jnp.inf, th)
    near = jnp.max(tl, axis=-1)  # [B, RB, T]
    far = jnp.min(th, axis=-1)
    enter = jnp.maximum(near, 0.0)
    hit = far >= enter
    near_blk = jnp.min(jnp.where(hit, enter, INF), axis=1)  # [B, T]
    gated = jnp.any(hit, axis=1)  # [B, T]
    return gated, near_blk


# Ray blocks per gate-kernel program: the per-block outputs are [1, T] rows,
# and TPU tiling wants >= 8 sublanes per written block.
GATE_SUB = 8
# Tile-box lanes per inner gate chunk: bounds the kernel's VMEM temps at
# [128, GATE_LANES] regardless of the scene's tile count (a 1M-tri scene has
# 1954 tiles; unbounded [128, T] temps blew the 16 MB scoped-vmem stack).
GATE_LANES = 512


def _exact_gate_kernel(rays_ref, boxest_ref, gated_ref, near_ref):
    """Per-ray slab tests for GATE_SUB ray blocks against ALL tile boxes,
    reduced per block in-kernel.  ``boxest_ref``: [8, T] (rows 0-2 box lo,
    3-5 box hi).  The pure-XLA :func:`_exact_gate` materializes its
    [B, RB, T, 3] broadcast temps through HBM (~20 GB of traffic, 24 ms
    measured at 262k tris); here the [RB, T] planes never leave VMEM."""
    n_tiles = boxest_ref.shape[1]
    n_chunks = n_tiles // GATE_LANES  # caller pads to whole chunks

    # A REAL loop over lane chunks (not a python unroll): Mosaic allocates
    # unrolled iterations their own scoped-vmem stack slots, so an unrolled
    # version blows the 16 MB limit around 1k tiles; the fori body's
    # [128, GATE_LANES] temps are reused across iterations.
    def chunk(i, _):
        box = boxest_ref[:, pl.ds(i * GATE_LANES, GATE_LANES)]  # [8, GL]
        g_rows = []
        n_rows = []
        for s in range(GATE_SUB):
            near_blk = None
            gated = None
            for c in range(RB // 128):
                base = s * RB + c * 128
                rays = rays_ref[base:base + 128, :]
                o = [rays[:, a:a + 1] for a in range(3)]   # [128, 1] each
                inv = [1.0 / rays[:, 3 + a:4 + a] for a in range(3)]
                near = None
                far = None
                for a in range(3):
                    lo = box[a:a + 1, :]                   # [1, GATE_LANES]
                    hi = box[3 + a:4 + a, :]
                    t0 = (lo - o[a]) * inv[a]              # [128, GATE_LANES]
                    t1 = (hi - o[a]) * inv[a]
                    tl = jnp.minimum(t0, t1)
                    th = jnp.maximum(t0, t1)
                    tl = jnp.where(jnp.isnan(tl), -jnp.inf, tl)
                    th = jnp.where(jnp.isnan(th), jnp.inf, th)
                    near = tl if near is None else jnp.maximum(near, tl)
                    far = th if far is None else jnp.minimum(far, th)
                enter = jnp.maximum(near, 0.0)
                hit = far >= enter
                nb_c = jnp.min(jnp.where(hit, enter, INF), axis=0,
                               keepdims=True)
                g_c = jnp.max(hit.astype(jnp.int32), axis=0, keepdims=True)
                near_blk = (nb_c if near_blk is None
                            else jnp.minimum(near_blk, nb_c))
                gated = g_c if gated is None else jnp.maximum(gated, g_c)
            g_rows.append(gated)
            n_rows.append(near_blk)
        gated_ref[:, pl.ds(i * GATE_LANES, GATE_LANES)] = jnp.concatenate(
            g_rows, axis=0
        )
        near_ref[:, pl.ds(i * GATE_LANES, GATE_LANES)] = jnp.concatenate(
            n_rows, axis=0
        )
        return _

    jax.lax.fori_loop(0, n_chunks, chunk, 0)


def _exact_gate_pallas(rays, boxes, interpret: bool = False):
    """Pallas twin of :func:`_exact_gate` (bit-identical gates/entries)."""
    r_pad = rays.shape[0]
    nb = r_pad // RB
    nbp = -(-nb // GATE_SUB) * GATE_SUB
    if nbp > nb:
        pad = jnp.zeros(((nbp - nb) * RB, 8), jnp.float32)
        pad = pad.at[:, 3].set(1.0)  # unit dir: no NaN slabs
        rays = jnp.concatenate([rays, pad], axis=0)
    n_tiles = boxes.shape[0]
    # Pad the tile axis to whole GATE_LANES chunks so the kernel's lane
    # slices are always full-width.  The inverted padding boxes (lo > hi)
    # DO gate in (slab min/max swap = all-space; ADVICE r4) — that's fine
    # here because the padded gate columns are sliced off at return below.
    tp = -(-n_tiles // GATE_LANES) * GATE_LANES
    if tp > n_tiles:
        pad = jnp.zeros((tp - n_tiles, 8), jnp.float32)
        pad = pad.at[:, 0:3].set(INF).at[:, 3:6].set(-INF)
        boxes = jnp.concatenate([boxes, pad], axis=0)
    boxest = boxes.T  # [8, Tp] component rows
    gated, near_blk = pl.pallas_call(
        _exact_gate_kernel,
        grid=(nbp // GATE_SUB,),
        in_specs=[
            pl.BlockSpec((GATE_SUB * RB, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # all boxes resident
        ],
        out_specs=(
            pl.BlockSpec((GATE_SUB, tp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GATE_SUB, tp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nbp, tp), jnp.int32),
            jax.ShapeDtypeStruct((nbp, tp), jnp.float32),
        ),
        interpret=interpret,
    )(rays, boxest)
    return gated[:nb, :n_tiles] > 0, near_blk[:nb, :n_tiles]


def _plan_tiles(rays, boxes, interpret: bool = False):
    """The block-traversal plan (pure XLA, one dense pass).

    For every [RB ray block x triangle tile]: does any ray in the block
    enter the tile's AABB, and at what minimum entry distance?  Returns

    * ``order`` [B, T] i32 — tile ids per block, front-to-back by block-min
      entry distance; slots past ``count`` repeat the last gated tile (the
      kernel skips them without a fresh DMA),
    * ``count`` [B] i32 — gated tiles per block,
    * ``near``  [B, T+1] f32 — entry distance in ``order`` order (INF past
      ``count``).
    """
    nb = rays.shape[0] // RB
    n_tiles = boxes.shape[0]
    if n_tiles > FRUSTUM_PLAN_TILES:
        gated, near_blk = _frustum_gate(rays, boxes)
    else:
        gated, near_blk = _exact_gate_pallas(rays, boxes, interpret)

    count = jnp.sum(gated, axis=1).astype(jnp.int32)  # [B]
    key = jnp.where(gated, near_blk, INF)
    # One sort yields both the visit order and the sorted entry distances.
    iota = jnp.broadcast_to(
        jnp.arange(n_tiles, dtype=jnp.int32)[None, :], key.shape
    )
    near_sorted, order = jax.lax.sort_key_val(key, iota, dimension=1)
    # Past-count slots: repeat the last gated tile id (no-op steps reuse the
    # resident tile; all-parked blocks repeat tile 0).
    slot = jnp.arange(n_tiles, dtype=jnp.int32)[None, :]
    last = jnp.maximum(count - 1, 0)[:, None]
    last_tile = jnp.take_along_axis(order, last, axis=1)
    order = jnp.where(slot < count[:, None], order, last_tile)

    # One extra slot: the kernel's continue test reads near[count] when it
    # runs out of tiles (the value is ignored, but the read must be in
    # bounds).
    near_pad = jnp.concatenate(
        [near_sorted, jnp.full((nb, 1), INF, jnp.float32)], axis=1
    )
    return order, count, near_pad


# Packed-min trick: positive f32 values order like their int32 bit patterns,
# so (bits(t) & ~LANE_BITS) | lane is a single sortable key carrying both the
# distance and the winning lane — one i32 min reduction per tile instead of
# min + argmin (measured 1.43x on the 262k-tri sweep, tools/kernel_opt.py).
# The low log2(TT) mantissa bits are sacrificed: comparisons see t truncated
# toward zero (relative error <= 2^-14 at TT=512), which can flip near-tie
# winners only; the caller recomputes exact t/barycentrics for the winner.
LANE_BITS = TT - 1  # requires power-of-two TT
# Kernel-side t values below this are hits; truncated-INF stays above it.
HIT_T = 1.0e38


def _init_key():
    import numpy as np

    return (int(np.float32(INF).view(np.int32)) & ~LANE_BITS) | LANE_BITS


INIT_KEY = _init_key()


# Loop-overhead amortization (measured, tools/profile_intersect.py): the
# original one-tile-per-iteration loop spent ~1.7 us/visit on descriptor
# setup, DMA wait, and the per-tile vector->scalar max reduce whose result
# gates the while branch (a full pipeline bubble every tile) — 87 ms of
# kernel time against a 12.4 ms VPU floor (14 %).  GROUP tiles are ground
# per iteration (one branch + one reduce per group) with a NBUF-deep
# rotating buffer ring (prefetch depth NBUF-1), and the early-exit bound is
# *lagged* one group so the reduce sits off the branch's critical path.
GROUP = 4
NBUF = 8


def _closest_kernel(order_ref, count_ref, near_ref, rays_ref, tris_ref,
                    t_ref, idx_ref, buf, sem, visited_ref=None):
    bc = jax.lax.bitcast_convert_type
    t_ref[:] = jnp.full_like(t_ref, INF)
    idx_ref[:] = jnp.zeros_like(idx_ref)
    if visited_ref is not None:
        visited_ref[:] = jnp.zeros_like(visited_ref)
    cnt = count_ref[0, 0, 0]
    n_tiles = order_ref.shape[2]
    depth = NBUF - 1

    @pl.when(cnt > 0)
    def _run():
        # Schedule in whole groups; entries past cnt repeat the last gated
        # tile (the plan pads them so), and re-grinding a tile is idempotent
        # under min — no per-tile masking needed.
        cnt_r = ((cnt + GROUP - 1) // GROUP) * GROUP

        def dma(k):
            kc = jnp.minimum(k, n_tiles - 1)  # clamp the rounded tail
            slot = jax.lax.rem(k, NBUF)
            return pltpu.make_async_copy(
                tris_ref.at[order_ref[0, 0, kc]], buf.at[slot], sem.at[slot]
            )

        for j in range(depth):
            @pl.when(j < cnt_r)
            def _warm():
                dma(j).start()

        def body(carry):
            k, _, best_key, best_tile, bound = carry
            for j in range(GROUP):
                idx = k + j
                pre = idx + depth

                @pl.when(pre < cnt_r)
                def _issue():
                    dma(pre).start()

                dma(idx).wait()
                t = _test_matrix(rays_ref[:], buf[jax.lax.rem(idx, NBUF)])
                lane = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
                key = (bc(t, jnp.int32) & ~LANE_BITS) | lane
                kmin = jnp.min(key, axis=1, keepdims=True)  # [RB, 1]
                closer = kmin < best_key
                best_key = jnp.where(closer, kmin, best_key)
                tile = order_ref[0, 0, jnp.minimum(idx, n_tiles - 1)]
                best_tile = jnp.where(closer, tile, best_tile)
            nk = k + GROUP
            # Front-to-back early exit, once per group, against the PREVIOUS
            # group's block-max best: the carried ``bound`` only shrinks over
            # time, so near >= bound still implies no later tile can win
            # (conservative by at most one group of extra grinds).
            cont = (nk < cnt) & (
                near_ref[0, 0, jnp.minimum(nk, n_tiles)] < bound
            )
            new_bound = jnp.max(bc(best_key & ~LANE_BITS, jnp.float32))
            return nk, cont, best_key, best_tile, new_bound

        init = (jnp.int32(0), jnp.bool_(True),
                jnp.full((RB, 1), INIT_KEY, jnp.int32),
                jnp.zeros((RB, 1), jnp.int32),
                jnp.float32(INF))
        k_fin, _, best_key, best_tile, _ = jax.lax.while_loop(
            lambda c: c[1], body, init
        )
        t_ref[:] = bc(best_key & ~LANE_BITS, jnp.float32)
        idx_ref[:] = best_tile * TT + (best_key & LANE_BITS)
        if visited_ref is not None:
            # Exact executed-work account for the roofline bench: tiles
            # actually ground by this block (includes the rounded-group
            # repeats — they really execute).
            visited_ref[:] = jnp.broadcast_to(k_fin, visited_ref.shape)

        # Early exit leaves up to ``depth`` speculative copies in flight:
        # everything issued lies in [0, min(k_fin + depth, cnt_r)).
        for j in range(depth):
            idx = k_fin + j

            @pl.when(idx < cnt_r)
            def _drain():
                dma(idx).wait()


def _closest_stats_kernel(order_ref, count_ref, near_ref, rays_ref, tris_ref,
                          t_ref, idx_ref, visited_ref, buf, sem):
    """The closest kernel plus a per-block visited-tile count output."""
    _closest_kernel(order_ref, count_ref, near_ref, rays_ref, tris_ref,
                    t_ref, idx_ref, buf, sem, visited_ref=visited_ref)


def _any_kernel(order_ref, count_ref, near_ref, rays_ref, tris_ref,
                hit_ref, buf, sem):
    hit_ref[:] = jnp.zeros_like(hit_ref)
    cnt = count_ref[0, 0, 0]
    n_tiles = order_ref.shape[2]
    depth = NBUF - 1

    @pl.when(cnt > 0)
    def _run():
        cnt_r = ((cnt + GROUP - 1) // GROUP) * GROUP

        def dma(k):
            kc = jnp.minimum(k, n_tiles - 1)
            slot = jax.lax.rem(k, NBUF)
            return pltpu.make_async_copy(
                tris_ref.at[order_ref[0, 0, kc]], buf.at[slot], sem.at[slot]
            )

        for j in range(depth):
            @pl.when(j < cnt_r)
            def _warm():
                dma(j).start()

        def body(carry):
            k, _, done_prev = carry
            for j in range(GROUP):
                idx = k + j
                pre = idx + depth

                @pl.when(pre < cnt_r)
                def _issue():
                    dma(pre).start()

                dma(idx).wait()
                t = _test_matrix(rays_ref[:], buf[jax.lax.rem(idx, NBUF)])
                any_hit = jnp.any(t < INF, axis=1, keepdims=True)
                hit_ref[:] = hit_ref[:] | any_hit.astype(jnp.int32)
            nk = k + GROUP
            # All-rays-hit exit, lagged one group (same amortization as the
            # closest kernel; the extra group of grinds is idempotent).
            cont = (nk < cnt) & jnp.logical_not(done_prev)
            done = jnp.all(hit_ref[:] > 0)
            return nk, cont, done

        k_fin, _, _ = jax.lax.while_loop(
            lambda c: c[1], body,
            (jnp.int32(0), jnp.bool_(True), jnp.bool_(False)),
        )

        for j in range(depth):
            idx = k_fin + j

            @pl.when(idx < cnt_r)
            def _drain():
                dma(idx).wait()


# Scenes up to this many tiles skip the plan entirely: every tile stays
# resident in VMEM and each ray block sweeps all of them (a 4-tile sweep is
# cheaper than planning it).
SMALL_TILES = 4


def _closest_small_kernel(rays_ref, tris_ref, t_ref, idx_ref):
    bc = jax.lax.bitcast_convert_type
    best_key = jnp.full((RB, 1), INIT_KEY, jnp.int32)
    best_tile = jnp.zeros((RB, 1), jnp.int32)
    for tile in range(tris_ref.shape[0]):  # static unroll
        t = _test_matrix(rays_ref[:], tris_ref[tile])
        lane = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
        key = (bc(t, jnp.int32) & ~LANE_BITS) | lane
        kmin = jnp.min(key, axis=1, keepdims=True)
        closer = kmin < best_key
        best_key = jnp.where(closer, kmin, best_key)
        best_tile = jnp.where(closer, jnp.int32(tile), best_tile)
    t_ref[:] = bc(best_key & ~LANE_BITS, jnp.float32)
    idx_ref[:] = best_tile * TT + (best_key & LANE_BITS)


def _any_small_kernel(rays_ref, tris_ref, hit_ref):
    hit = jnp.zeros_like(hit_ref)
    for tile in range(tris_ref.shape[0]):
        t = _test_matrix(rays_ref[:], tris_ref[tile])
        hit = hit | jnp.any(t < INF, axis=1, keepdims=True).astype(jnp.int32)
    hit_ref[:] = hit


def _small_call(kernel, rays, tris, out_shapes, interpret):
    nb = rays.shape[0] // RB
    one = len(out_shapes) == 1
    out_spec = pl.BlockSpec((RB, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((RB, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # all tiles resident
        ],
        out_specs=out_spec if one else tuple(out_spec for _ in out_shapes),
        out_shape=out_shapes[0] if one else tuple(out_shapes),
        interpret=interpret,
    )(rays, tris)


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


def _grid_call(kernel, rays, tris, boxes, out_shapes, interpret):
    r_pad = rays.shape[0]
    n_tiles = tris.shape[0]
    nb = r_pad // RB
    if n_tiles <= SMALL_TILES:
        small = (_closest_small_kernel
                 if kernel is _closest_kernel else _any_small_kernel)
        return _small_call(small, rays, tris, out_shapes, interpret)
    order, count, near = _plan_tiles(rays, boxes, interpret)
    one = len(out_shapes) == 1
    out_spec = pl.BlockSpec((RB, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    # Plan rows ride as [nb, 1, L] so the per-block (1, 1, L) SMEM block
    # trivially satisfies the trailing-dims tiling rule.
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            # Per-block traversal plan rows live in SMEM (scalar reads drive
            # the in-kernel DMA loop).
            pl.BlockSpec((1, 1, order.shape[1]), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, near.shape[1]), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((RB, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            # The whole tile stack stays in HBM; the kernel streams only the
            # tiles its plan names (double-buffered async copies).
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=out_spec if one else tuple(out_spec for _ in out_shapes),
        out_shape=out_shapes[0] if one else tuple(out_shapes),
        scratch_shapes=[
            pltpu.VMEM((NBUF, 16, TT), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
        interpret=interpret,
    )(order[:, None, :], count[:, None, None], near[:, None, :], rays, tris)


def closest_pallas(fs: FlatScene, orig, dirn, interpret: bool = False,
                   split_geom_grad: bool = False):
    """Closest-hit via the Pallas block traversal; returns the Hit payload.

    The kernel only *selects* the winning triangle (truncated-t packed min);
    all differentiable quantities are recomputed exactly in the epilogue, so
    gradients never need to flow through the pallas_call — stop_gradient at
    its boundary keeps AD (the geometry-gradient scan, ``ptx.diff``) from
    tracing kernel internals that have no differentiation rules.

    ``split_geom_grad``: route d/d vertex-positions through the narrow
    ``fs.tri_a/e1/e2`` [T, 3] leaves instead of the packed [T, 40]
    ``tri_attrs`` rows.  The vjp of a row gather is a row scatter-add, and
    TPU scatter cost scales brutally with row width (measured isolated:
    776 ms for one [59k, 40] scatter at 32k indices vs 199 ms for three
    [59k, 3] ones — ``tools/bwd_experiments.py``), so geometry optimization
    wants the narrow cotangent even at the price of three extra [r, 3]
    forward gathers.  Values are bit-identical; only the AD routing (and
    which leaves receive cotangents) changes — shading attrs stay in the
    stop-gradient'd row because no supported optimization field lives in
    columns 0-24 (``ptx.diff.inverse.DIFFERENTIABLE_FIELDS``)."""
    from ptx.kernels.intersect import attrs_from_indices

    sg = jax.lax.stop_gradient
    r = orig.shape[0]
    rays, r_pad = _pack_rays(sg(orig), sg(dirn))
    tris, boxes = _scene_tiles(jax.tree.map(sg, fs))
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
    t_trunc = t[:r, 0]
    tri = idx[:r, 0]
    # ONE gather resolves the winner: the packed tri_attrs row carries the
    # vertex data (columns 25-33) along with the shading attributes, so the
    # whole epilogue costs a single [r, 40] gather (measured ~1.4 ms per
    # gather op at 131k rays, independent of row width).
    at = (fs.tri_attrs[tri]
          if fs.tri_attrs.shape[0] == fs.tri_a.shape[0] else None)
    geom = None
    if at is not None and split_geom_grad:
        at = sg(at)
        a, e1, e2 = fs.tri_a[tri], fs.tri_e1[tri], fs.tri_e2[tri]
        geom = (a, e1, e2)
    elif at is not None:
        a, e1, e2 = at[:, 25:28], at[:, 28:31], at[:, 31:34]
    else:
        a, e1, e2 = fs.tri_a[tri], fs.tri_e1[tri], fs.tri_e2[tri]
    # Recompute t + barycentrics for the single winning triangle per ray —
    # this also restores the mantissa bits the packed-min key truncated.
    t_exact, beta, gamma, _ = geometry.moller_trumbore(orig, dirn, a, e1, e2)
    # hit requires BOTH signals: the kernel's truncated winner AND a finite
    # recompute — a boundary hit the recompute's eps test rejects must not
    # ship as hit=True with t=INF (inconsistent payload for the distributed
    # min-distance reduce; ADVICE r3).
    hit = (t_trunc < HIT_T) & (t_exact < INF)
    t = jnp.where(hit, t_exact, INF)
    return attrs_from_indices(fs, t, tri, beta, gamma, hit, at=at, geom=geom)


def any_pallas(fs: FlatScene, orig, dirn, interpret: bool = False):
    sg = jax.lax.stop_gradient
    r = orig.shape[0]
    rays, r_pad = _pack_rays(sg(orig), sg(dirn))
    tris, boxes = _scene_tiles(jax.tree.map(sg, fs))
    hit = _grid_call(
        _any_kernel,
        rays,
        tris,
        boxes,
        [jax.ShapeDtypeStruct((r_pad, 1), jnp.int32)],
        interpret,
    )
    return hit[:r, 0] > 0


def closest_pallas_stats(fs: FlatScene, orig, dirn, interpret: bool = False):
    """Closest sweep returning ``(t, tri_idx, visited_tiles_per_block)`` —
    the bench's exact executed-work account (``ptx.bench.run_pallas_roofline``).
    Requires a scene above the SMALL_TILES fast path."""
    rays, r_pad = _pack_rays(orig, dirn)
    tris, boxes = _scene_tiles(fs)
    n_tiles = tris.shape[0]
    if n_tiles <= SMALL_TILES:
        raise ValueError("stats sweep needs > SMALL_TILES tiles")
    nb = r_pad // RB
    order, count, near = _plan_tiles(rays, boxes, interpret)
    out_spec = pl.BlockSpec((RB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    t, idx, visited = pl.pallas_call(
        _closest_stats_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1, order.shape[1]), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, near.shape[1]), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((RB, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((r_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((r_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((r_pad, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((NBUF, 16, TT), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
        interpret=interpret,
    )(order[:, None, :], count[:, None, None], near[:, None, :], rays, tris)
    return t[:, 0], idx[:, 0], visited[::RB, 0]


def make_backend(static: Optional[SceneStatic] = None,
                 interpret: Optional[bool] = None,
                 split_geom_grad: bool = False):
    """(closest, any_hit) pair.  ``interpret`` defaults to True off-TPU so the
    same code path runs (slowly but exactly) in CPU CI.
    ``split_geom_grad``: see :func:`closest_pallas` (geometry-gradient AD
    routing; values unchanged)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def closest(fs, orig, dirn):
        return closest_pallas(fs, orig, dirn, interpret,
                              split_geom_grad=split_geom_grad)

    def any_hit(fs, orig, dirn):
        return any_pallas(fs, orig, dirn, interpret)

    return closest, any_hit
