"""Measure Pallas intersection-kernel variants on the real TPU.

Breaks the production ``closest_pallas`` call into its cost components
(tile pack, traversal plan, kernel sweep) and times candidate kernel
optimizations against the baseline:

* prepack  — tiles/boxes hoisted out of the call (per-scene, not per-bounce)
* recip    — ``pl.reciprocal(det, approx=True)`` replacing the exact divide
* packmin  — single packed min reduction (t bits | lane) instead of
             min + argmin per tile
* TT=1024  — wider tiles (fewer loop steps, same work)

Each variant is checked against the baseline hits before its time counts.
Run: timeout 900 python tools/kernel_opt.py [n_tris]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax

import sys as _sys; _sys.path.insert(0, __file__.rsplit("/", 2)[0])
from ptx.utils import enable_compile_cache

enable_compile_cache(jax)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ptx import render as R
from ptx.config import RenderConfig
from ptx.kernels import intersect_pallas as ip
from ptx.scene import camera as pcamera

N_TRIS = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
N_RAYS = 131072


def setup():
    cfg = RenderConfig(width=256, height=256, samples=2, bounces=1,
                       intersector="pallas", sort_rays="off")
    fs, static = R.load_scene(f"synthetic:{N_TRIS}", quirks=cfg.quirks,
                              device=False)
    fs, static = R.ensure_accel(fs, static, cfg, device=True)
    pix = jnp.arange(N_RAYS, dtype=jnp.int32) % (cfg.width * cfg.height)
    smp = jnp.arange(N_RAYS, dtype=jnp.int32) // (cfg.width * cfg.height)
    orig, dirn = pcamera.generate_rays(fs, pix, smp, cfg.width, cfg.height,
                                       cfg.seed, True, False)
    return fs, static, orig, dirn


def _fence(out):
    """Materialize one element of the newest output — block_until_ready can
    return before execution on the tunneled platform (see ptx.bench._sync)."""
    np.asarray(jax.device_get(jax.tree.leaves(out)[-1].ravel()[0:1]))


def bench(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    _fence(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        _fence(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best, out


def sweep_prepacked(rays, tiles, boxes):
    """The production sweep with pack_tris hoisted: returns (t, idx)."""
    r_pad = rays.shape[0]
    return ip._grid_call(
        ip._closest_kernel, rays, tiles, boxes,
        [jax.ShapeDtypeStruct((r_pad, 1), jnp.float32),
         jax.ShapeDtypeStruct((r_pad, 1), jnp.int32)],
        False,
    )


def mt_recip(rays, tris):
    """_mt_matrix with an approximate reciprocal for 1/det."""
    ox, oy, oz = rays[:, 0:1], rays[:, 1:2], rays[:, 2:3]
    dx, dy, dz = rays[:, 3:4], rays[:, 4:5], rays[:, 5:6]
    ax, ay, az = tris[0:1, :], tris[1:2, :], tris[2:3, :]
    e1x, e1y, e1z = tris[3:4, :], tris[4:5, :], tris[5:6, :]
    e2x, e2y, e2z = tris[6:7, :], tris[7:8, :], tris[8:9, :]
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = pl.reciprocal(det, approx=True)
    tx = ox - ax
    ty = oy - ay
    tz = oz - az
    beta = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    gamma = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    ok = (
        (beta >= -ip.EPS) & (beta <= 1.0 + ip.EPS) & (gamma >= -ip.EPS)
        & (beta + gamma <= 1.0 + ip.EPS) & (t >= 0.0) & jnp.isfinite(t)
    )
    return jnp.where(ok, t, ip.INF)


def make_packmin_kernel():
    """Variant: one packed min reduction per tile.

    key = (bits(t) & ~0x1FF) | lane — f32 positives order like their bit
    patterns, so a single i32 min carries both the (truncated) distance and
    the winning lane.  Low 9 mantissa bits are sacrificed (relative error
    2^-14 in the *comparison* only; final t/barycentrics are recomputed
    outside the kernel for the winning triangle)."""
    LANE_BITS = 0x1FF

    bc = jax.lax.bitcast_convert_type
    init_key = (int(np.float32(ip.INF).view(np.int32)) & ~LANE_BITS) | LANE_BITS

    def kernel(order_ref, count_ref, near_ref, rays_ref, tris_ref,
               t_ref, idx_ref, buf, sem):
        cnt = count_ref[0, 0, 0]
        t_ref[:] = jnp.full_like(t_ref, ip.INF)
        idx_ref[:] = jnp.zeros_like(idx_ref)

        @pl.when(cnt > 0)
        def _run():
            ip._tile_dma(tris_ref, order_ref, buf, sem, 0, 0).start()

            def body(carry):
                k, _, best_key, best_tile = carry
                slot = jax.lax.rem(k, 2)
                nk = k + 1
                more = nk < cnt

                @pl.when(more)
                def _issue():
                    ip._tile_dma(tris_ref, order_ref, buf, sem, nk,
                                 jax.lax.rem(nk, 2)).start()

                ip._tile_dma(tris_ref, order_ref, buf, sem, k, slot).wait()
                t = ip._mt_matrix(rays_ref[:], buf[slot])
                lane = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
                key = (bc(t, jnp.int32) & ~LANE_BITS) | lane
                kmin = jnp.min(key, axis=1, keepdims=True)
                closer = kmin < best_key
                best_key = jnp.where(closer, kmin, best_key)
                tile = order_ref[0, 0, k]
                best_tile = jnp.where(closer, tile, best_tile)
                tmax = jnp.max(bc(best_key & ~LANE_BITS, jnp.float32))
                cont = more & (near_ref[0, 0, nk] < tmax)
                return nk, cont, best_key, best_tile

            init = (jnp.int32(0), jnp.bool_(True),
                    jnp.full((ip.RB, 1), init_key, jnp.int32),
                    jnp.zeros((ip.RB, 1), jnp.int32))
            k_fin, _, best_key, best_tile = jax.lax.while_loop(
                lambda c: c[1], body, init)

            t_ref[:] = bc(best_key & ~LANE_BITS, jnp.float32)
            idx_ref[:] = best_tile * ip.TT + (best_key & LANE_BITS)

            @pl.when(k_fin < cnt)
            def _drain():
                ip._tile_dma(tris_ref, order_ref, buf, sem, k_fin,
                             jax.lax.rem(k_fin, 2)).wait()

    return kernel


def main():
    fs, static, orig, dirn = setup()
    rays, r_pad = ip._pack_rays(orig, dirn)
    rays = jax.device_put(rays)

    print(f"== {N_TRIS} tris, {N_RAYS} rays, TT={ip.TT}, RB={ip.RB} ==")

    # Baseline: the full production call.
    full = jax.jit(lambda fs, o, d: ip.closest_pallas(fs, o, d))
    dt, base_out = bench(full, fs, orig, dirn)
    base_hit = base_out.hit
    base_t = jnp.where(base_out.hit, base_out.t, 0.0)
    print(f"full closest_pallas        : {dt*1e3:8.3f} ms")

    # Cost components.
    pack = jax.jit(ip.pack_tris)
    dt_pack, (tiles, boxes) = bench(pack, fs)
    tiles = jax.device_put(tiles)
    boxes = jax.device_put(boxes)
    print(f"pack_tris alone            : {dt_pack*1e3:8.3f} ms")
    plan = jax.jit(ip._plan_tiles)
    dt_plan, _ = bench(plan, rays, boxes)
    print(f"_plan_tiles alone          : {dt_plan*1e3:8.3f} ms")

    pre = jax.jit(sweep_prepacked)
    dt_pre, (t0_, i0_) = bench(pre, rays, tiles, boxes)
    print(f"prepacked plan+kernel      : {dt_pre*1e3:8.3f} ms")

    # Variant: reciprocal det.
    saved_mt = ip._mt_matrix
    ip._mt_matrix = mt_recip
    try:
        dt_r, (t1_, i1_) = bench(jax.jit(sweep_prepacked), rays, tiles, boxes)
    finally:
        ip._mt_matrix = saved_mt
    agree = float(jnp.mean(((t1_ < ip.INF) == (t0_ < ip.INF)).astype(jnp.float32)))
    print(f"recip-approx det           : {dt_r*1e3:8.3f} ms  (hit agree {agree:.6f})")

    # Variant: packed single min.
    pk = make_packmin_kernel()

    def sweep_packmin(rays, tiles, boxes):
        r_pad = rays.shape[0]
        return ip._grid_call(
            pk, rays, tiles, boxes,
            [jax.ShapeDtypeStruct((r_pad, 1), jnp.float32),
             jax.ShapeDtypeStruct((r_pad, 1), jnp.int32)],
            False,
        )

    dt_p, (t2_, i2_) = bench(jax.jit(sweep_packmin), rays, tiles, boxes)
    agree_hit = float(jnp.mean(((t2_ < 1.0e38) == (t0_ < ip.INF)).astype(jnp.float32)))
    agree_idx = float(jnp.mean((i2_ == i0_).astype(jnp.float32)))
    print(f"packed-min kernel          : {dt_p*1e3:8.3f} ms  "
          f"(hit agree {agree_hit:.6f}, idx agree {agree_idx:.6f})")

    # Variant: wider tiles.
    for tt in (1024, 256):
        # Patch the whole packed-key constant set, not just TT: lanes >= 512
        # would otherwise OR into uncleared mantissa bits of the TT=512 key
        # (corrupt winners; ADVICE r3).
        saved = (ip.TT, ip.LANE_BITS, ip.INIT_KEY)
        ip.TT = tt
        ip.LANE_BITS = tt - 1
        ip.INIT_KEY = ip._init_key()
        try:
            dtp2, (tiles2, boxes2) = bench(jax.jit(ip.pack_tris), fs)
            dt_tt, (t3_, i3_) = bench(jax.jit(sweep_prepacked), rays,
                                      jax.device_put(tiles2),
                                      jax.device_put(boxes2))
        finally:
            ip.TT, ip.LANE_BITS, ip.INIT_KEY = saved
        agree = float(jnp.mean(((t3_ < ip.INF) == (t0_ < ip.INF)).astype(jnp.float32)))
        print(f"TT={tt:4d} prepacked         : {dt_tt*1e3:8.3f} ms  "
              f"(hit agree {agree:.6f})")


if __name__ == "__main__":
    main()
