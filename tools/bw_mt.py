#!/usr/bin/env python3
"""Measure the production Baldwin-Weber ray-triangle test against the
classic Moller-Trumbore formulation (the round-4 experiment that led to
adopting BW in ptx.kernels.intersect_pallas._test_matrix).

BW precomputes, per triangle, the plane (n, d) and two rows (T1, T2) of the
inverse of [e1 e2 n] (with translation), so the in-kernel test is

    t     = -(n.o + d) / (n.dir)
    P     = o + t dir
    beta  = T1 . (P, 1)
    gamma = T2 . (P, 1)

~29 vector instructions per element vs ~45 for MT (the kernel is measured
instruction-issue-bound, BASELINE.md) at the cost of 12 floats/tri instead
of 9 — which still fit the existing 16-row tile DMA unit.

Run: timeout 880 python tools/bw_mt.py [n_tris]
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

from ptx.utils import enable_compile_cache

enable_compile_cache(jax)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ptx import render as R
from ptx.bench import _sync, _timed_burst
from ptx.config import RenderConfig
from ptx.kernels import intersect_pallas as ip
from ptx.scene import camera as pcamera

N_TRIS = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
N_RAYS = 131072


def mt_classic(rays, tris):
    """The pre-round-4 Moller-Trumbore kernel test (rows 0-8 = a, e1, e2),
    kept as the comparison baseline."""
    ox, oy, oz = rays[:, 0:1], rays[:, 1:2], rays[:, 2:3]
    dx, dy, dz = rays[:, 3:4], rays[:, 4:5], rays[:, 5:6]
    ax, ay, az = tris[0:1, :], tris[1:2, :], tris[2:3, :]
    e1x, e1y, e1z = tris[3:4, :], tris[4:5, :], tris[5:6, :]
    e2x, e2y, e2z = tris[6:7, :], tris[7:8, :], tris[8:9, :]
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    r0 = pl.reciprocal(det, approx=True)
    inv_det = r0 * (2.0 - det * r0)
    tx, ty, tz = ox - ax, oy - ay, oz - az
    beta = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    gamma = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    ok = ((jnp.minimum(beta, gamma) >= -ip.EPS) & (beta <= 1.0 + ip.EPS)
          & (beta + gamma <= 1.0 + ip.EPS) & (t >= 0.0))
    return jnp.where(ok, t, ip.INF)


def pack_mt(fs):
    """Classic MT tiles (rows 0-8 = a, e1, e2) in the 16-row layout."""
    tri_a = np.asarray(fs.tri_a, np.float32)
    tri_e1 = np.asarray(fs.tri_e1, np.float32)
    tri_e2 = np.asarray(fs.tri_e2, np.float32)
    n = tri_a.shape[0]
    n_pad = -(-n // ip.TT) * ip.TT
    rows = np.zeros((16, n_pad), np.float32)
    rows[0:3, :n] = tri_a.T
    rows[3:6, :n] = tri_e1.T
    rows[6:9, :n] = tri_e2.T
    n_tiles = n_pad // ip.TT
    return np.ascontiguousarray(
        rows.reshape(16, n_tiles, ip.TT).transpose(1, 0, 2)
    )


def main():
    cfg = RenderConfig(width=256, height=256, samples=2, bounces=1,
                       intersector="pallas", sort_rays="off")
    fs, static = R.load_scene(f"synthetic:{N_TRIS}", quirks=cfg.quirks,
                              device=False)
    fs, static = R.ensure_accel(fs, static, cfg, device=False)  # BW prepack
    mt_tiles = pack_mt(fs)
    fs_bw = R.to_device(fs)
    fs_mt = R.to_device(fs._replace(ptiles=mt_tiles))

    pix = jnp.arange(N_RAYS, dtype=jnp.int32) % (cfg.width * cfg.height)
    smp = jnp.arange(N_RAYS, dtype=jnp.int32) // (cfg.width * cfg.height)
    orig, dirn = pcamera.generate_rays(fs_bw, pix, smp, cfg.width, cfg.height,
                                       cfg.seed, True, False)

    def timed(name, fn):
        out = fn()
        jax.block_until_ready(out)
        _sync(out)
        dt = _timed_burst(fn, reps=3)
        print(f"{name:24s} {dt*1e3:8.2f} ms")
        return dt, out

    sweep = jax.jit(lambda fs, o, d: ip.closest_pallas(fs, o, d))
    dt_bw, out = timed("BW (production)", lambda: sweep(fs_bw, orig, dirn))

    saved = ip._test_matrix
    ip._test_matrix = mt_classic
    try:
        sweep_mt = jax.jit(lambda fs, o, d: ip.closest_pallas(fs, o, d))
        dt_mt, base = timed("MT (classic)", lambda: sweep_mt(fs_mt, orig, dirn))
    finally:
        ip._test_matrix = saved

    hit_agree = float(jnp.mean((out.hit == base.hit).astype(jnp.float32)))
    both = out.hit & base.hit
    terr = float(jnp.max(jnp.where(
        both, jnp.abs(out.t - base.t) / jnp.maximum(base.t, 1e-6), 0.0)))
    print(f"speedup {dt_mt / dt_bw:.3f}x   hit agree {hit_agree:.6f}   "
          f"max rel t err (both-hit) {terr:.2e}")


if __name__ == "__main__":
    main()
