"""Measure Pallas intersection-kernel variants on the real TPU.

Breaks the production ``closest_pallas`` call into its cost components
(tile pack, traversal plan, kernel sweep) and times candidate kernel
optimizations against the baseline:

* prepack  — tiles/boxes hoisted out of the call (per-scene, not per-bounce)
* TT variants — wider/narrower tiles (fewer loop steps vs finer culling)

(The round-3 recip / packed-min variants measured here were adopted into
the production kernel; ``tools/profile_intersect.py`` is the maintained
cost-breakdown tool with dispatch-floor-amortized timing.)

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
