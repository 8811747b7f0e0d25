#!/usr/bin/env python3
"""Break the production Pallas closest-hit sweep into its cost components.

VERDICT r3 #2: the roofline says 11.3 % of VPU peak / 1.6 % of HBM — the
kernel is neither compute- nor bandwidth-bound, so ~88 % of its time is
overhead.  This tool times each piece in isolation on the real chip:

  plan.gate     the per-[block x tile] slab gate (_exact_gate/_frustum_gate)
  plan.sort     the front-to-back sort_key_val over [B, T]
  kernel        the pallas_call alone, plan precomputed and device-resident
  epilogue      winner MT recompute + attrs_from_indices gathers
  total         the production closest_pallas (everything fused in one jit)

Run: python tools/profile_intersect.py [n_rays n_tris]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

from ptx.utils import enable_compile_cache

enable_compile_cache(jax)

import jax.numpy as jnp

from ptx import render as R
from ptx.bench import _sync, _timed_passes
from ptx.config import RenderConfig
from ptx.kernels import intersect_pallas as ip


def main(n_rays=131072, n_tris=262144):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cfg = RenderConfig(width=256, height=256, samples=2, bounces=1,
                       intersector="pallas", sort_rays="off")
    fs, static = R.load_scene(f"synthetic:{n_tris}", quirks=cfg.quirks,
                              device=False)
    fs, static = R.ensure_accel(fs, static, cfg, device=True)

    from ptx.scene import camera as pcamera
    pixel_ids = jnp.arange(n_rays, dtype=jnp.int32) % (cfg.width * cfg.height)
    sample_ids = jnp.arange(n_rays, dtype=jnp.int32) // (
        cfg.width * cfg.height
    )
    orig, dirn = pcamera.generate_rays(
        fs, pixel_ids, sample_ids, cfg.width, cfg.height, cfg.seed,
        True, False,
    )

    rays, r_pad = ip._pack_rays(orig, dirn)
    rays = jax.device_put(rays)
    tris, boxes = ip._scene_tiles(fs)
    tris, boxes = jax.device_put(tris), jax.device_put(boxes)
    nb = r_pad // ip.RB
    n_tiles = tris.shape[0]

    def timed(name, fn, *args, reps=4, k=8):
        """Per-call device time with the tunnel dispatch floor amortized:
        ``k`` async dispatches, one block (single-dispatch timings carry a
        ~20-25 ms host round-trip floor that made every small piece read as
        ~23 ms and the sum exceed the fused total)."""
        f = jax.jit(fn)
        out = f(*args)
        jax.block_until_ready(out)
        _sync(out)
        dt1 = _timed_passes(lambda: f(*args), reps=reps)

        def burst():
            outs = [f(*args) for _ in range(k)]
            return outs[-1]

        dtk = _timed_passes(burst, reps=reps)
        # dtk ~= floor + k * t_call and dt1 ~= floor + t_call.
        per = max((dtk - dt1) / (k - 1), 0.0) if k > 1 else dt1
        print(f"{name:28s} {per * 1e3:9.3f} ms/call "
              f"(single-dispatch {dt1 * 1e3:8.3f} ms)")
        return per, out

    # --- total (production path)
    dt_total, _ = timed(
        "total closest_pallas",
        lambda o, d: ip.closest_pallas(fs, o, d), orig, dirn,
    )

    # --- plan pieces
    gate = (ip._frustum_gate if n_tiles > ip.FRUSTUM_PLAN_TILES
            else ip._exact_gate)
    dt_gate, _ = timed("plan: slab gate", gate, rays, boxes)
    dt_plan, (order, count, near) = timed(
        "plan: gate+sort (_plan_tiles)", ip._plan_tiles, rays, boxes
    )
    order, count, near = (jax.device_put(order), jax.device_put(count),
                          jax.device_put(near))

    # --- kernel alone (plan precomputed)
    out_spec = pl.BlockSpec((ip.RB, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def kernel_only(order, count, near, rays, tris):
        return pl.pallas_call(
            ip._closest_kernel,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, 1, order.shape[2]), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, near.shape[2]), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((ip.RB, 8), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(out_spec, out_spec),
            out_shape=(
                jax.ShapeDtypeStruct((r_pad, 1), jnp.float32),
                jax.ShapeDtypeStruct((r_pad, 1), jnp.int32),
            ),
            scratch_shapes=[
                pltpu.VMEM((ip.NBUF, 16, ip.TT), jnp.float32),
                pltpu.SemaphoreType.DMA((ip.NBUF,)),
            ],
        )(order, count, near, rays, tris)

    o3 = order[:, None, :]
    c3 = count[:, None, None]
    n3 = near[:, None, :]
    dt_kernel, (t_k, idx_k) = timed(
        "kernel: pallas_call only", kernel_only, o3, c3, n3, rays, tris
    )

    # --- epilogue alone
    from ptx import geometry
    from ptx.kernels.intersect import attrs_from_indices

    t_trunc = t_k[:n_rays, 0]
    tri_idx = idx_k[:n_rays, 0]

    def epilogue(orig, dirn, t_trunc, tri):
        # Mirrors the production single-gather epilogue in closest_pallas.
        at = fs.tri_attrs[tri]
        a, e1, e2 = at[:, 25:28], at[:, 28:31], at[:, 31:34]
        t_exact, beta, gamma, _ = geometry.moller_trumbore(
            orig, dirn, a, e1, e2
        )
        hit = (t_trunc < ip.HIT_T) & (t_exact < ip.INF)
        t = jnp.where(hit, t_exact, ip.INF)
        return attrs_from_indices(fs, t, tri, beta, gamma, hit, at=at)

    dt_epi, _ = timed("epilogue: recompute+attrs", epilogue,
                      orig, dirn, t_trunc, tri_idx)

    # --- executed-work account
    stats = jax.jit(lambda o, d: ip.closest_pallas_stats(fs, o, d))
    _, _, visited = stats(orig, dirn)
    visited_tiles = int(jnp.sum(visited))
    tests = visited_tiles * ip.RB * ip.TT
    grind_at_peak = tests * 53 / 12.3e12  # v5e VPU estimate
    print(f"\nvisited tiles {visited_tiles} (avg {visited_tiles / nb:.1f}"
          f"/block of {n_tiles}), tests {tests / 1e9:.2f}G")
    print(f"pieces: gate {dt_gate*1e3:.2f} + sort "
          f"{(dt_plan - dt_gate)*1e3:.2f} + kernel {dt_kernel*1e3:.2f} "
          f"+ epilogue {dt_epi*1e3:.2f} = {(dt_plan + dt_kernel + dt_epi)*1e3:.2f}"
          f" vs total {dt_total*1e3:.2f} ms")
    print(f"kernel VPU floor at est. peak: {grind_at_peak*1e3:.2f} ms "
          f"({grind_at_peak / dt_kernel:.1%} of kernel time)")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:3]]
    main(*args)
