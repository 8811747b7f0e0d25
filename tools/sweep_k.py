#!/usr/bin/env python3
"""Measured samples_per_launch sweep on the live backend (VERDICT r2 task 1).

Runs the cornell headline config at k in {1,2,4,8,16} and prints paths/s per
k, plus a breakdown run separating sort/plan cost from the integrator when
the winner differs from round 1's implicit k=1.
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from ptx import render as R
from ptx.config import RenderConfig

CORNELL = "/root/reference/path-tracer-core/scenes/cornell-box/cornell.gltf"


def sweep(scene=CORNELL, width=256, height=256, samples=16, bounces=4):
    results = {}
    for k in (1, 2, 4, 8, 16):
        if k > samples:
            break
        cfg = RenderConfig(width=width, height=height, samples=samples,
                           bounces=bounces, intersector="pallas",
                           samples_per_launch=k)
        fs, static = R.load_scene(scene, quirks=cfg.quirks, device=False)
        fs, static = R.ensure_accel(fs, static, cfg, device=True)
        n_launches = -(-samples // k)
        if k > 1:
            fn = R.make_batched_sample_fn(static, cfg, k)
        else:
            fn = R.make_sample_fn(static, cfg)
        t0 = time.perf_counter()
        out = fn(fs, jnp.int32(0))
        jax.block_until_ready(out)
        t_compile = time.perf_counter() - t0
        # median of 3 timed full renders
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [fn(fs, jnp.int32(i * k)) for i in range(n_launches)]
            jax.block_until_ready(outs)
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[1]
        paths = width * height * k * n_launches
        pps = paths / dt
        results[k] = pps
        print(f"k={k:3d}: {pps/1e6:.3f} M paths/s  (dt={dt*1e3:.1f} ms, "
              f"compile={t_compile:.1f}s, launches={n_launches})", flush=True)
    best = max(results, key=results.get)
    print(f"BEST k={best}: {results[best]/1e6:.3f} M paths/s")
    return results


if __name__ == "__main__":
    sweep()
