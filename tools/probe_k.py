#!/usr/bin/env python3
"""Why does per-path cost rise with samples_per_launch? Isolate the suspects:
per-bounce sorting, survivor compaction chunking, and the Pallas shader."""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from ptx import render as R
from ptx.config import RenderConfig

CORNELL = "/root/reference/path-tracer-core/scenes/cornell-box/cornell.gltf"


def run(tag, k, **kw):
    cfg = RenderConfig(width=256, height=256, samples=16, bounces=4,
                       intersector="pallas", samples_per_launch=k, **kw)
    fs, static = R.load_scene(CORNELL, quirks=cfg.quirks, device=False)
    fs, static = R.ensure_accel(fs, static, cfg, device=True)
    n_launches = -(-16 // k)
    fn = R.make_batched_sample_fn(static, cfg, k) if k > 1 else R.make_sample_fn(static, cfg)
    out = fn(fs, jnp.int32(0))
    jax.block_until_ready(out)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(fs, jnp.int32(i * k)) for i in range(n_launches)]
        jax.block_until_ready(outs)
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[1]
    pps = 256 * 256 * k * n_launches / dt
    print(f"{tag:40s} k={k:2d}: {pps/1e6:.3f} M paths/s", flush=True)


if __name__ == "__main__":
    for k in (1, 8):
        run("default (sort auto, shader auto)", k)
        run("sort off", k, sort_rays="off")
        run("shader xla", k, shader="xla")
        run("sort off + shader xla", k, sort_rays="off", shader="xla")
