"""Benchmark harness.

Primary metric: *paths/s* — camera paths fully traced per second (the
wavefront advanced to termination over all bounces), measured on whatever
backend JAX selects (the single TPU chip under the driver; CPU in tests).
``vs_baseline`` is the ratio against ``BASELINE_PATHS_PER_SEC``, an estimate
of the reference C++ wavefront worker's throughput on its 4-vCPU/4GB Lambda
budget (the reference publishes no numbers — BASELINE.md).

Run: ``python bench.py`` at the repo root (one JSON line on stdout).
"""

from __future__ import annotations

import json
import time
from typing import Optional

# Estimated reference worker throughput (paths/s) on its Lambda budget:
# 640x480x50spp inside the 900 s timeout ~= 1.7e4 paths/s end-to-end; a
# generous in-core estimate for the multithreaded wavefront on 4 vCPUs with a
# SAH KD-tree over cornell-scale scenes is ~1e5 paths/s. Used only to make
# vs_baseline meaningful; revisit when a measured baseline exists.
BASELINE_PATHS_PER_SEC = 1.0e5

CORNELL = "/root/reference/path-tracer-core/scenes/cornell-box/cornell.gltf"


def run_backward_bench(scene: Optional[str] = None, cfg=None) -> dict:
    """grad-paths/s: value+grad of the image MSE w.r.t. material parameters
    through the full differentiable wavefront (BASELINE.md backward metric)."""
    import time as _time

    import jax
    import jax.numpy as jnp

    from ptx import render as R
    from ptx.config import RenderConfig
    from ptx.diff import inverse

    if cfg is None:
        cfg = RenderConfig(width=128, height=128, samples=4, bounces=4,
                           intersector="pallas")
    scene = scene or CORNELL
    fs, static = R.load_scene(scene, quirks=cfg.quirks)
    n_pixels = cfg.width * cfg.height
    target = jnp.zeros((n_pixels, 3))
    loss_fn = inverse.make_loss_fn(static, cfg, target,
                                   ("mat_albedo", "mat_emissive"))
    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    params = {"mat_albedo": fs.mat_albedo, "mat_emissive": fs.mat_emissive}

    out = grad_fn(params, fs, jnp.int32(0))
    jax.block_until_ready(out)
    t0 = _time.perf_counter()
    outs = [grad_fn(params, fs, jnp.int32(s)) for s in range(cfg.samples)]
    jax.block_until_ready(outs)
    dt = _time.perf_counter() - t0
    paths = n_pixels * cfg.samples
    value = paths / dt
    return {
        "metric": "cornell_128x128_b4_backward",
        "value": round(value, 1),
        "unit": "grad-paths/s",
        "vs_baseline": round(value / BASELINE_PATHS_PER_SEC, 3),
        "elapsed_s": round(dt, 3),
    }


def run_bench(
    scene: Optional[str] = None,
    cfg=None,
    warmup_samples: int = 1,
) -> dict:
    import jax
    import jax.numpy as jnp

    from ptx import render as R
    from ptx.config import RenderConfig

    if cfg is None:
        cfg = RenderConfig(
            width=256, height=256, samples=16, bounces=4,
            intersector="pallas", shader="auto",
        )
    scene = scene or CORNELL

    fs, static = R.load_scene(scene, quirks=cfg.quirks, device=False)
    fs, static = R.ensure_accel(fs, static, cfg, device=True)
    sample_fn = R.make_sample_fn(static, cfg)

    # Warmup (compile + device tunnel).
    for s in range(warmup_samples):
        r, a = sample_fn(fs, jnp.int32(s))
    jax.block_until_ready((r, a))

    t0 = time.perf_counter()
    outs = []
    for s in range(cfg.samples):
        outs.append(sample_fn(fs, jnp.int32(s)))
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0

    paths = cfg.width * cfg.height * cfg.samples
    value = paths / dt
    return {
        "metric": "cornell_256x256x16spp_b4_forward",
        "value": round(value, 1),
        "unit": "paths/s",
        "vs_baseline": round(value / BASELINE_PATHS_PER_SEC, 3),
        "device": str(jax.devices()[0]),
        "elapsed_s": round(dt, 3),
        "n_tris": static.n_tris,
    }
