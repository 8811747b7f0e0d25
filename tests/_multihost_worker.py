"""Subprocess worker for tests/test_multihost.py: one JAX process of a
2-process CPU "pod" (4 virtual devices each, 8 global).

Run: python tests/_multihost_worker.py <pid> <nprocs> <port> <dp> <tp> <out>
Process 0 writes {out}.npz with the rendered color plane and a timed
steady-state paths/s for the scaling-efficiency metric.
"""

import json
import os
import sys
import time

pid, nprocs, port, dp, tp = (int(v) for v in sys.argv[1:6])
out = sys.argv[6]

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.pop("JAX_PLATFORMS", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from ptx.parallel import multihost  # noqa: E402

assert multihost.initialize(
    coordinator_address=f"localhost:{port}",
    num_processes=nprocs,
    process_id=pid,
)
assert jax.process_count() == nprocs
assert jax.device_count() == 8

import numpy as np  # noqa: E402

from ptx import render as R  # noqa: E402
from ptx.config import RenderConfig  # noqa: E402
from ptx.parallel import dist, mesh as pmesh  # noqa: E402

CORNELL = "/root/reference/path-tracer-core/scenes/cornell-box/cornell.gltf"

# Every host loads the same scene file — the multi-controller analog of each
# worker Lambda pulling its scene from S3 (app.py:131-140 fan-out).
fs, static = R.load_scene(CORNELL, device=False)
cfg = RenderConfig(width=16, height=16, samples=2, bounces=2,
                   intersector="brute")
plan = pmesh.Plan(dp=dp, tp=tp, scene_sharded=tp > 1)
mesh = pmesh.make_mesh(plan)

res = dist.render_distributed(fs, static, cfg, plan=plan, mesh=mesh)

# Steady-state throughput (executables now cached): re-render and time.
t0 = time.perf_counter()
res2 = dist.render_distributed(fs, static, cfg, plan=plan, mesh=mesh)
dt = time.perf_counter() - t0
assert np.array_equal(res.color, res2.color)

if pid == 0:
    np.savez(out, color=res.color, alpha=res.alpha)
    with open(out + ".json", "w") as f:
        json.dump({
            "paths_per_s": cfg.width * cfg.height * cfg.samples / dt,
            "elapsed_s": dt,
            "process_count": nprocs,
        }, f)
print(f"[worker {pid}] done ({dt:.2f}s steady-state)", flush=True)
