"""Per-iteration live-lane fractions of the differentiable scan's workload.

Runs the trace/shade pair eagerly for jack at the chunked-vjp shapes and
prints alive counts per iteration — the ceiling for concentrating live rays
into dense blocks (sort-by-alive) inside the diff scan.
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from ptx.utils import enable_compile_cache

enable_compile_cache(jax)

from ptx import render as R  # noqa: E402
from ptx.config import RenderConfig  # noqa: E402
from ptx.integrator.wavefront import (  # noqa: E402
    RayState, make_shade_fn, make_trace_fn,
)
from ptx.kernels import sorting  # noqa: E402
from ptx.scene import camera as pcamera  # noqa: E402

JACK = (
    "/root/reference/path-tracer-core/scenes/jack-of-blades/jack-of-blades.gltf"
)


def main():
    cfg = RenderConfig(width=128, height=128, samples=4, bounces=4,
                       intersector="pallas")
    fs, static = R.load_scene(JACK, quirks=cfg.quirks)
    closest, any_hit = R.get_backend(static, cfg)
    do_compact = sorting.resolve_compact(static, cfg)
    print("do_compact:", do_compact)
    trace = make_trace_fn(static, cfg, closest, any_hit, do_compact)
    shade = make_shade_fn(static, cfg)

    cp, k = 8192, 4
    pix = jnp.tile(jnp.arange(cp, dtype=jnp.int32), k)
    smp = jnp.repeat(jnp.arange(k, dtype=jnp.int32), cp)
    orig, dirn = pcamera.generate_rays(
        fs, pix, smp, cfg.width, cfg.height, cfg.seed,
        cfg.quirks.first_sample_centered, cfg.transparent_background,
    )
    r = pix.shape[0]
    state = RayState(
        orig=orig, dirn=dirn, radiance=jnp.zeros((r, 3)),
        throughput=jnp.ones((r, 3)), alpha=jnp.zeros((r,)),
        alive=jnp.ones((r,), bool),
        bounce=jnp.full((r,), cfg.bounces, jnp.int32),
        pixel_ids=pix, sample_ids=smp,
    )

    extra = cfg.opacity_extra_iters if static.has_translucent else 0
    step = jax.jit(lambda fs, it, s: shade(fs, it, s, *trace(fs, it, s)))
    for it in range(cfg.bounces + extra):
        alive = int(state.alive.sum())
        # How many 256-ray blocks hold at least one live lane, as-is vs
        # if lanes were sorted live-first.
        blocks = state.alive.reshape(-1, 256).any(axis=1).sum()
        dense = -(-alive // 256)
        print(f"iter {it}: alive {alive:6d}/{r}  "
              f"live blocks as-is {int(blocks)} vs sorted {dense}")
        state = step(fs, jnp.int32(it), state)
    print(f"final: alive {int(state.alive.sum())}")


if __name__ == "__main__":
    main()
