"""Round-5 backward-path experiments on TPU.

E1: shade remat ablation — the diff scan's jax.checkpoint around shade
    re-runs the shade forward during backward; with chunked-vjp residual
    memory bounded, storing may beat remat.
E2: scatter-add microbench — the geometry cotangent path scatters [R,40]
    rows into [T,40] per iteration (the tri_attrs gather vjp); measure row
    scatter cost vs width (40 vs 3 cols) and vs 3 separate [T,3] scatters
    to see whether splitting the differentiable geometry columns would pay.
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from ptx.utils import enable_compile_cache

enable_compile_cache(jax)

from ptx import render as R  # noqa: E402
from ptx.bench import _sync, _timed_burst  # noqa: E402
from ptx.config import RenderConfig  # noqa: E402
from ptx.diff import inverse  # noqa: E402

JACK = (
    "/root/reference/path-tracer-core/scenes/jack-of-blades/jack-of-blades.gltf"
)


def bench(tag, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    _sync(out)
    dt = _timed_burst(lambda: fn(*args), reps=2, k=6)
    print(f"{tag:28s} {dt*1e3:8.1f} ms", flush=True)
    return dt


def e2_scatter():
    import numpy as np

    rng = np.random.default_rng(0)
    T, Rr = 59392, 32768
    idx = jnp.asarray(rng.integers(0, T, Rr), jnp.int32)
    w40 = jnp.asarray(rng.normal(size=(Rr, 40)), jnp.float32)

    def grad_gather(P, W):
        def f(p):
            return jnp.sum(p[idx] * W[:, :p.shape[1]])

        return jax.jit(jax.grad(f))(P)

    p40 = jnp.zeros((T, 40), jnp.float32)
    p9 = jnp.zeros((T, 9), jnp.float32)
    p3 = jnp.zeros((T, 3), jnp.float32)
    bench("scatter [T,40] x1", grad_gather, p40, w40)
    bench("scatter [T,9]  x1", grad_gather, p9, w40)
    bench("scatter [T,3]  x1", grad_gather, p3, w40)

    def grad3(pa, pb, pc):
        def f(ps):
            a, b, c = ps
            return (jnp.sum(a[idx] * w40[:, :3])
                    + jnp.sum(b[idx] * w40[:, 3:6])
                    + jnp.sum(c[idx] * w40[:, 6:9]))

        return jax.jit(jax.grad(f))((pa, pb, pc))

    bench("scatter [T,3]  x3", grad3, p3, p3, p3)


def e1_remat():
    from ptx.integrator.wavefront import make_integrator
    from ptx.render import MAX_RAYS_PER_LAUNCH

    cfg = RenderConfig(width=128, height=128, samples=4, bounces=4,
                       intersector="pallas")
    fs, static = R.load_scene(JACK, quirks=cfg.quirks)
    fs, static = R.ensure_accel(fs, static, cfg, device=True)
    n_pixels = cfg.width * cfg.height
    target = jnp.zeros((n_pixels, 3))
    closest, any_hit = R.get_backend(static, cfg)
    params = {"tri_a": fs.tri_a}

    from ptx.kernels.intersect_pallas import make_backend

    for split, remat in ((False, True), (True, True), (True, False)):
        if split:
            closest, any_hit = make_backend(static, split_geom_grad=True)
        else:
            closest, any_hit = R.get_backend(static, cfg)
        integ = make_integrator(static, cfg, closest, any_hit,
                                differentiable=True, remat_shade=remat)
        cap = MAX_RAYS_PER_LAUNCH
        k = 4
        cp = inverse._largest_divisor_leq(n_pixels, cap // k)
        n_chunks = n_pixels // cp

        def chunk_loss(p, fsx, c):
            fsx = inverse.inject_params(fsx, p, keep_tiles=True)
            pix = c * cp + jnp.arange(cp, dtype=jnp.int32)
            pixel_ids = jnp.tile(pix, k)
            sample_ids = jnp.repeat(jnp.arange(k, dtype=jnp.int32), cp)
            radiance, _ = integ(fsx, pixel_ids, sample_ids)
            radiance = radiance.reshape(k, cp, 3).mean(axis=0)
            tgt = jax.lax.dynamic_slice_in_dim(target, c * cp, cp, axis=0)
            return jnp.sum((radiance - tgt) ** 2)

        @jax.jit
        def vg(p, fsx):
            from ptx.kernels.intersect_pallas import pack_tris

            sgp = jax.tree.map(jax.lax.stop_gradient, p)
            t_, b_ = pack_tris(inverse.inject_params(fsx, sgp,
                                                     keep_tiles=True))
            fsx = fsx._replace(ptiles=t_, pboxes=b_)

            def body(carry, c):
                t, g = carry
                v, gc = jax.value_and_grad(chunk_loss)(p, fsx, c)
                return (t + v, jax.tree.map(jnp.add, g, gc)), None

            (tot, grads), _ = jax.lax.scan(
                body, (jnp.float32(0.0),
                       jax.tree.map(jnp.zeros_like, p)),
                jnp.arange(n_chunks, dtype=jnp.int32),
            )
            return tot, grads

        dt = bench(f"vg_tri_a split={split} remat={remat}", vg, params, fs)
        print(f"  -> {n_pixels*4/dt/1e3:.1f}k grad-paths/s", flush=True)


def _main():
    if "--scatter" in sys.argv:
        try:
            e2_scatter()
        except Exception as e:
            print("e2 failed:", repr(e)[:500], flush=True)
    try:
        e1_remat()
    except Exception as e:
        print("e1 failed:", repr(e)[:500], flush=True)


if __name__ == "__main__":
    _main()
