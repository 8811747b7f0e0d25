"""Decompose the geometry-backward (vertex-gradient) time on TPU.

Times three jitted programs on the SAME chunked-loss structure
(``inverse.make_batch_value_and_grad_fn``'s policy):

  fwd        — the chunked loss value only (no AD)
  vg_sun     — value+grad wrt sun_energy THROUGH THE GENERAL SCAN
               (forced; sun_energy alone would take the fast path) —
               backward through the bounce scan but no geometry scatter
  vg_tri_a   — value+grad wrt tri_a (the production vertex backward)

so (vg_sun - fwd) isolates the scan-backward overhead and
(vg_tri_a - vg_sun) isolates the Moller-Trumbore vjp + the [T,40]/[T,3]
scatter-adds of the per-chunk geometry cotangents.

Usage: python tools/profile_backward.py [W H SPP BOUNCES]
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


def main():
    w, h, spp, b = (int(a) for a in sys.argv[1:5]) if len(sys.argv) > 4 else (
        128, 128, 4, 4
    )
    cfg = RenderConfig(width=w, height=h, samples=spp, bounces=b,
                       intersector="pallas")
    fs, static = R.load_scene(JACK, quirks=cfg.quirks)
    fs, static = R.ensure_accel(fs, static, cfg, device=True)
    n_pixels = w * h
    paths = n_pixels * spp
    target = jnp.zeros((n_pixels, 3))

    def bench(tag, fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        _sync(out)
        dt = _timed_burst(lambda: fn(*args), reps=2, k=6)
        print(f"{tag:10s} {dt*1e3:8.1f} ms  {paths/dt:12.0f} paths/s",
              flush=True)
        return dt

    # (a) forward-only chunked loss.
    vg_tri = inverse.make_batch_value_and_grad_fn(
        static, cfg, target, spp, param_fields=("tri_a",)
    )
    # Reuse the same integrator/chunking via a loss-only twin: grad wrt a
    # 1-element dummy still AD-traces, so instead just time the plain
    # chunked loss built on the general integrator.
    closest, any_hit = R.get_backend(static, cfg)
    from ptx.integrator.wavefront import make_integrator

    integ = make_integrator(static, cfg, closest, any_hit, differentiable=True)
    from ptx.render import MAX_RAYS_PER_LAUNCH

    cap = MAX_RAYS_PER_LAUNCH
    k = max(1, min(spp, cap))
    while spp % k:
        k -= 1
    cp = inverse._largest_divisor_leq(n_pixels, max(1, cap // k))
    n_chunks = n_pixels // cp
    print(f"chunks: {n_chunks} x ({cp} px x {k} spp = {cp*k} rays)",
          flush=True)

    def refresh_tiles(params, fsx):
        # The hoisted once-per-loss repack (inverse.make_batch_value_and_grad_fn).
        if any(f in inverse._GEOM_ATTR_COLS for f in params):
            from ptx.kernels.intersect_pallas import pack_tris

            sgp = jax.tree.map(jax.lax.stop_gradient, params)
            t_, b_ = pack_tris(
                inverse.inject_params(fsx, sgp, keep_tiles=True)
            )
            fsx = fsx._replace(ptiles=t_, pboxes=b_)
        return fsx

    def chunk_loss(params, fsx, c):
        fsx = inverse.inject_params(fsx, params, keep_tiles=True)
        pix = c * cp + jnp.arange(cp, dtype=jnp.int32)
        pixel_ids = jnp.tile(pix, k)
        sample_ids = jnp.repeat(jnp.arange(k, dtype=jnp.int32), cp)
        radiance, _ = integ(fsx, pixel_ids, sample_ids)
        radiance = radiance.reshape(k, cp, 3).mean(axis=0)
        tgt = jax.lax.dynamic_slice_in_dim(target, c * cp, cp, axis=0)
        return jnp.sum((radiance - tgt) ** 2)

    @jax.jit
    def fwd(params, fsx):
        fsx = refresh_tiles(params, fsx)

        def body(acc, c):
            return acc + chunk_loss(params, fsx, c), None

        tot, _ = jax.lax.scan(
            body, jnp.float32(0.0), jnp.arange(n_chunks, dtype=jnp.int32)
        )
        return tot

    def make_vg(fields):
        def vg(params, fsx):
            fsx = refresh_tiles(params, fsx)

            def body(carry, c):
                t, g = carry
                v, gc = jax.value_and_grad(chunk_loss)(params, fsx, c)
                return (t + v, jax.tree.map(jnp.add, g, gc)), None

            (tot, grads), _ = jax.lax.scan(
                body,
                (jnp.float32(0.0), jax.tree.map(jnp.zeros_like, params)),
                jnp.arange(n_chunks, dtype=jnp.int32),
            )
            return tot, grads

        return jax.jit(vg)

    p_sun = {"sun_energy": fs.sun_energy}
    p_tri = {"tri_a": fs.tri_a}

    t_f = bench("fwd", fwd, p_tri, fs)
    t_s = bench("vg_sun", make_vg(("sun_energy",)), p_sun, fs)
    t_t = bench("vg_tri_a", make_vg(("tri_a",)), p_tri, fs)
    print(f"scan-backward overhead (vg_sun - fwd): {(t_s-t_f)*1e3:.1f} ms")
    print(f"geometry path (vg_tri_a - vg_sun):     {(t_t-t_s)*1e3:.1f} ms")

    # The production entry, for the record.
    vg_prod = jax.jit(vg_tri)
    bench("production", vg_prod, p_tri, fs)


if __name__ == "__main__":
    main()
