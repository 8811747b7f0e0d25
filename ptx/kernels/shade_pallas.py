"""Fused Pallas shading kernels.

The XLA lowering of the wavefront step shatters into ~100 small fusions
whose layouts/window configs the compiler picks per-fusion — measured at
~15 ms per bounce iteration for a 65k-ray wavefront even though the same
math compiled in isolation runs in 0.04 ms.  These kernels make the
schedule deterministic: the entire shading stage (``shading_worker.cpp:
10-201`` semantics, identical to ``ptx.integrator.wavefront.step``) runs as
TWO Pallas kernels per bounce:

* ``sun_sample``  — NEE cone sampling + shadow-ray setup
  (``intersection_worker.cpp:22-40``), between closest-hit and the shadow
  occlusion query;
* ``shade``       — env/miss, emissive, stochastic opacity, TBN + normal
  map, backface, shadow catcher, lobe selection, NEE contribution,
  importance sampling, throughput update, Russian roulette, and the lane
  merges — one straight-line VPU program.

Data layout: every logical [R] array is viewed as [R/128, 128] so each
plane is natively (8,128)-tileable; vec3 quantities travel as three planes
(SoA), never as trailing-3 arrays.  The counter RNG (PCG4D) runs inside the
kernel on u32 planes — integer *multiplies* are fine on the VPU (it is
division/modulo that lack a hardware path).

The pure-JAX integrator remains the semantics oracle; tests assert the
kernel path produces identical images.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ptx import sampling
from ptx.config import RenderConfig
from ptx.scene.flatten import SceneStatic

LANES = 128
EPS = 1e-4
PI = 3.14159265358979
INV_SQRT3 = 0.5773502691896258


# --- plane-SoA vector helpers ------------------------------------------------


def _dot(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _cross(ax, ay, az, bx, by, bz):
    return ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx


def _normalize(x, y, z):
    inv = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, 1e-20))
    return x * inv, y * inv, z * inv


def _onb(nx, ny, nz):
    """Reference non-parallel-axis TBN pick (util/rand_cone_vec.cpp:20-33)."""
    use_x = jnp.abs(nx) < INV_SQRT3
    use_y = jnp.logical_and(~use_x, jnp.abs(ny) < INV_SQRT3)
    ex = jnp.where(use_x, 1.0, 0.0)
    ey = jnp.where(use_y, 1.0, 0.0)
    ez = jnp.where(use_x | use_y, 0.0, 1.0)
    tx, ty, tz = _cross(nx, ny, nz, ex, ey, ez)
    tx, ty, tz = _normalize(tx, ty, tz)
    bx, by, bz = _cross(nx, ny, nz, tx, ty, tz)
    return tx, ty, tz, bx, by, bz


def _cone(u, cos_theta, axx, axy, axz):
    """rand_cone_vec on planes."""
    phi = u * (2.0 * PI)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    lx = jnp.cos(phi) * sin_theta
    ly = jnp.sin(phi) * sin_theta
    lz = cos_theta
    tx, ty, tz, bx, by, bz = _onb(axx, axy, axz)
    return (
        tx * lx + bx * ly + axx * lz,
        ty * lx + by * ly + axy * lz,
        tz * lx + bz * ly + axz * lz,
    )


def _pcg4d_uniform(a, b, c, d):
    """PCG4D -> uniform [0,1) on u32 planes (mirrors sampling._pcg4d)."""
    k = jnp.uint32(1664525)
    m = jnp.uint32(1013904223)
    a = a * k + m
    b = b * k + m
    c = c * k + m
    d = d * k + m
    a = a + b * d
    b = b + c * a
    c = c + a * b
    d = d + b * c
    a = a ^ (a >> 16)
    b = b ^ (b >> 16)
    c = c ^ (c >> 16)
    d = d ^ (d >> 16)
    a = a + b * d
    # Mosaic has no u32->f32 cast; the 24-bit value fits s32, so bitcast first.
    bits = jax.lax.bitcast_convert_type(a >> 8, jnp.int32)
    return bits.astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def _uniform(pix, smp, it, purpose, seed):
    c = (it.astype(jnp.uint32) << 8) | jnp.uint32(purpose)
    d = jnp.uint32(seed) ^ jnp.uint32(0x9E3779B9)
    return _pcg4d_uniform(
        pix, smp, jnp.broadcast_to(c, pix.shape), jnp.broadcast_to(d, pix.shape)
    )


def _fresnel(ox, oy, oz, ix, iy, iz, ior):
    hx, hy, hz = _normalize(ox + ix, oy + iy, oz + iz)
    cos_t = _dot(ox, oy, oz, hx, hy, hz)
    f0 = (ior - 1.0) / (ior + 1.0)
    f0 = f0 * f0
    p = jnp.maximum(1.0 - cos_t, 0.0)
    p5 = p * p * p * p * p
    return f0 + (1.0 - f0) * p5


def _smith_g1(cos_theta, k):
    return cos_theta / jnp.maximum(k + (1.0 - k) * cos_theta, EPS)


def _brdf_block(nx, ny, nz, ox, oy, oz, ix, iy, iz,
                alb_r, alb_g, alb_b, metal, rough):
    """Shared BRDF math (shading_worker.cpp:118-139) on planes.
    Returns (brdf_r/g/b, diffuse_pdf, specular_pdf)."""
    n_dot_i = _dot(nx, ny, nz, ix, iy, iz)
    n_dot_o = _dot(nx, ny, nz, ox, oy, oz)
    diffuse_pdf = n_dot_i / PI

    a = rough * rough
    a = a * a
    hx, hy, hz = _normalize(ox + ix, oy + iy, oz + iz)
    cos_phi = _dot(nx, ny, nz, hx, hy, hz)
    denom = 1.0 + (a - 1.0) * cos_phi * cos_phi
    dist = n_dot_i * a / jnp.maximum(PI * denom * denom, EPS)
    r1 = rough + 1.0
    k = (r1 * r1) / 8.0
    geo = _smith_g1(n_dot_o, k) * _smith_g1(n_dot_i, k)
    specular_pdf = (dist * geo) / jnp.maximum(4.0 * n_dot_o * n_dot_i, EPS)

    cos_oh = _dot(ox, oy, oz, hx, hy, hz)
    p = jnp.maximum(1.0 - cos_oh, 0.0)
    p5 = p * p * p * p * p
    inv_m = 1.0 - metal

    def channel(alb):
        fres = (0.04 + (alb - 0.04) * metal) * (1.0 - p5) + p5
        diffuse = diffuse_pdf * alb * inv_m
        return diffuse + (specular_pdf - diffuse) * fres

    return channel(alb_r), channel(alb_g), channel(alb_b), diffuse_pdf, specular_pdf


# --- kernel A: sun cone sample + shadow-ray setup ---------------------------


def _sun_kernel(seed, it_ref, pix_ref, smp_ref, alive_ref,
                nx_ref, ny_ref, nz_ref, px_ref, py_ref, pz_ref, sun_ref,
                sdx_ref, sdy_ref, sdz_ref, sox_ref, soy_ref, soz_ref,
                exists_ref):
    it = it_ref[0]
    pix = pix_ref[:]
    smp = smp_ref[:]
    sun_x = sun_ref[0, 0]
    sun_y = sun_ref[0, 1]
    sun_z = sun_ref[0, 2]
    ang = sun_ref[0, 3]
    u_theta = _uniform(pix, smp, it, sampling.P_SUN_THETA, seed)
    u_phi = _uniform(pix, smp, it, sampling.P_SUN_PHI, seed)
    cos_t = jnp.cos(u_theta * ang)
    shape = pix.shape
    sdx, sdy, sdz = _cone(
        u_phi, cos_t,
        jnp.broadcast_to(sun_x, shape),
        jnp.broadcast_to(sun_y, shape),
        jnp.broadcast_to(sun_z, shape),
    )
    nx, ny, nz = nx_ref[:], ny_ref[:], nz_ref[:]
    exists = (_dot(nx, ny, nz, sdx, sdy, sdz) > 0.0) & (alive_ref[:] > 0)
    sdx_ref[:] = sdx
    sdy_ref[:] = sdy
    sdz_ref[:] = sdz
    sox_ref[:] = px_ref[:] + sdx * EPS
    soy_ref[:] = py_ref[:] + sdy * EPS
    soz_ref[:] = pz_ref[:] + sdz * EPS
    exists_ref[:] = exists.astype(jnp.int32)


# --- kernel B: the fused shading stage ---------------------------------------

# Input plane order for the shade kernel (all [P, LANES] unless noted).
SHADE_INPUTS = [
    "pix", "smp",                       # u32 RNG keys
    "dx", "dy", "dz",                   # current ray direction
    "rad_r", "rad_g", "rad_b",          # accumulated radiance
    "thr_r", "thr_g", "thr_b",          # throughput
    "alpha", "alive", "bounce",         # f32 / i32 / i32
    "hit", "px", "py", "pz",            # i32 hit mask + hit position
    "nx", "ny", "nz",                   # interpolated normal
    "tgx", "tgy", "tgz",                # interpolated tangent
    "alb_r", "alb_g", "alb_b",
    "opacity", "rough", "metal", "ior", "catcher",
    "emi_r", "emi_g", "emi_b",
    "tn_x", "tn_y", "tn_z",             # normal-map tangent-space normal
    "env_r", "env_g", "env_b",          # environment radiance for this dir
    "sdx", "sdy", "sdz",                # sun sample dir
    "sun_exists", "shadow_hit",         # i32
]
SHADE_OUTPUTS = [
    "ox", "oy", "oz", "dx", "dy", "dz",
    "rad_r", "rad_g", "rad_b",
    "thr_r", "thr_g", "thr_b",
    "alpha", "alive", "bounce",
]


def _make_shade_kernel(static: SceneStatic, cfg: RenderConfig):
    q = cfg.quirks
    has_sun = static.has_sun
    seed = cfg.seed
    bounces = cfg.bounces
    alpha_on_miss = 0.0 if cfg.transparent_background else 1.0

    def kernel(sun_energy_ref, it_ref, *refs):
        ins = dict(zip(SHADE_INPUTS, refs[: len(SHADE_INPUTS)]))
        outs = dict(zip(SHADE_OUTPUTS, refs[len(SHADE_INPUTS):]))
        it = it_ref[0]
        pix, smp = ins["pix"][:], ins["smp"][:]
        u = lambda p: _uniform(pix, smp, it, p, seed)

        alive_in = ins["alive"][:] > 0
        hit = (ins["hit"][:] > 0) & alive_in
        miss = alive_in & ~hit
        dx, dy, dz = ins["dx"][:], ins["dy"][:], ins["dz"][:]
        thr_r, thr_g, thr_b = ins["thr_r"][:], ins["thr_g"][:], ins["thr_b"][:]

        # miss -> environment (shading_worker.cpp:27-41)
        mf = miss.astype(jnp.float32)
        rad_r = ins["rad_r"][:] + mf * thr_r * ins["env_r"][:]
        rad_g = ins["rad_g"][:] + mf * thr_g * ins["env_g"][:]
        rad_b = ins["rad_b"][:] + mf * thr_b * ins["env_b"][:]
        alpha = jnp.where(miss, alpha_on_miss, ins["alpha"][:])
        alive = alive_in & hit
        alpha = jnp.where(hit, 1.0, alpha)

        # emissive (x scale quirk)
        af = alive.astype(jnp.float32)
        es = q.emissive_scale
        rad_r = rad_r + af * thr_r * ins["emi_r"][:] * es
        rad_g = rad_g + af * thr_g * ins["emi_g"][:] * es
        rad_b = rad_b + af * thr_b * ins["emi_b"][:] * es

        # stochastic opacity passthrough (no bounce consumed)
        opacity = ins["opacity"][:]
        translucent = jnp.abs(opacity - 1.0) > EPS
        passthrough = alive & translucent & (u(sampling.P_OPACITY) > opacity)

        # shading normal: TBN + normal map (intersect.cpp:71-77)
        nx, ny, nz = _normalize(ins["nx"][:], ins["ny"][:], ins["nz"][:])
        tgx, tgy, tgz = _normalize(ins["tgx"][:], ins["tgy"][:], ins["tgz"][:])
        bx, by, bz = _cross(nx, ny, nz, tgx, tgy, tgz)
        tn_x, tn_y, tn_z = ins["tn_x"][:], ins["tn_y"][:], ins["tn_z"][:]
        sx = tgx * tn_x + bx * tn_y + nx * tn_z
        sy = tgy * tn_x + by * tn_y + ny * tn_z
        sz = tgz * tn_x + bz * tn_y + nz * tn_z
        sx, sy, sz = _normalize(sx, sy, sz)
        ox_, oy_, oz_ = -dx, -dy, -dz  # outcoming

        n_dot_o = _dot(sx, sy, sz, ox_, oy_, oz_)
        backface = alive & ~passthrough & (n_dot_o <= 0.0)

        sun_exists = ins["sun_exists"][:] > 0
        shadow_hit = ins["shadow_hit"][:] > 0
        sdx, sdy, sdz = ins["sdx"][:], ins["sdy"][:], ins["sdz"][:]
        n_dot_sun = _dot(sx, sy, sz, sdx, sdy, sdz)

        # shadow catcher at the first bounce (shading_worker.cpp:74-105)
        is_catcher = ins["catcher"][:] > 0.5
        first_bounce = ins["bounce"][:] == bounces
        catcher_now = alive & ~passthrough & ~backface & is_catcher & first_bounce
        if has_sun:
            catcher_lit = catcher_now & sun_exists & (n_dot_sun > 0.0) & ~shadow_hit
        else:
            catcher_lit = catcher_now & False
        catcher_shadowed = catcher_now & ~catcher_lit
        csf = 1.0 - catcher_shadowed.astype(jnp.float32)
        rad_r = rad_r * csf
        rad_g = rad_g * csf
        rad_b = rad_b * csf
        alpha = jnp.where(catcher_shadowed, 1.0, alpha)
        passthrough = passthrough | catcher_lit

        # lobe selection
        rough = jnp.maximum(ins["rough"][:], q.roughness_floor)
        metal = ins["metal"][:]
        # mirror = reflect(-out, n)
        d_dot_n = _dot(sx, sy, sz, dx, dy, dz)
        mx = dx - 2.0 * d_dot_n * sx
        my = dy - 2.0 * d_dot_n * sy
        mz = dz - 2.0 * d_dot_n * sz
        spec_prob = jnp.maximum(
            _fresnel(ox_, oy_, oz_, mx, my, mz, ins["ior"][:]), metal
        )
        specular_sample = u(sampling.P_LOBE) < spec_prob

        shading = alive & ~passthrough & ~backface & ~catcher_shadowed
        alb_r, alb_g, alb_b = ins["alb_r"][:], ins["alb_g"][:], ins["alb_b"][:]

        # NEE (shading_worker.cpp:112-147): pdf = 1, clamped to sun energy
        if has_sun:
            nee_ok = shading & sun_exists & (n_dot_sun > 0.0) & ~shadow_hit
            br, bg, bb, _, _ = _brdf_block(
                sx, sy, sz, ox_, oy_, oz_, sdx, sdy, sdz,
                alb_r, alb_g, alb_b, metal, rough,
            )
            se_r = sun_energy_ref[0, 0]
            se_g = sun_energy_ref[0, 1]
            se_b = sun_energy_ref[0, 2]
            d_r = br * se_r
            d_g = bg * se_g
            d_b = bb * se_b
            if q.clamp_direct_to_light:
                d_r = jnp.clip(d_r, 0.0, se_r)
                d_g = jnp.clip(d_g, 0.0, se_g)
                d_b = jnp.clip(d_b, 0.0, se_b)
            nf = nee_ok.astype(jnp.float32)
            rad_r = rad_r + nf * thr_r * d_r
            rad_g = rad_g + nf * thr_g * d_g
            rad_b = rad_b + nf * thr_b * d_b

        # indirect importance sampling (shading_worker.cpp:149-199)
        u1 = u(sampling.P_BRDF_U)
        u2 = u(sampling.P_BRDF_V)
        # specular: GGX half-vector cone
        a4 = rough * rough
        a4 = a4 * a4
        ggx_cos = jnp.sqrt(
            jnp.clip((1.0 - u1) / (1.0 + (a4 - 1.0) * u1), 0.0, 1.0)
        )
        hx, hy, hz = _cone(u2, ggx_cos, sx, sy, sz)
        o_dot_h = _dot(hx, hy, hz, ox_, oy_, oz_)
        spx = 2.0 * o_dot_h * hx - ox_
        spy = 2.0 * o_dot_h * hy - oy_
        spz = 2.0 * o_dot_h * hz - oz_
        # diffuse: cosine-weighted. The reference's
        # cos(acos(2u-1)/2) equals sqrt(u) by the half-angle identity.
        lam_cos = jnp.sqrt(u1)
        dfx, dfy, dfz = _cone(u2, lam_cos, sx, sy, sz)
        ix = jnp.where(specular_sample, spx, dfx)
        iy = jnp.where(specular_sample, spy, dfy)
        iz = jnp.where(specular_sample, spz, dfz)

        up_facing = _dot(sx, sy, sz, ix, iy, iz) > 0.0
        br, bg, bb, diffuse_pdf, specular_pdf = _brdf_block(
            sx, sy, sz, ox_, oy_, oz_, ix, iy, iz,
            alb_r, alb_g, alb_b, metal, rough,
        )
        pdf = diffuse_pdf + (specular_pdf - diffuse_pdf) * spec_prob
        inv_pdf = 1.0 / jnp.maximum(pdf, EPS)
        if q.indirect_clamp_to_incoming:
            # Monolithic convention: per-bounce factor clamped to 1
            # (renderer.cpp:616-620).
            nthr_r = thr_r * jnp.clip(br * inv_pdf, 0.0, 1.0)
            nthr_g = thr_g * jnp.clip(bg * inv_pdf, 0.0, 1.0)
            nthr_b = thr_b * jnp.clip(bb * inv_pdf, 0.0, 1.0)
        else:
            tc = q.throughput_clamp
            nthr_r = jnp.clip(thr_r * br * inv_pdf, 0.0, tc)
            nthr_g = jnp.clip(thr_g * bg * inv_pdf, 0.0, tc)
            nthr_b = jnp.clip(thr_b * bb * inv_pdf, 0.0, tc)

        # Russian roulette (shading_worker.cpp:182-190)
        bounce = ins["bounce"][:]
        rr_active = bounce < (bounces - q.rr_after_bounces)
        p_survive = jnp.maximum(nthr_r, jnp.maximum(nthr_g, nthr_b))
        rr_kill = rr_active & (u(sampling.P_RR) > p_survive)
        comp = jnp.where(
            rr_active & ~rr_kill, 1.0 / jnp.maximum(p_survive, EPS), 1.0
        )
        nthr_r = nthr_r * comp
        nthr_g = nthr_g * comp
        nthr_b = nthr_b * comp

        new_bounce = bounce - 1
        continues = shading & up_facing & ~rr_kill & (new_bounce > 0)

        # lane merges
        px, py, pz = ins["px"][:], ins["py"][:], ins["pz"][:]
        pass_f = passthrough
        outs["ox"][:] = jnp.where(
            pass_f, px + dx * EPS,
            jnp.where(continues, px + ix * EPS, jnp.zeros_like(px)),
        )
        outs["oy"][:] = jnp.where(
            pass_f, py + dy * EPS,
            jnp.where(continues, py + iy * EPS, jnp.zeros_like(py)),
        )
        outs["oz"][:] = jnp.where(
            pass_f, pz + dz * EPS,
            jnp.where(continues, pz + iz * EPS, jnp.zeros_like(pz)),
        )
        outs["dx"][:] = jnp.where(continues, ix, dx)
        outs["dy"][:] = jnp.where(continues, iy, dy)
        outs["dz"][:] = jnp.where(continues, iz, dz)
        cf = continues
        outs["thr_r"][:] = jnp.where(cf, nthr_r, thr_r)
        outs["thr_g"][:] = jnp.where(cf, nthr_g, thr_g)
        outs["thr_b"][:] = jnp.where(cf, nthr_b, thr_b)
        outs["rad_r"][:] = rad_r
        outs["rad_g"][:] = rad_g
        outs["rad_b"][:] = rad_b
        outs["alpha"][:] = alpha
        outs["bounce"][:] = jnp.where(continues, new_bounce, bounce)
        outs["alive"][:] = (alive & (passthrough | continues)).astype(jnp.int32)

    return kernel


BLOCK_ROWS = 64  # rows of 128 lanes per program (8192 rays, ~few MB VMEM)


def _plane(x):
    """[R] -> [R/LANES, LANES] view."""
    r = x.shape[0]
    return x.reshape(r // LANES, LANES)


def _call_shade(kernel, sun_energy, it, planes, n_rows, interpret):
    br = min(BLOCK_ROWS, n_rows)
    out_shapes = []
    out_specs = []
    for name in SHADE_OUTPUTS:
        dtype = jnp.int32 if name in ("alive", "bounce") else jnp.float32
        out_shapes.append(jax.ShapeDtypeStruct((n_rows, LANES), dtype))
        out_specs.append(
            pl.BlockSpec((br, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )
    in_specs = [
        pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),  # sun
        pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),  # it
    ] + [
        pl.BlockSpec((br, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
        for _ in SHADE_INPUTS
    ]
    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(n_rows, br),),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=interpret,
    )(sun_energy, it, *planes)


def _call_sun(static, cfg, it, pix, smp, alive, n_interp, position, fs, n_rows,
              interpret):
    br = min(BLOCK_ROWS, n_rows)
    kernel = functools.partial(_sun_kernel, cfg.seed)
    sun = jnp.concatenate(
        [fs.sun_dir, fs.sun_angular_radius[None]]
    ).reshape(1, 4)
    plane_specs = [
        pl.BlockSpec((br, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
        for _ in range(9)
    ]
    in_specs = (
        [pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM)]
        + plane_specs[:3]
        + plane_specs[3:9]
        + [pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.VMEM)]
    )
    out_specs = tuple(
        pl.BlockSpec((br, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
        for _ in range(7)
    )
    out_shape = tuple(
        [jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32)] * 6
        + [jax.ShapeDtypeStruct((n_rows, LANES), jnp.int32)]
    )
    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(n_rows, br),),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(
        it,
        pix, smp, alive,
        _plane(n_interp[:, 0]), _plane(n_interp[:, 1]), _plane(n_interp[:, 2]),
        _plane(position[:, 0]), _plane(position[:, 1]), _plane(position[:, 2]),
        sun,
    )


def make_pallas_step(static: SceneStatic, cfg: RenderConfig,
                     closest, any_hit, interpret=None, record=False):
    """One bounce of the fused-Pallas schedule: XLA closest-hit + material
    fetch, then the sun-NEE and shading Pallas kernels.

    ``record=True`` makes the step additionally return the bounce's trace
    results ``(h, d_sun, sun_exists, shadow_hit)`` — the residuals the fast
    differentiable path (``ptx.diff.fast``) saves so its backward can
    linearize only the XLA shading algebra at the recorded hits."""
    from ptx.integrator.wavefront import RayState, _env_radiance
    from ptx.kernels import sorting
    from ptx.scene import textures

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shade_kernel = _make_shade_kernel(static, cfg)
    do_compact = sorting.resolve_compact(static, cfg)

    def step(fs, it, state: RayState):
        r = state.orig.shape[0]
        n_rows = r // LANES
        # Park dead lanes (sort into all-dead blocks, fail every tile gate);
        # results for those lanes are alive-masked inside the shade kernel.
        if do_compact:
            q_orig, q_dirn = sorting.park(
                state.orig, state.dirn, state.alive, static
            )
        else:
            q_orig, q_dirn = state.orig, state.dirn
        h = closest(fs, q_orig, q_dirn)
        mat = textures.material_lookup(fs, h.mat_id, h.uv, static)
        env = _env_radiance(fs, static, cfg, state.dirn)

        pix_p = _plane(state.pixel_ids.astype(jnp.uint32))
        smp_p = _plane(state.sample_ids.astype(jnp.uint32))
        alive_p = _plane(state.alive.astype(jnp.int32))

        if static.has_sun:
            sdx, sdy, sdz, sox, soy, soz, exists = _call_sun(
                static, cfg, jnp.asarray([it], jnp.int32), pix_p, smp_p,
                alive_p, h.normal, h.position, fs, n_rows, interpret,
            )
            shadow_org = jnp.stack(
                [sox.reshape(r), soy.reshape(r), soz.reshape(r)], axis=-1
            )
            shadow_dir = jnp.stack(
                [sdx.reshape(r), sdy.reshape(r), sdz.reshape(r)], axis=-1
            )
            # Occlusion only matters where the lane is alive with a hit and
            # an up-facing sun (`exists` already folds alive in).
            if do_compact:
                s_org, s_dir = sorting.park(
                    shadow_org, shadow_dir,
                    (exists.reshape(r) > 0) & h.hit, static,
                )
            else:
                s_org, s_dir = shadow_org, shadow_dir
            shadow_hit = any_hit(fs, s_org, s_dir).astype(jnp.int32)
            shadow_hit_p = _plane(shadow_hit)
            exists_p = exists
        else:
            zero = jnp.zeros((n_rows, LANES), jnp.float32)
            sdx = sdy = sdz = zero
            exists_p = jnp.zeros((n_rows, LANES), jnp.int32)
            shadow_hit_p = jnp.zeros((n_rows, LANES), jnp.int32)

        planes = dict(
            pix=pix_p, smp=smp_p,
            dx=_plane(state.dirn[:, 0]), dy=_plane(state.dirn[:, 1]),
            dz=_plane(state.dirn[:, 2]),
            rad_r=_plane(state.radiance[:, 0]),
            rad_g=_plane(state.radiance[:, 1]),
            rad_b=_plane(state.radiance[:, 2]),
            thr_r=_plane(state.throughput[:, 0]),
            thr_g=_plane(state.throughput[:, 1]),
            thr_b=_plane(state.throughput[:, 2]),
            alpha=_plane(state.alpha), alive=alive_p,
            bounce=_plane(state.bounce),
            hit=_plane(h.hit.astype(jnp.int32)),
            px=_plane(h.position[:, 0]), py=_plane(h.position[:, 1]),
            pz=_plane(h.position[:, 2]),
            nx=_plane(h.normal[:, 0]), ny=_plane(h.normal[:, 1]),
            nz=_plane(h.normal[:, 2]),
            tgx=_plane(h.tangent[:, 0]), tgy=_plane(h.tangent[:, 1]),
            tgz=_plane(h.tangent[:, 2]),
            alb_r=_plane(mat["albedo"][:, 0]),
            alb_g=_plane(mat["albedo"][:, 1]),
            alb_b=_plane(mat["albedo"][:, 2]),
            opacity=_plane(mat["opacity"]), rough=_plane(mat["roughness"]),
            metal=_plane(mat["metallic"]), ior=_plane(mat["ior"]),
            catcher=_plane(mat["shadow_catcher"]),
            emi_r=_plane(mat["emissive"][:, 0]),
            emi_g=_plane(mat["emissive"][:, 1]),
            emi_b=_plane(mat["emissive"][:, 2]),
            tn_x=_plane(mat["tangent_normal"][:, 0]),
            tn_y=_plane(mat["tangent_normal"][:, 1]),
            tn_z=_plane(mat["tangent_normal"][:, 2]),
            env_r=_plane(env[:, 0]), env_g=_plane(env[:, 1]),
            env_b=_plane(env[:, 2]),
            sdx=sdx, sdy=sdy, sdz=sdz,
            sun_exists=exists_p, shadow_hit=shadow_hit_p,
        )
        sun_energy = jnp.concatenate(
            [fs.sun_energy, jnp.zeros((1,), jnp.float32)]
        ).reshape(1, 4)
        outs = _call_shade(
            shade_kernel, sun_energy, jnp.asarray([it], jnp.int32),
            [planes[k] for k in SHADE_INPUTS], n_rows, interpret,
        )
        o = dict(zip(SHADE_OUTPUTS, outs))

        def vec3(x, y, z):
            return jnp.stack(
                [x.reshape(r), y.reshape(r), z.reshape(r)], axis=-1
            )

        new_state = RayState(
            orig=vec3(o["ox"], o["oy"], o["oz"]),
            dirn=vec3(o["dx"], o["dy"], o["dz"]),
            radiance=vec3(o["rad_r"], o["rad_g"], o["rad_b"]),
            throughput=vec3(o["thr_r"], o["thr_g"], o["thr_b"]),
            alpha=o["alpha"].reshape(r),
            alive=o["alive"].reshape(r) > 0,
            bounce=o["bounce"].reshape(r),
            pixel_ids=state.pixel_ids,
            sample_ids=state.sample_ids,
        )
        if record:
            d_sun = (
                vec3(sdx, sdy, sdz) if static.has_sun
                else jnp.zeros((r, 3), jnp.float32)
            )
            rec = (
                h,
                d_sun,
                exists_p.reshape(r) > 0,
                shadow_hit_p.reshape(r) > 0,
            )
            return new_state, rec
        return new_state

    return step


def make_pallas_integrator(static: SceneStatic, cfg: RenderConfig,
                           closest, any_hit, interpret=None,
                           live_sync=None):
    """Integrator with the fused Pallas shading path.

    Produces identical images to ``ptx.integrator.wavefront.make_integrator``
    (same RNG streams, same merge order); only the execution schedule differs.
    Forward-only (the differentiable path builds on :func:`make_pallas_step`
    with ``record=True`` — ``ptx.diff.fast``).

    ``live_sync`` (SPMD use): when ``closest``/``any_hit`` contain
    collectives (the scene-sharded reduces), pass an axis-wide pmax so every
    chip agrees on loop trip counts — same contract as
    ``wavefront._chunked_forward``.
    """
    from ptx.integrator.wavefront import RayState
    from ptx.kernels import sorting
    from ptx.scene import camera as pcamera

    q = cfg.quirks
    extra = cfg.opacity_extra_iters if static.has_translucent else 0
    max_iters = cfg.bounces + extra
    do_compact = sorting.resolve_compact(static, cfg)
    step = make_pallas_step(static, cfg, closest, any_hit, interpret)

    def integrate(fs, pixel_ids, sample_ids):
        from ptx.integrator.wavefront import _chunked_forward

        r = pixel_ids.shape[0]
        if r % LANES:
            raise ValueError(f"ray count {r} must be a multiple of {LANES}")
        orig, dirn = pcamera.generate_rays(
            fs, pixel_ids, sample_ids, cfg.width, cfg.height, cfg.seed,
            q.first_sample_centered, cfg.transparent_background,
        )
        state = RayState(
            orig=orig, dirn=dirn,
            radiance=jnp.zeros((r, 3)), throughput=jnp.ones((r, 3)),
            alpha=jnp.zeros((r,)), alive=jnp.ones((r,), bool),
            bounce=jnp.full((r,), cfg.bounces, jnp.int32),
            pixel_ids=pixel_ids.astype(jnp.int32),
            sample_ids=sample_ids.astype(jnp.int32),
        )

        if do_compact:
            return _chunked_forward(
                step, fs, state, max_iters, static, live_sync
            )

        def any_alive(s):
            n = jnp.sum(s.alive.astype(jnp.int32))
            return (live_sync(n) if live_sync is not None else n) > 0

        def cond(carry):
            it, s = carry
            return (it < max_iters) & any_alive(s)

        def body(carry):
            it, s = carry
            return it + 1, step(fs, it, s)

        _, state = jax.lax.while_loop(cond, body, (jnp.int32(0), state))
        return state.radiance, state.alpha

    return integrate
