"""Measured accept/reject of the MT-as-matmul (MXU) intersection formulation.

BASELINE.md's north star asks whether the intersection sweep can ride the
MXU instead of the VPU.  The candidate formulation is the classic per-
triangle affine ("Woop") transform: precompute, for every triangle
(a, e1, e2) with normal n = e1 x e2, the inverse basis

    A = [e1 | e2 | n],   M = A^-1            (3x3, rows mu/mv/mz)

so a world ray (o, d) maps to the triangle's unit frame with two GEMMs:

    O' = [o | 1] @ W_o      W_o : [4, 3T]   (rows of M plus -M a)
    D' =  d      @ W_d      W_d : [3, 3T]

and the per-pair epilogue is branch-free VPU work:
    t = -O'_z / D'_z;  u = O'_x + t D'_x;  v = O'_y + t D'_y
    hit = (u >= -eps) & (v >= -eps) & (u + v <= 1 + eps) & (t >= 0)

identical math to Moller-Trumbore (u == beta, v == gamma, same t), so the
two formulations are comparable bit-for-bit up to f32 rounding.

Why this *should* lose on TPU, measured here rather than asserted: the GEMM
contraction depth is K = 4 (resp. 3) against a 128-deep systolic column, so
the MXU runs at <= 4/128 ~ 3% utilization; and more than half the per-pair
FLOPs (the epilogue + running min) are VPU work anyway, so by Amdahl the
formulation cannot beat a VPU sweep whose 53 FLOPs/test all vectorize.

Run on the TPU:  python tools/mxu_mt.py [n_rays] [n_tris]
Prints one JSON line per formulation plus a verdict line.  The measured
numbers from the driver chip are recorded in BASELINE.md and referenced by
``ptx.bench.run_pallas_roofline``.

RESULT (TPU v5 lite, 2026-08-20, n_rays=8192, n_tris=65536, f32):
    brute VPU sweep (production ptx.kernels.intersect.brute_closest):
        1.057e10 tests/s
    MXU f32 GEMM + epilogue:      8.00e9 tests/s   (0.76x brute)
    MXU bf16-in/f32-acc GEMM:     8.00e9 tests/s   (0.76x brute — timing
        *identical* to f32, i.e. the GEMM contributes ~zero of the runtime;
        and bf16 Woop coordinates are geometrically unusable anyway:
        8 mantissa bits.  hit_agree vs MT drops to 0.94 even in f32 —
        grazing/near-tie hits resolve differently through the inverted
        frame, a precision regression on top of the slowdown.)
    t_tile sweep at n_rays=32768: 256 -> 4.15e9, 1024 -> 3.28e9,
        2048 -> 3.40e9 tests/s vs brute 5.61e9 — MXU loses at every tile
        size and the gap widens once the [R, T] intermediates spill to HBM.
    VERDICT: REJECT — the epilogue-bound pipeline caps below the plain VPU
    sweep, exactly as the K/128 utilization argument predicts; the MXU
    stays idle in this workload and the Pallas block-traversal kernel's
    speed of light remains min(VPU issue rate, HBM).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from ptx import render as R  # noqa: E402
from ptx.config import RenderConfig  # noqa: E402
from ptx.kernels import intersect as intersect_mod  # noqa: E402
from ptx.scene import camera as pcamera  # noqa: E402

EPS = 1e-4


def woop_matrices(tri_a, tri_e1, tri_e2):
    """Host-side precompute of the stacked GEMM operands.

    Returns ``(W_o [4, 3T], W_d [3, 3T])`` with per-triangle column triples
    (u, v, z).  Degenerate (padding) triangles get a singular frame mapped to
    an always-miss column (D'_z == 0 and O'_z == 1 -> t < 0)."""
    a = np.asarray(tri_a, np.float64)
    e1 = np.asarray(tri_e1, np.float64)
    e2 = np.asarray(tri_e2, np.float64)
    n = np.cross(e1, e2)
    A = np.stack([e1, e2, n], axis=-1)  # [T, 3, 3] columns e1|e2|n
    det = np.linalg.det(A)
    bad = np.abs(det) < 1e-30
    A[bad] = np.eye(3)
    M = np.linalg.inv(A)  # [T, 3, 3] rows map world -> (u, v, z)
    trans = -np.einsum("tij,tj->ti", M, a)  # [T, 3]
    # Always-miss column for degenerate frames: z(d) = 0, z(o) = -1 => t = -(-1)/0 -> inf rejected by isfinite; simpler: make t negative.
    M[bad] = 0.0
    trans[bad] = np.array([0.0, 0.0, -1.0])
    # Column 3t + k holds row k of M_t: W[:, 3t+k] = M[t, k, :].
    T = M.shape[0]
    W_d = np.empty((3, 3 * T), np.float64)
    W_o = np.empty((4, 3 * T), np.float64)
    Mk = np.transpose(M, (1, 0, 2))  # [3(k), T, 3(axis)]
    for k in range(3):
        W_d[:, k::3] = Mk[k].T  # [3, T]
        W_o[:3, k::3] = Mk[k].T
        W_o[3, k::3] = trans[:, k]
    return W_o.astype(np.float32), W_d.astype(np.float32)


def make_mxu_closest(W_o, W_d, t_tile: int = 512, dtype=jnp.float32):
    """Closest-hit sweep: fori_loop over triangle tiles, each tile = two
    GEMMs ([R,4]x[4,3TT], [R,3]x[3,3TT]) + VPU epilogue + running min."""
    W_o = jnp.asarray(W_o, dtype)
    W_d = jnp.asarray(W_d, dtype)
    n3 = W_o.shape[1]
    n_tris = n3 // 3
    n_tiles = -(-n_tris // t_tile)

    def closest(orig, dirn):
        r = orig.shape[0]
        o_h = jnp.concatenate(
            [orig, jnp.ones((r, 1), orig.dtype)], axis=1
        ).astype(dtype)
        d_in = dirn.astype(dtype)

        def body(i, carry):
            best_t, best_tri = carry
            start = i * t_tile * 3
            wo = jax.lax.dynamic_slice_in_dim(W_o, start, t_tile * 3, axis=1)
            wd = jax.lax.dynamic_slice_in_dim(W_d, start, t_tile * 3, axis=1)
            op = jnp.dot(o_h, wo, preferred_element_type=jnp.float32)
            dp = jnp.dot(d_in, wd, preferred_element_type=jnp.float32)
            op = op.reshape(r, t_tile, 3)
            dp = dp.reshape(r, t_tile, 3)
            dz = dp[..., 2]
            t = -op[..., 2] / jnp.where(dz == 0.0, 1.0, dz)
            u = op[..., 0] + t * dp[..., 0]
            v = op[..., 1] + t * dp[..., 1]
            ok = (
                (u >= -EPS) & (v >= -EPS) & (u + v <= 1.0 + EPS)
                & (t >= 0.0) & (dz != 0.0) & jnp.isfinite(t)
            )
            t = jnp.where(ok, t, np.float32(3.0e38))
            arg = jnp.argmin(t, axis=1)
            tmin = jnp.take_along_axis(t, arg[:, None], axis=1)[:, 0]
            closer = tmin < best_t
            best_tri = jnp.where(
                closer, i * t_tile + arg.astype(jnp.int32), best_tri
            )
            best_t = jnp.minimum(best_t, tmin)
            return best_t, best_tri

        init = (
            jnp.full((r,), np.float32(3.0e38)),
            jnp.zeros((r,), jnp.int32),
        )
        return jax.lax.fori_loop(0, n_tiles, body, init)

    return closest


def bench(fn, args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


def main(n_rays=8192, n_tris=65536):
    cfg = RenderConfig(width=256, height=256, samples=1, bounces=1,
                       intersector="brute", sort_rays="off")
    fs, static = R.load_scene(f"synthetic:{n_tris}", quirks=cfg.quirks)
    t_padded = int(static.n_tris_padded)

    pixel_ids = jnp.arange(n_rays, dtype=jnp.int32) % (cfg.width * cfg.height)
    sample_ids = jnp.zeros((n_rays,), jnp.int32)
    orig, dirn = pcamera.generate_rays(
        fs, pixel_ids, sample_ids, cfg.width, cfg.height, cfg.seed, True, False
    )

    results = {}

    # Production VPU brute sweep (t + argmin only — same outputs as MXU).
    brute = jax.jit(
        lambda o, d: intersect_mod.brute_closest(fs, o, d)[:2]
    )
    dt, (bt, btri) = bench(brute, (orig, dirn))
    results["brute_vpu"] = {
        "tests_per_s": n_rays * t_padded / dt, "elapsed_s": dt,
    }

    W_o, W_d = woop_matrices(fs.tri_a, fs.tri_e1, fs.tri_e2)

    for name, dtype in (("mxu_f32", jnp.float32), ("mxu_bf16", jnp.bfloat16)):
        closest = jax.jit(make_mxu_closest(W_o, W_d, dtype=dtype))
        dt, (mt, mtri) = bench(closest, (orig, dirn))
        entry = {
            "tests_per_s": n_rays * t_padded / dt, "elapsed_s": dt,
            "ratio_vs_brute": (
                n_rays * t_padded / dt
            ) / results["brute_vpu"]["tests_per_s"],
        }
        if dtype == jnp.float32:
            # Numerics: same winner / same distance (up to f32 rounding and
            # genuine near-ties between formulations).
            bt_np, mt_np = np.asarray(bt), np.asarray(mt)
            both_hit = (bt_np < 1e30) & (mt_np < 1e30)
            entry["hit_agree_frac"] = float(
                np.mean((bt_np < 1e30) == (mt_np < 1e30))
            )
            if both_hit.any():
                entry["t_rel_err_max"] = float(
                    np.max(
                        np.abs(bt_np[both_hit] - mt_np[both_hit])
                        / np.maximum(bt_np[both_hit], 1e-6)
                    )
                )
        results[name] = entry
        print(json.dumps({"formulation": name, **{
            k: (round(v, 4) if isinstance(v, float) else v)
            for k, v in entry.items()
        }}))

    print(json.dumps({
        "formulation": "brute_vpu",
        "tests_per_s": round(results["brute_vpu"]["tests_per_s"], 1),
    }))
    accept = results["mxu_f32"]["ratio_vs_brute"] > 1.25
    print(json.dumps({
        "verdict": "ACCEPT" if accept else "REJECT",
        "mxu_f32_vs_brute": round(results["mxu_f32"]["ratio_vs_brute"], 3),
        "mxu_bf16_vs_brute": round(results["mxu_bf16"]["ratio_vs_brute"], 3),
        "device": str(jax.devices()[0]),
        "n_rays": n_rays, "n_tris": t_padded,
    }))
    return results


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:3]]
    main(*args)
