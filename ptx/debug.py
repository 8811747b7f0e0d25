"""Debug visualization modes.

The reference ships three debug oracles in lieu of tests (SURVEY.md §4):
KD-tree depth visualization (``renderer.hpp:33``, ``mesh.cpp:314-331``), a
NaN dump in ``trace()`` (``renderer.cpp:623-639``) and the queue-depth
monitor.  Here the analogs are first-class render modes:

* ``depth``      — primary-hit distance as grayscale,
* ``normals``    — shading normal as RGB (n * 0.5 + 0.5),
* ``bvh-depth``  — BVH nodes visited per primary ray as a heat ramp (the
  traversal-cost oracle; requires an attached BVH),
* ``nan-check``  — render one sample pass and report any non-finite pixels
  (the NaN dump, vectorized).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ptx.config import RenderConfig
from ptx.scene import camera as pcamera
from ptx.scene.flatten import FlatScene, SceneStatic

MODES = ("depth", "normals", "bvh-depth", "nan-check")


def _primary_rays(fs, cfg):
    n_pixels = cfg.width * cfg.height
    pix = jnp.arange(n_pixels, dtype=jnp.int32)
    smp = jnp.zeros((n_pixels,), jnp.int32)
    return pcamera.generate_rays(
        fs, pix, smp, cfg.width, cfg.height, cfg.seed,
        first_sample_centered=True,
    )


def _heat(values):
    """Normalized scalar -> blue->red ramp, uint8 RGBA [P, 4]."""
    v = np.asarray(values, np.float32)
    hi = np.percentile(v, 99.0) or 1.0
    t = np.clip(v / max(hi, 1e-9), 0.0, 1.0)
    rgba = np.zeros((*t.shape, 4), np.uint8)
    rgba[..., 0] = (t * 255).astype(np.uint8)
    rgba[..., 1] = (np.sin(t * np.pi) * 160).astype(np.uint8)
    rgba[..., 2] = ((1.0 - t) * 255).astype(np.uint8)
    rgba[..., 3] = 255
    return rgba


def visualize(fs: FlatScene, static: SceneStatic, cfg: RenderConfig,
              mode: str) -> np.ndarray:
    """Render a debug visualization; returns [H, W, 4] uint8."""
    from ptx.render import ensure_accel, get_backend

    h, w = cfg.height, cfg.width
    orig, dirn = _primary_rays(fs, cfg)

    if mode == "bvh-depth":
        from ptx.accel import traverse

        cfg_bvh = cfg if cfg.intersector == "bvh" else RenderConfig(
            **{**cfg.__dict__, "intersector": "bvh"}
        )
        fs, static = ensure_accel(fs, static, cfg_bvh, device=True)
        visits = traverse.node_visits(fs, orig, dirn)
        return _heat(visits).reshape(h, w, 4)

    # The beauty path runs ensure_accel + device placement inside render();
    # the debug oracles intersect directly, so do both here (traced gathers
    # into host numpy arrays fail under jit).
    fs, static = ensure_accel(fs, static, cfg, device=True)
    closest, _ = get_backend(static, cfg)
    hit = closest(fs, orig, dirn)

    if mode == "depth":
        t = np.asarray(hit.t)
        t = np.where(np.asarray(hit.hit), t, np.nan)
        finite = t[np.isfinite(t)]
        lo, hi = (finite.min(), finite.max()) if finite.size else (0.0, 1.0)
        g = np.where(
            np.isfinite(t), 1.0 - (t - lo) / max(hi - lo, 1e-9), 0.0
        )
        rgba = np.zeros((t.shape[0], 4), np.uint8)
        rgba[:, 0] = rgba[:, 1] = rgba[:, 2] = (g * 255).astype(np.uint8)
        rgba[:, 3] = 255
        return rgba.reshape(h, w, 4)

    if mode == "normals":
        n = np.asarray(hit.normal) * 0.5 + 0.5
        n = np.where(np.asarray(hit.hit)[:, None], n, 0.0)
        rgba = np.concatenate(
            [(n * 255).astype(np.uint8), np.full((n.shape[0], 1), 255, np.uint8)],
            axis=1,
        )
        return rgba.reshape(h, w, 4)

    if mode == "nan-check":
        from ptx.render import make_sample_fn

        sample_fn = make_sample_fn(static, cfg)
        radiance, alpha = sample_fn(fs, jnp.int32(0))
        bad = ~np.isfinite(np.asarray(radiance)).all(axis=-1)
        n_bad = int(bad.sum())
        if n_bad:
            idx = np.argwhere(bad)[:16, 0]
            print(f"nan-check: {n_bad} non-finite pixels, first at flat ids "
                  f"{idx.tolist()}")
        else:
            print("nan-check: all pixels finite")
        rgba = np.zeros((bad.shape[0], 4), np.uint8)
        rgba[:, 0] = np.where(bad, 255, 0)
        rgba[:, 3] = 255
        return rgba.reshape(h, w, 4)

    raise ValueError(f"unknown visualization mode {mode!r}; pick from {MODES}")
