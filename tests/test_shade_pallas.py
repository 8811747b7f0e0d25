"""Fused Pallas shading path must match the XLA oracle bit-for-bit at the
image level (same RNG streams, same merge order)."""

import numpy as np
import pytest

from ptx import render as R
from ptx.config import RenderConfig

CORNELL = "/root/reference/path-tracer-core/scenes/cornell-box/cornell.gltf"
JACK = "/root/reference/path-tracer-core/scenes/jack-of-blades/jack-of-blades.gltf"


def _pair(scene_path, **kw):
    fs, static = R.load_scene(scene_path)
    base = dict(width=32, height=32, samples=2, bounces=3)
    base.update(kw)
    a = R.render(fs, static, RenderConfig(shader="xla", **base))
    b = R.render(fs, static, RenderConfig(shader="pallas", **base))
    return a, b


def test_cornell_kernel_matches_oracle():
    a, b = _pair(CORNELL, intersector="brute")
    np.testing.assert_allclose(a.color, b.color, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(a.image, b.image)


def test_jack_kernel_matches_oracle():
    # Exercises the sun kernel + NEE + textures + alpha-mode opacity.
    a, b = _pair(JACK, intersector="bvh", bounces=2, samples=1)
    np.testing.assert_allclose(a.color, b.color, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(a.image, b.image)


def test_transparent_background_matches():
    a, b = _pair(CORNELL, intersector="brute", transparent_background=True,
                 samples=2, bounces=2)
    np.testing.assert_allclose(a.alpha, b.alpha, atol=1e-6)
    np.testing.assert_allclose(a.color, b.color, rtol=1e-4, atol=1e-5)


def test_unaligned_pixel_count_rejected():
    fs, static = R.load_scene(CORNELL)
    cfg = RenderConfig(width=33, height=31, samples=1, bounces=1,
                       intersector="brute", shader="pallas")
    with pytest.raises(ValueError, match="multiple of 128"):
        R.render(fs, static, cfg)


def test_auto_falls_back_for_unaligned():
    fs, static = R.load_scene(CORNELL)
    cfg = RenderConfig(width=33, height=31, samples=1, bounces=1,
                       intersector="brute", shader="auto")
    res = R.render(fs, static, cfg)  # auto -> xla, no error
    assert np.isfinite(res.color).all()


def test_partial_block_rows_shade_correctly():
    """Regression: the shade/sun kernels floor-truncated their grid, so a
    wavefront whose row count is not a multiple of BLOCK_ROWS (e.g. the CLI
    default 640x480 -> 2400 rows) left the tail rows unshaded garbage."""
    from ptx import render as R
    from ptx.config import RenderConfig

    fs, static = R.load_scene("synthetic:500")
    base = dict(width=128, height=96, samples=2, bounces=3,
                intersector="brute")
    rp = R.render(fs, static, RenderConfig(shader="pallas", **base))
    rx = R.render(fs, static, RenderConfig(shader="xla", **base))
    np.testing.assert_allclose(
        np.asarray(rp.color), np.asarray(rx.color), atol=1e-5
    )
