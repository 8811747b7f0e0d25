import numpy as np

from ptx import render as R
from ptx.config import RenderConfig


def test_synthetic_spec_roundtrip():
    fs, static = R.load_scene("synthetic:5000:3")
    assert static.n_tris == 5000
    assert static.n_materials == 3
    assert not static.has_sun
    # Deterministic for the same seed, different for another.
    fs2, _ = R.load_scene("synthetic:5000:3")
    np.testing.assert_array_equal(np.asarray(fs.tri_a), np.asarray(fs2.tri_a))
    fs3, _ = R.load_scene("synthetic:5000:4")
    assert not np.array_equal(np.asarray(fs.tri_a), np.asarray(fs3.tri_a))


def test_synthetic_render_bvh():
    fs, static = R.load_scene("synthetic:20000")
    cfg = RenderConfig(width=32, height=32, samples=1, bounces=2,
                       intersector="bvh")
    res = R.render(fs, static, cfg)
    assert np.isfinite(res.color).all()
    # The emissive clusters light the soup.
    assert res.color.mean() > 0.01
