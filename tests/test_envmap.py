"""Environment-map path: equirectangular sampling on miss + furnace test."""

import numpy as np
import pytest

from ptx import render as R
from ptx.config import Quirks, RenderConfig

CORNELL = "/root/reference/path-tracer-core/scenes/cornell-box/cornell.gltf"


def test_env_map_miss_color():
    # Constant-color env map: misses must return exactly that color.
    env = np.zeros((8, 16, 3), np.float32)
    env[:, :, 0] = 0.25  # dark red sky
    env[:, :, 1] = 0.5
    fs, static = R.load_scene(CORNELL, env_image=env)
    assert static.env_tex >= 0
    cfg = RenderConfig(width=32, height=32, samples=1, bounces=1,
                       intersector="brute",
                       quirks=Quirks(emissive_scale=0.0,
                                     first_sample_centered=True))
    res = R.render(fs, static, cfg)
    # The cornell camera looks into the open box; any missing rays (there are
    # corners that miss geometry) must show the env color scaled by
    # environment_factor = 1.
    c = res.color.reshape(-1, 3)
    # Find pure-env pixels: exactly the env color.
    is_env = np.isclose(c[:, 0], 0.25, atol=1e-5) & np.isclose(
        c[:, 1], 0.5, atol=1e-5
    )
    # Either some rays miss (open-box corners) or none do; both renders must
    # at minimum not blow up and keep env sampling finite.
    assert np.isfinite(c).all()
    if is_env.any():
        np.testing.assert_allclose(c[is_env][:, 2], 0.0, atol=1e-5)


def test_environment_factor_scales_miss():
    fs, static = R.load_scene(CORNELL)
    base = RenderConfig(width=16, height=16, samples=1, bounces=1,
                        intersector="brute",
                        quirks=Quirks(emissive_scale=0.0))
    double = RenderConfig(width=16, height=16, samples=1, bounces=1,
                          intersector="brute",
                          environment_factor=(2.0, 2.0, 2.0),
                          quirks=Quirks(emissive_scale=0.0))
    a = R.render(fs, static, base).color
    b = R.render(fs, static, double).color
    # With emissive off and a single bounce, radiance comes only from env
    # misses after the first bounce -> exactly doubles.
    np.testing.assert_allclose(b, a * 2.0, rtol=1e-5, atol=1e-7)


def test_cli_env_flag_renders_with_hdr_map(tmp_path):
    """`ptx render --env sky.hdr` end-to-end: RGBE round trip through the
    CLI's env-map plumbing produces a lit image."""
    import subprocess
    import sys

    from ptx.io.hdr import write_hdr

    sky = np.zeros((8, 16, 3), np.float32)
    sky[:4] = [0.4, 0.6, 1.2]   # bright upper hemisphere
    sky[4:] = [0.05, 0.05, 0.05]
    hdr_path = str(tmp_path / "sky.hdr")
    write_hdr(hdr_path, sky)

    out = subprocess.run(
        [sys.executable, "-m", "ptx.cli", "render", "--scene", CORNELL,
         "--out", str(tmp_path / "env.png"), "--width", "16", "--height",
         "16", "--samples", "2", "--bounces", "2", "--cpu",
         "--intersector", "brute", "--env", hdr_path],
        capture_output=True, text=True, timeout=420, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    from ptx.io.png import read_png

    img = read_png(str(tmp_path / "env.png"))
    assert img[..., :3].max() > 0
