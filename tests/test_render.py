import os

import jax.numpy as jnp
import numpy as np
import pytest

from ptx import render as R
from ptx.config import Quirks, RenderConfig
from ptx.integrator import accumulate

CORNELL = "/root/reference/path-tracer-core/scenes/cornell-box/cornell.gltf"
GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "cornell_48_s4_b3.npy")


@pytest.fixture(scope="module")
def cornell():
    return R.load_scene(CORNELL)


def _render(cornell, **kw):
    fs, static = cornell
    cfg = RenderConfig(
        width=48, height=48, samples=4, bounces=3, intersector="brute", **kw
    )
    return R.render(fs, static, cfg)


def test_render_deterministic(cornell):
    a = _render(cornell)
    b = _render(cornell)
    np.testing.assert_array_equal(a.color, b.color)
    np.testing.assert_array_equal(a.image, b.image)


def test_render_statistics(cornell):
    res = _render(cornell)
    c = res.color
    assert np.isfinite(c).all()
    assert c.min() >= 0.0
    # The emissive panel (x10) must be the brightest thing in frame.
    assert c.max() > 5.0
    # Scene is lit: mean radiance in a sane band.
    assert 0.05 < c.mean() < 2.0
    # Opaque background -> alpha 1 everywhere.
    np.testing.assert_allclose(res.alpha, 1.0, atol=1e-6)


def test_render_golden(cornell):
    res = _render(cornell)
    if not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.save(GOLDEN, res.color)
        pytest.skip("golden image generated")
    golden = np.load(GOLDEN)
    np.testing.assert_allclose(res.color, golden, rtol=1e-4, atol=1e-5)


def test_seed_changes_noise(cornell):
    a = _render(cornell)
    b = _render(cornell, seed=7)
    # Different RNG stream -> different noise, same converged-ish mean.
    assert not np.array_equal(a.color, b.color)
    assert abs(a.color.mean() - b.color.mean()) < 0.1


def test_more_bounces_more_light(cornell):
    fs, static = cornell
    means = []
    for bounces in (1, 2, 4):
        cfg = RenderConfig(width=32, height=32, samples=4, bounces=bounces,
                           intersector="brute")
        means.append(R.render(fs, static, cfg).color.mean())
    # Monotone: additional bounces only add energy.
    assert means[0] < means[1] < means[2]


def test_physical_quirks_mode():
    # Physical mode folds KHR emissive_strength=10 at load instead of the
    # shading-time x10 quirk; for cornell these coincide, so the light stays
    # equally bright.
    q = Quirks.physical()
    scene = R.load_scene(CORNELL, quirks=q)
    res = _render(scene, quirks=q)
    assert np.isfinite(res.color).all()
    assert res.color.max() > 5.0


def test_accumulate_claim_semantics():
    # 2 pixels, 3 samples: pixel 0 sees transparent, opaque, transparent;
    # pixel 1 is always transparent.
    radiance = jnp.asarray(
        np.array(
            [
                [[0.0, 0.0, 0.0], [0.0, 0.0, 0.0]],
                [[3.0, 3.0, 3.0], [0.0, 0.0, 0.0]],
                [[0.0, 0.0, 0.0], [0.0, 0.0, 0.0]],
            ],
            np.float32,
        )
    )
    alpha = jnp.asarray(np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 0.0]], np.float32))
    color, a = accumulate.accumulate_claim(radiance, alpha)
    # Pixel 0: claimed at sample 1 -> color overwritten to the opaque sample,
    # alpha = 1/2 then blended with the transparent sample 2 -> 1/3.
    np.testing.assert_allclose(color[0], [3, 3, 3], atol=1e-6)
    np.testing.assert_allclose(a[0], 1.0 / 3.0, atol=1e-6)
    # Pixel 1: never claimed -> transparent black.
    np.testing.assert_allclose(color[1], [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(a[1], 0.0, atol=1e-6)


def test_finalize_range():
    color = jnp.asarray(np.array([[0.0, 0.5, 100.0]], np.float32))
    alpha = jnp.asarray(np.array([1.0], np.float32))
    img = accumulate.finalize(color, alpha)
    assert img.dtype == np.uint8
    assert img[0, 3] == 255
    assert img[0, 0] == 0 and img[0, 2] == 255


def test_cli_metrics_report(tmp_path):
    """`ptx render --metrics` prints the per-phase observability report
    (trace/accumulate/finalize timers + throughput) — SURVEY §5's metrics
    subsystem wired through the CLI."""
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-m", "ptx.cli", "render", "--scene", CORNELL,
         "--out", str(tmp_path / "m.png"), "--width", "16", "--height",
         "16", "--samples", "2", "--bounces", "2", "--cpu",
         "--intersector", "brute", "--metrics"],
        capture_output=True, text=True, timeout=420, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "trace" in out.stderr and "finalize" in out.stderr
    assert (tmp_path / "m.png").exists()


def test_cli_config_json_round_trip(tmp_path):
    """`ptx render --config cfg.json` (the reference's worker_info payload
    style, SURVEY §5 config layer): a JSON round-tripped RenderConfig must
    drive the CLI to the same image as the equivalent flags."""
    import subprocess
    import sys

    from ptx.io.png import read_png

    cfg = RenderConfig(width=16, height=16, samples=2, bounces=2,
                       intersector="brute")
    cfg2 = RenderConfig.from_json(cfg.to_json())
    assert cfg2 == cfg

    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(cfg.to_json())
    base = [sys.executable, "-m", "ptx.cli", "render", "--scene", CORNELL,
            "--cpu"]
    a = subprocess.run(
        base + ["--out", str(tmp_path / "a.png"), "--config", str(cfg_path)],
        capture_output=True, text=True, timeout=420, cwd="/root/repo",
    )
    assert a.returncode == 0, a.stderr[-2000:]
    b = subprocess.run(
        base + ["--out", str(tmp_path / "b.png"), "--width", "16",
                "--height", "16", "--samples", "2", "--bounces", "2",
                "--intersector", "brute"],
        capture_output=True, text=True, timeout=420, cwd="/root/repo",
    )
    assert b.returncode == 0, b.stderr[-2000:]
    np.testing.assert_array_equal(
        read_png(str(tmp_path / "a.png")), read_png(str(tmp_path / "b.png"))
    )
