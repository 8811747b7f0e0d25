"""Checkpoint/resume: a resumed render must equal an uninterrupted one."""

import os

import numpy as np
import pytest

from ptx import render as R
from ptx.config import RenderConfig
from ptx.io import checkpoint as ck

CORNELL = "/root/reference/path-tracer-core/scenes/cornell-box/cornell.gltf"


@pytest.fixture(scope="module")
def cornell():
    return R.load_scene(CORNELL)


def _cfg(samples):
    return RenderConfig(width=24, height=24, samples=samples, bounces=2,
                        intersector="brute")


def test_resume_identical(cornell, tmp_path):
    fs, static = cornell
    path = str(tmp_path / "render.ckpt.npz")

    # Uninterrupted 6-sample render.
    full = R.render(fs, static, _cfg(6))

    # Interrupted: render 3 samples (checkpointing), then resume to 6 —
    # the fingerprint excludes the sample count, so the checkpoint is valid
    # for any larger target.
    R.render(fs, static, _cfg(3), checkpoint_path=path, checkpoint_every=1)
    loaded = ck.load(path)
    assert loaded is not None and loaded.samples_done == 3

    resumed = R.render(fs, static, _cfg(6), checkpoint_path=path)
    np.testing.assert_allclose(resumed.color, full.color, rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(resumed.image, full.image)


def test_checkpoint_rejects_mismatched_config(cornell, tmp_path):
    fs, static = cornell
    path = str(tmp_path / "render.ckpt.npz")
    R.render(fs, static, _cfg(3), checkpoint_path=path, checkpoint_every=1)
    # Different seed -> different fingerprint -> checkpoint ignored.
    other = RenderConfig(width=24, height=24, samples=3, bounces=2,
                         intersector="brute", seed=9)
    assert ck.load(path, ck.config_fingerprint(other)) is None


def test_checkpoint_missing_file(tmp_path):
    assert ck.load(str(tmp_path / "nope.npz")) is None


def test_preview_png_written_and_matches_checkpoint_state(cornell, tmp_path):
    """Each checkpoint writes a viewable preview that is exactly
    finalize() of the checkpointed accumulator (reference's periodic image
    flush, core/renderer.cpp:409-424; VERDICT r3 #8)."""
    from ptx.integrator import accumulate
    from ptx.io.png import read_png

    fs, static = cornell
    path = str(tmp_path / "render.ckpt.npz")
    preview = str(tmp_path / "partial.preview.png")
    R.render(fs, static, _cfg(3), checkpoint_path=path, checkpoint_every=1,
             preview_path=preview)
    assert os.path.exists(preview)
    loaded = ck.load(path)
    img = read_png(preview)
    expect = np.asarray(
        accumulate.finalize(loaded.color, loaded.alpha)
    ).reshape(24, 24, 4)
    np.testing.assert_array_equal(img, expect)

    # Default location (no explicit preview_path): next to the checkpoint.
    path2 = str(tmp_path / "render2.ckpt.npz")
    R.render(fs, static, _cfg(3), checkpoint_path=path2, checkpoint_every=1)
    assert os.path.exists(path2 + ".preview.png")
