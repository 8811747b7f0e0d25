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
