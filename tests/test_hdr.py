import numpy as np

from ptx.io import hdr


def test_hdr_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = (rng.uniform(0, 1, (16, 32, 3)) ** 2 * 50.0).astype(np.float32)
    path = str(tmp_path / "t.hdr")
    hdr.write_hdr(path, img)
    back = hdr.read_hdr(path)
    assert back.shape == img.shape
    # RGBE is a shared-exponent format: each channel is accurate to ~1/256
    # of the *max* channel of its pixel.
    tol = img.max(axis=-1, keepdims=True) / 256.0 + 1e-6
    assert np.all(np.abs(back - img) <= 2.0 * tol)


def test_hdr_zero_pixels(tmp_path):
    img = np.zeros((4, 8, 3), np.float32)
    img[2, 3] = [1000.0, 0.5, 0.0]
    path = str(tmp_path / "z.hdr")
    hdr.write_hdr(path, img)
    back = hdr.read_hdr(path)
    np.testing.assert_allclose(back[0, 0], 0.0)
    np.testing.assert_allclose(back[2, 3, 0], 1000.0, rtol=0.02)


def test_env_render_with_hdr(tmp_path):
    # End-to-end: render cornell against an .hdr environment.
    from ptx import render as R
    from ptx.config import Quirks, RenderConfig

    import jax.numpy as jnp

    env = np.full((8, 16, 3), 0.75, np.float32)
    path = str(tmp_path / "env.hdr")
    hdr.write_hdr(path, env)
    loaded = hdr.load_env_image(path)
    fs, static = R.load_scene(
        "/root/reference/path-tracer-core/scenes/cornell-box/cornell.gltf",
        env_image=loaded,
    )
    # Move the camera far outside the (fully enclosed) room and face away:
    # every primary ray misses and the image must be exactly the env radiance.
    fs = fs._replace(
        cam_basis=fs.cam_basis @ jnp.diag(jnp.array([-1.0, 1.0, -1.0])),
        cam_origin=jnp.array([0.0, 0.0, 500.0]),
    )
    cfg = RenderConfig(width=16, height=16, samples=1, bounces=2,
                       intersector="brute", quirks=Quirks(emissive_scale=0.0))
    res = R.render(fs, static, cfg)
    np.testing.assert_allclose(res.color, 0.75, rtol=0.01)
