"""Bilinear texture sampling over the flat texel pack.

Counterpart of ``image::image_texture::sample`` (``image/image_texture.cpp:
20-61``): bilinear filtering with wrap addressing and V flip, operating on a
single flat texel buffer with per-texture (offset, width, height) — a
gather-based design so a whole wavefront samples *different* textures in one
vectorized call (no per-material branching).

sRGB decode already happened at load (``gltf.decode_image``), so all texels
are linear.  Channel conventions (G = roughness, B = metallic, normal
``2t - 1``) live in the material accessors in this module, mirroring
``core/material.cpp``.
"""

from __future__ import annotations

import jax.numpy as jnp

from ptx import math as pmath
from ptx.scene.flatten import (
    FlatScene,
    SLOT_ALBEDO,
    SLOT_EMISSIVE,
    SLOT_METALLIC,
    SLOT_NORMAL,
    SLOT_OPACITY,
    SLOT_ROUGHNESS,
)


def sample_texture(fs: FlatScene, tex_idx, uv):
    """Bilinear sample.  ``tex_idx``: [R] i32 pack slots; ``uv``: [R, 2].
    Returns linear RGBA [R, 4]."""
    w = fs.tex_width[tex_idx].astype(jnp.float32)
    h = fs.tex_height[tex_idx].astype(jnp.float32)
    off = fs.tex_offset[tex_idx]
    wi = fs.tex_width[tex_idx]
    hi = fs.tex_height[tex_idx]

    # Pixel center with V flip (image_texture.cpp:31-32).
    cx = uv[..., 0] * w - 0.5
    cy = (1.0 - uv[..., 1]) * h - 0.5

    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    dx = cx - x0
    dy = cy - y0

    def wrap(v, size_f, size_i):
        return jnp.mod(v.astype(jnp.int32), jnp.maximum(size_i, 1))

    x0i = wrap(x0, w, wi)
    x1i = wrap(x0 + 1.0, w, wi)
    y0i = wrap(y0, h, hi)
    y1i = wrap(y0 + 1.0, h, hi)

    def texel(xi, yi):
        return fs.tex_texels[off + yi * wi + xi]

    tl = texel(x0i, y0i)
    tr = texel(x1i, y0i)
    bl = texel(x0i, y1i)
    br = texel(x1i, y1i)
    top = pmath.lerp(tl, tr, dx[..., None])
    bot = pmath.lerp(bl, br, dx[..., None])
    return pmath.lerp(top, bot, dy[..., None])


# ---------------------------------------------------------------------------
# Material accessors (core/material.cpp semantics, vectorized over rays)
# ---------------------------------------------------------------------------


def material_lookup(fs: FlatScene, mat_id, uv):
    """Fetch all shading inputs for a wavefront of hits.

    ``mat_id``: [R] i32, ``uv``: [R, 2].  Returns a dict of per-ray material
    properties; slots with no texture hit the neutral dummy texels so the
    whole fetch is branch-free.
    """
    tex = fs.mat_tex[mat_id]  # [R, 7]
    albedo = fs.mat_albedo[mat_id] * sample_texture(fs, tex[..., SLOT_ALBEDO], uv)[..., :3]
    opacity = fs.mat_opacity[mat_id] * sample_texture(fs, tex[..., SLOT_OPACITY], uv)[..., 3]
    # G channel = roughness, B = metallic (material.cpp:34-44).
    mr = sample_texture(fs, tex[..., SLOT_ROUGHNESS], uv)
    roughness = fs.mat_roughness[mat_id] * mr[..., 1]
    metallic = fs.mat_metallic[mat_id] * sample_texture(fs, tex[..., SLOT_METALLIC], uv)[..., 2]
    emissive = fs.mat_emissive[mat_id] * sample_texture(fs, tex[..., SLOT_EMISSIVE], uv)[..., :3]
    # Normal map decode 2t - 1 (material.cpp:6-11).
    tangent_normal = sample_texture(fs, tex[..., SLOT_NORMAL], uv)[..., :3] * 2.0 - 1.0
    return dict(
        albedo=albedo,
        opacity=opacity,
        roughness=roughness,
        metallic=metallic,
        emissive=emissive,
        tangent_normal=tangent_normal,
        ior=fs.mat_ior[mat_id],
        shadow_catcher=fs.mat_shadow_catcher[mat_id],
    )
