"""Sample accumulation and image finalize.

Counterpart of the accumulation stage + image finalize
(``accumulation_worker.cpp:5-53``, ``worker.cpp:172-191``).  The reference
keeps a per-pixel running mean ``c = (c*n + x)/(n+1)`` guarded by an atomic
sample counter; since every ray accumulates exactly once, the running mean is
just the mean over the sample axis — a single vectorized reduce here.

The transparent-background "smart blending" claim logic
(``renderer.cpp:373-399``, ``accumulation_worker.cpp:25-43``) is inherently
sequential over samples (the first opaque sample *claims* the pixel and
overwrites prior transparent contributions); it is reproduced with a
``lax.scan`` over the sample axis — cheap, since it runs once per image.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ptx import math as pmath


def accumulate_mean(radiance, alpha):
    """Plain running-mean accumulation (opaque background).

    ``radiance``: [S, P, 3]; ``alpha``: [S, P].  Returns ([P,3], [P]).
    """
    return jnp.mean(radiance, axis=0), jnp.mean(alpha, axis=0)


def accumulate_claim(radiance, alpha):
    """Claim-blend accumulation for transparent backgrounds.

    Per sample s (in order), per pixel — reference ``renderer.cpp:373-399``:
      * opaque sample (a > 0.5) on an unclaimed pixel: overwrite color,
        alpha := 1/(s+1), claim.
      * transparent sample on a claimed pixel: blend alpha only.
      * transparent sample on an unclaimed pixel: keep transparent black.
      * opaque on claimed: blend color and alpha.
    """
    p = radiance.shape[1]

    def step(carry, inp):
        color, acc_alpha, claimed, s = carry
        sample_color, sample_alpha = inp
        opaque = sample_alpha > 0.5
        claim_now = opaque & ~claimed
        blend = opaque & claimed
        trans_on_claimed = ~opaque & claimed

        inv = 1.0 / (s + 1.0)
        new_color = jnp.where(
            claim_now[:, None],
            sample_color,
            jnp.where(
                blend[:, None], (color * s[..., None] + sample_color) * inv[..., None], color
            ),
        )
        new_alpha = jnp.where(
            claim_now,
            inv,
            jnp.where(
                blend | trans_on_claimed,
                (acc_alpha * s + sample_alpha) * inv,
                acc_alpha,
            ),
        )
        return (new_color, new_alpha, claimed | claim_now, s + 1.0), None

    init = (
        jnp.zeros((p, 3)),
        jnp.zeros((p,)),
        jnp.zeros((p,), bool),
        jnp.zeros((p,)),
    )
    (color, acc_alpha, _, _), _ = jax.lax.scan(step, init, (radiance, alpha))
    return color, acc_alpha


def finalize(color, alpha):
    """HDR -> display: ACES tonemap then gamma-2.2 sRGB encode + 8-bit
    quantize with round-half-up (``worker.cpp:180-188``,
    ``image/image.cpp:145-153``).  Returns uint8 RGBA."""
    rgb = pmath.srgb_encode(pmath.tonemap_approx_aces(color))
    rgba = jnp.concatenate([rgb, jnp.clip(alpha, 0.0, 1.0)[..., None]], axis=-1)
    return jnp.clip(rgba * 255.0 + 0.5, 0.0, 255.0).astype(jnp.uint8)
