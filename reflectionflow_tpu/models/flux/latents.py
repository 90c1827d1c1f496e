"""Packed-latent layout helpers.

FLUX packs the 16-channel VAE latent grid into 2x2 patches: a (B, 16, h, w)
latent becomes (B, h/2 * w/2, 64) tokens — the sequence the DiT consumes
(capability of FluxPipeline._pack_latents as exercised by
`/root/reference/tts/utils.py:71-87`). We use NHWC internally (TPU conv
layout) and expose both pack directions plus seeded noise drawing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def latent_tokens(height_px: int, width_px: int, vae_downscale: int = 8) -> tuple[int, int]:
    """(tokens_y, tokens_x) of the packed grid for an image size in pixels."""
    return height_px // (vae_downscale * 2), width_px // (vae_downscale * 2)


def pack_latents(lat: jnp.ndarray) -> jnp.ndarray:
    """(B, h, w, C) latent grid -> (B, h/2*w/2, C*4) packed tokens.

    Channel order within a token is (C-major over the 2x2 patch):
    [c0@(0,0).. cC@(0,0) ... ] matching the layout of weights trained on
    (B, C, h, w) patchify with patch dims appended after channels.
    """
    B, h, w, C = lat.shape
    x = lat.reshape(B, h // 2, 2, w // 2, 2, C)
    # -> (B, h2, w2, C, py, px): token features ordered channel-major, then 2x2
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(B, (h // 2) * (w // 2), C * 4)


def unpack_latents(tokens: jnp.ndarray, tokens_y: int, tokens_x: int) -> jnp.ndarray:
    """(B, L, C*4) -> (B, h, w, C) latent grid (inverse of pack_latents)."""
    B, L, F = tokens.shape
    C = F // 4
    x = tokens.reshape(B, tokens_y, tokens_x, C, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (B, h2, py, w2, px, C)
    return x.reshape(B, tokens_y * 2, tokens_x * 2, C)


def draw_packed_noise(
    key: jax.Array,
    batch: int,
    height_px: int,
    width_px: int,
    channels: int = 16,
    dtype=jnp.bfloat16,
    vae_downscale: int = 8,
) -> jnp.ndarray:
    """Seeded initial latents, already packed: (B, L, channels*4)."""
    ty, tx = latent_tokens(height_px, width_px, vae_downscale)
    noise = jax.random.normal(key, (batch, ty * 2, tx * 2, channels), dtype=jnp.float32)
    return pack_latents(noise).astype(dtype)
