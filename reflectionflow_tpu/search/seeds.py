"""Deterministic candidate seeding.

The reference draws random int32 seeds from global host RNG state
(`/root/reference/tts/utils.py:131-155`); here every candidate seed is a
pure function of (run_seed, prompt_idx, round, branch) so any run — or any
single image — is reproducible in isolation.
"""

from __future__ import annotations

import jax
import numpy as np

from ..models.flux.latents import draw_packed_noise


def candidate_seeds(run_seed: int, prompt_idx: int, round_idx: int, n: int) -> list[int]:
    rng = np.random.Generator(np.random.PCG64([run_seed, prompt_idx, round_idx]))
    return [int(s) for s in rng.integers(0, 2**31 - 1, size=n)]


def seeds_to_latents(seeds, height, width, channels, dtype, vae_downscale=8):
    """One packed-noise latent per seed, concatenated on the batch axis."""
    lats = [
        draw_packed_noise(jax.random.PRNGKey(s), 1, height, width, channels, dtype, vae_downscale)
        for s in seeds
    ]
    import jax.numpy as jnp

    return jnp.concatenate(lats, axis=0)
