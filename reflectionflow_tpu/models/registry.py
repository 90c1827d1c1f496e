"""Generator-family latent-preparation registry.

Capability parity with the reference's per-family latent prep dispatch
(`/root/reference/tts/utils.py:71-128`: FLUX packed 2x2 / SD / SDXL / SD3)
— FLUX is the only family with a full pipeline in this framework (the
reference's SD3 corrector path references missing code, SURVEY.md §7.4),
but the seam is first-class so new families plug in with one entry.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp

from .flux.latents import latent_tokens, pack_latents


@dataclass(frozen=True)
class LatentSpec:
    channels: int
    vae_downscale: int
    packed: bool  # FLUX-style 2x2 token packing

    def prepare(self, key: jax.Array, batch: int, height: int, width: int, dtype=jnp.bfloat16):
        h = height // self.vae_downscale
        w = width // self.vae_downscale
        noise = jax.random.normal(key, (batch, h, w, self.channels), jnp.float32)
        if self.packed:
            return pack_latents(noise).astype(dtype)
        return noise.astype(dtype)

    def seq_len(self, height: int, width: int) -> int:
        if self.packed:
            ty, tx = latent_tokens(height, width, self.vae_downscale)
            return ty * tx
        return (height // self.vae_downscale) * (width // self.vae_downscale)


LATENT_SPECS: dict[str, LatentSpec] = {
    "flux": LatentSpec(channels=16, vae_downscale=8, packed=True),
    "sd": LatentSpec(channels=4, vae_downscale=8, packed=False),
    "sdxl": LatentSpec(channels=4, vae_downscale=8, packed=False),
    "sd3": LatentSpec(channels=16, vae_downscale=8, packed=False),
}

# model name (hub id substring) -> family (MODEL_NAME_MAP analogue)
MODEL_FAMILY_MAP = {
    "FLUX": "flux",
    "stable-diffusion-3": "sd3",
    "stable-diffusion-xl": "sdxl",
    "stable-diffusion": "sd",
}


def family_for_model(name: str) -> str:
    for needle, family in MODEL_FAMILY_MAP.items():
        if needle.lower() in name.lower():
            return family
    return "flux"


def register_family(name: str, spec: LatentSpec) -> None:
    LATENT_SPECS[name] = spec


def get_latent_spec(family: str) -> LatentSpec:
    return LATENT_SPECS[family]
