"""Condition stream encoding (OminiControl-style "cot" conditioning).

Capability parity with `/root/reference/train_flux/flux/condition.py:24-132`:
a conditioning image (the previous round's best-but-flawed sample, resized
to `condition_size`) is VAE-encoded, packed into 2x2 latent tokens, and
given RoPE ids offset by `position_delta` (ReflectionFlow uses
`[0, -condition_size//16]`, placing cond tokens in a grid region left of
the image). `empty=True` encodes a black image — the unconditional branch
of image CFG (`generate.py:250-272`).

Only the "cot" condition type is implemented as a first-class citizen; the
registry below keeps the reference's other types (depth/canny/...) as
pluggable preprocessors.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax.numpy as jnp
import numpy as np

from ..config import FluxVAEConfig
from ..models.flux.latents import pack_latents
from ..models.flux.rope import make_image_ids
from ..models.flux.vae import vae_encode, vae_encode_tiled

# condition_type -> type id (parity with condition.py:10-21; only "cot" is
# exercised by ReflectionFlow)
CONDITION_TYPE_IDS = {
    "depth": 0,
    "canny": 1,
    "subject": 4,
    "coloring": 6,
    "deblurring": 7,
    "depth_pred": 8,
    "fill": 9,
    "sr": 10,
    "cartoon": 11,
    "cot": 12,
}

def _canny(img: np.ndarray) -> np.ndarray:
    import cv2

    edges = cv2.Canny(img, 100, 200)
    return np.stack([edges] * 3, axis=-1)


def _coloring(img: np.ndarray) -> np.ndarray:
    import cv2

    gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    return np.stack([gray] * 3, axis=-1)


def _deblurring(img: np.ndarray) -> np.ndarray:
    import cv2

    return cv2.GaussianBlur(img, (0, 0), sigmaX=4)


def _depth(img: np.ndarray) -> np.ndarray:
    """Monocular depth via a LOCAL depth-estimation snapshot (the reference
    loads LiheYoung/depth-anything-small-hf from the hub, condition.py:49-59;
    this environment has no network, so the model dir must be local)."""
    import os

    from transformers import pipeline

    model = os.environ.get("DEPTH_MODEL_DIR", "LiheYoung/depth-anything-small-hf")
    from PIL import Image

    pipe = pipeline(task="depth-estimation", model=model)
    depth = pipe(Image.fromarray(img).convert("RGB"))["depth"].convert("RGB")
    return np.asarray(depth)


# preprocessors: image (H, W, 3) uint8 -> image (H, W, 3) uint8
# (semantics of condition.py:43-80; "cot" — the only type ReflectionFlow
# exercises — is identity, conditioning directly on the previous sample)
PREPROCESSORS: dict[str, Callable[[np.ndarray], np.ndarray]] = {
    "cot": lambda img: img,
    "subject": lambda img: img,
    "fill": lambda img: img,
    "sr": lambda img: img,
    "cartoon": lambda img: img,
    "depth_pred": lambda img: img,  # precomputed depth map passed through
    "depth": _depth,
    "canny": _canny,
    "coloring": _coloring,
    "deblurring": _deblurring,
}


def register_preprocessor(name: str, fn: Callable[[np.ndarray], np.ndarray]) -> None:
    PREPROCESSORS[name] = fn


@dataclass
class Condition:
    """A conditioning image + its token-grid placement."""

    condition_type: str = "cot"
    image: np.ndarray | None = None  # (H, W, 3) uint8
    position_delta: tuple[int, int] = (0, 0)

    @property
    def type_id(self) -> int:
        return CONDITION_TYPE_IDS[self.condition_type]

    def preprocess(self) -> np.ndarray:
        return PREPROCESSORS[self.condition_type](self.image)


def encode_conditions(
    conditions: list[Condition],
    vae_params,
    vae_cfg: FluxVAEConfig,
    dtype=jnp.bfloat16,
    empty: bool = False,
    tiled: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batch-encode one condition per candidate.

    Returns (cond_tokens (B, L_c, C*4), cond_ids (L_c, 3)). All conditions
    in the batch must share size and position_delta (uniform-shape rule for
    the jitted DiT). `tiled` routes through `vae_encode_tiled` (diffusers
    enable_vae_tiling covers encode too) — a no-op at <=512px conditions."""
    enc = vae_params["encoder"] if "encoder" in vae_params else vae_params
    _encode = vae_encode_tiled if tiled else vae_encode
    if empty:
        # black image: encode ONE frame and broadcast (all-identical batch)
        H, W = conditions[0].preprocess().shape[:2]
        x = np.full((1, H, W, 3), -1.0, np.float32)
        latents = _encode(enc, vae_cfg, jnp.asarray(x, dtype))
        tokens = jnp.broadcast_to(
            pack_latents(latents), (len(conditions),) + pack_latents(latents).shape[1:]
        )
        latents = jnp.broadcast_to(latents, (len(conditions),) + latents.shape[1:])
    else:
        imgs = np.stack([c.preprocess() for c in conditions])  # (B, H, W, 3) uint8
        x = imgs.astype(np.float32) / 127.5 - 1.0
        latents = _encode(enc, vae_cfg, jnp.asarray(x, dtype))  # deterministic (mode)
        tokens = pack_latents(latents)
    ty = latents.shape[1] // 2
    tx = latents.shape[2] // 2
    ids = make_image_ids(ty, tx, position_delta=conditions[0].position_delta)
    return tokens.astype(dtype), jnp.asarray(ids)


def cot_position_delta(condition_size: int) -> tuple[int, int]:
    """ReflectionFlow's delta for the 'cot' condition
    (`/root/reference/tts/tts_reflectionflow.py:278`)."""
    return (0, -condition_size // 16)
