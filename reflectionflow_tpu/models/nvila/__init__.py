"""JAX-native NVILA (VILA-family) VLM — the NVILA yes/no verifier's model.

Replaces the reference's `trust_remote_code` torch load
(`/root/reference/tts/verifiers/nvila_verifier.py`) with native pieces:
`siglip.py` (vision tower), `model.py` (projector + Qwen2-LM glue +
first-token scoring). Loaded from a released VILA bundle via
`utils.hf_loader.load_nvila`.
"""

from .model import NvilaModel, downsample_tokens, preprocess_images, projector_apply
from .siglip import siglip_apply, siglip_init

__all__ = [
    "NvilaModel",
    "downsample_tokens",
    "preprocess_images",
    "projector_apply",
    "siglip_apply",
    "siglip_init",
]
