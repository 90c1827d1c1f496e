"""Normalization + AdaLN modulation primitives.

All elementwise; XLA fuses these into surrounding matmuls, so no Pallas is
needed here. Accumulation is in fp32 regardless of input dtype.
"""

from __future__ import annotations

import jax.numpy as jnp


def layer_norm(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Parameter-free LayerNorm (elementwise_affine=False), fp32 accum."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mu) * jnp.reciprocal(jnp.sqrt(var + eps))).astype(x.dtype)


def rms_norm(x: jnp.ndarray, scale: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """RMSNorm with learned scale (used for FLUX QK-norm and Qwen layers)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jnp.reciprocal(jnp.sqrt(var + eps))
    return (normed * scale.astype(jnp.float32)).astype(x.dtype)


def adaln_modulate(x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """LN(x) * (1 + scale) + shift, with per-batch (B, H) shift/scale.

    The AdaLN-Zero modulation used by every FLUX block (semantics of
    diffusers AdaLayerNormZero as exercised by
    /root/reference/train_flux/flux/block.py:185-201).
    """
    return layer_norm(x, eps) * (1.0 + scale[:, None, :]) + shift[:, None, :]
