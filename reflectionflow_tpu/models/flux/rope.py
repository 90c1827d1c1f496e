"""FLUX 3-axis rotary position embedding.

Position ids are (L, 3) = (type, y, x); each axis gets its own frequency
band of size `axes_dims[i]` (FLUX.1: 16/56/56 summing to head_dim 128).
Conventions follow the weights we must load (diffusers FluxPosEmbed with
repeat_interleave_real=True and pair-unbind rotation — exercised by
/root/reference/train_flux/flux/transformer.py:130-134): cos/sin tables are
built in fp32 with each frequency repeated twice, and rotation acts on
(even, odd) element pairs.

The condition stream gets its own ids with a `position_delta` offset
(/root/reference/train_flux/flux/condition.py:126-131), so cond tokens live
at shifted grid coordinates rather than overlapping the image.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def rope_tables(ids: jnp.ndarray, axes_dims: tuple[int, ...], theta: float = 10000.0):
    """cos/sin tables for 3-axis RoPE.

    Args:
      ids: (L, 3) float or int positions.
      axes_dims: per-axis rotary dims, sum = head_dim.

    Returns (cos, sin), each (L, head_dim) float32.
    """
    cos_parts, sin_parts = [], []
    ids = ids.astype(jnp.float32)
    for axis, dim in enumerate(axes_dims):
        freqs = 1.0 / (theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))  # (dim/2,)
        angles = ids[:, axis : axis + 1] * freqs[None, :]  # (L, dim/2)
        # repeat each frequency twice: [f0, f0, f1, f1, ...]
        angles = jnp.repeat(angles, 2, axis=-1)
        cos_parts.append(jnp.cos(angles))
        sin_parts.append(jnp.sin(angles))
    return jnp.concatenate(cos_parts, axis=-1), jnp.concatenate(sin_parts, axis=-1)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate (B, L, H, D) by tables (L, D): pairs (x_even, x_odd) ->
    (x_even*cos - x_odd*sin, x_odd*cos + x_even*sin)."""
    xf = x.astype(jnp.float32)
    x_pair = xf.reshape(*xf.shape[:-1], -1, 2)
    x_even, x_odd = x_pair[..., 0], x_pair[..., 1]
    rotated = jnp.stack([-x_odd, x_even], axis=-1).reshape(xf.shape)
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    return (xf * c + rotated * s).astype(x.dtype)


# --- half-split serving layout -------------------------------------------
#
# The interleaved-pair rotation above compiles to stride-2 lane shuffles,
# which are VPU-bound on TPU (measured 107 ms/step of the full-depth FLUX
# serve, tools/step_ablation.py). Permuting the head dim to "all even
# positions, then all odd positions" turns the rotation partner of lane i
# into lane i + D/2 — two contiguous half-slices, no shuffles. Pairs
# (2i, 2i+1) never straddle the 3-axis segment boundaries (each axis dim
# is even), so ONE global permutation is exact. Attention logits are
# invariant as long as q, k, the QK-norm scales, and the tables all use
# the same permutation; v and the out projection are untouched.


def rope_split_perm(head_dim: int) -> np.ndarray:
    """Permutation old->new ordering: evens then odds."""
    return np.concatenate([np.arange(0, head_dim, 2), np.arange(1, head_dim, 2)])


def apply_rope_split(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate (B, L, H, D) in the half-split layout: tables pre-permuted by
    `rope_split_perm` (cos/sin halves are then identical copies).

    Math runs in fp32 when the tables are fp32; bf16 tables select the
    serving fast path — all-bf16 elementwise, no (B, L, H, D) fp32
    intermediates (|cos|,|sin| <= 1, so the rotation error is ~0.4%
    relative, below the int8 weight-quant noise floor)."""
    xf = x if cos.dtype == x.dtype else x.astype(jnp.float32)
    half = x.shape[-1] // 2
    x1, x2 = xf[..., :half], xf[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    return (xf * c + rotated * s).astype(x.dtype)


def make_image_ids(height_tokens: int, width_tokens: int, position_delta=(0, 0)) -> np.ndarray:
    """(h*w, 3) grid ids for packed 2x2 latents: (0, y+dy, x+dx)."""
    ys, xs = np.meshgrid(np.arange(height_tokens), np.arange(width_tokens), indexing="ij")
    ids = np.zeros((height_tokens * width_tokens, 3), dtype=np.float32)
    ids[:, 1] = ys.reshape(-1) + position_delta[0]
    ids[:, 2] = xs.reshape(-1) + position_delta[1]
    return ids


def make_text_ids(seq_len: int) -> np.ndarray:
    """Text tokens sit at the origin: all-zero ids."""
    return np.zeros((seq_len, 3), dtype=np.float32)
