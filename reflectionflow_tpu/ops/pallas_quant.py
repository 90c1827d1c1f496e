"""Pallas fused activation-quantization kernels (W8A8 serving).

Profiler traces of the full-depth serving step show the XLA act-quant
chains around each int8 matmul (AdaLN modulate -> amax reduce -> round,
gelu -> amax -> round) materialize their bf16 intermediates and re-read
them per pass — ~0.5-1 ms per block of pure glue. Each kernel here does
the whole chain in ONE VMEM pass per row tile: read the input once, do
all row statistics and elementwise in registers, write int8 + per-token
scales.

Used only on the quantized serving path (`models.flux.dit` gates on the
fast/serving layout); the XLA chains remain for training and
non-quantized runs. All kernels support interpret mode for CPU tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _row_quant(y):
    """y (bl, H) f32 -> (int8 values, (bl, 1) f32 scale)."""
    amax = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-12) / 127.0
    return jnp.round(y / s).astype(jnp.int8), s


def _adaln_quant_kernel(x_ref, shift_ref, scale_ref, q_ref, s_ref, *, eps):
    xf = x_ref[:].astype(jnp.float32)  # (bl, H)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    r = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    ln = (xf - mu) * r
    y = ln * (1.0 + scale_ref[:].astype(jnp.float32)) + shift_ref[:].astype(jnp.float32)
    q, s = _row_quant(y)
    q_ref[:] = q
    s_ref[:] = s


def _gelu_quant_kernel(x_ref, q_ref, s_ref):
    xf = x_ref[:].astype(jnp.float32)
    y = jax.nn.gelu(xf, approximate=True)
    q, s = _row_quant(y)
    q_ref[:] = q
    s_ref[:] = s


def _rowquant_kernel(x_ref, q_ref, s_ref):
    q, s = _row_quant(x_ref[:].astype(jnp.float32))
    q_ref[:] = q
    s_ref[:] = s


def _grid_call(x, kernel, extra_inputs, extra_specs, block_rows, interpret):
    B, L, H = x.shape
    grid = (B, L // block_rows)
    q, s = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((None, block_rows, H), lambda b, l: (b, l, 0))] + extra_specs,
        out_specs=[
            pl.BlockSpec((None, block_rows, H), lambda b, l: (b, l, 0)),
            pl.BlockSpec((None, block_rows, 1), lambda b, l: (b, l, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, L, H), jnp.int8),
            jax.ShapeDtypeStruct((B, L, 1), jnp.float32),
        ],
        interpret=interpret,
    )(x, *extra_inputs)
    return q, s


def auto_block_rows(L: int, width: int) -> int:
    """Largest row-block that divides L and keeps the double-buffered
    (bf16 in + int8 out) tile under the ~16 MB VMEM budget (measured: 256
    rows x 12288 cols compiles to an 18 MB scoped allocation and is
    rejected)."""
    cap = 256 if width <= 6144 else 128
    for bl in sorted({cap, 128, 64, 32, 16, 8}, reverse=True):
        if bl <= cap and L % bl == 0:
            return bl
    return 0


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret", "eps"))
def adaln_quant(x, shift, scale, block_rows: int = 256, interpret: bool = False, eps: float = 1e-6):
    """AdaLN-Zero modulate + per-token int8 quant in one pass.

    x (B, L, H); shift/scale (B, H). Returns (x_q (B,L,H) int8,
    x_scale (B,L,1) f32). L must be a multiple of block_rows (the serving
    shapes are; callers fall back to the XLA chain otherwise)."""
    spec = pl.BlockSpec((None, 1, x.shape[-1]), lambda b, l: (b, 0, 0))
    return _grid_call(
        x, functools.partial(_adaln_quant_kernel, eps=eps),
        [shift[:, None, :], scale[:, None, :]], [spec, spec], block_rows, interpret,
    )


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def gelu_quant(x, block_rows: int = 256, interpret: bool = False):
    """tanh-gelu + per-token int8 quant in one pass. x (B, L, M)."""
    return _grid_call(x, _gelu_quant_kernel, [], [], block_rows, interpret)


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def rowquant(x, block_rows: int = 256, interpret: bool = False):
    """Per-token int8 quant in one pass. x (B, L, H)."""
    return _grid_call(x, _rowquant_kernel, [], [], block_rows, interpret)


def _norm_rope_kernel(x_ref, scale_ref, cos_ref, sin_ref, out_ref, *, head_dim, eps):
    """Per-head RMS QK-norm + half-split RoPE rotation in ONE VMEM pass.

    x (bl, H*D) in the projection panel layout; scale (1, D); cos/sin
    (bl, D) pre-permuted split-layout tables (identical halves). The XLA
    chain reads/writes the (L, H*D) tensor twice (norm reduce+apply, rope
    apply); this reads once, does both in registers, writes once."""
    D = head_dim
    half = D // 2
    x = x_ref[:]  # (bl, H*D) storage dtype
    n_heads = x.shape[-1] // D
    scale = scale_ref[:]  # (1, D)
    cos = cos_ref[:]  # (bl, D)
    sin = sin_ref[:]
    c1, s1 = cos[:, :half], sin[:, :half]
    c2, s2 = cos[:, half:], sin[:, half:]
    for g in range(n_heads):
        xg = x[:, g * D : (g + 1) * D].astype(jnp.float32)
        var = jnp.mean(xg * xg, axis=-1, keepdims=True)
        xn = (xg * jax.lax.rsqrt(var + eps)).astype(x.dtype) * scale
        x1, x2 = xn[:, :half], xn[:, half:]
        out_ref[:, g * D : g * D + half] = x1 * c1 - x2 * s1
        out_ref[:, g * D + half : (g + 1) * D] = x2 * c2 + x1 * s2


@functools.partial(jax.jit, static_argnames=("head_dim", "block_rows", "interpret", "eps"))
def norm_rope(x, scale, cos, sin, head_dim: int, block_rows: int = 256,
              interpret: bool = False, eps: float = 1e-6):
    """Fused serving QK-norm + split-layout RoPE for one stream.

    x (B, L, H*D) — the raw q or k projection panel; scale (D,) RMS-norm
    weight (split-permuted); cos/sin (L, D) bf16 split tables. Returns the
    normed+rotated panel, same shape/dtype. Serving-only (no vjp);
    training keeps the XLA `rms_norm` + `apply_rope` path."""
    B, L, HD = x.shape
    grid = (B, L // block_rows)
    row_spec = pl.BlockSpec((None, block_rows, HD), lambda b, l: (b, l, 0))
    tab_spec = pl.BlockSpec((block_rows, head_dim), lambda b, l: (l, 0))
    return pl.pallas_call(
        functools.partial(_norm_rope_kernel, head_dim=head_dim, eps=eps),
        grid=grid,
        in_specs=[
            row_spec,
            pl.BlockSpec((1, head_dim), lambda b, l: (0, 0)),
            tab_spec,
            tab_spec,
        ],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((B, L, HD), x.dtype),
        interpret=interpret,
    )(x, scale[None, :], cos, sin)
