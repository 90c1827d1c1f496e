"""Pallas flash attention for the FLUX joint [txt|img|cond] attention.

Hand-written online-softmax kernel (SURVEY.md §2.4: the TPU-native
replacement for the reference's CUDA `F.scaled_dot_product_attention`,
`/root/reference/train_flux/flux/block.py:123-125`).

Design (v5e-tuned):
  * grid = (batch*heads, q-blocks); per program the FULL K/V for one head
    (~6k tokens x 128 x bf16 = 1.5 MB each) sits in VMEM, and the kernel
    streams K in chunks with the online-softmax recurrence — logits never
    materialize beyond a (BQ, BK) fp32 tile;
  * the condition-stream modifiers are expressed STRUCTURALLY instead of
    as a dense (L, L) bias: tokens past `main_len` are "cond", and
    cross-(cond, main) logits get `cross_bias` added (-inf reproduces
    `union_cond_attn=False`, log(c_factor) reproduces `c_factor`);
  * fp32 accumulation, bf16 inputs/outputs.

Falls back to `ops.attention.sdpa` under interpret-mode tests for parity.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(
    q_ref,  # (BQ, D)
    k_ref,  # (L, D)
    v_ref,  # (L, D)
    out_ref,  # (BQ, D)
    *,
    scale: float,
    block_k: int,
    seq_len: int,
    main_len: int,
    cross_bias: float,
    q_block: int,
):
    qb = pl.program_id(1)
    q = q_ref[:].astype(jnp.float32) * scale  # (BQ, D)
    BQ = q.shape[0]
    q_start = qb * q_block
    # keep every intermediate >= 2D (TPU vector layout requirement)
    q_pos = q_start + jax.lax.broadcasted_iota(jnp.int32, (BQ, 1), 0)  # (BQ, 1)
    q_is_cond = q_pos >= main_len  # (BQ, 1)

    num_k_blocks = pl.cdiv(seq_len, block_k)

    def body(kb, carry):
        m_prev, l_prev, acc = carry  # (BQ, 1), (BQ, 1), (BQ, D)
        k_start = kb * block_k
        k = k_ref[pl.ds(k_start, block_k), :].astype(jnp.float32)  # (BK, D)
        v = v_ref[pl.ds(k_start, block_k), :].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BQ, BK)
        k_pos = k_start + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)  # (1, BK)
        k_valid = k_pos < seq_len  # mask padding tail
        if cross_bias != 0.0:
            k_is_cond = k_pos >= main_len  # (1, BK)
            cross = q_is_cond != k_is_cond  # (BQ, BK)
            logits = logits + jnp.where(cross, cross_bias, 0.0)
        logits = jnp.where(k_valid, logits, NEG_INF)

        m_cur = jnp.max(logits, axis=1, keepdims=True)  # (BQ, 1)
        m_new = jnp.maximum(m_prev, m_cur)
        correction = jnp.exp(m_prev - m_new)  # (BQ, 1)
        p = jnp.exp(logits - m_new)  # (BQ, BK)
        l_new = l_prev * correction + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * correction + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc

    D = q.shape[1]
    m0 = jnp.full((BQ, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((BQ, 1), jnp.float32)
    acc0 = jnp.zeros((BQ, D), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_k_blocks, body, (m0, l0, acc0))
    out_ref[:] = (acc / jnp.maximum(l, 1e-20)).astype(out_ref.dtype)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("main_len", "cross_bias", "block_q", "block_k", "interpret"),
)
def flash_attention_structured(
    q: jnp.ndarray,  # (B, L, H, D)
    k: jnp.ndarray,
    v: jnp.ndarray,
    main_len: int | None = None,
    cross_bias: float = 0.0,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash attention with structural cond-stream bias.

    Tokens with index >= main_len form the condition segment; cross logits
    between the segments get `cross_bias` added (use -1e30 for masking).
    """
    B, L, H, D = q.shape
    main_len = L if main_len is None else main_len
    scale = 1.0 / math.sqrt(D)

    # pad L so both block sizes divide it
    Lp = _round_up(L, max(block_q, block_k))
    if Lp != L:
        pad = [(0, 0), (0, Lp - L), (0, 0), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    # (B, L, H, D) -> (B*H, L, D)
    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(B * H, Lp, D)

    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)

    kernel = functools.partial(
        _flash_kernel,
        scale=scale,
        block_k=block_k,
        seq_len=L,
        main_len=main_len,
        cross_bias=float(cross_bias),
        q_block=block_q,
    )
    grid = (B * H, Lp // block_q)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, D), lambda bh, qi: (bh, qi, 0)),
            pl.BlockSpec((None, Lp, D), lambda bh, qi: (bh, 0, 0)),
            pl.BlockSpec((None, Lp, D), lambda bh, qi: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, D), lambda bh, qi: (bh, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, Lp, D), q.dtype),
        interpret=interpret,
    )(qb, kb, vb)
    out = out.reshape(B, H, Lp, D).transpose(0, 2, 1, 3)
    return out[:, :L]


def flash_attention(q, k, v, bias=None, main_len=None, cross_bias=0.0, interpret=False):
    """Entry used by ops.attention: structural bias only (dense `bias` is the
    XLA path's job)."""
    assert bias is None, "pallas path takes structural (main_len, cross_bias), not dense bias"
    # block sizes tuned down for short sequences
    L = q.shape[1]
    bq = min(256, _round_up(L, 128))
    bk = min(512, _round_up(L, 128))
    return flash_attention_structured(
        q, k, v, main_len=main_len, cross_bias=cross_bias, block_q=bq, block_k=bk, interpret=interpret
    )
