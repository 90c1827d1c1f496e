"""Pallas flash attention for the FLUX joint [txt|img|cond] attention.

Hand-written online-softmax kernel (SURVEY.md §2.4: the TPU-native
replacement for the reference's CUDA `F.scaled_dot_product_attention`,
`/root/reference/train_flux/flux/block.py:123-125`), with a full
recompute-based backward (`jax.custom_vjp`) so the SAME kernel serves
training — the reference trains through its serving SDPA too
(one model path, SURVEY.md §3.3).

Design (v5e-tuned):
  * grid = (batch*heads, q-blocks); per program the FULL K/V for one head
    (~6k tokens x 128 x bf16 = 1.5 MB each) sits in VMEM, and the kernel
    streams K in chunks with the online-softmax recurrence — logits never
    materialize beyond a (BQ, BK) fp32 tile;
  * the condition-stream modifiers are expressed STRUCTURALLY instead of
    as a dense (L, L) bias: tokens past `main_len` are "cond", and
    cross-(cond, main) logits get `cross_bias` added (-1e30 reproduces
    `union_cond_attn=False`, log(c_factor) reproduces `c_factor`);
  * fp32 accumulation, bf16 inputs/outputs; forward also emits the
    logsumexp rows so the backward recomputes probabilities instead of
    storing the (L, L) matrix;
  * backward = two kernels: dQ over q-blocks (streams K/V), dK/dV over
    k-blocks (streams Q/dO). D_i = rowsum(dO*O) is precomputed in XLA.

Falls back to interpret mode on CPU for parity tests.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e30


def _cross_mask_bias(logits, q_pos, k_pos, main_len, cross_bias):
    if cross_bias != 0.0:
        cross = (q_pos >= main_len) != (k_pos >= main_len)
        logits = logits + jnp.where(cross, cross_bias, 0.0)
    return logits


def _unrolled_fori(n, body, init, limit=16):
    """Statically unroll a small streaming loop inside a kernel.

    The MXU dot of iteration i+1 has no data dependency on iteration i's
    fp32 softmax/VPU work, so an unrolled dataflow lets Mosaic overlap
    them; a `fori_loop` body is scheduled strictly serially (measured
    ~0.5 ms/call of un-overlapped softmax at FLUX shapes). Falls back to
    `fori_loop` past `limit` blocks to bound code size."""
    if n <= limit:
        carry = init
        for i in range(n):
            carry = body(i, carry)
        return carry
    return jax.lax.fori_loop(0, n, body, init)


def _flash_fwd_kernel(
    *refs,
    scale: float,
    block_k: int,
    seq_len: int,
    main_len: int,
    cross_bias: float,
    q_block: int,
    dyn_offsets: bool = False,
):
    # dyn_offsets (ring chunks): two leading SMEM scalars carry this
    # chunk's RING-GLOBAL start positions — `main_len` stays static, the
    # cross-segment predicate compares global positions (local + offset).
    # Padding masks stay LOCAL (padding is a property of the local chunk).
    if dyn_offsets:
        qoff_ref, koff_ref, q_ref, k_ref, v_ref, out_ref, lse_ref = refs
        q_off, k_off = qoff_ref[0, 0], koff_ref[0, 0]
    else:
        q_ref, k_ref, v_ref, out_ref, lse_ref = refs
        q_off = k_off = 0
    qb = pl.program_id(1)
    # inputs stay in their storage dtype (bf16 in serving) — the MXU does
    # bf16 x bf16 with fp32 accumulation via preferred_element_type; an
    # explicit fp32 upcast would halve MXU throughput
    q = q_ref[:]  # (BQ, D)
    BQ = q.shape[0]
    # keep every intermediate >= 2D (TPU vector layout requirement)
    q_pos = qb * q_block + jax.lax.broadcasted_iota(jnp.int32, (BQ, 1), 0)  # (BQ, 1)

    num_k_blocks = pl.cdiv(seq_len, block_k)

    def body(kb, carry):
        m_prev, l_prev, acc = carry  # (BQ, 1), (BQ, 1), (BQ, D)
        k_start = kb * block_k
        k = k_ref[pl.ds(k_start, block_k), :]  # (BK, D)
        v = v_ref[pl.ds(k_start, block_k), :]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (BQ, BK) fp32
        k_pos = k_start + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)  # (1, BK)
        logits = _cross_mask_bias(logits, q_pos + q_off, k_pos + k_off, main_len, cross_bias)
        logits = jnp.where(k_pos < seq_len, logits, NEG_INF)  # mask padding tail

        m_cur = jnp.max(logits, axis=1, keepdims=True)  # (BQ, 1)
        m_new = jnp.maximum(m_prev, m_cur)
        correction = jnp.exp(m_prev - m_new)  # (BQ, 1)
        p = jnp.exp(logits - m_new)  # (BQ, BK) fp32
        l_new = l_prev * correction + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * correction + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc

    D = q.shape[1]
    m0 = jnp.full((BQ, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((BQ, 1), jnp.float32)
    acc0 = jnp.zeros((BQ, D), jnp.float32)
    m, l, acc = _unrolled_fori(num_k_blocks, body, (m0, l0, acc0))
    l_safe = jnp.maximum(l, 1e-20)
    out_ref[:] = (acc / l_safe).astype(out_ref.dtype)
    lse_ref[:] = m + jnp.log(l_safe)  # (BQ, 1)


def _flash_dq_kernel(
    *refs,
    scale: float,
    block_k: int,
    seq_len: int,
    main_len: int,
    cross_bias: float,
    q_block: int,
    dyn_offsets: bool = False,
):
    if dyn_offsets:
        qoff_ref, koff_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref = refs
        q_off, k_off = qoff_ref[0, 0], koff_ref[0, 0]
    else:
        q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref = refs
        q_off = k_off = 0
    qb = pl.program_id(1)
    q = q_ref[:]  # native dtype; MXU accumulates fp32
    do = do_ref[:]
    BQ, D = q.shape
    lse = lse_ref[:]  # (BQ, 1)
    delta = delta_ref[:]  # (BQ, 1)
    q_pos = qb * q_block + jax.lax.broadcasted_iota(jnp.int32, (BQ, 1), 0)

    num_k_blocks = pl.cdiv(seq_len, block_k)

    def body(kb, dq):
        k_start = kb * block_k
        k = k_ref[pl.ds(k_start, block_k), :]
        v = v_ref[pl.ds(k_start, block_k), :]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        k_pos = k_start + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
        logits = _cross_mask_bias(logits, q_pos + q_off, k_pos + k_off, main_len, cross_bias)
        logits = jnp.where(k_pos < seq_len, logits, NEG_INF)
        p = jnp.exp(logits - lse)  # (BQ, BK) fp32
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BQ, BK)
        ds = (p * (dp - delta)).astype(k.dtype)
        return dq + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    dq = _unrolled_fori(num_k_blocks, body, jnp.zeros((BQ, D), jnp.float32))
    dq_ref[:] = (dq * scale).astype(dq_ref.dtype)


def _flash_dkv_kernel(
    *refs,
    scale: float,
    block_q: int,
    seq_len: int,
    main_len: int,
    cross_bias: float,
    k_block: int,
    dyn_offsets: bool = False,
):
    if dyn_offsets:
        (qoff_ref, koff_ref, k_ref, v_ref, q_ref, do_ref, lse_ref, delta_ref,
         dk_ref, dv_ref) = refs
        q_off, k_off = qoff_ref[0, 0], koff_ref[0, 0]
    else:
        k_ref, v_ref, q_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref = refs
        q_off = k_off = 0
    kb = pl.program_id(1)
    k = k_ref[:]  # native dtype; MXU accumulates fp32
    v = v_ref[:]
    BK, D = k.shape
    k_pos = kb * k_block + jax.lax.broadcasted_iota(jnp.int32, (BK, 1), 0)  # (BK, 1)

    num_q_blocks = pl.cdiv(seq_len, block_q)

    def body(qb, carry):
        dk, dv = carry
        q_start = qb * block_q
        q = q_ref[pl.ds(q_start, block_q), :]  # (BQ, D)
        do = do_ref[pl.ds(q_start, block_q), :]
        lse = lse_ref[:, pl.ds(q_start, block_q)]  # (1, BQ)
        delta = delta_ref[:, pl.ds(q_start, block_q)]  # (1, BQ)
        # logits^T: (BK, BQ)
        logits_t = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        q_pos = q_start + jax.lax.broadcasted_iota(jnp.int32, (1, block_q), 1)  # (1, BQ)
        logits_t = _cross_mask_bias(logits_t, k_pos + k_off, q_pos + q_off, main_len, cross_bias)
        p_t = jnp.exp(logits_t - lse)  # (BK, BQ) fp32
        p_t = jnp.where(q_pos < seq_len, p_t, 0.0)  # mask padded q rows
        dv = dv + jax.lax.dot_general(
            p_t.astype(do.dtype), do, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp_t = jax.lax.dot_general(
            v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BK, BQ)
        ds_t = (p_t * (dp_t - delta)).astype(q.dtype)
        dk = dk + jax.lax.dot_general(
            ds_t, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return dk, dv

    dk0 = jnp.zeros((BK, D), jnp.float32)
    dv0 = jnp.zeros((BK, D), jnp.float32)
    dk, dv = _unrolled_fori(num_q_blocks, body, (dk0, dv0))
    dk_ref[:] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)


def _flash_fwd_int8_kernel(
    q_ref,  # (BQ, D) storage dtype (bf16 serving)
    k_ref,  # (L, D)
    v_ref,  # (L, D)
    out_ref,  # (BQ, D)
    ki8_ref,  # (L, D) int8 VMEM scratch — persists across this head's q tiles
    ks_ref,  # (1, L) f32 VMEM scratch
    *,
    scale: float,
    block_k: int,
    seq_len: int,
    main_len: int,
    cross_bias: float,
    q_block: int,
):
    """Serving forward with int8 QK^T on the MXU (~2x the bf16 dot rate),
    quantizing IN-KERNEL: no XLA pre-quant pass over HBM, no int8/scale
    layout shuffles (the earlier XLA-side variant lost its MXU gain to
    exactly that glue). The full K stripe is quantized ONCE per head into
    VMEM scratch — the TPU grid runs a head's q tiles sequentially, so the
    scratch persists and later tiles skip the quant entirely. K is
    mean-centered over the real tokens first — the per-row `q . mean(K)`
    logit shift cancels in softmax, so centering costs nothing and
    tightens the int8 range (SageAttention, Zhang et al. 2024). P@V stays
    bf16 for accuracy."""
    qb = pl.program_id(1)

    @pl.when(qb == 0)
    def _quantize_k():
        kf = k_ref[:].astype(jnp.float32)  # (Lp, D)
        Lp = kf.shape[0]
        valid = (jax.lax.broadcasted_iota(jnp.int32, (Lp, 1), 0) < seq_len).astype(jnp.float32)
        k_mean = jnp.sum(kf * valid, axis=0, keepdims=True) * (1.0 / seq_len)  # (1, D)
        kc = (kf - k_mean) * valid  # centered; padding rows zeroed
        k_amax = jnp.maximum(jnp.max(jnp.abs(kc), axis=1, keepdims=True), 1e-12)  # (Lp, 1)
        ki8_ref[:] = jnp.round(kc * (127.0 / k_amax)).astype(jnp.int8)
        ks_ref[:] = jnp.transpose(k_amax * (1.0 / 127.0))  # (1, Lp)

    qf = q_ref[:].astype(jnp.float32)  # (BQ, D)
    BQ, D = qf.shape
    # per-token quantize q; absorb the softmax scale into q_s
    q_amax = jnp.maximum(jnp.max(jnp.abs(qf), axis=1, keepdims=True), 1e-12)
    q_i8 = jnp.round(qf * (127.0 / q_amax)).astype(jnp.int8)
    q_s = q_amax * (scale / 127.0)  # (BQ, 1)

    q_pos = qb * q_block + jax.lax.broadcasted_iota(jnp.int32, (BQ, 1), 0)
    num_k_blocks = pl.cdiv(seq_len, block_k)

    def body(kb, carry):
        m_prev, l_prev, acc = carry
        k_start = kb * block_k
        k = ki8_ref[pl.ds(k_start, block_k), :]  # (BK, D) int8
        ks = ks_ref[:, pl.ds(k_start, block_k)]  # (1, BK)
        v = v_ref[pl.ds(k_start, block_k), :]
        logits_i = jax.lax.dot_general(
            q_i8, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        )  # (BQ, BK) int32
        logits = logits_i.astype(jnp.float32) * q_s * ks
        k_pos = k_start + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
        logits = _cross_mask_bias(logits, q_pos, k_pos, main_len, cross_bias)
        logits = jnp.where(k_pos < seq_len, logits, NEG_INF)

        m_cur = jnp.max(logits, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        correction = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new)
        l_new = l_prev * correction + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * correction + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc

    m0 = jnp.full((BQ, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((BQ, 1), jnp.float32)
    acc0 = jnp.zeros((BQ, D), jnp.float32)
    m, l, acc = _unrolled_fori(num_k_blocks, body, (m0, l0, acc0))
    out_ref[:] = (acc / jnp.maximum(l, 1e-20)).astype(out_ref.dtype)


def _flash_fwd_nr_kernel(
    scq_ref,  # (2, D) q-norm scales [txt, img] (split-permuted)
    sck_ref,  # (2, D) k-norm scales
    cos_ref,  # (Lp, D) bf16 split tables for the FULL joint sequence
    sin_ref,  # (Lp, D)
    q_ref,  # (BQ, D) RAW q projection (pre-norm, pre-rope)
    k_ref,  # (Lp, D) RAW k
    v_ref,  # (Lp, D)
    out_ref,  # (BQ, D)
    kn_ref,  # (Lp, D) VMEM scratch: normed+rotated K, built once per head
    *,
    scale: float,
    block_k: int,
    seq_len: int,
    main_len: int,
    cross_bias: float,
    q_block: int,
    txt_len: int,
    eps: float,
):
    """Serving forward with QK-norm + split-layout RoPE fused IN-KERNEL.

    Eliminates the separate `ops.pallas_quant.norm_rope` pass (one full
    read+write of the q and k panels per layer, ~112 MB at FLUX scale —
    the denoise-glue item in BENCH_NOTES). The K stripe is normed+rotated
    ONCE per head into VMEM scratch (`pl.when(qb == 0)` — the grid runs a
    head's q tiles sequentially, so the scratch persists, the int8
    kernel's trick); q tiles transform on the fly. Tables/scales have
    constant block indices, so Pallas DMAs them once per call.

    Per-row norm-scale selection handles the double-block stream concat:
    rows < `txt_len` use scale row 0 (txt projections' norms), the rest
    row 1 (img projections' norms — the cond stream shares them). Single
    blocks pass txt_len=0 with their one scale in row 1."""
    qb = pl.program_id(1)
    D = q_ref.shape[1]
    half = D // 2

    def norm_rot(x, cos, sin, pos, sc_ref):
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        sel = pos < txt_len  # (rows, 1)
        sc = jnp.where(sel, sc_ref[0:1, :], sc_ref[1:2, :]).astype(jnp.float32)
        xn = (xf * jax.lax.rsqrt(var + eps) * sc).astype(x.dtype)
        x1, x2 = xn[:, :half], xn[:, half:]
        c1, s1 = cos[:, :half], sin[:, :half]
        c2, s2 = cos[:, half:], sin[:, half:]
        return jnp.concatenate([x1 * c1 - x2 * s1, x2 * c2 + x1 * s2], axis=1)

    @pl.when(qb == 0)
    def _prep_k():
        # transform the stripe in block_k chunks: a whole-stripe norm_rot
        # would allocate (Lp, D) fp32 temporaries (~2.4 MB at FLUX scale),
        # which pushed the 512x512 config 1.4 MB past the 16 MB scoped-VMEM
        # cap (measured); chunked, the temporaries are (block_k, D)
        Lp = k_ref.shape[0]
        for c0 in range(0, Lp, block_k):
            pos = c0 + jax.lax.broadcasted_iota(jnp.int32, (block_k, 1), 0)
            kn_ref[c0 : c0 + block_k, :] = norm_rot(
                k_ref[c0 : c0 + block_k, :],
                cos_ref[c0 : c0 + block_k, :],
                sin_ref[c0 : c0 + block_k, :],
                pos, sck_ref,
            ).astype(kn_ref.dtype)

    BQ = q_ref.shape[0]
    q_pos = qb * q_block + jax.lax.broadcasted_iota(jnp.int32, (BQ, 1), 0)  # (BQ, 1)
    q = norm_rot(
        q_ref[:],
        cos_ref[pl.ds(qb * q_block, q_block), :],
        sin_ref[pl.ds(qb * q_block, q_block), :],
        q_pos, scq_ref,
    ).astype(v_ref.dtype)

    num_k_blocks = pl.cdiv(seq_len, block_k)

    def body(kb, carry):
        m_prev, l_prev, acc = carry
        k_start = kb * block_k
        k = kn_ref[pl.ds(k_start, block_k), :]
        v = v_ref[pl.ds(k_start, block_k), :]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        k_pos = k_start + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
        logits = _cross_mask_bias(logits, q_pos, k_pos, main_len, cross_bias)
        logits = jnp.where(k_pos < seq_len, logits, NEG_INF)
        m_cur = jnp.max(logits, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        correction = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new)
        l_new = l_prev * correction + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * correction + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc

    m0 = jnp.full((BQ, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((BQ, 1), jnp.float32)
    acc0 = jnp.zeros((BQ, D), jnp.float32)
    m, l, acc = _unrolled_fori(num_k_blocks, body, (m0, l0, acc0))
    out_ref[:] = (acc / jnp.maximum(l, 1e-20)).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("txt_len", "main_len", "cross_bias", "block_q", "block_k",
                     "interpret", "eps"),
)
def flash_attention_nr(
    q: jnp.ndarray,  # (B, L, H, D) RAW q projections (heads split, no norm/rope)
    k: jnp.ndarray,
    v: jnp.ndarray,
    cos: jnp.ndarray,  # (L, D) split-layout tables (bf16 serving)
    sin: jnp.ndarray,
    scale_q: jnp.ndarray,  # (2, D) norm scales [txt-row, img-row]
    scale_k: jnp.ndarray,
    txt_len: int = 0,
    main_len: int | None = None,
    cross_bias: float = 0.0,
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool = False,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Flash attention with the serving QK-norm + split-RoPE fused in
    (serving only — no backward). See `_flash_fwd_nr_kernel`."""
    B, L, H, D = q.shape
    main_len = L if main_len is None else main_len
    scale = 1.0 / math.sqrt(D)
    hi, lo = max(block_q, block_k), min(block_q, block_k)
    if hi % lo:
        raise ValueError(f"block_q={block_q} and block_k={block_k} must divide one another")
    Lp = _round_up(L, hi)
    q, k, v = _pad_len(q, k, v, L, Lp)
    if Lp != L:
        cos = jnp.pad(cos, [(0, Lp - L), (0, 0)])
        sin = jnp.pad(sin, [(0, Lp - L), (0, 0)])
    qb_, kb_, vb_ = (_to_bh(x, B, H, Lp, D) for x in (q, k, v))

    kernel = functools.partial(
        _flash_fwd_nr_kernel,
        scale=scale, block_k=block_k, seq_len=L, main_len=main_len,
        cross_bias=float(cross_bias), q_block=block_q, txt_len=txt_len, eps=eps,
    )
    from jax.experimental.pallas import tpu as pltpu

    grid = (B * H, Lp // block_q)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((2, D), lambda bh, qi: (0, 0)),
            pl.BlockSpec((2, D), lambda bh, qi: (0, 0)),
            pl.BlockSpec((Lp, D), lambda bh, qi: (0, 0)),
            pl.BlockSpec((Lp, D), lambda bh, qi: (0, 0)),
            pl.BlockSpec((None, block_q, D), lambda bh, qi: (bh, qi, 0)),
            pl.BlockSpec((None, Lp, D), lambda bh, qi: (bh, 0, 0)),
            pl.BlockSpec((None, Lp, D), lambda bh, qi: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, D), lambda bh, qi: (bh, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, Lp, D), v.dtype),
        scratch_shapes=[pltpu.VMEM((Lp, D), v.dtype)],
        interpret=interpret,
    )(
        scale_q.astype(jnp.float32), scale_k.astype(jnp.float32),
        cos, sin, qb_, kb_, vb_,
    )
    return _from_bh(out, B, H, Lp, D)[:, :L]


@functools.partial(
    jax.jit,
    static_argnames=("main_len", "cross_bias", "block_q", "block_k", "interpret"),
)
def flash_attention_int8(
    q: jnp.ndarray,  # (B, L, H, D)
    k: jnp.ndarray,
    v: jnp.ndarray,
    main_len: int | None = None,
    cross_bias: float = 0.0,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Int8-QK^T flash attention, quantized in-kernel (serving only — no
    backward). Takes the same bf16 inputs as the bf16 kernel."""
    B, L, H, D = q.shape
    main_len = L if main_len is None else main_len
    scale = 1.0 / math.sqrt(D)
    hi, lo = max(block_q, block_k), min(block_q, block_k)
    if hi % lo:
        # Lp pads to max(bq, bk); both grids floor-divide by their block, so
        # the smaller block MUST divide the larger or tail rows are never
        # computed (silent garbage)
        raise ValueError(f"block_q={block_q} and block_k={block_k} must divide one another")
    Lp = _round_up(L, hi)
    q, k, v = _pad_len(q, k, v, L, Lp)
    qb, kb, vb = (_to_bh(x, B, H, Lp, D) for x in (q, k, v))

    kernel = functools.partial(
        _flash_fwd_int8_kernel,
        scale=scale, block_k=block_k, seq_len=L, main_len=main_len,
        cross_bias=float(cross_bias), q_block=block_q,
    )
    from jax.experimental.pallas import tpu as pltpu

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
        out_shape=jax.ShapeDtypeStruct((B * H, Lp, D), v.dtype),
        scratch_shapes=[
            pltpu.VMEM((Lp, D), jnp.int8),
            pltpu.VMEM((1, Lp), jnp.float32),
        ],
        interpret=interpret,
    )(qb, kb, vb)
    return _from_bh(out, B, H, Lp, D)[:, :L]


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _to_bh(x, B, H, Lp, D):
    return x.transpose(0, 2, 1, 3).reshape(B * H, Lp, D)


def _from_bh(x, B, H, Lp, D):
    return x.reshape(B, H, Lp, D).transpose(0, 2, 1, 3)


def _pad_len(q, k, v, L, Lp):
    if Lp != L:
        pad = [(0, 0), (0, Lp - L), (0, 0), (0, 0)]
        return jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    return q, k, v


def _offset_ops_specs(offsets):
    """-> (extra operands, extra SMEM in_specs) for dynamic ring-global
    offsets (None -> static path, no extras)."""
    if offsets is None:
        return [], []
    from jax.experimental.pallas import tpu as pltpu

    ops = [jnp.reshape(jnp.asarray(o, jnp.int32), (1, 1)) for o in offsets]
    specs = [pl.BlockSpec((1, 1), lambda *_: (0, 0), memory_space=pltpu.SMEM)] * 2
    return ops, specs


def _fwd_impl(q, k, v, main_len, cross_bias, block_q, block_k, interpret, offsets=None):
    B, L, H, D = q.shape
    scale = 1.0 / math.sqrt(D)
    Lp = _round_up(L, max(block_q, block_k))
    q, k, v = _pad_len(q, k, v, L, Lp)
    qb, kb, vb = (_to_bh(x, B, H, Lp, D) for x in (q, k, v))

    off_ops, off_specs = _offset_ops_specs(offsets)
    kernel = functools.partial(
        _flash_fwd_kernel,
        scale=scale, block_k=block_k, seq_len=L, main_len=main_len,
        cross_bias=float(cross_bias), q_block=block_q,
        dyn_offsets=offsets is not None,
    )
    grid = (B * H, Lp // block_q)
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=off_specs + [
            pl.BlockSpec((None, block_q, D), lambda bh, qi: (bh, qi, 0)),
            pl.BlockSpec((None, Lp, D), lambda bh, qi: (bh, 0, 0)),
            pl.BlockSpec((None, Lp, D), lambda bh, qi: (bh, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, block_q, D), lambda bh, qi: (bh, qi, 0)),
            pl.BlockSpec((None, block_q, 1), lambda bh, qi: (bh, qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, Lp, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, Lp, 1), jnp.float32),
        ],
        interpret=interpret,
    )(*off_ops, qb, kb, vb)
    return out, lse  # both padded, (B*H, ...)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash(q, k, v, main_len, cross_bias, block_q, block_k, interpret):
    B, L, H, D = q.shape
    Lp = _round_up(L, max(block_q, block_k))
    out, _ = _fwd_impl(q, k, v, main_len, cross_bias, block_q, block_k, interpret)
    return _from_bh(out, B, H, Lp, D)[:, :L]


def _flash_fwd_rule(q, k, v, main_len, cross_bias, block_q, block_k, interpret):
    B, L, H, D = q.shape
    Lp = _round_up(L, max(block_q, block_k))
    out_bh, lse = _fwd_impl(q, k, v, main_len, cross_bias, block_q, block_k, interpret)
    out = _from_bh(out_bh, B, H, Lp, D)[:, :L]
    return out, (q, k, v, out_bh, lse)


def _flash_bwd_rule(main_len, cross_bias, block_q, block_k, interpret, res, g):
    q, k, v, out_bh, lse = res
    B, L, H, D = q.shape
    Lp = _round_up(L, max(block_q, block_k))
    g_p = jnp.pad(g, [(0, 0), (0, Lp - L), (0, 0), (0, 0)]) if Lp != L else g
    dob = _to_bh(g_p, B, H, Lp, D)
    # D_i = rowsum(dO * O): cheap elementwise-reduce, leave to XLA
    delta = jnp.sum(
        dob.astype(jnp.float32) * out_bh.astype(jnp.float32), axis=-1, keepdims=True
    )  # (B*H, Lp, 1)
    return _bwd_impl(
        q, k, v, g, delta, lse, main_len, cross_bias, block_q, block_k, interpret, dob=dob
    )


def _bwd_impl(q, k, v, g, delta, lse, main_len, cross_bias, block_q, block_k, interpret,
              dob=None, offsets=None):
    """Flash backward from precomputed (global) lse + delta.

    q/k/v/g are user layout (B, L, H, D); delta/lse are bh layout
    (B*H, Lp, 1); `dob` is the optional already-padded bh cotangent (the
    custom-VJP rule built it for delta — don't rebuild). Factored out of
    `_flash_bwd_rule` so ring attention can run the SAME kernels per K/V
    chunk with the ring-global lse (and, with `offsets`, ring-global
    positions for the structural cross bias)."""
    B, L, H, D = q.shape
    scale = 1.0 / math.sqrt(D)
    Lp = _round_up(L, max(block_q, block_k))
    qp, kp, vp = _pad_len(q, k, v, L, Lp)
    qb, kb, vb = (_to_bh(x, B, H, Lp, D) for x in (qp, kp, vp))
    if dob is None:
        g_p = jnp.pad(g, [(0, 0), (0, Lp - L), (0, 0), (0, 0)]) if Lp != L else g
        dob = _to_bh(g_p, B, H, Lp, D)
    lse_t = jnp.swapaxes(lse, 1, 2)  # (B*H, 1, Lp) for the k-major kernel
    delta_t = jnp.swapaxes(delta, 1, 2)

    off_ops, off_specs = _offset_ops_specs(offsets)
    dyn = offsets is not None
    grid_q = (B * H, Lp // block_q)
    dq = pl.pallas_call(
        functools.partial(
            _flash_dq_kernel,
            scale=scale, block_k=block_k, seq_len=L, main_len=main_len,
            cross_bias=float(cross_bias), q_block=block_q, dyn_offsets=dyn,
        ),
        grid=grid_q,
        in_specs=off_specs + [
            pl.BlockSpec((None, block_q, D), lambda bh, qi: (bh, qi, 0)),
            pl.BlockSpec((None, Lp, D), lambda bh, qi: (bh, 0, 0)),
            pl.BlockSpec((None, Lp, D), lambda bh, qi: (bh, 0, 0)),
            pl.BlockSpec((None, block_q, D), lambda bh, qi: (bh, qi, 0)),
            pl.BlockSpec((None, block_q, 1), lambda bh, qi: (bh, qi, 0)),
            pl.BlockSpec((None, block_q, 1), lambda bh, qi: (bh, qi, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, D), lambda bh, qi: (bh, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, Lp, D), q.dtype),
        interpret=interpret,
    )(*off_ops, qb, kb, vb, dob, lse, delta)

    grid_k = (B * H, Lp // block_k)
    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_dkv_kernel,
            scale=scale, block_q=block_q, seq_len=L, main_len=main_len,
            cross_bias=float(cross_bias), k_block=block_k, dyn_offsets=dyn,
        ),
        grid=grid_k,
        in_specs=off_specs + [
            pl.BlockSpec((None, block_k, D), lambda bh, ki: (bh, ki, 0)),
            pl.BlockSpec((None, block_k, D), lambda bh, ki: (bh, ki, 0)),
            pl.BlockSpec((None, Lp, D), lambda bh, ki: (bh, 0, 0)),
            pl.BlockSpec((None, Lp, D), lambda bh, ki: (bh, 0, 0)),
            pl.BlockSpec((None, 1, Lp), lambda bh, ki: (bh, 0, 0)),
            pl.BlockSpec((None, 1, Lp), lambda bh, ki: (bh, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, block_k, D), lambda bh, ki: (bh, ki, 0)),
            pl.BlockSpec((None, block_k, D), lambda bh, ki: (bh, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, Lp, D), k.dtype),
            jax.ShapeDtypeStruct((B * H, Lp, D), v.dtype),
        ],
        interpret=interpret,
    )(*off_ops, kb, vb, qb, dob, lse_t, delta_t)

    dq = _from_bh(dq, B, H, Lp, D)[:, :L]
    dk = _from_bh(dk, B, H, Lp, D)[:, :L]
    dv = _from_bh(dv, B, H, Lp, D)[:, :L]
    return dq, dk, dv


_flash.defvjp(_flash_fwd_rule, _flash_bwd_rule)


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
    """Flash attention with structural cond-stream bias, differentiable.

    Tokens with index >= main_len form the condition segment; cross logits
    between the segments get `cross_bias` added (use -1e30 for masking).
    """
    B, L, H, D = q.shape
    main_len = L if main_len is None else main_len
    hi, lo = max(block_q, block_k), min(block_q, block_k)
    if hi % lo:
        # Lp pads to max(bq, bk); both grids floor-divide by their block, so
        # the smaller block MUST divide the larger or tail rows are never
        # computed (silent garbage)
        raise ValueError(f"block_q={block_q} and block_k={block_k} must divide one another")
    return _flash(q, k, v, main_len, float(cross_bias), block_q, block_k, interpret)


def _block_policy(L):
    # block policy (v5e sweep, tools/attn_sweep.py): with the statically
    # UNROLLED K loop, 512x512 blocks win (1.40 ms = 95% of the bf16 MXU
    # peak at L=4608) — the unrolled dataflow lets Mosaic overlap block
    # k+1's QK^T dot with block k's fp32 softmax, which a fori_loop body
    # serializes (full-length K blocks, the old policy, measured 1.91 ms).
    # bq == bk divides the padded length by construction.
    bq = min(512, _round_up(L, 128))
    return bq, bq


def flash_attention(q, k, v, bias=None, main_len=None, cross_bias=0.0, interpret=False, int8=False):
    """Entry used by ops.attention: structural bias only (dense `bias` is the
    XLA path's job). `int8=True` selects the serving-only int8-QK^T kernel."""
    assert bias is None, "pallas path takes structural (main_len, cross_bias), not dense bias"
    bq, bk = _block_policy(q.shape[1])
    fn = flash_attention_int8 if int8 else flash_attention_structured
    return fn(
        q, k, v, main_len=main_len, cross_bias=cross_bias, block_q=bq, block_k=bk, interpret=interpret
    )


# ---------------------------------------------------------------------------
# Chunk-level entries for ring attention (ops.ring_attention): the same
# kernels on one local K/V shard, exposing the online-softmax partials so
# per-shard results merge across the ring.
# ---------------------------------------------------------------------------


def _lse_to_user(lse_bh, B, H, Lp, L):
    """(B*H, Lp, 1) -> (B, L, H, 1)."""
    return lse_bh.reshape(B, H, Lp, 1).transpose(0, 2, 1, 3)[:, :L]


def _lse_to_bh(lse, B, H, L, Lp):
    """(B, L, H, 1) -> (B*H, Lp, 1), padded."""
    if Lp != L:
        lse = jnp.pad(lse, [(0, 0), (0, Lp - L), (0, 0), (0, 0)])
    return lse.transpose(0, 2, 1, 3).reshape(B * H, Lp, 1)


def flash_chunk_fwd(q, k, v, interpret: bool = False, main_len: int | None = None,
                    cross_bias: float = 0.0, q_offset=None, k_offset=None):
    """Normalized flash attention over one chunk + its logsumexp rows.

    q/k/v (B, L, H, D) with equal local lengths; returns
    (out (B, L, H, D) fp32, lse (B, L, H, 1) fp32).

    Cond-stream modifiers under SP: `main_len`/`cross_bias` are the GLOBAL
    segment boundary and bias; `q_offset`/`k_offset` (traced int32 scalars,
    the ring-global start positions of this Q chunk and the currently-held
    K/V shard) enter the kernel as SMEM scalars so the cross-segment
    predicate compares global positions while everything else stays the
    static serving kernel."""
    B, L, H, D = q.shape
    bq, bk = _block_policy(L)
    Lp = _round_up(L, max(bq, bk))
    modifiers = main_len is not None and cross_bias != 0.0
    out_bh, lse_bh = _fwd_impl(
        q, k, v, main_len if modifiers else L, cross_bias if modifiers else 0.0,
        bq, bk, interpret,
        offsets=(q_offset, k_offset) if modifiers else None,
    )
    out = _from_bh(out_bh, B, H, Lp, D)[:, :L].astype(jnp.float32)
    return out, _lse_to_user(lse_bh, B, H, Lp, L)


def flash_chunk_bwd(q, k, v, g, lse, delta, interpret: bool = False,
                    main_len: int | None = None, cross_bias: float = 0.0,
                    q_offset=None, k_offset=None):
    """Flash backward over one chunk using ring-GLOBAL lse/delta.

    lse/delta are (B, L, H, 1) fp32 rows of the FULL (all-shards) softmax;
    the per-chunk dq/dk/dv returned here sum across chunks to the exact
    full-attention gradients. Shapes + modifier/offset semantics as
    `flash_chunk_fwd`."""
    B, L, H, D = q.shape
    bq, bk = _block_policy(L)
    Lp = _round_up(L, max(bq, bk))
    modifiers = main_len is not None and cross_bias != 0.0
    return _bwd_impl(
        q, k, v, g,
        _lse_to_bh(delta, B, H, L, Lp), _lse_to_bh(lse, B, H, L, Lp),
        main_len if modifiers else L, cross_bias if modifiers else 0.0,
        bq, bk, interpret,
        offsets=(q_offset, k_offset) if modifiers else None,
    )
