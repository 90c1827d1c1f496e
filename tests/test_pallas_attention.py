"""Pallas flash-attention parity vs the XLA sdpa path (interpret mode on CPU;
the same kernel compiles for TPU via ops.attention impl='pallas')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reflectionflow_tpu.ops.attention import cond_attention_bias, joint_attention, sdpa
from reflectionflow_tpu.ops.pallas_attention import flash_attention


@pytest.fixture(scope="module")
def qkv():
    B, L, H, D = 2, 160, 3, 32
    key = jax.random.PRNGKey(0)
    return tuple(
        jax.random.normal(jax.random.fold_in(key, i), (B, L, H, D), jnp.float32) for i in range(3)
    )


def test_plain_parity(qkv):
    q, k, v = qkv
    ref = sdpa(q, k, v)
    out = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_c_factor_parity(qkv):
    q, k, v = qkv
    L, cond_len = q.shape[1], 32
    ref = sdpa(q, k, v, bias=cond_attention_bias(L, cond_len, True, 2.0))
    out = flash_attention(q, k, v, main_len=L - cond_len, cross_bias=float(np.log(2.0)), interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_masked_parity(qkv):
    q, k, v = qkv
    L, cond_len = q.shape[1], 32
    ref = sdpa(q, k, v, bias=cond_attention_bias(L, cond_len, False))
    out = flash_attention(q, k, v, main_len=L - cond_len, cross_bias=-1e30, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_unaligned_length(qkv):
    """L not a multiple of the block sizes exercises the padding path."""
    q, k, v = (x[:, :137] for x in qkv)
    ref = sdpa(q, k, v)
    out = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_joint_attention_pallas_split(qkv):
    """joint_attention with impl='pallas_interpret' returns per-stream splits
    matching the XLA path."""
    q, k, v = qkv
    sq = [q[:, :100], q[:, 100:]]
    sk = [k[:, :100], k[:, 100:]]
    sv = [v[:, :100], v[:, 100:]]
    ref = joint_attention(sq, sk, sv, bias=None, impl="xla")
    out = joint_attention(sq, sk, sv, impl="pallas_interpret", cond_len=60, cross_bias=0.0)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=2e-5)


def test_dit_with_pallas_interpret():
    """Full tiny DiT forward via the pallas kernel == xla path."""
    from reflectionflow_tpu.config import FluxDiTConfig
    from reflectionflow_tpu.models.flux.dit import flux_dit_apply, flux_dit_init
    from reflectionflow_tpu.models.flux.rope import make_image_ids, make_text_ids

    cfg = FluxDiTConfig.tiny()
    params = flux_dit_init(jax.random.PRNGKey(0), cfg)
    inputs = dict(
        img=jax.random.normal(jax.random.PRNGKey(1), (1, 16, cfg.in_channels)),
        txt=jax.random.normal(jax.random.PRNGKey(2), (1, 8, cfg.text_dim)),
        pooled=jax.random.normal(jax.random.PRNGKey(3), (1, cfg.pooled_dim)),
        timestep=jnp.array([0.5]),
        img_ids=jnp.asarray(make_image_ids(4, 4)),
        txt_ids=jnp.asarray(make_text_ids(8)),
        guidance=jnp.array([3.5]),
    )
    cond = jax.random.normal(jax.random.PRNGKey(4), (1, 4, cfg.in_channels))
    cond_ids = jnp.asarray(make_image_ids(2, 2, position_delta=(0, -2)))
    ref = flux_dit_apply(params, cfg, **inputs, cond=cond, cond_ids=cond_ids)
    out = flux_dit_apply(
        params, cfg, **inputs, cond=cond, cond_ids=cond_ids, attn_impl="pallas_interpret"
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


@pytest.mark.parametrize(
    "cond_len,cross_bias",
    [(0, 0.0), (32, float(np.log(2.0))), (32, -1e30)],
    ids=["plain", "cond_c_factor", "cond_masked"],
)
def test_int8_qk_parity(qkv, cond_len, cross_bias):
    """Serving int8-QK^T kernel: per-token quantized logits stay within int8
    tolerance of the exact path in every structural-bias mode."""
    q, k, v = qkv
    L = q.shape[1]
    bias = (
        cond_attention_bias(L, cond_len, cross_bias != -1e30, np.exp(cross_bias) if abs(cross_bias) < 100 else None)
        if cond_len
        else None
    )
    ref = np.asarray(sdpa(q, k, v, bias=bias))
    out = np.asarray(
        flash_attention(
            q, k, v, main_len=L - cond_len, cross_bias=cross_bias, interpret=True, int8=True
        )
    )
    cos = float((ref.ravel() @ out.ravel()) / (np.linalg.norm(ref) * np.linalg.norm(out)))
    assert cos > 0.999, cos
    assert np.abs(out - ref).max() < 0.05, np.abs(out - ref).max()


def test_int8_qk_unaligned_and_joint(qkv):
    q, k, v = (x[:, :137] for x in qkv)
    ref = np.asarray(sdpa(q, k, v))
    out = np.asarray(flash_attention(q, k, v, interpret=True, int8=True))
    assert np.abs(out - ref).max() < 0.05
    # and via the joint_attention impl string used by the DiT
    sq = [q[:, :100], q[:, 100:]]
    outs = joint_attention(
        [q[:, :100], q[:, 100:]], [k[:, :100], k[:, 100:]], [v[:, :100], v[:, 100:]],
        impl="pallas_int8_interpret", cond_len=37, cross_bias=0.0,
    )
    cat = np.concatenate([np.asarray(o) for o in outs], axis=1)
    assert np.abs(cat - ref).max() < 0.05


def test_dit_with_pallas_int8_interpret():
    """Tiny DiT forward through attn_impl='pallas_int8_interpret' stays
    directionally faithful to the exact XLA path (serving profile check)."""
    from reflectionflow_tpu.config import FluxDiTConfig
    from reflectionflow_tpu.models.flux.dit import flux_dit_apply, flux_dit_init
    from reflectionflow_tpu.models.flux.rope import make_image_ids, make_text_ids

    cfg = FluxDiTConfig.tiny()
    params = flux_dit_init(jax.random.PRNGKey(0), cfg)
    inputs = dict(
        img=jax.random.normal(jax.random.PRNGKey(1), (1, 16, cfg.in_channels)),
        txt=jax.random.normal(jax.random.PRNGKey(2), (1, 8, cfg.text_dim)),
        pooled=jax.random.normal(jax.random.PRNGKey(3), (1, cfg.pooled_dim)),
        timestep=jnp.array([0.5]),
        img_ids=jnp.asarray(make_image_ids(4, 4)),
        txt_ids=jnp.asarray(make_text_ids(8)),
        guidance=jnp.array([3.5]),
    )
    ref = np.asarray(flux_dit_apply(params, cfg, **inputs)).ravel()
    out = np.asarray(
        flux_dit_apply(params, cfg, **inputs, attn_impl="pallas_int8_interpret")
    ).ravel()
    cos = float(ref @ out / (np.linalg.norm(ref) * np.linalg.norm(out)))
    assert cos > 0.999, cos


def _loss_weights(q):
    # fixed random cotangent-like weighting so grads are informative
    return jax.random.normal(jax.random.PRNGKey(99), q.shape, jnp.float32)


@pytest.mark.parametrize(
    "cond_len,cross_bias",
    [(0, 0.0), (32, 0.0), (32, float(np.log(2.0))), (32, -1e30)],
    ids=["plain", "cond_union", "cond_c_factor", "cond_masked"],
)
def test_backward_parity(qkv, cond_len, cross_bias):
    """custom_vjp flash backward vs XLA autodiff through sdpa."""
    q, k, v = qkv
    L = q.shape[1]
    w = _loss_weights(q)
    bias = (
        cond_attention_bias(L, cond_len, cross_bias != -1e30, np.exp(cross_bias) if 0.0 < abs(cross_bias) < 100 else None)
        if cond_len
        else None
    )

    def loss_ref(q, k, v):
        return jnp.sum(sdpa(q, k, v, bias=bias) * w)

    def loss_pallas(q, k, v):
        from reflectionflow_tpu.ops.pallas_attention import flash_attention_structured

        out = flash_attention_structured(
            q, k, v, main_len=L - cond_len, cross_bias=cross_bias, block_q=64, block_k=64, interpret=True
        )
        return jnp.sum(out * w)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_out = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_out, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4, err_msg=f"d{name}")


def test_backward_nondivisible_length():
    """Padding path: L not a multiple of the block sizes."""
    B, L, H, D = 1, 100, 2, 16
    key = jax.random.PRNGKey(1)
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (B, L, H, D), jnp.float32) for i in range(3))
    w = jax.random.normal(jax.random.PRNGKey(5), (B, L, H, D), jnp.float32)
    from reflectionflow_tpu.ops.pallas_attention import flash_attention_structured

    def loss_ref(q, k, v):
        return jnp.sum(sdpa(q, k, v) * w)

    def loss_pallas(q, k, v):
        return jnp.sum(
            flash_attention_structured(q, k, v, block_q=64, block_k=64, interpret=True) * w
        )

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_out = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_out, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("L", [160, 640, 384, 2900])
def test_block_policy_odd_lengths(L):
    """The auto block policy must cover every row for lengths where the
    padded length is not a multiple of a naive bk choice (regression: grids
    floor-divide, so an unaligned bk left tail q-rows unwritten)."""
    B, H, D = 1, 2, 32
    key = jax.random.PRNGKey(7)
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (B, L, H, D), jnp.float32) for i in range(3))
    ref = sdpa(q, k, v)
    out = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_mismatched_blocks_rejected():
    from reflectionflow_tpu.ops.pallas_attention import flash_attention_structured

    q = jnp.zeros((1, 640, 2, 32), jnp.float32)
    with pytest.raises(ValueError, match="divide"):
        flash_attention_structured(q, q, q, block_q=256, block_k=640, interpret=True)


def test_flash_fori_fallback_long_sequence(key):
    """>16 K blocks takes the fori_loop branch of _unrolled_fori (bf16) and
    the per-block re-quantization branch (int8) — both must match dense."""
    from reflectionflow_tpu.ops.attention import sdpa
    from reflectionflow_tpu.ops.pallas_attention import (
        flash_attention_int8,
        flash_attention_structured,
    )

    B, L, H, D = 1, 160, 2, 8  # 20 blocks of 8 > the unroll limit (16)
    q = jax.random.normal(key, (B, L, H, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, L, H, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, L, H, D), jnp.float32)
    ref = np.asarray(sdpa(q, k, v))
    out = np.asarray(
        flash_attention_structured(q, k, v, block_q=8, block_k=8, interpret=True)
    )
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)
    out8 = np.asarray(
        flash_attention_int8(q, k, v, block_q=8, block_k=8, interpret=True)
    ).ravel()
    r = ref.ravel()
    cos = float(r @ out8 / (np.linalg.norm(r) * np.linalg.norm(out8)))
    assert cos > 0.999, cos


def test_flash_attention_nr_fused_matches_separate_passes():
    """In-kernel QK-norm + split-RoPE (flash_attention_nr, the denoise-glue
    fusion) == the separate passes: per-segment _rms_fast (txt scales for
    rows < txt_len, img scales after — the double-block concat layout) ->
    apply_rope_split -> structural-bias flash attention."""
    from reflectionflow_tpu.models.flux.rope import apply_rope_split
    from reflectionflow_tpu.ops.pallas_attention import (
        flash_attention_nr,
        flash_attention_structured,
    )

    B, L, H, D = 1, 48, 2, 16
    txt_len, main_len = 16, 40  # [txt 16 | img 24 | cond 8]
    cross = float(np.log(2.0))
    key = jax.random.PRNGKey(0)
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (B, L, H, D), jnp.float32)
               for i in range(3))
    scq = 1.0 + 0.1 * jax.random.normal(jax.random.fold_in(key, 3), (2, D))
    sck = 1.0 + 0.1 * jax.random.normal(jax.random.fold_in(key, 4), (2, D))
    ang = jax.random.uniform(jax.random.fold_in(key, 5), (L, D // 2), maxval=6.28)
    cos = jnp.concatenate([jnp.cos(ang), jnp.cos(ang)], axis=-1)
    sin = jnp.concatenate([jnp.sin(ang), jnp.sin(ang)], axis=-1)

    def ref_transform(x, sc):
        var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
        row_sc = jnp.where((jnp.arange(L) < txt_len)[:, None], sc[0], sc[1])  # (L, D)
        xn = x * jax.lax.rsqrt(var + 1e-6) * row_sc[None, :, None, :]
        return apply_rope_split(xn, cos, sin)

    ref = flash_attention_structured(
        ref_transform(q, scq), ref_transform(k, sck), v,
        main_len=main_len, cross_bias=cross, block_q=16, block_k=16, interpret=True,
    )
    out = flash_attention_nr(
        q, k, v, cos, sin, scq, sck, txt_len=txt_len,
        main_len=main_len, cross_bias=cross, block_q=16, block_k=16, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    # single-block layout: one norm pair in scale row 1 via txt_len=0
    out1 = flash_attention_nr(
        q, k, v, cos, sin, scq[1:].repeat(2, 0), sck[1:].repeat(2, 0), txt_len=0,
        block_q=16, block_k=16, interpret=True,
    )
    ref1 = flash_attention_structured(
        apply_rope_split(q * jax.lax.rsqrt(jnp.mean(jnp.square(q), -1, keepdims=True) + 1e-6) * scq[1], cos, sin),
        apply_rope_split(k * jax.lax.rsqrt(jnp.mean(jnp.square(k), -1, keepdims=True) + 1e-6) * sck[1], cos, sin),
        v, block_q=16, block_k=16, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out1), np.asarray(ref1), atol=3e-5)

    # padding path: L not a multiple of the blocks
    out_pad = flash_attention_nr(
        q[:, :40], k[:, :40], v[:, :40], cos[:40], sin[:40], scq, sck, txt_len=txt_len,
        block_q=16, block_k=16, interpret=True,
    )
    ref_pad = flash_attention_structured(
        ref_transform(q, scq)[:, :40], ref_transform(k, sck)[:, :40], v[:, :40],
        block_q=16, block_k=16, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out_pad), np.asarray(ref_pad), atol=3e-5)


def test_dit_with_pallas_nr_interpret():
    """Full tiny DiT via attn_impl='pallas_nr_interpret' (QK-norm + RoPE
    fused INTO the flash kernel — no separate norm_rope pass) == the split
    XLA path, in every structural-bias mode (plain / c_factor / union
    mask), and falls back to the plain flash path when the layout is not
    split (no silent garbage on rope_layout='interleaved')."""
    from reflectionflow_tpu.config import FluxDiTConfig
    from reflectionflow_tpu.models.flux.dit import flux_dit_apply, flux_dit_init
    from reflectionflow_tpu.models.flux.rope import make_image_ids, make_text_ids

    cfg = FluxDiTConfig.tiny()
    params = flux_dit_init(jax.random.PRNGKey(0), cfg)
    inputs = dict(
        img=jax.random.normal(jax.random.PRNGKey(1), (1, 16, cfg.in_channels)),
        txt=jax.random.normal(jax.random.PRNGKey(2), (1, 8, cfg.text_dim)),
        pooled=jax.random.normal(jax.random.PRNGKey(3), (1, cfg.pooled_dim)),
        timestep=jnp.array([0.5]),
        img_ids=jnp.asarray(make_image_ids(4, 4)),
        txt_ids=jnp.asarray(make_text_ids(8)),
        guidance=jnp.array([3.5]),
    )
    cond = jax.random.normal(jax.random.PRNGKey(4), (1, 4, cfg.in_channels))
    cond_ids = jnp.asarray(make_image_ids(2, 2, position_delta=(0, -2)))
    for inp in (
        inputs,
        dict(inputs, cond=cond, cond_ids=cond_ids, c_factor=2.0),
        dict(inputs, cond=cond, cond_ids=cond_ids, union_cond_attn=False),
    ):
        ref = np.asarray(flux_dit_apply(params, cfg, **inp, rope_layout="split"))
        out = np.asarray(flux_dit_apply(
            params, cfg, **inp, rope_layout="split", attn_impl="pallas_nr_interpret"
        ))
        np.testing.assert_allclose(out, ref, atol=5e-5)
    # non-split layout: the nr gate must fall back to plain pallas flash
    ref_i = np.asarray(flux_dit_apply(params, cfg, **inputs))
    out_i = np.asarray(flux_dit_apply(params, cfg, **inputs, attn_impl="pallas_nr_interpret"))
    np.testing.assert_allclose(out_i, ref_i, atol=5e-5)
