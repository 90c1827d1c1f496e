"""Pallas fused act-quant kernels (interpret mode) vs the XLA chains."""

import jax
import jax.numpy as jnp
import numpy as np

from reflectionflow_tpu.config import FluxDiTConfig
from reflectionflow_tpu.models.flux.dit import flux_dit_apply, flux_dit_init
from reflectionflow_tpu.models.flux.rope import make_image_ids, make_text_ids
from reflectionflow_tpu.ops.norms import adaln_modulate
from reflectionflow_tpu.ops.pallas_quant import adaln_quant, gelu_quant, rowquant
from reflectionflow_tpu.ops.quant import int8_matmul_pre, quantize_dit_params, quantize_linear


def _ref_quant(y):
    amax = np.max(np.abs(y), axis=-1, keepdims=True)
    s = np.maximum(amax, 1e-12) / 127.0
    return np.round(y / s).astype(np.int8), s


def test_adaln_quant_matches_xla_chain(key):
    B, L, H = 2, 32, 64
    x = jax.random.normal(key, (B, L, H))
    sh = jax.random.normal(jax.random.PRNGKey(1), (B, H)) * 0.1
    sc = jax.random.normal(jax.random.PRNGKey(2), (B, H)) * 0.1
    q, s = adaln_quant(x, sh, sc, block_rows=8, interpret=True)
    assert q.dtype == jnp.int8 and s.shape == (B, L, 1)
    y_ref = np.asarray(adaln_modulate(x, sh, sc), np.float32)
    q_ref, s_ref = _ref_quant(y_ref)
    np.testing.assert_allclose(np.asarray(s), s_ref, rtol=1e-5)
    # dequantized values match the reference modulate within one quant step
    np.testing.assert_allclose(np.asarray(q) * np.asarray(s), y_ref, atol=float(s_ref.max()) * 1.01)


def test_gelu_and_rowquant(key):
    x = jax.random.normal(key, (1, 16, 128))
    q, s = gelu_quant(x, block_rows=8, interpret=True)
    y_ref = np.asarray(jax.nn.gelu(x.astype(jnp.float32), approximate=True))
    np.testing.assert_allclose(np.asarray(q) * np.asarray(s), y_ref, atol=float(np.asarray(s).max()) * 1.01)
    q2, s2 = rowquant(x, block_rows=8, interpret=True)
    np.testing.assert_allclose(np.asarray(q2) * np.asarray(s2), np.asarray(x, np.float32), atol=float(np.asarray(s2).max()) * 1.01)


def test_int8_matmul_pre_matches_linear(key):
    from reflectionflow_tpu.models.flux.dit import linear

    x = jax.random.normal(key, (2, 16, 64))
    p = quantize_linear({"w": jax.random.normal(jax.random.PRNGKey(3), (64, 32)) * 0.1,
                         "b": jnp.ones((32,))}, act_quant=True)
    ref = linear(p, x)
    xq, xs = rowquant(x, block_rows=8, interpret=True)
    out = int8_matmul_pre(xq, xs, p, x.dtype)
    rel = float(jnp.abs(out - ref).mean() / jnp.abs(ref).mean())
    assert rel < 0.02, rel


def test_dit_fused_quant_serving_path(key):
    """Full tiny DiT on the W8A8 serving tree: the Pallas fused-quant path
    (attn_impl=pallas_interpret + split layout) matches the XLA quant chains,
    with and without the cond stream."""
    from reflectionflow_tpu.ops.fuse import fuse_dit_qkv, fuse_single_block_io, permute_rope_layout

    cfg = FluxDiTConfig.tiny()
    params = flux_dit_init(key, cfg)
    serving = permute_rope_layout(fuse_single_block_io(fuse_dit_qkv(params)), cfg.head_dim)
    q = quantize_dit_params(serving, min_size=64 * 64, act_quant=True)
    assert "act_q" in q["single_blocks"]["in_proj"]
    inputs = dict(
        img=jax.random.normal(jax.random.PRNGKey(1), (1, 16, cfg.in_channels)),
        txt=jax.random.normal(jax.random.PRNGKey(2), (1, 8, cfg.text_dim)),
        pooled=jax.random.normal(jax.random.PRNGKey(3), (1, cfg.pooled_dim)),
        timestep=jnp.array([0.5]),
        img_ids=jnp.asarray(make_image_ids(4, 4)),
        txt_ids=jnp.asarray(make_text_ids(8)),
        guidance=jnp.array([3.5]),
    )
    cond_inputs = dict(
        inputs,
        cond=jax.random.normal(jax.random.PRNGKey(4), (1, 4, cfg.in_channels)),
        cond_ids=jnp.asarray(make_image_ids(2, 2)),
        c_factor=2.0,
    )
    # pallas_nr_interpret: same serving tree with QK-norm+RoPE fused INTO
    # the flash kernel (the W8A8 panel matmuls feed it raw projections)
    for impl in ("pallas_interpret", "pallas_nr_interpret"):
        for inp in (inputs, cond_inputs):
            ref = np.asarray(flux_dit_apply(q, cfg, **inp, rope_layout="split")).ravel()
            out = np.asarray(
                flux_dit_apply(q, cfg, **inp, rope_layout="split", attn_impl=impl)
            ).ravel()
            cos = float(ref @ out / (np.linalg.norm(ref) * np.linalg.norm(out)))
            assert cos > 0.999, (impl, cos)
            # and against the unquantized model the usual int8 tolerance holds
            exact = np.asarray(flux_dit_apply(params, cfg, **inp)).ravel()
            rel = float(np.abs(out - exact).mean() / np.abs(exact).mean())
            assert rel < 0.06, (impl, rel)


def test_norm_rope_matches_xla_fast_path(key):
    """Fused QK-norm+RoPE kernel == _rms_fast -> apply_rope_split."""
    from reflectionflow_tpu.models.flux.dit import _rms_fast
    from reflectionflow_tpu.models.flux.rope import apply_rope_split
    from reflectionflow_tpu.ops.pallas_quant import norm_rope

    B, L, Hh, D = 2, 16, 3, 8
    x = jax.random.normal(key, (B, L, Hh * D), jnp.float32)
    scale = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(1), (D,))
    ang = jax.random.uniform(jax.random.PRNGKey(2), (L, D // 2), maxval=6.28)
    cos = jnp.concatenate([jnp.cos(ang), jnp.cos(ang)], axis=-1)
    sin = jnp.concatenate([jnp.sin(ang), jnp.sin(ang)], axis=-1)
    out = norm_rope(x, scale, cos, sin, D, block_rows=8, interpret=True)
    xh = x.reshape(B, L, Hh, D)
    ref = apply_rope_split(_rms_fast(xh, scale), cos, sin).reshape(B, L, Hh * D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-4)
