"""FLUX text encoders: T5 v1.1 encoder (sequence states) + CLIP-L (pooled).

Capability parity with the prompt encoding the reference delegates to
diffusers/transformers (`/root/reference/train_flux/flux/pipeline_tools.py:33-52`):
T5-XXL hidden states (seq <= 512) feed the DiT text stream; the CLIP pooled
vector feeds the AdaLN conditioning. Implementations follow the upstream
architectures exactly so published HF weights convert 1:1 (validated in
tests against transformers' torch models on tiny random configs).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ...config import CLIPTextConfig, T5Config
from .dit import _linear_init, linear


# ---------------------------------------------------------------------------
# T5 v1.1 encoder
# ---------------------------------------------------------------------------


def _t5_ln(x, scale, eps):
    """T5 LayerNorm: RMS only, no mean subtraction, no bias."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * scale


def _nobias_init(key, d_in, d_out, dtype):
    return {"w": (jax.random.normal(key, (d_in, d_out)) * (d_in ** -0.5)).astype(dtype)}


def t5_encoder_init(key, cfg: T5Config, dtype=jnp.float32):
    ks = jax.random.split(key, 4)

    def block_init(k):
        kk = jax.random.split(k, 7)
        inner = cfg.num_heads * cfg.d_kv
        return {
            "ln1": {"scale": jnp.ones((cfg.d_model,), dtype)},
            "q": _nobias_init(kk[0], cfg.d_model, inner, dtype),
            "k": _nobias_init(kk[1], cfg.d_model, inner, dtype),
            "v": _nobias_init(kk[2], cfg.d_model, inner, dtype),
            "o": _nobias_init(kk[3], inner, cfg.d_model, dtype),
            "ln2": {"scale": jnp.ones((cfg.d_model,), dtype)},
            "wi0": _nobias_init(kk[4], cfg.d_model, cfg.d_ff, dtype),
            "wi1": _nobias_init(kk[5], cfg.d_model, cfg.d_ff, dtype),
            "wo": _nobias_init(kk[6], cfg.d_ff, cfg.d_model, dtype),
        }

    return {
        "embed": (jax.random.normal(ks[0], (cfg.vocab_size, cfg.d_model)) * 1.0).astype(dtype),
        "rel_bias": (
            jax.random.normal(ks[1], (cfg.relative_attention_num_buckets, cfg.num_heads)) * 0.1
        ).astype(dtype),
        "blocks": jax.vmap(block_init)(jax.random.split(ks[2], cfg.num_layers)),
        "final_ln": {"scale": jnp.ones((cfg.d_model,), dtype)},
    }


def _t5_relative_buckets(rel_pos: np.ndarray, num_buckets: int, max_distance: int) -> np.ndarray:
    """Bidirectional relative-position bucketing (T5 convention)."""
    num_buckets //= 2
    ret = (rel_pos > 0).astype(np.int64) * num_buckets
    n = np.abs(rel_pos)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact) / np.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, num_buckets - 1)
    return ret + np.where(is_small, n, large)


def t5_position_bias(params, cfg: T5Config, seq_len: int) -> jnp.ndarray:
    """(1, heads, L, L) additive bias shared by all layers."""
    pos = np.arange(seq_len, dtype=np.int64)
    rel = pos[None, :] - pos[:, None]  # memory - query
    buckets = _t5_relative_buckets(
        rel, cfg.relative_attention_num_buckets, cfg.relative_attention_max_distance
    )
    bias = params["rel_bias"][jnp.asarray(buckets)]  # (L, L, heads)
    return bias.transpose(2, 0, 1)[None]


@partial(jax.jit, static_argnums=(1,))
def t5_encode(params, cfg: T5Config, input_ids: jnp.ndarray, attention_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """(B, L) int32 -> (B, L, d_model) final hidden states."""
    B, L = input_ids.shape
    h = params["embed"][input_ids]
    bias = t5_position_bias(params, cfg, L).astype(jnp.float32)
    if attention_mask is not None:
        neg = jnp.where(attention_mask[:, None, None, :].astype(bool), 0.0, -1e9)
        bias = bias + neg
    eps = cfg.layer_norm_epsilon

    def body(h, bp):
        # all matmuls via linear() -> int8 weight-only quantization works here
        x = _t5_ln(h, bp["ln1"]["scale"], eps)
        q = linear(bp["q"], x).reshape(B, L, cfg.num_heads, cfg.d_kv)
        k = linear(bp["k"], x).reshape(B, L, cfg.num_heads, cfg.d_kv)
        v = linear(bp["v"], x).reshape(B, L, cfg.num_heads, cfg.d_kv)
        # T5: no 1/sqrt(d) scaling (folded into init)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) + bias
        probs = jax.nn.softmax(logits, axis=-1).astype(h.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, L, -1)
        h = h + linear(bp["o"], attn)
        x = _t5_ln(h, bp["ln2"]["scale"], eps)
        ff = linear(bp["wo"], jax.nn.gelu(linear(bp["wi0"], x), approximate=True) * linear(bp["wi1"], x))
        return h + ff, None

    h, _ = jax.lax.scan(body, h, params["blocks"])
    return _t5_ln(h, params["final_ln"]["scale"], eps)


# ---------------------------------------------------------------------------
# CLIP text encoder (pooled output)
# ---------------------------------------------------------------------------


def _ln_init(d, dtype):
    return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}


def _ln(x, p, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype) * p["scale"] + p["bias"]


def clip_text_init(key, cfg: CLIPTextConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 4)

    def block_init(k):
        kk = jax.random.split(k, 6)
        d, m = cfg.hidden_size, cfg.intermediate_size
        return {
            "ln1": _ln_init(d, dtype),
            "q": _linear_init(kk[0], d, d, dtype),
            "k": _linear_init(kk[1], d, d, dtype),
            "v": _linear_init(kk[2], d, d, dtype),
            "o": _linear_init(kk[3], d, d, dtype),
            "ln2": _ln_init(d, dtype),
            "fc1": _linear_init(kk[4], d, m, dtype),
            "fc2": _linear_init(kk[5], m, d, dtype),
        }

    return {
        "tok_embed": (jax.random.normal(ks[0], (cfg.vocab_size, cfg.hidden_size)) * 0.02).astype(dtype),
        "pos_embed": (
            jax.random.normal(ks[1], (cfg.max_position_embeddings, cfg.hidden_size)) * 0.02
        ).astype(dtype),
        "blocks": jax.vmap(block_init)(jax.random.split(ks[2], cfg.num_layers)),
        "final_ln": _ln_init(cfg.hidden_size, dtype),
    }


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


@partial(jax.jit, static_argnums=(1,))
def clip_text_encode(params, cfg: CLIPTextConfig, input_ids: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(B, L) -> (last_hidden (B, L, d), pooled (B, d)).

    Pooled = final-LN hidden at the first EOS-token position."""
    B, L = input_ids.shape
    nH = cfg.num_heads
    D = cfg.hidden_size // nH
    h = params["tok_embed"][input_ids] + params["pos_embed"][:L][None]
    causal = jnp.triu(jnp.full((L, L), -jnp.inf, jnp.float32), k=1)[None, None]
    eps = cfg.layer_norm_eps

    def body(h, bp):
        x = _ln(h, bp["ln1"], eps)
        q = linear(bp["q"], x).reshape(B, L, nH, D)
        k = linear(bp["k"], x).reshape(B, L, nH, D)
        v = linear(bp["v"], x).reshape(B, L, nH, D)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        logits = logits * (D ** -0.5) + causal
        probs = jax.nn.softmax(logits, axis=-1).astype(h.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, L, -1)
        h = h + linear(bp["o"], attn)
        x = _ln(h, bp["ln2"], eps)
        h = h + linear(bp["fc2"], quick_gelu(linear(bp["fc1"], x)))
        return h, None

    h, _ = jax.lax.scan(body, h, params["blocks"])
    h = _ln(h, params["final_ln"], eps)
    if cfg.eos_token_id == 2:
        # legacy CLIP pooling (all published CLIP checkpoints store eos=2 in
        # their config): position of the highest token id = first EOT, since
        # EOT is the max id in the CLIP vocab
        eos_pos = jnp.argmax(input_ids, axis=1)
    else:
        eos_pos = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32), axis=1)
    pooled = h[jnp.arange(B), eos_pos]
    return h, pooled
