"""Qwen2.5 decoder LM with multimodal 3D RoPE (M-RoPE) and KV cache.

The language half of Qwen2.5-VL — used twice (SURVEY.md §7.3): as the
Image-Verifier (`rm_head` pooling in `reward.py`, capability of
`/root/reference/reward_modeling/trainer.py:59-172`) and as the
Reflection-Generator (`generate.py`, replacing the HTTP-served model at
`/root/reference/tts/tts_reflectionflow.py:24,231`).

Architecture follows Qwen2.5 exactly (GQA, q/k/v bias, SiLU gate MLP,
RMSNorm, rotate-half RoPE with mrope sections) so HF weights convert 1:1 —
validated against transformers on tiny configs in tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...config import QwenLMConfig
from ..flux.dit import _linear_init, linear


def _nobias(key, d_in, d_out, dtype):
    return {"w": (jax.random.normal(key, (d_in, d_out)) * (d_in ** -0.5)).astype(dtype)}


def _rms(d, dtype):
    return {"scale": jnp.ones((d,), dtype)}


def rms_norm(x, scale, eps=1e-6):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return ((xf * jax.lax.rsqrt(var + eps)) * scale.astype(jnp.float32)).astype(x.dtype)


def qwen_lm_init(key, cfg: QwenLMConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    H = cfg.hidden_size
    D = cfg.head_dim
    q_dim, kv_dim = cfg.num_heads * D, cfg.num_kv_heads * D

    def block_init(k):
        kk = jax.random.split(k, 8)
        return {
            "ln1": _rms(H, dtype),
            "q": _linear_init(kk[0], H, q_dim, dtype),
            "k": _linear_init(kk[1], H, kv_dim, dtype),
            "v": _linear_init(kk[2], H, kv_dim, dtype),
            "o": _nobias(kk[3], q_dim, H, dtype),
            "ln2": _rms(H, dtype),
            "gate": _nobias(kk[4], H, cfg.intermediate_size, dtype),
            "up": _nobias(kk[5], H, cfg.intermediate_size, dtype),
            "down": _nobias(kk[6], cfg.intermediate_size, H, dtype),
        }

    params = {
        "embed": (jax.random.normal(ks[0], (cfg.vocab_size, H)) * 0.02).astype(dtype),
        "blocks": jax.vmap(block_init)(jax.random.split(ks[1], cfg.num_layers)),
        "final_ln": _rms(H, dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = _nobias(ks[2], H, cfg.vocab_size, dtype)
    return params


def mrope_tables(position_ids: jnp.ndarray, cfg: QwenLMConfig) -> tuple[jnp.ndarray, jnp.ndarray]:
    """position_ids: (3, B, L) [temporal, h, w] -> (cos, sin) each (B, L, D).

    Section s of `mrope_section` takes its rotary angles from position
    stream s; the half-dim frequency axis is partitioned [t|h|w], and the
    full-dim tables are the half tables tiled twice (rotate-half layout).
    """
    D = cfg.head_dim
    half = D // 2
    inv_freq = 1.0 / (cfg.rope_theta ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    # angles per stream: (3, B, L, half)
    angles = position_ids.astype(jnp.float32)[..., None] * inv_freq[None, None, None, :]
    sections = np.cumsum(np.asarray(cfg.mrope_section))
    assert sections[-1] == half, "mrope_section must sum to head_dim//2"
    parts = []
    start = 0
    for stream, end in enumerate(sections):
        parts.append(angles[stream, :, :, start:end])
        start = end
    ang = jnp.concatenate(parts, axis=-1)  # (B, L, half)
    ang = jnp.concatenate([ang, ang], axis=-1)  # rotate-half tiling
    return jnp.cos(ang), jnp.sin(ang)


def rotate_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope_rh(x, cos, sin):
    """Rotate-half RoPE: x (B, L, H, D), tables (B, L, D)."""
    c = cos[:, :, None, :].astype(jnp.float32)
    s = sin[:, :, None, :].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    return (xf * c + rotate_half(xf) * s).astype(x.dtype)


def qwen_lm_apply(
    params,
    cfg: QwenLMConfig,
    inputs_embeds: jnp.ndarray,  # (B, L, H)
    position_ids: jnp.ndarray,  # (3, B, L)
    attention_mask: jnp.ndarray | None = None,  # (B, L) 1=valid
    kv_cache: dict | None = None,  # {"k": (N,B,S,KV,D), "v":..., "len": int32}
    return_hidden: bool = False,
    remat: bool = False,  # checkpoint the block scan body (training path)
):
    """Returns (logits or hidden, new_kv_cache).

    Without cache: full causal self-attention over L.
    With cache: L = chunk being appended at offset cache["len"].

    `remat=True` wraps the (cacheless) scan body in `jax.checkpoint`:
    under value_and_grad only the per-block carry is saved and the block
    forward is recomputed in the backward. Essential for quantized-base
    training — without it the DEQUANTIZED bf16 weights become per-block
    residuals (~0.5 GB x 28 blocks at 7B: instant OOM on 16 GB)."""
    B, L, H = inputs_embeds.shape
    nH, nKV, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    cos, sin = mrope_tables(position_ids, cfg)
    h = inputs_embeds

    use_cache = kv_cache is not None
    if use_cache:
        S = kv_cache["k"].shape[2]
        offset = kv_cache["len"]
        kpos = jnp.arange(S)[None, :]  # cache slot positions
        qpos = offset + jnp.arange(L)[None, :]
        causal = kpos[:, None, :] <= qpos[:, :, None]  # (1, L, S)
        valid = kpos[:, None, :] < (offset + L)
        mask = (causal & valid)[:, None, :, :]  # (1,1,L,S)
        if "pad" in kv_cache:  # left-padded batched decode: mask pad slots
            notpad = kpos >= kv_cache["pad"][:, None]  # (B, S)
            mask = mask & notpad[:, None, None, :]
        bias = jnp.where(mask, 0.0, -1e9).astype(jnp.float32)
    else:
        causal = jnp.tril(jnp.ones((L, L), bool))
        bias = jnp.where(causal, 0.0, -1e9)[None, None].astype(jnp.float32)
        if attention_mask is not None:
            pad = jnp.where(attention_mask[:, None, None, :].astype(bool), 0.0, -1e9)
            bias = bias + pad

    def block(h, bp, k_cache=None, v_cache=None):
        x = rms_norm(h, bp["ln1"]["scale"], cfg.rms_norm_eps)
        q = linear(bp["q"], x).reshape(B, L, nH, D)
        k = linear(bp["k"], x).reshape(B, L, nKV, D)
        v = linear(bp["v"], x).reshape(B, L, nKV, D)
        q = apply_rope_rh(q, cos, sin)
        k = apply_rope_rh(k, cos, sin)
        if use_cache:
            k_all = jax.lax.dynamic_update_slice(k_cache, k.astype(k_cache.dtype), (0, offset, 0, 0))
            v_all = jax.lax.dynamic_update_slice(v_cache, v.astype(v_cache.dtype), (0, offset, 0, 0))
            new_k, new_v = k_all, v_all
        else:
            k_all, v_all = k, v
            new_k = new_v = None
        # GQA: repeat kv heads
        rep = nH // nKV
        k_r = jnp.repeat(k_all, rep, axis=2)
        v_r = jnp.repeat(v_all, rep, axis=2)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k_r, preferred_element_type=jnp.float32)
        logits = logits * (D ** -0.5) + bias
        probs = jax.nn.softmax(logits, axis=-1).astype(h.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v_r).reshape(B, L, nH * D)
        h = h + linear(bp["o"], attn)
        x = rms_norm(h, bp["ln2"]["scale"], cfg.rms_norm_eps)
        mlp = linear(bp["down"], jax.nn.silu(linear(bp["gate"], x)) * linear(bp["up"], x))
        return h + mlp, (new_k, new_v)

    # scan over stacked block params — one compiled body instead of 28
    # inlined layers; the cached path scans the per-layer caches as xs and
    # collects the updated caches as ys (jit-friendly decode step).
    new_cache = None
    if use_cache:
        def scan_body_cached(carry, xs):
            bp, kc, vc = xs
            out, (nk, nv) = block(carry, bp, kc, vc)
            return out, (nk, nv)

        h, (new_k, new_v) = jax.lax.scan(
            scan_body_cached, h, (params["blocks"], kv_cache["k"], kv_cache["v"])
        )
        new_cache = {"k": new_k, "v": new_v, "len": kv_cache["len"] + L}
        if "pad" in kv_cache:
            new_cache["pad"] = kv_cache["pad"]
    else:
        def scan_body(carry, bp):
            out, _ = block(carry, bp)
            return out, None

        if remat:
            scan_body = jax.checkpoint(scan_body)
        h, _ = jax.lax.scan(scan_body, h, params["blocks"])
    h = rms_norm(h, params["final_ln"]["scale"], cfg.rms_norm_eps)
    if return_hidden:
        return h, new_cache
    if "lm_head" in params:
        logits = h @ params["lm_head"]["w"]
    else:
        logits = h @ params["embed"].T
    return logits, new_cache


def init_kv_cache(cfg: QwenLMConfig, batch: int, max_len: int, dtype=jnp.bfloat16) -> dict:
    shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype), "len": jnp.asarray(0, jnp.int32)}
