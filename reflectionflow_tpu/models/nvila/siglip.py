"""SigLIP vision tower (JAX) — the NVILA verifier's image encoder.

Capability target: the `vision_tower/` half of
`Efficient-Large-Model/NVILA-Lite-2B-Verifier`
(`/root/reference/tts/verifiers/nvila_verifier.py:4-10` loads it via
`trust_remote_code`; the checkpoint stores the tower as a standard
`SiglipVisionModel` subdir). Architecture: valid-padding conv patch embed,
learned position embeddings (no CLS token), pre-LN transformer blocks
(biased q/k/v/out attention + gelu-tanh MLP), final post-layernorm.

TPU-first shape: params are a pytree with per-block leaves stacked on a
leading axis and the encoder is one `lax.scan` body; images are a static
square resolution so the whole tower jits once. VILA taps hidden states at
`select_layer` (-2 = penultimate block output, before post-layernorm) —
the scan simply runs a static prefix of the stacked tree.

Activation-parity-tested against `transformers.SiglipVisionModel` in
tests/test_nvila.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...config import SiglipVisionConfig
from ..flux.dit import _linear_init, linear


def _ln(d, dtype):
    return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}


def layer_norm_affine(x, p, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (out * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)).astype(x.dtype)


def siglip_init(key, cfg: SiglipVisionConfig, dtype=jnp.float32):
    H = cfg.hidden_size
    P = cfg.patch_size
    n_pos = (cfg.image_size // P) ** 2
    ks = jax.random.split(key, 3)

    def block_init(k):
        kk = jax.random.split(k, 6)
        return {
            "ln1": _ln(H, dtype),
            "q": _linear_init(kk[0], H, H, dtype),
            "k": _linear_init(kk[1], H, H, dtype),
            "v": _linear_init(kk[2], H, H, dtype),
            "o": _linear_init(kk[3], H, H, dtype),
            "ln2": _ln(H, dtype),
            "fc1": _linear_init(kk[4], H, cfg.intermediate_size, dtype),
            "fc2": _linear_init(kk[5], cfg.intermediate_size, H, dtype),
        }

    return {
        # conv patch embed stored as a matmul over flattened (c, ph, pw)
        # patches — the TPU-native layout (stride==kernel conv ≡ reshape +
        # matmul; same trick as qwen_vl/vision.py patch_embed)
        "patch_embed": {
            "w": (jax.random.normal(ks[0], (3 * P * P, H)) * (3 * P * P) ** -0.5).astype(dtype),
            "b": jnp.zeros((H,), dtype),
        },
        "pos_embed": (jax.random.normal(ks[1], (n_pos, H)) * 0.02).astype(dtype),
        "blocks": jax.vmap(block_init)(jax.random.split(ks[2], cfg.num_layers)),
        "post_ln": _ln(H, dtype),
    }


def patchify_images(pixels: jnp.ndarray, patch: int) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, gh*gw, 3*patch*patch) flattened valid patches,
    feature order (c, ph, pw) to match the torch Conv2d kernel layout."""
    B, H, W, C = pixels.shape
    gh, gw = H // patch, W // patch
    x = pixels.reshape(B, gh, patch, gw, patch, C)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (B, gh, gw, C, ph, pw)
    return x.reshape(B, gh * gw, C * patch * patch)


def siglip_apply(
    params,
    cfg: SiglipVisionConfig,
    pixels: jnp.ndarray,  # (B, S, S, 3) normalized, S == cfg.image_size
    select_layer: int = 0,
):
    """Returns (B, n_patches, H) hidden states.

    select_layer=0: full tower incl. post-layernorm (transformers
    `last_hidden_state`). Negative: VILA-style tap into the
    [embeddings, block_1, ..., block_N] list — -1 = last block output,
    -2 = penultimate — WITHOUT post-layernorm (matches
    `output_hidden_states=True` indexing, the projector's input).
    """
    nH = cfg.num_heads
    D = cfg.hidden_size // nH
    h = linear(params["patch_embed"], patchify_images(pixels, cfg.patch_size))
    h = h + params["pos_embed"][None].astype(h.dtype)
    B, L, H = h.shape

    n_run = cfg.num_layers if select_layer == 0 else cfg.num_layers + 1 + select_layer
    assert 0 <= n_run <= cfg.num_layers, f"select_layer {select_layer} out of range"

    def block(h, bp):
        x = layer_norm_affine(h, bp["ln1"], cfg.layer_norm_eps)
        q = linear(bp["q"], x).reshape(B, L, nH, D)
        k = linear(bp["k"], x).reshape(B, L, nH, D)
        v = linear(bp["v"], x).reshape(B, L, nH, D)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits * (D ** -0.5), axis=-1).astype(h.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, L, H)
        h = h + linear(bp["o"], attn)
        x = layer_norm_affine(h, bp["ln2"], cfg.layer_norm_eps)
        mlp = linear(bp["fc2"], jax.nn.gelu(linear(bp["fc1"], x), approximate=True))
        return h + mlp, None

    run_blocks = jax.tree.map(lambda leaf: leaf[:n_run], params["blocks"])
    if n_run:
        h, _ = jax.lax.scan(block, h, run_blocks)
    if select_layer == 0:
        h = layer_norm_affine(h, params["post_ln"], cfg.layer_norm_eps)
    return h
