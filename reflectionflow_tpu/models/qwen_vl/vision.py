"""Qwen2.5-VL vision tower: window attention + 2D RoPE + patch merger.

The vision half of the Image-Verifier / Reflection-Generator (capability of
the HF vision tower the reference loads via transformers —
`/root/reference/reward_modeling/trainer.py:96-125` consumes its embeds).
Weight-compatible with `Qwen2_5_VisionTransformerPretrainedModel`; parity
is tested against transformers on tiny configs.

TPU-native formulation: the window partition (token regrouping by
`window_index`) and both attention masks are precomputed on host per grid
shape (static per image size -> cached jit), and window attention is a
single dense attention with a block-diagonal segment bias. Sequences here
are a few thousand tokens, so dense bias + XLA fused softmax is the right
first implementation; the Pallas flash path drops in via ops.attention.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ...config import QwenVLVisionConfig
from ..flux.dit import _linear_init, linear
from .lm import rms_norm, rotate_half


def _nobias(key, d_in, d_out, dtype):
    return {"w": (jax.random.normal(key, (d_in, d_out)) * (d_in ** -0.5)).astype(dtype)}


def qwen_vision_init(key, cfg: QwenVLVisionConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    C = cfg.hidden_size
    patch_dim = 3 * cfg.temporal_patch_size * cfg.patch_size * cfg.patch_size
    merged = C * cfg.spatial_merge_size**2

    def block_init(k):
        kk = jax.random.split(k, 6)
        return {
            "ln1": {"scale": jnp.ones((C,), dtype)},
            "qkv": _linear_init(kk[0], C, 3 * C, dtype),
            "proj": _linear_init(kk[1], C, C, dtype),
            "ln2": {"scale": jnp.ones((C,), dtype)},
            "gate": _linear_init(kk[2], C, cfg.intermediate_size, dtype),
            "up": _linear_init(kk[3], C, cfg.intermediate_size, dtype),
            "down": _linear_init(kk[4], cfg.intermediate_size, C, dtype),
        }

    return {
        "patch_embed": _nobias(ks[0], patch_dim, C, dtype),
        "blocks": jax.vmap(block_init)(jax.random.split(ks[1], cfg.depth)),
        "merger": {
            "ln_q": {"scale": jnp.ones((C,), dtype)},
            "fc1": _linear_init(ks[2], merged, merged, dtype),
            "fc2": _linear_init(ks[3], merged, cfg.out_hidden_size, dtype),
        },
    }


# ---------------------------------------------------------------------------
# host-side static geometry (per grid shape)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=32)
def vision_geometry(cfg: QwenVLVisionConfig, t: int, h: int, w: int):
    """Precompute (window_index, pos_ids, seg_window, seg_full) for one grid.

    Matches Qwen2.5-VL's get_window_index / rot_pos_emb semantics: tokens
    are regrouped into spatial-merge units of (merge**2) patches, units are
    tiled into windows of `window_size//merge//patch` units with edge
    truncation, and window attention is segment-local.
    """
    merge = cfg.spatial_merge_size
    unit = merge * merge
    win = cfg.window_size // merge // cfg.patch_size  # units per window edge
    gh, gw = h // merge, w // merge  # llm grid (units)

    index = np.arange(t * gh * gw).reshape(t, gh, gw)
    pad_h = (-gh) % win
    pad_w = (-gw) % win
    nwh, nww = (gh + pad_h) // win, (gw + pad_w) // win
    padded = np.pad(index, ((0, 0), (0, pad_h), (0, pad_w)), constant_values=-100)
    padded = padded.reshape(t, nwh, win, nww, win).transpose(0, 1, 3, 2, 4)
    padded = padded.reshape(t, nwh * nww, win, win)
    seqlens = (padded != -100).sum(axis=(2, 3)).reshape(-1)  # units per window
    flat = padded.reshape(-1)
    window_index = flat[flat != -100]  # unit order after windowing

    # window segment id per TOKEN (after reorder): window j covers
    # seqlens[j]*unit tokens contiguously
    seg_window = np.repeat(np.arange(len(seqlens)), seqlens * unit)

    # full-attention segment: one image (t frames share h*w each -> per-frame
    # segments, matching cu_seqlens = repeat(h*w, t))
    seg_full_units = np.repeat(np.arange(t), gh * gw)
    # after reorder, full segments follow the reordered unit order's frame ids
    seg_full = np.repeat(seg_full_units[window_index], unit)

    # 2D rope position ids per patch (pre-reorder order is merge-grouped)
    hpos = np.broadcast_to(np.arange(h)[:, None], (h, w))
    wpos = np.broadcast_to(np.arange(w)[None, :], (h, w))

    def group(x):
        return x.reshape(gh, merge, gw, merge).transpose(0, 2, 1, 3).reshape(-1)

    hpos_g, wpos_g = group(hpos), group(wpos)
    pos = np.stack([hpos_g, wpos_g], axis=-1)  # (h*w, 2)
    pos = np.tile(pos, (t, 1))
    # reorder positions by window_index at unit granularity
    pos_units = pos.reshape(-1, unit, 2)[window_index].reshape(-1, 2)
    return window_index, pos_units, seg_window, seg_full


def _seg_bias(seg: np.ndarray) -> jnp.ndarray:
    same = seg[:, None] == seg[None, :]
    return jnp.asarray(np.where(same, 0.0, -1e9), jnp.float32)[None, None]


import functools as _functools


@_functools.partial(jax.jit, static_argnames=("cfg", "grid_thw"))
def qwen_vision_batch_apply(params, cfg, patches_batch, grid_thw):
    """(B, L, pd) -> (B, L/merge^2, H): the tower vmapped over a same-grid
    batch under ONE stable jit (the verifier/reflector hot path — a fresh
    vmap closure per call would retrace every round)."""
    return jax.vmap(lambda p: qwen_vision_apply(params, cfg, p, grid_thw))(patches_batch)


def qwen_vision_apply(
    params,
    cfg: QwenVLVisionConfig,
    patches: jnp.ndarray,  # (L, 3*tp*ps*ps) flattened patch pixels
    grid_thw: tuple[int, int, int],
    remat: bool = False,  # checkpoint each block (vision-LoRA training path)
) -> jnp.ndarray:
    """-> (L / merge**2, out_hidden_size) image embeds for the LM.

    `remat=True` checkpoints each block so a quantized/frozen tower under
    value_and_grad recomputes forwards instead of saving dequantized
    weights and attention intermediates as residuals."""
    t, h, w = grid_thw
    L = t * h * w
    assert patches.shape[0] == L
    merge = cfg.spatial_merge_size
    unit = merge * merge
    nH = cfg.num_heads
    D = cfg.hidden_size // nH

    window_index, pos_units, seg_window, seg_full = vision_geometry(cfg, t, h, w)

    x = patches @ params["patch_embed"]["w"]  # (L, C)
    # reorder into window order at unit granularity
    x = x.reshape(L // unit, unit, -1)[jnp.asarray(window_index)].reshape(L, -1)

    # rope tables: dim/4 freqs each for h and w -> (L, D/2) -> tile to D
    quarter = D // 4
    inv_freq = 1.0 / (10000.0 ** (np.arange(quarter, dtype=np.float64) * 2 / (D // 2)))
    ang_h = pos_units[:, 0:1] * inv_freq[None, :]
    ang_w = pos_units[:, 1:2] * inv_freq[None, :]
    ang = np.concatenate([ang_h, ang_w], axis=-1)  # (L, D/2)
    ang = np.concatenate([ang, ang], axis=-1)  # (L, D)
    cos = jnp.asarray(np.cos(ang), jnp.float32)[None, :, None, :]
    sin = jnp.asarray(np.sin(ang), jnp.float32)[None, :, None, :]

    bias_window = _seg_bias(seg_window)
    bias_full = _seg_bias(seg_full)
    fullatt = set(cfg.fullatt_block_indexes)

    def block(xx, bp, use_full):
        hs = rms_norm(xx, bp["ln1"]["scale"])
        qkv = linear(bp["qkv"], hs).reshape(1, L, 3, nH, D)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        qf = (q.astype(jnp.float32) * cos + rotate_half(q.astype(jnp.float32)) * sin).astype(xx.dtype)
        kf = (k.astype(jnp.float32) * cos + rotate_half(k.astype(jnp.float32)) * sin).astype(xx.dtype)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qf, kf, preferred_element_type=jnp.float32)
        logits = logits * (D ** -0.5) + (bias_full if use_full else bias_window)
        probs = jax.nn.softmax(logits, axis=-1).astype(xx.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(L, nH * D)
        xx = xx + linear(bp["proj"], attn)
        hs = rms_norm(xx, bp["ln2"]["scale"])
        mlp = linear(bp["down"], jax.nn.silu(linear(bp["gate"], hs)) * linear(bp["up"], hs))
        return xx + mlp

    block_fn = jax.checkpoint(block, static_argnums=(2,)) if remat else block
    for i in range(cfg.depth):
        bp = jax.tree.map(lambda a: a[i], params["blocks"])
        x = block_fn(x, bp, i in fullatt)

    # merger: RMSNorm per token, group merge**2 tokens, MLP
    m = rms_norm(x, params["merger"]["ln_q"]["scale"])
    m = m.reshape(L // unit, unit * cfg.hidden_size)
    m = linear(params["merger"]["fc2"], jax.nn.gelu(linear(params["merger"]["fc1"], m), approximate=False))
    # undo the window reorder
    reverse = jnp.asarray(np.argsort(window_index))
    return m[reverse]


_CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def frames_to_patches(frames: np.ndarray, cfg: QwenVLVisionConfig) -> tuple[np.ndarray, tuple[int, int, int]]:
    """(T, H, W, 3) uint8, T a multiple of temporal_patch_size ->
    flattened patches (L, 3*tp*ps*ps) in Qwen order + grid (T/tp, h, w).

    The shared patchify core: normalize, bundle `tp` frames, patchify with
    channel-major features per patch in merge-grouped ordering. Images are
    the T=tp special case (`image_to_patches` temporal-duplicates); videos
    pad T to a multiple of tp first (`video.video_to_patches`)."""
    ps, tp, merge = cfg.patch_size, cfg.temporal_patch_size, cfg.spatial_merge_size
    T, H, W, _ = frames.shape
    assert T % tp == 0 and H % (ps * merge) == 0 and W % (ps * merge) == 0, (T, H, W)
    gt, gh, gw = T // tp, H // ps, W // ps
    x = (frames.astype(np.float32) / 255.0 - _CLIP_MEAN) / _CLIP_STD  # (T, H, W, 3)
    x = x.transpose(0, 3, 1, 2)  # (T, 3, H, W)
    # -> (gh/m, m, gw/m, m) patch grid per frame bundle, merge-grouped order
    x = x.reshape(gt, tp, 3, gh // merge, merge, ps, gw // merge, merge, ps)
    x = x.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)  # (gt, gh/m, gw/m, m, m, 3, tp, ps, ps)
    patches = x.reshape(gt * gh * gw, 3 * tp * ps * ps)
    return patches, (gt, gh, gw)


def image_to_patches(image: np.ndarray, cfg: QwenVLVisionConfig) -> tuple[np.ndarray, tuple[int, int, int]]:
    """(H, W, 3) uint8 (H, W multiples of patch*merge) -> flattened patches
    (L, 3*tp*ps*ps) in Qwen order + grid (1, h, w).

    Matches Qwen preprocessing: the frame is temporal-duplicated to fill
    one `temporal_patch_size` bundle, then patchified by the shared core.
    """
    frames = np.broadcast_to(
        np.asarray(image)[None], (cfg.temporal_patch_size,) + image.shape
    )
    return frames_to_patches(frames, cfg)


def smart_resize(height: int, width: int, factor: int = 28, min_pixels: int = 56 * 56, max_pixels: int = 14 * 14 * 4 * 1280) -> tuple[int, int]:
    """Qwen's resolution policy: round to multiples of `factor`, keep area
    within [min_pixels, max_pixels] (semantics of the vendored helper at
    `/root/reference/reward_modeling/vision_process.py:55-81`)."""
    import math

    if max(height, width) / min(height, width) > 200:
        raise ValueError("aspect ratio too extreme")
    h_bar = max(factor, round(height / factor) * factor)
    w_bar = max(factor, round(width / factor) * factor)
    if h_bar * w_bar > max_pixels:
        beta = math.sqrt((height * width) / max_pixels)
        h_bar = math.floor(height / beta / factor) * factor
        w_bar = math.floor(width / beta / factor) * factor
    elif h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (height * width))
        h_bar = math.ceil(height * beta / factor) * factor
        w_bar = math.ceil(width * beta / factor) * factor
    return h_bar, w_bar
