"""FLUX AutoencoderKL (16-channel) in NHWC, TPU-native.

Capability parity with the diffusers VAE the reference delegates to
(`/root/reference/train_flux/flux/pipeline_tools.py:7-30` encode path,
`/root/reference/train_flux/flux/generate.py:298-307` decode path):
encoder/decoder resnet stacks with GroupNorm+SiLU, a single-head attention
mid-block, diagonal-Gaussian sampling, and the FLUX scaling/shift factors.

TPU-first: NHWC layout throughout (XLA:TPU's native conv layout), fp32
GroupNorm accumulation, weights stored as HWIO.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ...config import FluxVAEConfig


def _conv_init(key, k, c_in, c_out, dtype):
    fan_in = k * k * c_in
    w = jax.random.normal(key, (k, k, c_in, c_out)) * (1.0 / jnp.sqrt(fan_in))
    return {"w": w.astype(dtype), "b": jnp.zeros((c_out,), dtype)}


def conv2d(p, x, stride=1, padding="SAME"):
    out = jax.lax.conv_general_dilated(
        x,
        p["w"],
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p["b"]


def group_norm(x, p, num_groups, eps=1e-6):
    B, H, W, C = x.shape
    xf = x.astype(jnp.float32).reshape(B, H, W, num_groups, C // num_groups)
    mu = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xf, axis=(1, 2, 4), keepdims=True)
    xf = (xf - mu) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(B, H, W, C)
    return (xf * p["scale"] + p["bias"]).astype(x.dtype)


def _gn_init(c, dtype):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def _resnet_init(key, c_in, c_out, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "norm1": _gn_init(c_in, dtype),
        "conv1": _conv_init(k1, 3, c_in, c_out, dtype),
        "norm2": _gn_init(c_out, dtype),
        "conv2": _conv_init(k2, 3, c_out, c_out, dtype),
    }
    if c_in != c_out:
        p["shortcut"] = _conv_init(k3, 1, c_in, c_out, dtype)
    return p


def _resnet_apply(p, x, groups):
    h = conv2d(p["conv1"], jax.nn.silu(group_norm(x, p["norm1"], groups)))
    h = conv2d(p["conv2"], jax.nn.silu(group_norm(h, p["norm2"], groups)))
    if "shortcut" in p:
        x = conv2d(p["shortcut"], x)
    return x + h


def _attn_init(key, c, dtype):
    ks = jax.random.split(key, 4)
    return {
        "norm": _gn_init(c, dtype),
        "q": _conv_init(ks[0], 1, c, c, dtype),
        "k": _conv_init(ks[1], 1, c, c, dtype),
        "v": _conv_init(ks[2], 1, c, c, dtype),
        "out": _conv_init(ks[3], 1, c, c, dtype),
    }


def _attn_apply(p, x, groups):
    B, H, W, C = x.shape
    h = group_norm(x, p["norm"], groups)
    q = conv2d(p["q"], h).reshape(B, H * W, C)
    k = conv2d(p["k"], h).reshape(B, H * W, C)
    v = conv2d(p["v"], h).reshape(B, H * W, C)
    logits = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32) / jnp.sqrt(
        jnp.asarray(C, jnp.float32)
    )
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("bqk,bkc->bqc", probs, v).reshape(B, H, W, C)
    return x + conv2d(p["out"], out)


def _mid_init(key, c, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "res1": _resnet_init(k1, c, c, dtype),
        "attn": _attn_init(k2, c, dtype),
        "res2": _resnet_init(k3, c, c, dtype),
    }


def _mid_apply(p, x, groups):
    x = _resnet_apply(p["res1"], x, groups)
    x = _attn_apply(p["attn"], x, groups)
    return _resnet_apply(p["res2"], x, groups)


# ---------------------------------------------------------------------------


def vae_encoder_init(key, cfg: FluxVAEConfig, dtype=jnp.float32):
    chans = cfg.block_out_channels
    ks = jax.random.split(key, 4 + len(chans))
    down = []
    c_prev = chans[0]
    for i, c in enumerate(chans):
        bk = jax.random.split(ks[2 + i], cfg.layers_per_block + 1)
        resnets = []
        for j in range(cfg.layers_per_block):
            resnets.append(_resnet_init(bk[j], c_prev if j == 0 else c, c, dtype))
        block = {"resnets": resnets}
        if i < len(chans) - 1:
            block["down"] = _conv_init(bk[-1], 3, c, c, dtype)
        down.append(block)
        c_prev = c
    return {
        "conv_in": _conv_init(ks[0], 3, cfg.in_channels, chans[0], dtype),
        "down": down,
        "mid": _mid_init(ks[1], chans[-1], dtype),
        "norm_out": _gn_init(chans[-1], dtype),
        "conv_out": _conv_init(ks[-1], 3, chans[-1], 2 * cfg.latent_channels, dtype),
    }


def vae_encode_moments(params, cfg: FluxVAEConfig, images: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) in [-1, 1] -> (B, h, w, 2*latent_channels) mean|logvar."""
    g = cfg.norm_num_groups
    x = conv2d(params["conv_in"], images)
    for block in params["down"]:
        for rp in block["resnets"]:
            x = _resnet_apply(rp, x, g)
        if "down" in block:
            # asymmetric (0,1),(0,1) pad + stride-2 conv
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            x = conv2d(block["down"], x, stride=2, padding="VALID")
    x = _mid_apply(params["mid"], x, g)
    x = jax.nn.silu(group_norm(x, params["norm_out"], g))
    return conv2d(params["conv_out"], x)


def _moments_to_latents(moments, cfg: FluxVAEConfig, key=None) -> jnp.ndarray:
    mean, logvar = jnp.split(moments, 2, axis=-1)
    if key is not None:
        logvar = jnp.clip(logvar, -30.0, 20.0)
        mean = mean + jnp.exp(0.5 * logvar) * jax.random.normal(key, mean.shape, mean.dtype)
    return (mean - cfg.shift_factor) * cfg.scaling_factor


@partial(jax.jit, static_argnums=(1,))
def vae_encode(params, cfg: FluxVAEConfig, images: jnp.ndarray, key=None) -> jnp.ndarray:
    """Encode to scaled/shifted latents; `key=None` -> mode (mean)."""
    return _moments_to_latents(vae_encode_moments(params, cfg, images), cfg, key)


def vae_decoder_init(key, cfg: FluxVAEConfig, dtype=jnp.float32):
    chans = list(reversed(cfg.block_out_channels))
    ks = jax.random.split(key, 4 + len(chans))
    up = []
    c_prev = chans[0]
    for i, c in enumerate(chans):
        bk = jax.random.split(ks[2 + i], cfg.layers_per_block + 2)
        resnets = []
        for j in range(cfg.layers_per_block + 1):
            resnets.append(_resnet_init(bk[j], c_prev if j == 0 else c, c, dtype))
        block = {"resnets": resnets}
        if i < len(chans) - 1:
            block["up"] = _conv_init(bk[-1], 3, c, c, dtype)
        up.append(block)
        c_prev = c
    return {
        "conv_in": _conv_init(ks[0], 3, cfg.latent_channels, chans[0], dtype),
        "mid": _mid_init(ks[1], chans[0], dtype),
        "up": up,
        "norm_out": _gn_init(chans[-1], dtype),
        "conv_out": _conv_init(ks[-1], 3, chans[-1], cfg.in_channels, dtype),
    }


@partial(jax.jit, static_argnums=(1,))
def vae_decode(params, cfg: FluxVAEConfig, latents: jnp.ndarray) -> jnp.ndarray:
    """Scaled latents (B, h, w, C_lat) -> images (B, H, W, 3) in [-1, 1]."""
    g = cfg.norm_num_groups
    z = latents / cfg.scaling_factor + cfg.shift_factor
    x = conv2d(params["conv_in"], z)
    x = _mid_apply(params["mid"], x, g)
    for block in params["up"]:
        for rp in block["resnets"]:
            x = _resnet_apply(rp, x, g)
        if "up" in block:
            B, H, W, C = x.shape
            x = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
            x = conv2d(block["up"], x)
    x = jax.nn.silu(group_norm(x, params["norm_out"], g))
    return conv2d(params["conv_out"], x)


def vae_init(key, cfg: FluxVAEConfig, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {"encoder": vae_encoder_init(k1, cfg, dtype), "decoder": vae_decoder_init(k2, cfg, dtype)}


# ---------------------------------------------------------------------------
# Tiled encode/decode — parity with diffusers `enable_vae_tiling`
# (`AutoencoderKL.tiled_decode/tiled_encode`), which the reference inherits
# through its diffusers VAE. Bounds decode activation memory at high
# resolution: the 1024px decode transients (~1.5 GB) are what break
# all-resident single-chip serving layouts; per-tile they shrink ~4x.
#
# TPU shape: each tile runs the SAME jitted `vae_decode`/moments graph
# (interior tiles share one compiled signature; clipped edge tiles add at
# most 3 more), and overlap blending is a handful of elementwise jnp ops on
# the small image/moment tiles — no host round-trips between tiles.
#
# Exactly like diffusers, per-tile GroupNorm statistics make a multi-tile
# result differ slightly from the untiled one near seams; a single-tile
# call is bit-identical (tested), and the stitch math is tested exactly
# with a shift-invariant decoder.


def _blend_v(top, bottom, extent):
    """Linearly blend `bottom`'s first rows with `top`'s last rows (NHWC)."""
    extent = min(extent, top.shape[1], bottom.shape[1])
    if extent <= 0:
        return bottom
    w = (jnp.arange(extent, dtype=jnp.float32) / extent)[None, :, None, None]
    mixed = top[:, -extent:].astype(jnp.float32) * (1.0 - w) + bottom[:, :extent].astype(jnp.float32) * w
    return jnp.concatenate([mixed.astype(bottom.dtype), bottom[:, extent:]], axis=1)


def _blend_h(left, right, extent):
    """Linearly blend `right`'s first columns with `left`'s last columns (NHWC)."""
    extent = min(extent, left.shape[2], right.shape[2])
    if extent <= 0:
        return right
    w = (jnp.arange(extent, dtype=jnp.float32) / extent)[None, None, :, None]
    mixed = left[:, :, -extent:].astype(jnp.float32) * (1.0 - w) + right[:, :, :extent].astype(jnp.float32) * w
    return jnp.concatenate([mixed.astype(right.dtype), right[:, :, extent:]], axis=2)


def _tiled_grid(full_fn, x, tile, overlap_factor, tile_out):
    """Shared tile/blend/stitch core (diffusers' overlap scheme, NHWC).

    `x` is split into `tile`-sized windows at stride tile*(1-overlap); each
    window goes through `full_fn` (which maps a full `tile` window to a
    `tile_out`-sized output — x8 for decode, /8 for encode), then adjacent
    outputs are linearly cross-faded over the overlap and cropped so kept
    extents sum exactly to x's extent * tile_out/tile.
    """
    _, h, w, _ = x.shape
    stride = int(tile * (1.0 - overlap_factor))
    assert 0 < stride <= tile, f"overlap_factor {overlap_factor} leaves no stride"
    blend = int(tile_out * overlap_factor)
    row_limit = tile_out - blend
    rows = [
        [full_fn(x[:, i : i + tile, j : j + tile]) for j in range(0, w, stride)]
        for i in range(0, h, stride)
    ]
    out_rows = []
    for i, row in enumerate(rows):
        out_row = []
        for j, t in enumerate(row):
            if i > 0:
                t = _blend_v(rows[i - 1][j], t, blend)
            if j > 0:
                t = _blend_h(row[j - 1], t, blend)
            out_row.append(t[:, :row_limit, :row_limit])
        out_rows.append(jnp.concatenate(out_row, axis=2))
    return jnp.concatenate(out_rows, axis=1)


def vae_decode_tiled(
    params, cfg: FluxVAEConfig, latents: jnp.ndarray, tile_latent: int = 64,
    overlap_factor: float = 0.25, decode_fn=None,
) -> jnp.ndarray:
    """`vae_decode` in overlapping `tile_latent`-sized latent tiles
    (64 latent = 512px samples, diffusers' default tile). Single-tile
    inputs take the exact untiled path."""
    decode_fn = decode_fn or (lambda z: vae_decode(params, cfg, z))
    _, h, w, _ = latents.shape
    if h <= tile_latent and w <= tile_latent:
        return decode_fn(latents)
    tile_out = tile_latent * cfg.downscale
    stride, blend = int(tile_latent * (1.0 - overlap_factor)), int(tile_out * overlap_factor)
    # stitch invariant: each kept tile extent (tile_out - blend) must equal
    # the latent stride upscaled, or the output is silently mis-sized/shifted
    assert stride * cfg.downscale == tile_out - blend, (
        f"tile_latent {tile_latent} / overlap {overlap_factor} misalign: kept "
        f"extent {tile_out - blend}px != stride {stride}*{cfg.downscale}px — "
        f"pick an overlap where int(tile*(1-f))*scale == tile*scale - int(tile*scale*f)"
    )
    return _tiled_grid(decode_fn, latents, tile_latent, overlap_factor, tile_out)


def vae_encode_tiled(
    params, cfg: FluxVAEConfig, images: jnp.ndarray, key=None, tile_sample: int = 512,
    overlap_factor: float = 0.25, moments_fn=None,
) -> jnp.ndarray:
    """`vae_encode` in overlapping `tile_sample`-sized image tiles; the
    diagonal-Gaussian moments are blended across seams (like diffusers'
    `tiled_encode`), then sampled/scaled once."""
    _, h, w, _ = images.shape
    if h <= tile_sample and w <= tile_sample:
        return vae_encode(params, cfg, images, key)
    s = cfg.downscale
    assert tile_sample % s == 0 and int(tile_sample * (1.0 - overlap_factor)) % s == 0, (
        f"tile_sample {tile_sample} / overlap {overlap_factor} must keep tile "
        f"and stride multiples of the VAE scale {s} so latent tiles align"
    )
    moments_fn = moments_fn or (lambda t: _moments_jit(params, cfg, t))
    # run the conv stack per tile, blend in latent-space moments (tile,
    # stride and blend all divide by s exactly — asserted above)
    moments = _tiled_grid(moments_fn, images, tile_sample, overlap_factor, tile_sample // s)
    return _moments_to_latents(moments, cfg, key)


_moments_jit = partial(jax.jit, static_argnums=(1,))(vae_encode_moments)
