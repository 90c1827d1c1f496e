"""NVILA (VILA-family) vision-language model — JAX-native.

Capability parity with `Efficient-Large-Model/NVILA-Lite-2B-Verifier` as
used by the reference (`/root/reference/tts/verifiers/nvila_verifier.py:4-10`
+ the yes/no scoring convention at
`/root/reference/tts/tts_reflectionflow.py:157-170`): SigLIP tower →
token-compressing MLP projector → Qwen2 LM; score = the yes/no logits the
first generated token sees.

Design notes (TPU-first):
  * The LM is the existing `qwen_vl.lm` stack (Qwen2 == Qwen2.5 minus
    M-RoPE; passing the same 1-D positions for all three M-RoPE streams
    reproduces standard rotate-half RoPE exactly, since the sections
    partition the frequency axis).
  * Images are a fixed square resolution, so tower+projector+LM jit once;
    candidates are a batch axis (the reference loops images one at a time).
  * Text is spliced around image embeddings by string-splitting on the
    media token — no dependence on a tokenizer-specific `<image>` id.

The projector's DownSample block mirrors VILA's `flat_square` reshapes:
output cell (i, j) concatenates the k×k input cells row-major
([x(ki+di, kj+dj) for di for dj]), grid zero-padded on bottom/right to a
multiple of k. k=2 is VILA "mlp_downsample", k=3 "mlp_downsample_3x3_fix".
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ...config import NvilaConfig, QwenLMConfig, SiglipVisionConfig
from ..flux.dit import linear
from .siglip import layer_norm_affine, siglip_apply


def downsample_tokens(tokens: jnp.ndarray, k: int) -> jnp.ndarray:
    """(B, gh*gw, C) -> (B, ceil(gh/k)*ceil(gw/k), C*k*k), VILA flat_square
    semantics (row-major k×k concat, zero pad bottom/right)."""
    B, L, C = tokens.shape
    g = int(round(L ** 0.5))
    assert g * g == L, f"non-square token grid: {L}"
    x = tokens.reshape(B, g, g, C)
    pad = (-g) % k
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, pad), (0, 0)))
        g = g + pad
    x = x.reshape(B, g // k, k, g // k, k, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, gi, gj, di, dj, C)
    return x.reshape(B, (g // k) * (g // k), k * k * C)


def projector_apply(params, tokens: jnp.ndarray, k: int) -> jnp.ndarray:
    """DownSample(k) -> [LayerNorm] -> Linear -> GELU -> Linear."""
    if k > 1:
        tokens = downsample_tokens(tokens, k)
    if "ln" in params:
        # torch nn.LayerNorm default eps (the projector is built with
        # defaults, unlike the tower's config-driven 1e-6)
        tokens = layer_norm_affine(tokens, params["ln"], eps=1e-5)
    h = jax.nn.gelu(linear(params["fc1"], tokens), approximate=False)
    return linear(params["fc2"], h)


def preprocess_images(images: Sequence[np.ndarray], size: int) -> np.ndarray:
    """uint8 HWC images -> (B, size, size, 3) float32 in [-1, 1] (SigLIP
    processor: square resize, rescale 1/255, normalize mean=std=0.5)."""
    from PIL import Image

    out = np.empty((len(images), size, size, 3), np.float32)
    for i, img in enumerate(images):
        arr = np.asarray(img)
        if arr.dtype != np.uint8:
            arr = np.clip(arr, 0, 255).astype(np.uint8)
        pil = Image.fromarray(arr).convert("RGB").resize((size, size), Image.BICUBIC)
        out[i] = (np.asarray(pil, np.float32) / 255.0 - 0.5) / 0.5
    return out


@partial(jax.jit, static_argnames=("vis_cfg", "lm_cfg", "select_layer", "downsample"))
def _nvila_logits(
    vis_params,
    proj_params,
    lm_params,
    vis_cfg: SiglipVisionConfig,
    lm_cfg: QwenLMConfig,
    pixels: jnp.ndarray,  # (B, S, S, 3)
    pre_ids: jnp.ndarray,  # (B, Lp) right-aligned (left-padded with pad_mask)
    pre_mask: jnp.ndarray,  # (B, Lp) 1=valid
    post_ids: jnp.ndarray,  # (B, Lq) left-aligned (right-padded)
    post_mask: jnp.ndarray,  # (B, Lq)
    select_layer: int,
    downsample: int,
):
    """Forward [pre-text | image tokens | post-text]; returns logits at the
    last VALID position of each row — what the first generated token sees.

    Left-padding the pre-text and right-padding the post-text keeps the
    image block at a static offset (one jit signature per (Lp, Lq, B));
    pad positions are masked out of attention and positions are
    pad-corrected so RoPE matches an unpadded sequence.
    """
    from ..qwen_vl.lm import qwen_lm_apply

    B = pixels.shape[0]
    vis = siglip_apply(vis_params, vis_cfg, pixels, select_layer=select_layer)
    img_embeds = projector_apply(proj_params, vis, downsample).astype(lm_params["embed"].dtype)
    n_img = img_embeds.shape[1]

    pre_e = lm_params["embed"][pre_ids]
    post_e = lm_params["embed"][post_ids]
    embeds = jnp.concatenate([pre_e, img_embeds, post_e], axis=1)
    Lp, Lq = pre_ids.shape[1], post_ids.shape[1]
    L = Lp + n_img + Lq
    mask = jnp.concatenate(
        [pre_mask, jnp.ones((B, n_img), pre_mask.dtype), post_mask], axis=1
    )
    # positions: contiguous over valid tokens (pre-text is left-padded, so
    # shift each row's positions back by its pad count)
    n_pad = Lp - jnp.sum(pre_mask, axis=1)  # (B,)
    pos = jnp.arange(L)[None, :] - n_pad[:, None]
    pos = jnp.clip(pos, 0)
    pos3 = jnp.broadcast_to(pos[None], (3, B, L))  # equal streams == 1-D RoPE
    logits, _ = qwen_lm_apply(lm_params, lm_cfg, embeds, pos3, attention_mask=mask)
    last = Lp + n_img + jnp.sum(post_mask, axis=1).astype(jnp.int32) - 1  # (B,)
    return jnp.take_along_axis(logits, last[:, None, None], axis=1)[:, 0, :]


@dataclass
class NvilaModel:
    vis_params: dict
    proj_params: dict
    lm_params: dict
    vis_cfg: SiglipVisionConfig
    lm_cfg: QwenLMConfig
    cfg: NvilaConfig = field(default_factory=NvilaConfig)
    tokenizer: object = None
    # chatml prompt around the media token (Qwen2-family conversation
    # format); `{prompt}` is the verifier question text
    template: str = (
        "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
        "<|im_start|>user\n<image>\n{prompt}<|im_end|>\n<|im_start|>assistant\n"
    )

    def _encode(self, text: str) -> tuple[list[int], list[int]]:
        pre, _, post = text.partition(self.cfg.media_token)
        enc = lambda s: self.tokenizer.encode(s, add_special_tokens=False)  # noqa: E731
        return enc(pre), enc(post)

    def first_token_logits(self, images: Sequence[np.ndarray], prompts: Sequence[str]) -> np.ndarray:
        """(B, vocab) logits for the first generated token of each
        (image, prompt) pair — the quantity the reference's yes/no ranking
        reads (`tts_reflectionflow.py:161-165`, `scores1[0][0, id]`)."""
        assert len(images) == len(prompts)
        pixels = jnp.asarray(preprocess_images(images, self.vis_cfg.image_size))
        pre_list, post_list = zip(*(self._encode(self.template.format(prompt=p)) for p in prompts))
        # bucket pad lengths to limit jit signatures across prompt sets
        Lp = max(8, -(-max(map(len, pre_list)) // 32) * 32)
        Lq = max(8, -(-max(map(len, post_list)) // 32) * 32)
        B = len(images)
        pre_ids = np.zeros((B, Lp), np.int32)
        pre_mask = np.zeros((B, Lp), np.int32)
        post_ids = np.zeros((B, Lq), np.int32)
        post_mask = np.zeros((B, Lq), np.int32)
        for i, (a, b) in enumerate(zip(pre_list, post_list)):
            pre_ids[i, Lp - len(a):] = a  # left-pad
            pre_mask[i, Lp - len(a):] = 1
            post_ids[i, : len(b)] = b  # right-pad
            post_mask[i, : len(b)] = 1
        logits = _nvila_logits(
            self.vis_params, self.proj_params, self.lm_params,
            self.vis_cfg, self.lm_cfg, pixels,
            jnp.asarray(pre_ids), jnp.asarray(pre_mask),
            jnp.asarray(post_ids), jnp.asarray(post_mask),
            self.cfg.select_layer, self.cfg.downsample,
        )
        return np.asarray(logits.astype(jnp.float32))
