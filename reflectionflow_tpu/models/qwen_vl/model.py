"""Qwen2.5-VL combined model: vision embeds scattered into the token stream
+ 3D M-RoPE position ids.

`get_rope_index` reproduces Qwen2.5-VL's position assignment: text tokens
advance all three (t, h, w) streams together; each image's tokens get grid
positions (t offset constant, h/w from the merged grid), and the stream
resumes after the image at max_position + 1.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ...config import QwenLMConfig, QwenVLVisionConfig
from .lm import qwen_lm_apply
from .vision import image_to_patches, qwen_vision_apply


@dataclass(frozen=True)
class QwenVLSpecialTokens:
    image_pad: int = 151655
    video_pad: int = 151656
    vision_start: int = 151652
    vision_end: int = 151653
    im_start: int = 151644
    im_end: int = 151645
    endoftext: int = 151643


def get_rope_index(
    input_ids: np.ndarray,  # (L,) one sequence
    image_grids: list[tuple[int, int, int]],
    spatial_merge_size: int,
    image_pad_id: int,
    video_pad_id: int | None = None,
    tokens_per_second: float = 2.0,
    seconds_per_grid: float | list[float] = 1.0,
) -> np.ndarray:
    """-> (3, L) position ids for one sequence (host-side, numpy).

    Video pads (`video_pad_id`) use the same grid walk with the temporal
    stream scaled by wall-clock: t index = frame_group * seconds_per_grid *
    tokens_per_second (Qwen2.5-VL's video M-RoPE; for images t=1 so the
    scale is moot). `seconds_per_grid` is shared (scalar) or per-VIDEO (list).
    NOTE two transformers conventions mirrored here so positions match a
    reward checkpoint trained through that stack (parity-pinned in
    tests/test_qwen_parity.py): (a) second_per_grid_t is cast to int64
    BEFORE scaling (fractional values truncate, e.g. 1.5 -> 1); (b) a
    `seconds_per_grid` list indexes per VIDEO (like second_per_grid_ts),
    not per visual — images don't consume an entry."""
    L = len(input_ids)
    pos = np.zeros((3, L), np.int64)
    img_iter = iter(image_grids)
    pad_ids = {image_pad_id} | ({video_pad_id} if video_pad_id is not None else set())
    spg = seconds_per_grid if isinstance(seconds_per_grid, (list, tuple)) else None
    n_videos = 0
    i = 0
    next_pos = 0
    while i < L:
        if input_ids[i] in pad_ids:
            t, h, w = next(img_iter)
            gh, gw = h // spatial_merge_size, w // spatial_merge_size
            n = t * gh * gw
            is_video = input_ids[i] == video_pad_id
            if is_video:
                scale = int(spg[n_videos] if spg else seconds_per_grid) * tokens_per_second
                n_videos += 1
            t_steps = (np.arange(t) * (scale if is_video else 1.0)).astype(np.int64)
            t_idx = np.repeat(t_steps, gh * gw)
            h_idx = np.tile(np.repeat(np.arange(gh), gw), t)
            w_idx = np.tile(np.arange(gw), t * gh)
            pos[0, i : i + n] = next_pos + t_idx
            pos[1, i : i + n] = next_pos + h_idx
            pos[2, i : i + n] = next_pos + w_idx
            next_pos = next_pos + max(int(t_idx.max()) + 1 if n else 1, gh, gw)
            i += n
        else:
            pos[:, i] = next_pos
            next_pos += 1
            i += 1
    return pos


class QwenVLModel:
    """Weights + configs for the combined model (verifier/reflector base)."""

    def __init__(self, lm_params, vision_params, lm_cfg: QwenLMConfig, vis_cfg: QwenVLVisionConfig,
                 tokens: QwenVLSpecialTokens = QwenVLSpecialTokens(), dtype=jnp.bfloat16):
        self.lm_params = lm_params
        self.vision_params = vision_params
        self.lm_cfg = lm_cfg
        self.vis_cfg = vis_cfg
        self.tokens = tokens
        self.dtype = dtype

    @classmethod
    def random_init(cls, key, lm_cfg=None, vis_cfg=None, dtype=jnp.float32, tokens=None):
        from .lm import qwen_lm_init
        from .vision import qwen_vision_init

        lm_cfg = lm_cfg or QwenLMConfig.tiny()
        vis_cfg = vis_cfg or QwenVLVisionConfig.tiny()
        k1, k2 = jax.random.split(key)
        return cls(
            qwen_lm_init(k1, lm_cfg, dtype),
            qwen_vision_init(k2, vis_cfg, dtype),
            lm_cfg,
            vis_cfg,
            tokens or QwenVLSpecialTokens(),
            dtype,
        )

    def embed_sequence(self, input_ids: np.ndarray, images: list[np.ndarray], precomputed=None):
        """One sequence: token embeds with image-pad positions replaced by
        vision embeds. Returns (embeds (1, L, H), position_ids (3, 1, L)).

        `precomputed`: optional (vision_embeds, grids) from a batched tower
        pass (`qwen_vision_batch_apply`) — callers with many same-grid
        images batch the tower instead of running it per sample."""
        if precomputed is not None:
            vision_embeds, grids = precomputed
        else:
            grids = []
            vision_embeds = []
            for img in images:
                img = np.asarray(img)
                if img.ndim == 4:  # (T, H, W, 3) video clip
                    from .video import video_to_patches

                    patches, grid = video_to_patches(img, self.vis_cfg)
                else:
                    patches, grid = image_to_patches(img, self.vis_cfg)
                emb = qwen_vision_apply(
                    self.vision_params, self.vis_cfg, jnp.asarray(patches, self.dtype), grid
                )
                grids.append(grid)
                vision_embeds.append(emb)
        ids = jnp.asarray(input_ids[None])
        embeds = jnp.asarray(self.lm_params["embed"])[ids]  # (1, L, H)
        if vision_embeds:
            vis = jnp.concatenate(vision_embeds, axis=0).astype(embeds.dtype)  # (n_img_tokens, H)
            is_pad = (input_ids == self.tokens.image_pad) | (input_ids == self.tokens.video_pad)
            assert int(is_pad.sum()) == vis.shape[0], (
                f"visual token count mismatch: {int(is_pad.sum())} pads vs {vis.shape[0]} embeds"
            )
            idx = np.nonzero(is_pad)[0]
            embeds = embeds.at[0, jnp.asarray(idx)].set(vis)
        pos = get_rope_index(
            input_ids, grids, self.vis_cfg.spatial_merge_size, self.tokens.image_pad,
            video_pad_id=self.tokens.video_pad,
        )
        return embeds, jnp.asarray(pos[:, None, :])

    def forward_hidden(self, input_ids: np.ndarray, images: list[np.ndarray]):
        embeds, pos = self.embed_sequence(input_ids, images)
        hidden, _ = qwen_lm_apply(self.lm_params, self.lm_cfg, embeds, pos, return_hidden=True)
        return hidden  # (1, L, H)

    def forward_logits(self, input_ids: np.ndarray, images: list[np.ndarray]):
        embeds, pos = self.embed_sequence(input_ids, images)
        logits, _ = qwen_lm_apply(self.lm_params, self.lm_cfg, embeds, pos)
        return logits
