"""Reward-model training data: GSB comparisons -> multimodal A/B batches.

Capability parity with `/root/reference/reward_modeling/data.py:30-237`
(`convert_GSB_csv_to_reward_data` + `QWen2VLDataCollator`): each row pairs
two images for one prompt with Good/Same/Bad labels (optionally MOS
scores); the collator builds per-side chat sequences with vision pads and
pads both sides to a common length.

Rows: {"image_A": path, "image_B": path, "prompt": str,
       "gsb": "G"|"S"|"B" or "chosen_label": int, "score_A"/"score_B": float}
"""

from __future__ import annotations

import numpy as np

from ..models.qwen_vl.model import QwenVLModel, QwenVLSpecialTokens, get_rope_index
from ..models.qwen_vl.vision import image_to_patches, smart_resize
from .losses import convert_gsb_labels


def vision_train_geometry(vis_cfg, max_pixels: int = 448 * 448) -> tuple[int, tuple[int, int, int]]:
    """-> (square side in px, grid_thw) for the fixed-resolution vision-
    training layout: one static grid per batch so raw patches stack into a
    (B, Lp, pd) jit input (static shapes; the reference's per-image
    smart_resize gives ragged grids, which on TPU would force a recompile
    per aspect ratio)."""
    import math

    factor = vis_cfg.patch_size * vis_cfg.spatial_merge_size
    side = max(factor, int(math.sqrt(max_pixels)) // factor * factor)
    g = side // vis_cfg.patch_size
    return side, (1, g, g)


def build_side_sequence(
    model: QwenVLModel,
    image: np.ndarray,
    prompt: str,
    tokenizer=None,
    max_pixels: int = 448 * 448,
    special_token_id: int | None = None,
    prompt_template: str = "Rate the quality of this image for the caption: {prompt}",
    fixed_square: bool = False,
):
    """-> dict(ids, resized_image) for one comparison side."""
    from PIL import Image

    vis_cfg = model.vis_cfg
    factor = vis_cfg.patch_size * vis_cfg.spatial_merge_size
    H, W = image.shape[:2]
    if fixed_square:
        nh = nw = vision_train_geometry(vis_cfg, max_pixels)[0]
    else:
        nh, nw = smart_resize(H, W, factor=factor, max_pixels=max_pixels)
    img = np.asarray(Image.fromarray(image).resize((nw, nh)))
    _, (t, gh, gw) = image_to_patches(img, vis_cfg)
    n_img = t * (gh // vis_cfg.spatial_merge_size) * (gw // vis_cfg.spatial_merge_size)
    tokens = QwenVLSpecialTokens()
    text = prompt_template.format(prompt=prompt)
    if tokenizer is not None:
        body = tokenizer.encode(text, add_special_tokens=False)
    else:
        from ..utils.tokenizers import HashTokenizer

        ht = HashTokenizer(vocab_size=model.lm_cfg.vocab_size, append_eos=False)
        body = [int(x) for x in ht([text], max_length=48)["input_ids"][0] if x != 0]
    ids = [tokens.vision_start] + [tokens.image_pad] * n_img + [tokens.vision_end] + body
    if special_token_id is not None:
        ids.append(special_token_id)
    return {"ids": np.asarray(ids, np.int64), "image": img}


def collate_rm_batch(
    model: QwenVLModel,
    rows: list[dict],
    tokenizer=None,
    max_pixels: int = 448 * 448,
    special_token_id: int | None = None,
    pad_token_id: int = 151643,
    train_vision: bool = False,
):
    """-> the jit-ready batch for `rm_train.train.make_rm_train_step`.

    Default: precomputes (token + vision) embeds per side with the frozen
    tower, pads to the max length across the batch; images must share
    resolution for a uniform vision grid (resize upstream or per-size
    bucketing).

    `train_vision`: the vision_lora layout — every image is resized to the
    ONE fixed square grid (`vision_train_geometry`), embeds carry token
    rows only (image rows are placeholders the in-step tower overwrites),
    and raw pixel patches ship as `patches_A/B` (B, Lp, pd)."""
    import jax.numpy as jnp

    from ..search.artifacts import load_image

    sides = {"A": [], "B": []}
    labels, scores_A, scores_B = [], [], []
    for row in rows:
        for side in ("A", "B"):
            img = row.get(f"image_{side}")
            if isinstance(img, str):
                img = load_image(img)
            sides[side].append(
                build_side_sequence(model, img, row["prompt"], tokenizer, max_pixels,
                                    special_token_id, fixed_square=train_vision)
            )
        if "chosen_label" in row:
            labels.append(int(row["chosen_label"]))
        else:
            labels.append(convert_gsb_labels(row.get("gsb", "S")))
        scores_A.append(float(row.get("score_A", 0.0)))
        scores_B.append(float(row.get("score_B", 0.0)))

    batch = {}
    for side in ("A", "B"):
        seqs = sides[side]
        L = max(len(s["ids"]) for s in seqs)
        B = len(seqs)
        ids = np.full((B, L), pad_token_id, np.int64)
        mask = np.zeros((B, L), np.int32)
        pos = np.zeros((3, B, L), np.int64)
        embeds = []
        patches = []
        for b, s in enumerate(seqs):
            n = len(s["ids"])
            ids[b, :n] = s["ids"]
            mask[b, :n] = 1
            if train_vision:
                pats, grid = image_to_patches(s["image"], model.vis_cfg)
                patches.append(pats)
                emb = jnp.asarray(model.lm_params["embed"])[jnp.asarray(s["ids"])][None]
                p = get_rope_index(
                    s["ids"], [grid], model.vis_cfg.spatial_merge_size,
                    model.tokens.image_pad, video_pad_id=model.tokens.video_pad,
                )[:, None, :]
            else:
                emb, p = model.embed_sequence(s["ids"], [s["image"]])
            pad = L - n
            emb = jnp.pad(emb, ((0, 0), (0, pad), (0, 0)))
            embeds.append(emb[0])
            pos[:, b, :n] = np.asarray(p)[:, 0, :]
        batch[f"embeds_{side}"] = jnp.stack(embeds)
        batch[f"ids_{side}"] = jnp.asarray(ids)
        batch[f"mask_{side}"] = jnp.asarray(mask)
        batch[f"pos_{side}"] = jnp.asarray(pos)
        if train_vision:
            batch[f"patches_{side}"] = jnp.asarray(np.stack(patches))
    batch["chosen_label"] = jnp.asarray(np.asarray(labels, np.int32)[:, None])
    batch["scores_A"] = jnp.asarray(np.asarray(scores_A, np.float32)[:, None])
    batch["scores_B"] = jnp.asarray(np.asarray(scores_B, np.float32)[:, None])
    return batch


def convert_gsb_csv(csv_path: str, image_root: str = "") -> list[dict]:
    """GSB csv -> rows (semantics of convert_GSB_csv_to_reward_data)."""
    import csv
    import os

    rows = []
    with open(csv_path) as f:
        for rec in csv.DictReader(f):
            rows.append(
                {
                    "image_A": os.path.join(image_root, rec.get("image_A", rec.get("img_A", ""))),
                    "image_B": os.path.join(image_root, rec.get("image_B", rec.get("img_B", ""))),
                    "prompt": rec.get("prompt", rec.get("caption", "")),
                    "gsb": rec.get("gsb", rec.get("label", "S")),
                    "score_A": float(rec.get("score_A", 0) or 0),
                    "score_B": float(rec.get("score_B", 0) or 0),
                }
            )
    return rows
