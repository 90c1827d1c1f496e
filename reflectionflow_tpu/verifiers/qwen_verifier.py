"""Colocated JAX Qwen2.5-VL Image-Verifier.

The public verifier API of the reference's reward model
(`ImageVLMRewardInference.reward`, `/root/reference/reward_modeling/
test_reward.py:142-155` as advertised in its README): images + prompts ->
z-normalized 'VQ' scalar scores. Runs on the same accelerator as the
generator — no HTTP round-trips.

Checkpoint reconstruction mirrors the reference contract: the training
run's `model_config.json` (pooling mode, special token, score stats) sits
next to the adapter/`rm_head` weights.
"""

from __future__ import annotations

import json
import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.qwen_vl.model import QwenVLModel, QwenVLSpecialTokens
from ..models.qwen_vl.reward import QwenRewardModel, RewardHead
from ..models.qwen_vl.vision import image_to_patches, smart_resize
from .base import Verifier

import functools


@functools.partial(jax.jit, static_argnames=("cfg", "pooling", "special_token_id"))
def _rm_scores_jit(lm_params, cfg, head_w, embeds, pos, ids, pooling, special_token_id):
    """LM forward + pooling + rm_head as ONE stable jitted graph — the 7B
    verifier forward used to dispatch op-by-op over the device tunnel."""
    from ..models.qwen_vl.lm import qwen_lm_apply
    from ..models.qwen_vl.reward import pool_hidden

    hidden, _ = qwen_lm_apply(lm_params, cfg, embeds, pos, return_hidden=True)
    mask = jnp.ones(ids.shape, jnp.int32)
    pooled = pool_hidden(hidden, mask, pooling, input_ids=ids, special_token_id=special_token_id)
    return pooled @ head_w.astype(pooled.dtype)

DEFAULT_TEMPLATE = (
    "You are presented with a generated image and its associated text caption. "
    "Your task is to analyze the image across multiple dimensions in relation to the caption. "
    "Rate the overall quality of the image.\nCaption: {prompt}"
)


class QwenRewardVerifier(Verifier):
    name = "qwen_rm"

    def __init__(
        self,
        model_path: str | None = None,
        model: QwenVLModel | None = None,
        tokenizer=None,
        head: RewardHead | None = None,
        max_pixels: int = 448 * 448,
        use_norm: bool = True,
        quantize: str | None = None,
        quantize_min_size: int = 1 << 18,
        device_index: int | None = None,
        **_,
    ):
        from ..utils.device import on_device, pin, quantize_blocks

        # second-chip deployment: the 9.3 GB verifier does not co-reside
        # with the 11.9 GB DiT on one 16 GB chip (docs/DEPLOYMENT.md) —
        # utils.device runs the whole construction (LoRA fold, quantize,
        # pin) on the target chip; jitted calls then follow their
        # operands' placement, so scoring runs there too.
        with on_device(device_index) as dev:
            if model is None:
                from ..utils.hf_loader import load_qwen_vl

                model, tokenizer = load_qwen_vl(model_path)
            if head is None and model_path is not None:
                head = self._load_head(model_path, model.lm_cfg.hidden_size)
            assert head is not None, "QwenRewardVerifier needs a RewardHead"
            if model_path is not None:
                model = self._apply_rm_adapter(model, model_path, head)
            if quantize == "int8":
                # int8 on a 16 GB chip: W8A8 LM blocks (after the LoRA
                # fold so deltas are captured), int8 vision blocks
                model.lm_params = quantize_blocks(model.lm_params, quantize_min_size)
                model.vision_params = quantize_blocks(model.vision_params, quantize_min_size)
            model.lm_params, model.vision_params, head.w = pin(
                dev, model.lm_params, model.vision_params, head.w
            )
        self.rm = QwenRewardModel(model, head)
        self.tokenizer = tokenizer
        self.max_pixels = max_pixels
        self.use_norm = use_norm

    @staticmethod
    def _load_head(model_path: str, hidden: int) -> RewardHead:
        """Read rm_head + pooling config saved by rm_train (or the reference's
        model_config.json + final_model layout)."""
        cfg_path = os.path.join(model_path, "model_config.json")
        cfg = {}
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                cfg = json.load(f)
        head_path = os.path.join(model_path, "rm_head.safetensors")
        if not os.path.exists(head_path):
            raise FileNotFoundError(
                f"{head_path} missing — an all-zero reward head would silently "
                "rank candidates arbitrarily; point model_path at a checkpoint "
                "written by rm_train.save_rm_checkpoint"
            )
        from safetensors.numpy import load_file

        w = jnp.asarray(load_file(head_path)["rm_head.weight"].T)
        return RewardHead(
            w=w,
            pooling=cfg.get("logits_processing", cfg.get("pooling", "last")),
            special_token_id=cfg.get("special_token_id"),
            vq_mean=cfg.get("VQ_mean", 0.0),
            vq_std=cfg.get("VQ_std", 1.0),
        )

    @staticmethod
    def _apply_rm_adapter(model: QwenVLModel, model_path: str, head) -> QwenVLModel:
        """Fold the trained LoRA into the LM and install the trained
        `<|VQ_reward|>` embedding row — the inference-time reconstruction of
        the reference's adapter + `non_lora_state_dict` merge
        (`/root/reference/reward_modeling/utils.py:168-205`)."""
        lora_path = os.path.join(model_path, "rm_lora.safetensors")
        if not os.path.exists(lora_path):
            return model
        from ..lora.lora import fold_lora
        from ..rm_train.train import load_rm_checkpoint

        trainable, cfg = load_rm_checkpoint(model_path)
        if trainable["lora"]:
            model.lm_params = fold_lora(
                model.lm_params,
                {"_alpha": cfg.get("lora_alpha", 16.0), "_r": cfg.get("lora_r", 16),
                 "adapters": {p: {k: jnp.asarray(v) for k, v in ab.items()}
                              for p, ab in trainable["lora"].items()}},
            )
        special_id = head.special_token_id
        if "special" in trainable and special_id is not None:
            embed = jnp.asarray(model.lm_params["embed"])
            model.lm_params["embed"] = embed.at[special_id].set(
                jnp.asarray(trainable["special"], embed.dtype)
            )
        return model

    # ------------------------------------------------------------------

    def _prepare_ids(
        self, image: np.ndarray, prompt: str
    ) -> tuple[np.ndarray, np.ndarray, tuple[int, int, int]]:
        """smart_resize the image (or sample+resize a (T, H, W, 3) clip),
        build the chat sequence with image/video pads. Returns
        (ids, prepared pixels, patches, grid) — patchified ONCE here;
        `raw_scores` reuses the patches for grouping and the tower."""
        from PIL import Image

        vis_cfg = self.rm.model.vis_cfg
        merge = vis_cfg.spatial_merge_size
        factor = vis_cfg.patch_size * merge
        tokens = QwenVLSpecialTokens()
        if image.ndim == 4:  # video clip -> video pads + video_score prompt
            from ..models.qwen_vl.video import fetch_video, video_to_patches
            from ..rm_train.prompt_template import build_prompt

            img = fetch_video(image, image_factor=factor, max_pixels=self.max_pixels)
            patches, grid = video_to_patches(img, vis_cfg)
            pad_id = tokens.video_pad
            text = build_prompt(prompt, template_type="video_score")
        else:
            H, W = image.shape[:2]
            nh, nw = smart_resize(H, W, factor=factor, max_pixels=self.max_pixels)
            img = np.asarray(Image.fromarray(image).resize((nw, nh)))
            patches, grid = image_to_patches(img, vis_cfg)
            pad_id = tokens.image_pad
            text = DEFAULT_TEMPLATE.format(prompt=prompt)
        gt, gh, gw = grid
        n_vis = gt * (gh // merge) * (gw // merge)
        return self._assemble_ids(text, n_vis, pad_id, tokens), patches, grid

    def _assemble_ids(self, text: str, n_vis: int, pad_id: int, tokens) -> np.ndarray:
        # full Qwen chat template incl. system message and the generation
        # prompt — 'last'-token pooling must land on the position the
        # reward checkpoint was trained with (apply_chat_template(...,
        # add_generation_prompt=True) semantics)
        if self.tokenizer is not None:
            prefix = self.tokenizer.encode(
                "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n<|im_start|>user\n",
                add_special_tokens=False,
            )
            body = self.tokenizer.encode(
                text + "<|im_end|>\n<|im_start|>assistant\n", add_special_tokens=False
            )
        else:  # hermetic fallback: hashed token ids + structural markers
            from ..utils.tokenizers import HashTokenizer

            ht = HashTokenizer(vocab_size=self.rm.model.lm_cfg.vocab_size, append_eos=False)
            prefix = [tokens.im_start]
            body = [int(x) for x in ht([text], max_length=64)["input_ids"][0] if x != 0]
            body += [tokens.im_end, tokens.im_start]
        ids = np.asarray(
            prefix + [tokens.vision_start] + [pad_id] * n_vis + [tokens.vision_end] + body,
            np.int64,
        )
        if self.rm.head.pooling == "special" and self.rm.head.special_token_id is not None:
            ids = np.concatenate([ids, [self.rm.head.special_token_id]])
        return ids

    def raw_scores(self, images: Sequence[np.ndarray], prompts: Sequence[str]) -> list[float]:
        """Candidates in a search round share a resolution, so their chat
        sequences are uniform: group by sequence length, run the vision
        tower vmapped over the group and the LM as ONE batched forward."""
        import jax
        import jax.numpy as jnp

        from ..models.qwen_vl.model import get_rope_index
        from ..models.qwen_vl.vision import qwen_vision_batch_apply

        prepared = [self._prepare_ids(np.asarray(img), p) for img, p in zip(images, prompts)]
        # group key includes the vision GRID, not just sequence length —
        # equal-length sequences can carry different (h, w) patch grids
        groups: dict[tuple, list[int]] = {}
        for i, (ids, _patches, grid) in enumerate(prepared):
            groups.setdefault((len(ids), grid), []).append(i)
        out = [0.0] * len(prepared)
        model = self.rm.model
        vis_cfg = model.vis_cfg
        for (_, grid), idxs in groups.items():
            B = len(idxs)
            patches = jnp.asarray(
                np.stack([prepared[i][1] for i in idxs]), model.dtype
            )  # (B, L, pd)
            # stable jit (vision tower vmapped over the group) — retraces only
            # on a new grid, not per call
            vis_batch = qwen_vision_batch_apply(model.vision_params, vis_cfg, patches, grid)

            id_rows = np.stack([prepared[i][0] for i in idxs])  # (B, L)
            embeds = jnp.asarray(model.lm_params["embed"])[jnp.asarray(id_rows)]
            is_pad = (id_rows == model.tokens.image_pad) | (id_rows == model.tokens.video_pad)
            pad_pos = np.nonzero(is_pad[0])[0]  # identical across the group
            embeds = embeds.at[:, jnp.asarray(pad_pos)].set(vis_batch.astype(embeds.dtype))
            pos0 = get_rope_index(
                id_rows[0], [grid], vis_cfg.spatial_merge_size, model.tokens.image_pad,
                video_pad_id=model.tokens.video_pad,
            )
            batch_pos = jnp.asarray(np.broadcast_to(pos0[:, None, :], (3, B, pos0.shape[1])))
            raw = _rm_scores_jit(
                model.lm_params, model.lm_cfg, jnp.asarray(self.rm.head.w),
                embeds, batch_pos, jnp.asarray(id_rows),
                self.rm.head.pooling, self.rm.head.special_token_id,
            )
            raw = np.asarray(raw)  # one host sync per group
            for j, i in enumerate(idxs):
                out[i] = float(raw[j, 0])
        return out

    def reward(self, images, prompts, use_norm: bool | None = None) -> list[dict]:
        """Reference-compatible API: -> [{'VQ': score}] (test_reward.py:142)."""
        use_norm = self.use_norm if use_norm is None else use_norm
        raws = self.raw_scores(images, prompts)
        return [{"VQ": self.rm.normalized(r) if use_norm else r} for r in raws]

    def score(self, images, prompts, tag=None, max_new_tokens=None):
        """Verifier interface: overall_score = z-normed VQ."""
        rewards = self.reward(images, prompts)
        return [
            {"overall_score": {"score": r["VQ"], "explanation": "qwen_rm VQ"}, "VQ": r["VQ"]}
            for r in rewards
        ]
