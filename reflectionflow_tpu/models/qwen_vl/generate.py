"""Reflection text generation with a KV cache.

Colocated replacement for the reference's HTTP-served reflection model
(`/root/reference/tts/tts_reflectionflow.py:24,228-237`): prefill the
multimodal prompt once, then greedy/temperature decode with a
static-shape KV cache.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .lm import init_kv_cache, qwen_lm_apply
from .model import QwenVLModel, QwenVLSpecialTokens


@dataclass
class QwenVLGenerator:
    model: QwenVLModel
    tokenizer: object | None = None  # HF tokenizer when model files exist
    eos_token_id: int = 151645  # <|im_end|>
    max_len: int = 2048

    @classmethod
    def from_pretrained(cls, model_path: str | None, **kw):
        if model_path is None:
            raise ValueError("local_qwen reflector needs a model path (or pass a QwenVLModel directly)")
        from ...utils.hf_loader import load_qwen_vl

        model, tokenizer = load_qwen_vl(model_path)
        return cls(model=model, tokenizer=tokenizer, **kw)

    def decode_ids(
        self,
        input_ids: np.ndarray,
        images: list[np.ndarray],
        max_new_tokens: int = 128,
        temperature: float = 0.0,
        key: jax.Array | None = None,
    ) -> list[int]:
        """Greedy (or sampled) continuation of one multimodal sequence."""
        model = self.model
        embeds, pos = model.embed_sequence(input_ids, images)
        L = embeds.shape[1]
        cache = init_kv_cache(model.lm_cfg, 1, L + max_new_tokens, dtype=embeds.dtype)
        logits, cache = qwen_lm_apply(model.lm_params, model.lm_cfg, embeds, pos, kv_cache=cache)
        next_pos_start = int(np.max(np.asarray(pos))) + 1
        out_ids: list[int] = []
        last_logits = logits[:, -1]
        k = key if key is not None else jax.random.PRNGKey(0)
        for step in range(max_new_tokens):
            if temperature > 0:
                k, sub = jax.random.split(k)
                tok = int(jax.random.categorical(sub, last_logits / temperature, axis=-1)[0])
            else:
                tok = int(jnp.argmax(last_logits, axis=-1)[0])
            if tok == self.eos_token_id:
                break
            out_ids.append(tok)
            p = next_pos_start + step
            pos_step = jnp.full((3, 1, 1), p, jnp.int32)
            emb = model.lm_params["embed"][jnp.asarray([[tok]])]
            logits, cache = qwen_lm_apply(model.lm_params, model.lm_cfg, emb, pos_step, kv_cache=cache)
            last_logits = logits[:, -1]
        return out_ids

    def generate(self, images: list[np.ndarray], prompts: list[str], max_new_tokens: int = 128,
                 max_pixels: int = 448 * 448) -> list[str]:
        assert self.tokenizer is not None, "text generation requires a tokenizer"
        from PIL import Image

        from .vision import smart_resize

        vis_cfg = self.model.vis_cfg
        factor = vis_cfg.patch_size * vis_cfg.spatial_merge_size
        outs = []
        for img, prompt in zip(images, prompts):
            img = np.asarray(img)
            nh, nw = smart_resize(img.shape[0], img.shape[1], factor=factor, max_pixels=max_pixels)
            img = np.asarray(Image.fromarray(img).resize((nw, nh)))
            ids = self._build_chat_ids(img, prompt)
            out_ids = self.decode_ids(ids, [img], max_new_tokens=max_new_tokens)
            outs.append(self.tokenizer.decode(out_ids, skip_special_tokens=True).strip())
        return outs

    def _build_chat_ids(self, image: np.ndarray, prompt: str) -> np.ndarray:
        from .vision import image_to_patches

        tok = self.tokenizer
        tokens = QwenVLSpecialTokens()
        _, (t, gh, gw) = image_to_patches(image, self.model.vis_cfg)
        n_img = t * (gh // self.model.vis_cfg.spatial_merge_size) * (gw // self.model.vis_cfg.spatial_merge_size)
        prefix = tok.encode("<|im_start|>user\n", add_special_tokens=False)
        suffix = tok.encode(f"{prompt}<|im_end|>\n<|im_start|>assistant\n", add_special_tokens=False)
        ids = (
            prefix
            + [tokens.vision_start]
            + [tokens.image_pad] * n_img
            + [tokens.vision_end]
            + suffix
        )
        return np.asarray(ids, np.int64)
