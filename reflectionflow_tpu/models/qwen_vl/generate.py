"""Reflection text generation with a KV cache — fully jitted decode.

Colocated replacement for the reference's HTTP-served reflection model
(`/root/reference/tts/tts_reflectionflow.py:24,228-237`), and the TPU
answer to its FlashAttention-2 decode
(`/root/reference/reward_modeling/train_reward.py:105`):

  * a round's candidates decode as ONE left-padded batch (the reference
    loops candidates over HTTP);
  * prefill is one jitted cache-filling forward; the token loop is a
    single `lax.while_loop` on device — greedy/temperature sampling,
    per-row EOS early-exit, ONE host sync at the end (the round-1 design
    paid a ~25 ms tunnel round-trip per token);
  * shapes bucket to multiples of 64 so recompiles stop after the first
    round of a given (batch, bucket) pair.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .lm import init_kv_cache, qwen_lm_apply
from .model import QwenVLModel, QwenVLSpecialTokens

_LEN_BUCKET = 64


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("cfg",))
def _prefill(params, cfg, embeds, pos, cache):
    return qwen_lm_apply(params, cfg, embeds, pos, kv_cache=cache)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_new_tokens", "eos_id", "temperature"),
    donate_argnums=(2,),
)
def _decode_tokens(
    params,
    cfg,
    cache,
    last_logits,  # (B, V)
    next_pos0,  # (B,) first decode position per row
    key,
    *,
    max_new_tokens: int,
    eos_id: int,
    temperature: float,
):
    """Device-side token loop -> (out_ids (B, max_new_tokens), lengths (B,)).

    Rows record tokens until their EOS; `lengths` counts recorded tokens
    (slots past a row's EOS hold 0 — trim by length, not by value)."""
    B = last_logits.shape[0]
    out0 = jnp.zeros((B, max_new_tokens), jnp.int32)
    done0 = jnp.zeros((B,), bool)
    len0 = jnp.zeros((B,), jnp.int32)

    def cond(st):
        step, _, _, _, done, _, _ = st
        return jnp.logical_and(step < max_new_tokens, jnp.logical_not(jnp.all(done)))

    def body(st):
        step, cache, logits, out, done, lengths, k = st
        if temperature > 0:
            k, sub = jax.random.split(k)
            tok = jax.random.categorical(sub, logits.astype(jnp.float32) / temperature, axis=-1)
        else:
            tok = jnp.argmax(logits, axis=-1)
        tok = tok.astype(jnp.int32)
        done_new = done | (tok == eos_id)
        out = out.at[:, step].set(jnp.where(done_new, 0, tok))
        lengths = lengths + jnp.where(done_new, 0, 1)
        emb = params["embed"][tok][:, None, :]
        pos = jnp.broadcast_to((next_pos0 + step)[None, :, None], (3, B, 1)).astype(jnp.int32)
        new_logits, cache = qwen_lm_apply(params, cfg, emb, pos, kv_cache=cache)
        return step + 1, cache, new_logits[:, -1], out, done_new, lengths, k

    _, _, _, out, _, lengths, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), cache, last_logits, out0, done0, len0, key)
    )
    return out, lengths


def _maybe_fold_adapter(model: QwenVLModel, model_dir: str) -> QwenVLModel:
    """Fold a finetuned adapter (`lora.safetensors` next to the checkpoint,
    `lora.save_lora_adapter` format) into the LM weights at load — the
    serving-time equivalent of the reference's LLaMA-Factory
    `finetuning_type: lora` Reflection-Generator deployment
    (/root/reference/tts/configs/our_reflectionmodel.yaml). Folding (not
    attaching) because serving never differentiates through the adapter."""
    import os

    adapter = os.path.join(model_dir, "lora.safetensors")
    if not os.path.exists(adapter):
        return model
    from ...lora.lora import fold_lora, load_lora_adapter

    lora = load_lora_adapter(adapter)
    lora = dict(lora, adapters={
        p: {k: jnp.asarray(v) for k, v in ab.items()} for p, ab in lora["adapters"].items()
    })
    model.lm_params = fold_lora(model.lm_params, lora)
    return model


@dataclass
class QwenVLGenerator:
    model: QwenVLModel
    tokenizer: object | None = None  # HF tokenizer when model files exist
    eos_token_id: int = 151645  # <|im_end|>
    max_len: int = 2048

    @classmethod
    def from_pretrained(cls, model_path: str | None, quantize: str | None = None,
                        quantize_min_size: int = 1 << 18, device_index: int | None = None, **kw):
        if model_path is None:
            raise ValueError("local_qwen reflector needs a model path (or pass a QwenVLModel directly)")
        from ...utils.device import on_device, pin, quantize_blocks
        from ...utils.hf_loader import load_qwen_vl

        # device_index: build + quantize + pin on a secondary chip
        # (utils.device) — the reflection model is its own 7B checkpoint
        # and gets its own chip, the analogue of the reference's separate
        # reflection GPU (tts_reflectionflow.py:24)
        with on_device(device_index) as dev:
            model, tokenizer = load_qwen_vl(model_path)
            model = _maybe_fold_adapter(model, model_path)
            if quantize == "int8":
                model.lm_params = quantize_blocks(model.lm_params, quantize_min_size)
                model.vision_params = quantize_blocks(model.vision_params, quantize_min_size)
            model.lm_params, model.vision_params = pin(
                dev, model.lm_params, model.vision_params
            )
        return cls(model=model, tokenizer=tokenizer, **kw)

    # -- batched core --------------------------------------------------------

    def decode_batch(
        self,
        sequences: list[tuple[np.ndarray, list[np.ndarray]]],  # [(input_ids, images)]
        max_new_tokens: int = 128,
        temperature: float = 0.0,
        key: jax.Array | None = None,
    ) -> list[list[int]]:
        """Left-pad the sequences into one batch, prefill once, decode the
        whole batch in one device loop. Ragged lengths are fine; vision
        grids may differ per row (towers run per sample)."""
        model = self.model
        B = len(sequences)
        # batch the vision towers across same-grid single-image rows (a
        # reflection round's candidates share a resolution)
        from .vision import image_to_patches, qwen_vision_batch_apply

        precomp: list = [None] * B
        by_grid: dict = {}
        for b, (_ids, imgs) in enumerate(sequences):
            if len(imgs) == 1:
                patches, grid = image_to_patches(imgs[0], model.vis_cfg)
                by_grid.setdefault(grid, []).append((b, patches))
        for grid, items in by_grid.items():
            if len(items) < 2:
                continue  # nothing to batch
            stack = jnp.asarray(np.stack([p for _, p in items]), model.dtype)
            embs = qwen_vision_batch_apply(model.vision_params, model.vis_cfg, stack, grid)
            for (b, _), e in zip(items, embs):
                precomp[b] = ([e], [grid])
        rows = [
            model.embed_sequence(ids, imgs, precomputed=precomp[b])
            for b, (ids, imgs) in enumerate(sequences)
        ]
        lens = [int(e.shape[1]) for e, _ in rows]
        Lmax = _round_up(max(lens), _LEN_BUCKET)
        # embeddings stay ON DEVICE: left-pad each row with jnp.pad and stack
        # (fetching B x Lmax x H to host would add B tunnel round-trips and
        # hundreds of MB of host traffic before the "single host sync")
        padded = [
            jnp.pad(emb[0].astype(model.dtype), ((Lmax - n, 0), (0, 0)))
            for (emb, _), n in zip(rows, lens)
        ]
        embeds_dev = jnp.stack(padded)
        # position ids are tiny (3 x B x Lmax ints) — built host-side
        pos = np.zeros((3, B, Lmax), np.int64)
        pads = np.zeros((B,), np.int32)
        next_pos0 = np.zeros((B,), np.int32)
        for b, (_, p) in enumerate(rows):
            n = lens[b]
            p_host = np.asarray(p)
            pads[b] = Lmax - n
            pos[:, b, Lmax - n :] = p_host[:, 0, :]
            next_pos0[b] = int(np.max(p_host)) + 1

        cache = init_kv_cache(model.lm_cfg, B, Lmax + max_new_tokens, dtype=model.dtype)
        cache["pad"] = jnp.asarray(pads)
        logits, cache = _prefill(
            model.lm_params, model.lm_cfg, embeds_dev, jnp.asarray(pos), cache,
        )
        out, lengths = _decode_tokens(
            model.lm_params, model.lm_cfg, cache, logits[:, -1],
            jnp.asarray(next_pos0), key if key is not None else jax.random.PRNGKey(0),
            max_new_tokens=max_new_tokens, eos_id=self.eos_token_id,
            temperature=float(temperature),
        )
        out = np.asarray(out)  # the single host sync
        lengths = np.asarray(lengths)
        return [out[b, : lengths[b]].tolist() for b in range(B)]

    def decode_ids(
        self,
        input_ids: np.ndarray,
        images: list[np.ndarray],
        max_new_tokens: int = 128,
        temperature: float = 0.0,
        key: jax.Array | None = None,
    ) -> list[int]:
        """Greedy (or sampled) continuation of one multimodal sequence."""
        return self.decode_batch(
            [(input_ids, images)], max_new_tokens=max_new_tokens, temperature=temperature, key=key
        )[0]

    def generate(self, images: list[np.ndarray], prompts: list[str], max_new_tokens: int = 128,
                 max_pixels: int = 448 * 448, system: str | None = None) -> list[str]:
        """Batched multimodal generation: ONE prefill + decode for the whole
        candidate set of a reflection round."""
        assert self.tokenizer is not None, "text generation requires a tokenizer"
        from PIL import Image

        from .vision import smart_resize

        vis_cfg = self.model.vis_cfg
        factor = vis_cfg.patch_size * vis_cfg.spatial_merge_size
        seqs = []
        for img, prompt in zip(images, prompts):
            img = np.asarray(img)
            nh, nw = smart_resize(img.shape[0], img.shape[1], factor=factor, max_pixels=max_pixels)
            img = np.asarray(Image.fromarray(img).resize((nw, nh)))
            seqs.append((self._build_chat_ids(img, prompt, system=system), [img]))
        outs = self.decode_batch(seqs, max_new_tokens=max_new_tokens)
        return [self.tokenizer.decode(ids, skip_special_tokens=True).strip() for ids in outs]

    def _build_chat_ids(self, image: np.ndarray, prompt: str, system: str | None = None) -> np.ndarray:
        from .vision import image_to_patches

        tok = self.tokenizer
        tokens = QwenVLSpecialTokens()
        _, (t, gh, gw) = image_to_patches(image, self.model.vis_cfg)
        n_img = t * (gh // self.model.vis_cfg.spatial_merge_size) * (gw // self.model.vis_cfg.spatial_merge_size)
        sys_ids = (
            tok.encode(f"<|im_start|>system\n{system}<|im_end|>\n", add_special_tokens=False)
            if system else []
        )
        prefix = tok.encode("<|im_start|>user\n", add_special_tokens=False)
        suffix = tok.encode(f"{prompt}<|im_end|>\n<|im_start|>assistant\n", add_special_tokens=False)
        ids = (
            sys_ids
            + prefix
            + [tokens.vision_start]
            + [tokens.image_pad] * n_img
            + [tokens.vision_end]
            + suffix
        )
        return np.asarray(ids, np.int64)
