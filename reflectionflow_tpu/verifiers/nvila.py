"""NVILA yes/no verifier wrapper.

Capability parity with `/root/reference/tts/verifiers/nvila_verifier.py:4-10`
+ the scoring convention at `tts_reflectionflow.py:157-170`: the model
answers yes/no to "does this image match the prompt", and ranking uses
(yes first, then yes-logit desc / no-logit asc).

NVILA ships as torch `trust_remote_code` weights with no JAX port; this
wrapper runs it via transformers when the local snapshot exists. The
hermetic equivalent for tests is `FakeNvilaVerifier`.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from .base import Verifier


class NvilaVerifier(Verifier):
    name = "nvila"
    output_kind = "yes_no"

    def __init__(self, model_name: str = "Efficient-Large-Model/NVILA-Lite-2B-Verifier",
                 cache_dir: str | None = None, **_):
        from transformers import AutoModel, AutoTokenizer

        self.model = AutoModel.from_pretrained(
            model_name, trust_remote_code=True, cache_dir=cache_dir, local_files_only=True,
            device_map="cpu",
        )
        tok = AutoTokenizer.from_pretrained(model_name, trust_remote_code=True, local_files_only=True)
        self.yes_id = tok.convert_tokens_to_ids("yes")
        self.no_id = tok.convert_tokens_to_ids("no")

    def score(self, images: Sequence[np.ndarray], prompts: Sequence[str], tag=None, max_new_tokens=None):
        from PIL import Image

        outputs = []
        for img, prompt in zip(images, prompts):
            r, scores = self.model.generate_content([Image.fromarray(np.asarray(img)), prompt])
            if r == "yes":
                outputs.append({"label": "yes", "score": float(scores[0][0, self.yes_id])})
            else:
                outputs.append({"label": "no", "score": float(scores[0][0, self.no_id])})
        return outputs


class NvilaJaxVerifier(Verifier):
    """TPU-native NVILA yes/no verifier (`models/nvila`): SigLIP tower +
    projector + Qwen2 LM in one jitted graph, candidates scored as ONE
    batch (the reference loops images serially through torch
    `generate_content`, `tts_reflectionflow.py:158-165`).

    Output contract matches `NvilaVerifier`: per-image
    `{"label": "yes"|"no", "score": <that label's logit>}`, consumed by the
    (yes-first, then logit) ranking rule in `base.py`. The label is the
    greedy first generated token — exactly what the reference's decoded
    `r1 == "yes"` check sees; a first token that is neither falls back to
    comparing the yes/no logits directly."""

    name = "nvila_jax"
    output_kind = "yes_no"

    def __init__(self, model=None, model_path: str | None = None, quantize: str | None = None,
                 quantize_min_size: int = 1 << 18, device_index: int | None = None,
                 tokenizer=None, **_):
        if model is None:
            from ..utils.device import on_device, pin, quantize_blocks
            from ..utils.hf_loader import load_nvila

            if model_path is None:
                raise ValueError("nvila_jax needs model_path (a VILA bundle dir) or a NvilaModel")
            # build + quantize + pin on the target chip (utils.device: an
            # int8 2B NVILA is ~2.4 GB and CAN co-reside with the 11.9 GB
            # W8A8 DiT on one 16 GB chip, so device_index is optional)
            with on_device(device_index) as dev:
                model = load_nvila(model_path)
                if quantize == "int8":
                    model.lm_params = quantize_blocks(model.lm_params, quantize_min_size)
                    model.vis_params = quantize_blocks(model.vis_params, quantize_min_size)
                model.lm_params, model.vis_params, model.proj_params = pin(
                    dev, model.lm_params, model.vis_params, model.proj_params
                )
        self.model = model
        if tokenizer is not None:
            model.tokenizer = tokenizer
        tok = model.tokenizer
        assert tok is not None, "nvila_jax needs the bundle's llm/ tokenizer"
        self.yes_id = tok.encode("yes", add_special_tokens=False)[0]
        self.no_id = tok.encode("no", add_special_tokens=False)[0]

    def score(self, images: Sequence[np.ndarray], prompts: Sequence[str], tag=None, max_new_tokens=None):
        logits = self.model.first_token_logits(images, prompts)  # (B, vocab)
        first = np.argmax(logits, axis=-1)
        outputs = []
        for i in range(len(images)):
            yes = first[i] == self.yes_id or (
                first[i] != self.no_id and logits[i, self.yes_id] >= logits[i, self.no_id]
            )
            label = "yes" if yes else "no"
            outputs.append({"label": label, "score": float(logits[i, self.yes_id if yes else self.no_id])})
        return outputs
