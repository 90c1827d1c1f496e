"""Reflection generators.

Capability parity with the reference's two reflection backends
(`/root/reference/tts/tts_reflectionflow.py:196-239`): GPT-4o via the
OpenAI API, or a finetuned Qwen2.5-VL served over HTTP. Here:

  * `openai` — any OpenAI-compatible endpoint (incl. a local server);
  * `local_qwen` — the colocated JAX Qwen2.5-VL generation graph
    (`models.qwen_vl`) — no HTTP round-trip;
  * `fake` — deterministic strings for hermetic tests.

All backends preserve input order and never drop entries (failures return
empty-string reflections + a warning, not a shorter list).
"""

from __future__ import annotations

import abc
import hashlib
from typing import Sequence

import numpy as np


class Reflector(abc.ABC):
    @abc.abstractmethod
    def generate(
        self,
        images: Sequence[np.ndarray],
        original_prompts: Sequence[str],
        current_prompts: Sequence[str],
        prev_reflections: Sequence[str] | None = None,
        evaluations: Sequence[str] | None = None,
        max_new_tokens: int | None = None,
    ) -> list[str]:
        ...


class FakeReflector(Reflector):
    def generate(self, images, original_prompts, current_prompts, prev_reflections=None, evaluations=None, max_new_tokens=None):
        out = []
        for img, prompt in zip(images, original_prompts):
            h = hashlib.sha1(np.ascontiguousarray(img).tobytes() + prompt.encode()).hexdigest()[:8]
            out.append(f"The image misses details of '{prompt}'; emphasize them next round (ref {h}).")
        return out


class OpenAIReflector(Reflector):
    def __init__(self, **kw):
        from ..verifiers.openai_backend import OpenAICompatVerifier

        self.backend = OpenAICompatVerifier(**kw)

    def generate(self, images, original_prompts, current_prompts, prev_reflections=None, evaluations=None, max_new_tokens=None):
        return self.backend.generate_reflections(
            images, original_prompts, current_prompts, prev_reflections, evaluations, max_new_tokens
        )


# Default user-message template — the reference's local-reflection message
# shape (`/root/reference/tts/tts_reflectionflow.py:27-41`): one image + a
# text that names the prompt. A finetuned Reflection-Generator checkpoint
# has a training-time input format; pass `template`/`system` (config:
# reflection_args.template / system_prompt) to match it. Available fields:
# {original_prompt} {current_prompt} {prev_reflection} {evaluation}.
DEFAULT_TEMPLATE = (
    'Generate reflections to improve the input image according to the prompt. '
    'The prompt is: "{original_prompt}"'
)
DEFAULT_SYSTEM = "You are a helpful assistant."


class LocalQwenReflector(Reflector):
    """Colocated JAX Qwen2.5-VL reflection generator (replaces the
    llamafactory HTTP server at `tts_reflectionflow.py:24,231`).

    The message template is configurable so a finetuned checkpoint's
    training-time format can be reproduced; every input the search loop
    supplies (current prompt, previous reflection, verifier evaluation) is
    exposed as a template field instead of being dropped."""

    def __init__(self, model, max_new_tokens: int = 256, template: str | None = None,
                 system: str | None = None):
        self.model = model  # models.qwen_vl.QwenVLGenerator
        self.max_new_tokens = max_new_tokens
        self.template = template or DEFAULT_TEMPLATE
        self.system = DEFAULT_SYSTEM if system is None else system
        # fail at construction, not mid-round: unknown {fields} raise here
        self.template.format(**self._fields("p", "p", "", ""))

    @staticmethod
    def _fields(orig, cur, refl, ev):
        return {
            "original_prompt": orig,
            "current_prompt": cur,
            "prev_reflection": refl or "",
            "evaluation": ev or "",
        }

    def generate(self, images, original_prompts, current_prompts, prev_reflections=None, evaluations=None, max_new_tokens=None):
        n = len(original_prompts)
        prev_reflections = prev_reflections or [""] * n
        evaluations = evaluations or [""] * n
        # never drop entries silently (the module contract): a short input
        # list would zip-truncate the batch
        for name, seq in (("images", images), ("current_prompts", current_prompts),
                          ("prev_reflections", prev_reflections), ("evaluations", evaluations)):
            if len(seq) != n:
                raise ValueError(f"{name} has {len(seq)} entries, expected {n}")
        prompts = [
            self.template.format(**self._fields(orig, cur, refl, ev))
            for orig, cur, refl, ev in zip(
                original_prompts, current_prompts, prev_reflections, evaluations
            )
        ]
        return self.model.generate(
            images=list(images), prompts=prompts,
            max_new_tokens=max_new_tokens or self.max_new_tokens,
            system=self.system or None,
        )


def load_reflector(backend: str, **kw) -> Reflector:
    if backend == "fake":
        return FakeReflector()
    if backend == "openai":
        return OpenAIReflector(**kw)
    if backend == "local_qwen":
        return LocalQwenReflector(**kw)
    raise ValueError(f"unknown reflector backend: {backend}")
