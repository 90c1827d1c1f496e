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
