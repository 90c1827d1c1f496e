"""Filesystem artifact contract.

The directory/JSONL layout IS the inter-stage protocol (SURVEY.md §1):
stage-2 reflection consumes stage-1 sample dirs, and GenEval tooling reads
the outputs. Layout per prompt index:

    {output_root}/{index:05d}/
        metadata.jsonl
        samples/                  {round}_round@{seed}.png   (stage 1)
        midimg/                   {round}_round@{seed}.png   (reflection rounds)
        samples_lastround/        {i:05d}.png
        samples_path_bestround/   {i:05d}.png  (best per chain)
        samples_best/             {i:05d}.png  (global best)
        best_img_detailedscore.jsonl
        best_img_meta.jsonl
        search_state.json         (resume manifest — ours)

Names match `/root/reference/tts/tts_reflectionflow.py:560-579` and
`tts_t2i_noise_scaling.py:48`.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np


def round_image_name(round_idx: int, seed: int) -> str:
    return f"{round_idx}_round@{seed}.png"


def save_image(path: str, image: np.ndarray) -> None:
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(image).save(path)


def load_image(path: str) -> np.ndarray:
    """Image file -> (H, W, 3); decoded video (.npy/.npz/frame dir) ->
    (T, H, W, 3) — the score CLI then routes clips through the verifier's
    video path (reference scores videos via the same dataset JSON,
    /root/reference/reward_modeling/inference.py)."""
    import os

    if os.path.isdir(path) or path.endswith((".npy", ".npz")):
        from ..models.qwen_vl.video import _read_decoded

        return _read_decoded(path)
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))


@dataclass
class PromptDirs:
    root: str

    @classmethod
    def create(cls, output_root: str, prompt_index: int, stage2: bool = False) -> "PromptDirs":
        root = os.path.join(output_root, f"{prompt_index:05d}")
        d = cls(root)
        os.makedirs(d.samples, exist_ok=True)
        if stage2:
            for sub in (d.midimg, d.samples_lastround, d.samples_bestround, d.samples_best):
                os.makedirs(sub, exist_ok=True)
        return d

    @property
    def samples(self):
        return os.path.join(self.root, "samples")

    @property
    def midimg(self):
        return os.path.join(self.root, "midimg")

    @property
    def samples_lastround(self):
        return os.path.join(self.root, "samples_lastround")

    @property
    def samples_bestround(self):
        return os.path.join(self.root, "samples_path_bestround")

    @property
    def samples_best(self):
        return os.path.join(self.root, "samples_best")

    @property
    def metadata(self):
        return os.path.join(self.root, "metadata.jsonl")

    @property
    def detailed_scores(self):
        return os.path.join(self.root, "best_img_detailedscore.jsonl")

    @property
    def best_meta(self):
        return os.path.join(self.root, "best_img_meta.jsonl")

    def append_metadata(self, datapoint: dict) -> None:
        with open(self.metadata, "a") as f:
            f.write(json.dumps(datapoint) + "\n")

    def append_detailed_scores(self, evaluation: list[dict], filenames: list[str]) -> None:
        with open(self.detailed_scores, "a") as f:
            f.write(json.dumps({"evaluation": evaluation, "filenames_batch": filenames}) + "\n")

    def append_best_meta(self, search_round: int, reflections=None, refined_prompt=None, filenames=None) -> None:
        with open(self.best_meta, "a") as f:
            if reflections is not None:
                f.write(f"reflections{search_round}: " + json.dumps(reflections) + "\n")
            if refined_prompt is not None:
                f.write(f"refined_prompt{search_round}: " + json.dumps(refined_prompt) + "\n")
            if filenames is not None:
                f.write(f"filenames_batch{search_round}: " + json.dumps(filenames) + "\n")


def load_geneval_metadata(path: str, start: int = 0, end: int | None = None) -> list[dict]:
    """Read GenEval evaluation_metadata.jsonl ({'prompt':..., 'tag':...})."""
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows[start:end]
