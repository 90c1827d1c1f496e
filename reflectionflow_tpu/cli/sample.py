"""Standalone corrector sampler — the working equivalent of the reference's
`train_flux/sample.py` (which ships broken: it imports a missing `src/`
package, sample.py:9-14). Batch-runs the FLUX Corrector over (bad image,
prompt, reflection) eval items: the bad image becomes a `cot` Condition at
condition_size; CLIP pools the original prompt while T5 encodes
`prompt + " [Reflexion] " + reflection` (the reference's prompt/prompt_2
split, sample.py:158-170); output is a [condition | good | corrected]
side-by-side sheet per item (sample.py:172-178).

Meta file: a JSON list or JSONL of items with `prompt`, `bad_image` (path),
optional `good_image`, and a reflection under one of `reflection_prompt` /
`instruction` / `reflection` / `edited_prompt_list` (the reference's key
fallbacks, sample.py:142-151). Paths resolve against --root_dir.

Usage:
  python -m reflectionflow_tpu.cli.sample \
      --pipeline_config_path configs/flux.1_dev_fake.json \
      --meta_path pairs.json --output_dir samples/ [--root_dir DATA]
"""

from __future__ import annotations

import json
import os
import random

import numpy as np

from ..sampler.condition import Condition, cot_position_delta
from ..search.artifacts import load_image, save_image
from ..utils.timing import PhaseTimer
from .common import build_parser, load_config, load_pipeline, slice_rows


def _reflection_of(item: dict) -> str:
    # reference fallback order, sample.py:142-151
    if "reflection_prompt" in item:
        return item["reflection_prompt"]
    if "instruction" in item:
        return item["instruction"]
    if "reflection" in item:
        return item["reflection"]
    if "edited_prompt_list" in item:
        return item["edited_prompt_list"][-1]
    raise ValueError(f"No reflection found in item: {sorted(item)}")


def _load_items(meta_path: str) -> list[dict]:
    with open(meta_path) as f:
        text = f.read()
    try:
        data = json.loads(text)
        return data if isinstance(data, list) else [data]
    except json.JSONDecodeError:
        return [json.loads(line) for line in text.splitlines() if line.strip()]


def _prep_pair(bad, good, target: int, cond: int, rng: random.Random):
    """Reference preprocessing (sample.py:100-127): bad resized onto good's
    grid, shorter edge to target, the SAME random crop on both, then bad
    down to the condition size."""
    from PIL import Image

    if good is not None:
        good_img = Image.fromarray(good)
        bad_img = Image.fromarray(bad).resize(good_img.size, Image.BICUBIC)
    else:
        good_img, bad_img = None, Image.fromarray(bad)
    w, h = bad_img.size
    ratio = target / min(w, h)
    nw, nh = -(-w * ratio // 1), -(-h * ratio // 1)  # ceil
    nw, nh = int(nw), int(nh)
    bad_img = bad_img.resize((nw, nh), Image.BICUBIC)
    good_img = good_img.resize((nw, nh), Image.BICUBIC) if good_img is not None else None
    if nw > target or nh > target:
        left = rng.randint(0, max(0, nw - target))
        top = rng.randint(0, max(0, nh - target))
        box = (left, top, left + target, top + target)
        bad_img = bad_img.crop(box)
        good_img = good_img.crop(box) if good_img is not None else None
    cond_img = bad_img.resize((cond, cond), Image.BICUBIC)
    return (
        np.asarray(cond_img.convert("RGB")),
        np.asarray(good_img.convert("RGB")) if good_img is not None else None,
    )


def main(argv=None):
    p = build_parser(__doc__)
    p.add_argument("--root_dir", type=str, default="", help="prefix for image paths in the meta file")
    p.add_argument("--image_guidance_scale", type=float, default=1.0)
    args = p.parse_args(argv)
    cfg = load_config(args)
    pa = cfg.pipeline_args
    target, cond_size = pa.height, pa.condition_size
    if cond_size > target:
        raise SystemExit(
            f"condition_size ({cond_size}) must not exceed height ({target}): "
            "the condition panel is pasted into a height-sized sheet column"
        )
    pipe = load_pipeline(cfg, args)
    items = slice_rows(_load_items(args.meta_path), args)
    out_dir = cfg.output_dir
    os.makedirs(out_dir, exist_ok=True)
    timer = PhaseTimer()

    for idx, item in enumerate(items):
        # per-item crop RNG keyed on the GLOBAL index: the same item gets
        # the same crop whether the run starts at 0 or resumes mid-list
        rng = random.Random(args.seed * 1_000_003 + args.start_index + idx)
        bad = load_image(os.path.join(args.root_dir, item["bad_image"]))
        good = (
            load_image(os.path.join(args.root_dir, item["good_image"]))
            if item.get("good_image") else None
        )
        cond_np, good_np = _prep_pair(bad, good, target, cond_size, rng)
        condition = Condition("cot", cond_np, position_delta=cot_position_delta(cond_size))
        prompt = item["prompt"]
        t5_prompt = prompt + " [Reflexion] " + _reflection_of(item)
        with timer.span("generate"):
            result = pipe.generate(
                [prompt],
                prompts_2=[t5_prompt],
                height=target, width=target,
                num_inference_steps=pa.num_inference_steps,
                guidance_scale=pa.guidance_scale,
                max_sequence_length=pa.max_sequence_length,
                # fresh noise per item (the reference draws unseeded noise
                # per call, sample.py:158-170) but still deterministic and
                # resume-stable under --start_index
                seed=args.seed + args.start_index + idx,
                conditions=[condition],
                image_guidance_scale=args.image_guidance_scale,
            )[0]
        # [condition | good | corrected] sheet, good omitted when absent
        panels = [p_ for p_ in (_fit(cond_np, target), good_np, result) if p_ is not None]
        sheet = np.concatenate(panels, axis=1)
        name = item.get("image_id", f"result_{args.start_index + idx}")
        save_image(os.path.join(out_dir, f"{name}.png"), sheet)
    print(timer.summary())


def _fit(img: np.ndarray, size: int) -> np.ndarray:
    """Pad the condition panel to the sheet height (reference pastes the
    smaller condition image into a target-height canvas)."""
    out = np.zeros((size, size, 3), np.uint8)
    out[: img.shape[0], : img.shape[1]] = img
    return out


if __name__ == "__main__":
    main()
