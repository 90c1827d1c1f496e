"""Noise + prompt scaling: best-of-N with per-round verifier scoring and
prompt refinement (no corrector conditioning).

Capability parity with `/root/reference/tts/tts_t2i_noise_prompt_scaling.py:22-251`:
per round, score the previous candidates, keep top-k, refine the prompt from
the best image's evaluation, and regenerate with fresh noise; refined
prompts feed the next round.
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..config import TTSConfig
from ..utils.timing import PhaseTimer
from ..verifiers.base import RankingRule, Verifier, select_topk
from .artifacts import PromptDirs, load_image, round_image_name, save_image
from .seeds import candidate_seeds, seeds_to_latents


def run_noise_prompt_scaling(
    pipeline,
    verifier: Verifier,
    refiner,
    cfg: TTSConfig,
    prompts: list[dict] | list[str],
    output_root: str,
    start_index: int = 0,
    run_seed: int = 0,
    timer: PhaseTimer | None = None,
) -> None:
    timer = timer or PhaseTimer()
    pa, sa = cfg.pipeline_args, cfg.search_args
    branch = sa.search_branch
    rule = RankingRule(
        kind="yes_no" if verifier.name.endswith("nvila") else "score",
        choice_of_metric=cfg.verifier_args.choice_of_metric,
    )
    for offset, row in enumerate(prompts):
        original_prompt = row["prompt"] if isinstance(row, dict) else row
        tag = row.get("tag") if isinstance(row, dict) else None
        idx = start_index + offset
        dirs = PromptDirs.create(output_root, idx)
        current_prompts = [original_prompt] * branch
        prev_images: list[str] = []
        for rnd in range(1, sa.search_rounds + 1):
            # refine from the previous round's best (skipped in round 1)
            if rnd > 1 and refiner is not None and cfg.prompt_refiner_args.run_refinement:
                arrays = [load_image(p) for p in prev_images]
                with timer.span("verify"):
                    outputs = verifier.score(arrays, [original_prompt] * len(arrays), tag=tag, max_new_tokens=cfg.verifier_args.max_new_tokens)
                topk_idx = select_topk(outputs, branch, rule)
                evaluations = [json.dumps(outputs[i]) for i in topk_idx]
                with timer.span("refine"):
                    current_prompts = refiner.refine(
                        [arrays[i] for i in topk_idx],
                        [original_prompt] * branch,
                        current_prompts,
                        evaluations=evaluations,
                    )
                dirs.append_detailed_scores([outputs[i] for i in topk_idx], [prev_images[i] for i in topk_idx])

            seeds = candidate_seeds(run_seed, idx, rnd, branch)
            latents = seeds_to_latents(
                seeds, pa.height, pa.width, pipeline.vae_cfg.latent_channels, pipeline.dtype,
                pipeline.vae_cfg.downscale,
            )
            with timer.span("generate"):
                images = pipeline.generate(
                    current_prompts, height=pa.height, width=pa.width,
                    num_inference_steps=pa.num_inference_steps, guidance_scale=pa.guidance_scale,
                    max_sequence_length=pa.max_sequence_length, latents=latents,
                )
            prev_images = []
            for seed, img in zip(seeds, images):
                path = os.path.join(dirs.samples, round_image_name(rnd, seed))
                save_image(path, img)
                prev_images.append(path)
            dirs.append_metadata(
                {
                    "prompt": original_prompt,
                    "current_prompts": current_prompts,
                    "search_round": rnd,
                    "seeds": [int(s) for s in seeds],
                }
            )
