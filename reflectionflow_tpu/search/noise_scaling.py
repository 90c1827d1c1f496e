"""Stage-1 noise scaling: round-based best-of-N generation (no verifier).

Capability parity with `/root/reference/tts/tts_t2i_noise_scaling.py:16-163`
(whose verifier never runs — scoring happens post-hoc in the NFE filter).
TPU-native difference: all `search_branch` candidates of a round are ONE
batched, mesh-sharded generate call instead of a serial bs=1 loop.
"""

from __future__ import annotations

import numpy as np

from ..config import TTSConfig
from ..models.flux.latents import draw_packed_noise
from ..utils.timing import PhaseTimer
from .artifacts import PromptDirs, round_image_name, save_image
from .seeds import candidate_seeds, seeds_to_latents


def run_noise_scaling(
    pipeline,
    cfg: TTSConfig,
    prompts: list[dict] | list[str],
    output_root: str,
    start_index: int = 0,
    run_seed: int = 0,
    timer: PhaseTimer | None = None,
) -> None:
    """prompts: list of strings or GenEval rows ({'prompt':..., 'tag':...})."""
    timer = timer or PhaseTimer()
    pa = cfg.pipeline_args
    sa = cfg.search_args
    for offset, row in enumerate(prompts):
        prompt = row["prompt"] if isinstance(row, dict) else row
        idx = start_index + offset
        dirs = PromptDirs.create(output_root, idx)
        for rnd in range(1, sa.search_rounds + 1):
            seeds = candidate_seeds(run_seed, idx, rnd, sa.search_branch)
            latents = seeds_to_latents(
                seeds, pa.height, pa.width, pipeline.vae_cfg.latent_channels,
                pipeline.dtype, pipeline.vae_cfg.downscale,
            )
            with timer.span("generate"):
                images = pipeline.generate(
                    [prompt] * sa.search_branch,
                    height=pa.height,
                    width=pa.width,
                    num_inference_steps=pa.num_inference_steps,
                    guidance_scale=pa.guidance_scale,
                    max_sequence_length=pa.max_sequence_length,
                    latents=latents,
                )
            for seed, img in zip(seeds, images):
                save_image(f"{dirs.samples}/{round_image_name(rnd, seed)}", img)
            dirs.append_metadata(
                {
                    "prompt": prompt,
                    "search_round": rnd,
                    "num_noises": sa.search_branch,
                    "seeds": [int(s) for s in seeds],
                }
            )
