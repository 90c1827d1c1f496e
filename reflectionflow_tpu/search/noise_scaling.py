"""Stage-1 noise scaling: round-based best-of-N generation (no verifier).

Capability parity with `/root/reference/tts/tts_t2i_noise_scaling.py:16-163`
(whose verifier never runs — scoring happens post-hoc in the NFE filter).
TPU-native difference: the batch axis carries PROMPTS x BRANCH — a chunk of
prompts' candidates for one round is a single mesh-sharded generate call
(the reference loops bs=1 serially per candidate), so the GenEval sweep
saturates the chip.
"""

from __future__ import annotations

import numpy as np

from ..config import TTSConfig
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
    import jax.numpy as jnp

    timer = timer or PhaseTimer()
    pa = cfg.pipeline_args
    sa = cfg.search_args
    branch = sa.search_branch
    # prompts per generate call (>=1), from the configured generation batch
    chunk = max(1, cfg.batch_size_for_img_gen // branch)

    entries = []
    for offset, row in enumerate(prompts):
        prompt = row["prompt"] if isinstance(row, dict) else row
        idx = start_index + offset
        entries.append((idx, prompt, PromptDirs.create(output_root, idx)))

    if getattr(pipeline, "_embed_cache", None) is not None:
        # phase structure: encode ALL prompts once, offload the text
        # encoders, then every DiT round runs from cached embeddings
        with timer.span("encode"):
            pipeline.warm_prompt_cache([e[1] for e in entries], pa.max_sequence_length)

    # rounds are independent here (fixed prompts, fresh noise): keep up to
    # MAX_PENDING dispatched rounds in flight so host image fetch + PNG save
    # overlaps device compute, without accumulating every round's uint8
    # output buffer on the 16 GB chip
    MAX_PENDING = 4

    for c0 in range(0, len(entries), chunk):
        block = entries[c0 : c0 + chunk]
        pending: list[tuple[int, list[list[int]], object]] = []

        def drain_one():
            rnd, all_seeds, handle = pending.pop(0)
            with timer.span("generate"):
                # the fetch is where the async dispatch's device time lands
                images = np.asarray(handle)
            timer.add_count("candidates", images.shape[0])
            for bi, (idx, prompt, dirs) in enumerate(block):
                for k, seed in enumerate(all_seeds[bi]):
                    save_image(
                        f"{dirs.samples}/{round_image_name(rnd, seed)}",
                        images[bi * branch + k],
                    )
                dirs.append_metadata(
                    {
                        "prompt": prompt,
                        "search_round": rnd,
                        "num_noises": branch,
                        "seeds": [int(s) for s in all_seeds[bi]],
                    }
                )

        for rnd in range(1, sa.search_rounds + 1):
            all_seeds: list[list[int]] = []
            lat_parts = []
            flux_prompts = []
            for idx, prompt, _dirs in block:
                seeds = candidate_seeds(run_seed, idx, rnd, branch)
                all_seeds.append(seeds)
                lat_parts.append(
                    seeds_to_latents(
                        seeds, pa.height, pa.width, pipeline.vae_cfg.latent_channels,
                        pipeline.dtype, pipeline.vae_cfg.downscale,
                    )
                )
                flux_prompts.extend([prompt] * branch)
            with timer.span("generate"):
                handle = pipeline.generate(
                    flux_prompts,
                    height=pa.height,
                    width=pa.width,
                    num_inference_steps=pa.num_inference_steps,
                    guidance_scale=pa.guidance_scale,
                    max_sequence_length=pa.max_sequence_length,
                    latents=jnp.concatenate(lat_parts, axis=0),
                    output_type="jax",
                )
            pending.append((rnd, all_seeds, handle))
            if len(pending) >= MAX_PENDING:
                drain_one()
        while pending:
            drain_one()
