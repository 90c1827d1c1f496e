"""Lockstep multi-prompt reflection loop: equivalence with the per-prompt
path (same seeds => same artifacts) and batching behavior."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reflectionflow_tpu.config import (
    CLIPTextConfig,
    FluxDiTConfig,
    FluxVAEConfig,
    T5Config,
    TTSConfig,
)
from reflectionflow_tpu.reflect import FakeReflector, FakeRefiner
from reflectionflow_tpu.sampler.pipeline import FluxPipeline
from reflectionflow_tpu.search.reflectionflow import (
    run_reflectionflow_block,
    run_reflectionflow_prompt,
)
from reflectionflow_tpu.verifiers import FakeVerifier


@pytest.fixture(scope="module")
def pipe():
    return FluxPipeline.random_init(
        jax.random.PRNGKey(0),
        dit_cfg=FluxDiTConfig.tiny(),
        vae_cfg=FluxVAEConfig.tiny(),
        t5_cfg=T5Config.tiny(),
        clip_cfg=CLIPTextConfig.tiny(),
        dtype=jnp.float32,
    )


def tiny_cfg():
    cfg = TTSConfig()
    cfg.pipeline_args.height = 16
    cfg.pipeline_args.width = 16
    cfg.pipeline_args.num_inference_steps = 2
    cfg.pipeline_args.condition_size = 8
    cfg.search_args.search_rounds = 2
    cfg.search_args.search_branch = 2
    return cfg


def test_block_runs_and_checkpoints(pipe, tmp_path):
    cfg = tiny_cfg()
    rows = [{"prompt": "a red cube", "tag": None}, {"prompt": "a blue ball", "tag": None}]
    dps = run_reflectionflow_block(
        pipe, FakeVerifier(), FakeReflector(), FakeRefiner(), cfg, rows,
        str(tmp_path), run_seed=0,
    )
    assert len(dps) == 2
    for i in range(2):
        root = tmp_path / f"{i:05d}"
        assert len(list((root / "midimg").glob("*.png"))) == 6  # r0 + 2 rounds
        assert (root / "samples_best" / "00000.png").exists()
        assert dps[i]["flag_terminated"]
    # resume: no-op
    mtimes = {p: os.path.getmtime(p) for p in glob.glob(str(tmp_path / "*" / "midimg" / "*.png"))}
    run_reflectionflow_block(
        pipe, FakeVerifier(), FakeReflector(), FakeRefiner(), cfg, rows,
        str(tmp_path), run_seed=0,
    )
    assert mtimes == {p: os.path.getmtime(p) for p in glob.glob(str(tmp_path / "*" / "midimg" / "*.png"))}


def test_block_matches_per_prompt_filenames(pipe, tmp_path):
    """Seeds are a pure function of (run_seed, idx, round): the block path
    must produce the same candidate filenames as the per-prompt path."""
    cfg = tiny_cfg()
    run_reflectionflow_block(
        pipe, FakeVerifier(), FakeReflector(), FakeRefiner(), cfg,
        [{"prompt": "p0", "tag": None}], str(tmp_path / "block"), run_seed=3,
    )
    run_reflectionflow_prompt(
        pipe, FakeVerifier(), FakeReflector(), FakeRefiner(), cfg,
        prompt_index=0, original_prompt="p0", tag=None,
        output_root=str(tmp_path / "single"), run_seed=3,
    )
    a = sorted(os.path.basename(p) for p in glob.glob(str(tmp_path / "block" / "00000" / "midimg" / "*.png")))
    b = sorted(os.path.basename(p) for p in glob.glob(str(tmp_path / "single" / "00000" / "midimg" / "*.png")))
    assert a == b


def test_block_midrun_resume_uses_last_round(pipe, tmp_path):
    """Review fix: resume after round k must parent round k+1 on round k's
    images, not round 0's."""
    import json

    cfg = tiny_cfg()
    rows = [{"prompt": "q", "tag": None}]
    # run 1 round only
    cfg.search_args.search_rounds = 1
    run_reflectionflow_block(
        pipe, FakeVerifier(), FakeReflector(), FakeRefiner(), cfg, rows, str(tmp_path), run_seed=1
    )
    # continue to 2 rounds (simulating a killed run resuming)
    cfg.search_args.search_rounds = 2
    dps = run_reflectionflow_block(
        pipe, FakeVerifier(), FakeReflector(), FakeRefiner(), cfg, rows, str(tmp_path), run_seed=1
    )
    chains = dps[0]["chains"]
    # every chain must have grown to length 2 (round-2 children appended to
    # round-1 chains, NOT spawned as orphans from round-0 parents)
    lengths = sorted(len(c["images"]) for c in chains.values())
    assert lengths == [2, 2], lengths
    assert all("1_round@" in c["images"][0] for c in chains.values())
    assert all("2_round@" in c["images"][1] for c in chains.values())
