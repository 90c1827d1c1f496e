"""Full GenEval benchmark surface: 553-prompt metadata + the per-tag NFE
scaling-curve pipeline end-to-end with the fake verifier.

Mirrors `/root/reference/tts/geneval/evaluation_metadata.jsonl` (benchmark
data, carried verbatim) and `/root/reference/tts/verifier_filter.py`.
"""

import json
import os
from collections import Counter

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
META = os.path.join(REPO, "configs", "geneval_metadata.jsonl")

EXPECTED_TAG_COUNTS = {
    "single_object": 80,
    "two_object": 99,
    "counting": 80,
    "colors": 94,
    "position": 100,
    "color_attr": 100,
}


def _rows():
    with open(META) as f:
        return [json.loads(line) for line in f if line.strip()]


def test_geneval_metadata_complete():
    rows = _rows()
    assert len(rows) == 553
    tags = Counter(r["tag"] for r in rows)
    assert dict(tags) == EXPECTED_TAG_COUNTS
    for r in rows:
        assert r["prompt"]
        assert isinstance(r["include"], list) and r["include"]
        for inc in r["include"]:
            assert {"class", "count"} <= set(inc)


def test_geneval_plain_verifier_prompt_asset():
    from reflectionflow_tpu.verifiers.openai_backend import load_prompt

    text = load_prompt("geneval_verifier_prompt.txt")
    for key in EXPECTED_TAG_COUNTS:
        assert f"`{key}`" in text or key in text
    assert "overall_score" in text


def test_nfe_filter_all_six_tags_end_to_end(tmp_path):
    """One prompt per GenEval tag -> tiny noise-scaling run -> NFE filter
    produces every nfe{K} dir with one selection per prompt."""
    from reflectionflow_tpu.config import (
        CLIPTextConfig, FluxDiTConfig, FluxVAEConfig, T5Config, TTSConfig,
    )
    from reflectionflow_tpu.sampler.pipeline import FluxPipeline
    from reflectionflow_tpu.search.nfe_filter import run_nfe_filter
    from reflectionflow_tpu.search.noise_scaling import run_noise_scaling
    from reflectionflow_tpu.verifiers import load_verifier
    from reflectionflow_tpu.verifiers.base import RankingRule

    rows = _rows()
    by_tag = {}
    for r in rows:
        by_tag.setdefault(r["tag"], r)
    prompts = list(by_tag.values())
    assert len(prompts) == 6

    pipe = FluxPipeline.random_init(
        jax.random.PRNGKey(0),
        dit_cfg=FluxDiTConfig.tiny(),
        vae_cfg=FluxVAEConfig.tiny(),
        t5_cfg=T5Config.tiny(),
        clip_cfg=CLIPTextConfig.tiny(),
        dtype=jnp.float32,
    )
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(
        json.dumps(
            {
                "pipeline_args": {
                    "height": 16, "width": 16, "num_inference_steps": 1, "max_sequence_length": 8,
                },
                "search_args": {"search_branch": 2, "search_rounds": 2},
            }
        )
    )
    cfg = TTSConfig.load(str(cfg_path))
    out = str(tmp_path / "run")
    run_noise_scaling(pipe, cfg, prompts, out, run_seed=0)

    verifier = load_verifier("fake")
    sel = run_nfe_filter(
        verifier, RankingRule(), out, out, prompts, nfes=(1, 2, 4), images_subdir="samples"
    )
    for k in (1, 2, 4):
        assert len(sel[k]) == 6
        files = sorted(os.listdir(os.path.join(out, f"nfe{k}")))
        assert files == [f"{i:05d}.png" for i in range(6)]
