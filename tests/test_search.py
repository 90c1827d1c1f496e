"""Search-loop tests with the deterministic fake verifier (hermetic)."""

import glob
import json
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
from reflectionflow_tpu.search.nfe_filter import run_nfe_filter
from reflectionflow_tpu.search.noise_prompt_scaling import run_noise_prompt_scaling
from reflectionflow_tpu.search.noise_scaling import run_noise_scaling
from reflectionflow_tpu.search.reflectionflow import run_reflectionflow_prompt
from reflectionflow_tpu.search.state import Chains
from reflectionflow_tpu.verifiers import FakeNvilaVerifier, FakeVerifier
from reflectionflow_tpu.verifiers.base import RankingRule, select_topk


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


def tiny_cfg(rounds=2, branch=2):
    cfg = TTSConfig()
    cfg.pipeline_args.height = 16
    cfg.pipeline_args.width = 16
    cfg.pipeline_args.num_inference_steps = 2
    cfg.pipeline_args.condition_size = 8
    cfg.search_args.search_rounds = rounds
    cfg.search_args.search_branch = branch
    return cfg


# ---------------------------------------------------------------------------
# ranking / chains units
# ---------------------------------------------------------------------------


def test_select_topk_score_rule():
    rule = RankingRule(kind="score", choice_of_metric="overall_score")
    outs = [{"overall_score": {"score": s}} for s in (3, 9, 5)]
    assert select_topk(outs, 2, rule) == [1, 2]
    # wraparound repeat
    assert select_topk(outs, 5, rule) == [1, 2, 0, 1, 2]


def test_nvila_rule_yes_first():
    rule = RankingRule(kind="yes_no")
    outs = [
        {"label": "no", "score": 0.1},   # low no-logit: best of the "no"s
        {"label": "yes", "score": 2.0},
        {"label": "yes", "score": 5.0},  # highest yes-logit: best overall
        {"label": "no", "score": 3.0},
    ]
    assert select_topk(outs, 4, rule) == [2, 1, 0, 3]


def test_chains_lifecycle():
    rule = RankingRule(kind="score", choice_of_metric="overall_score")
    c = Chains(rule)
    c.init_round(["a1", "b1"], [{"overall_score": {"score": 1}}, {"overall_score": {"score": 2}}])
    assert set(c.chains) == {"a1", "b1"}
    # round 2: both children descend from b1
    c.update(["b1", "b1"], ["a2", "b2"], [{"overall_score": {"score": 5}}, {"overall_score": {"score": 0}}])
    assert c.chains["b1"]["images"] == ["b1", "a2", "b2"]
    assert c.best_per_chain() == ["a1", "a2"]
    img, out = c.global_best()
    assert img == "a2" and out["overall_score"]["score"] == 5
    # serialization roundtrip
    c2 = Chains.from_json(c.to_json())
    assert c2.chains == c.chains


# ---------------------------------------------------------------------------
# loops
# ---------------------------------------------------------------------------


def test_noise_scaling_artifacts(pipe, tmp_path):
    cfg = tiny_cfg()
    run_noise_scaling(pipe, cfg, ["a red cube"], str(tmp_path), run_seed=1)
    imgs = sorted(glob.glob(str(tmp_path / "00000" / "samples" / "*_round@*.png")))
    assert len(imgs) == cfg.search_args.search_rounds * cfg.search_args.search_branch
    meta = open(tmp_path / "00000" / "metadata.jsonl").read().strip().splitlines()
    assert len(meta) == cfg.search_args.search_rounds
    # determinism: same run_seed -> same filenames
    run_noise_scaling(pipe, cfg, ["a red cube"], str(tmp_path / "again"), run_seed=1)
    imgs2 = sorted(
        os.path.basename(p) for p in glob.glob(str(tmp_path / "again" / "00000" / "samples" / "*.png"))
    )
    assert imgs2 == [os.path.basename(p) for p in imgs]


def test_reflectionflow_end_to_end(pipe, tmp_path):
    cfg = tiny_cfg(rounds=2, branch=2)
    dp = run_reflectionflow_prompt(
        pipe,
        FakeVerifier(),
        FakeReflector(),
        FakeRefiner(),
        cfg,
        prompt_index=0,
        original_prompt="a blue sphere",
        tag=None,
        output_root=str(tmp_path),
        run_seed=0,
    )
    root = tmp_path / "00000"
    assert dp["flag_terminated"]
    assert len(dp["generated_img"]) == 2
    assert len(dp["chains"]) == 2  # one chain per round-1 candidate
    assert (root / "samples_best" / "00000.png").exists()
    assert len(list((root / "samples_lastround").glob("*.png"))) == 2
    assert len(list((root / "samples_path_bestround").glob("*.png"))) == 2
    assert (root / "best_img_detailedscore.jsonl").exists()
    assert (root / "best_img_meta.jsonl").exists()
    # flux prompt format: refined + [Reflexion]: suffixes recorded
    assert all("[Reflexion]" not in p for p in dp["refined_prompt"])
    assert all(r for r in dp["reflections"])
    # resume: running again is a no-op (manifest says done)
    mtimes = {p: os.path.getmtime(p) for p in glob.glob(str(root / "midimg" / "*.png"))}
    run_reflectionflow_prompt(
        pipe, FakeVerifier(), FakeReflector(), FakeRefiner(), cfg,
        prompt_index=0, original_prompt="a blue sphere", tag=None,
        output_root=str(tmp_path), run_seed=0,
    )
    assert mtimes == {p: os.path.getmtime(p) for p in glob.glob(str(root / "midimg" / "*.png"))}


def test_reflectionflow_nvila_rule(pipe, tmp_path):
    cfg = tiny_cfg(rounds=1, branch=2)
    dp = run_reflectionflow_prompt(
        pipe, FakeNvilaVerifier(), FakeReflector(), FakeRefiner(), cfg,
        prompt_index=3, original_prompt="x", tag=None, output_root=str(tmp_path), run_seed=0,
    )
    assert len(dp["generated_img"]) == 2


def test_noise_prompt_scaling(pipe, tmp_path):
    cfg = tiny_cfg(rounds=2, branch=2)
    run_noise_prompt_scaling(
        pipe, FakeVerifier(), FakeRefiner(), cfg, ["a tiny boat"], str(tmp_path), run_seed=0
    )
    imgs = glob.glob(str(tmp_path / "00000" / "samples" / "*.png"))
    assert len(imgs) == 4
    meta = [json.loads(l) for l in open(tmp_path / "00000" / "metadata.jsonl")]
    # round 2 prompts were refined
    assert meta[1]["current_prompts"][0] != "a tiny boat"
    assert meta[1]["current_prompts"][0].startswith("a tiny boat")


def test_nfe_filter_selects_quality(pipe, tmp_path):
    cfg = tiny_cfg(rounds=2, branch=2)
    run_noise_scaling(pipe, cfg, ["p"], str(tmp_path / "stage1"), run_seed=0)
    # ground-truth scorer: brighter image wins
    verifier = FakeVerifier(quality_fn=lambda img, p: float(img.mean()))
    rule = RankingRule(kind="score", choice_of_metric="overall_score")
    sel = run_nfe_filter(
        verifier, rule, str(tmp_path / "stage1"), str(tmp_path / "curve"), ["p"],
        nfes=(1, 2, 4), images_subdir="samples",
    )
    assert len(sel[1]) == len(sel[2]) == len(sel[4]) == 1
    assert (tmp_path / "curve" / "nfe4" / "00000.png").exists()
    # best-of-4 must be at least as bright as best-of-1
    from reflectionflow_tpu.search.artifacts import load_image

    assert load_image(sel[4][0]).mean() >= load_image(sel[1][0]).mean()
