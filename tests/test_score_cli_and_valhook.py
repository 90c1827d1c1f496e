"""Batch-scoring CLI (resume semantics) + validation-sampling hook."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from reflectionflow_tpu.config import (
    CLIPTextConfig,
    FluxDiTConfig,
    FluxVAEConfig,
    T5Config,
    TrainConfig,
)
from reflectionflow_tpu.sampler.pipeline import FluxPipeline
from reflectionflow_tpu.search.artifacts import save_image
from reflectionflow_tpu.utils.jsonl import read_jsonl


def test_score_images_cli_resume(tmp_path):
    from reflectionflow_tpu.cli.score_images import main

    rng = np.random.default_rng(0)
    rows = []
    for i in range(4):
        path = str(tmp_path / f"img{i}.png")
        save_image(path, rng.integers(0, 255, (8, 8, 3), dtype=np.uint8))
        rows.append({"image": path, "prompt": f"p{i}"})
    meta = str(tmp_path / "meta.jsonl")
    with open(meta, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    out = str(tmp_path / "scores.jsonl")
    main(["--meta_path", meta, "--output_json", out, "--verifier", "fake"])
    scored = read_jsonl(out)
    assert len(scored) == 4 and all("VQ" in r for r in scored)
    # resume: truncate to 2 rows, rerun -> only missing 2 re-scored, same values
    with open(out, "w") as f:
        for r in scored[:2]:
            f.write(json.dumps(r) + "\n")
    main(["--meta_path", meta, "--output_json", out, "--verifier", "fake"])
    scored2 = read_jsonl(out)
    assert len(scored2) == 4
    assert {r["image"]: r["VQ"] for r in scored2} == {r["image"]: r["VQ"] for r in scored}


def test_validation_hook(tmp_path):
    from reflectionflow_tpu.lora.lora import lora_init
    from reflectionflow_tpu.train.train_loop import make_validation_hook

    pipe = FluxPipeline.random_init(
        jax.random.PRNGKey(0),
        dit_cfg=FluxDiTConfig.tiny(),
        vae_cfg=FluxVAEConfig.tiny(),
        t5_cfg=T5Config.tiny(),
        clip_cfg=CLIPTextConfig.tiny(),
        dtype=jnp.float32,
    )
    cfg = TrainConfig(sample_interval=2)
    cfg.lora.r = 2
    cfg.lora.alpha = 2
    cfg.data.target_size = 16
    cfg.data.condition_size = 8
    rng = np.random.default_rng(0)
    val = [{"prompt": "v", "condition": rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)}]
    hook = make_validation_hook(pipe, cfg, val, str(tmp_path))
    lora = lora_init(jax.random.PRNGKey(1), pipe.params["dit"], r=2, alpha=2)
    hook(0, lora["adapters"], {})  # step 1: not a sample step
    assert not os.listdir(tmp_path)
    hook(1, lora["adapters"], {})  # step 2: samples
    assert os.path.exists(tmp_path / "step2_00.png")
    assert pipe.cond_dit_params is None  # restored
