"""Drop-in compatibility: the REFERENCE repo's own config JSONs must load.

These tests read (never copy) `/root/reference/tts/configs/*.json` at test
time and assert `TTSConfig.load` maps every surface the search loop consumes.
Skipped when the reference snapshot isn't present.
"""

import glob
import os

import pytest

from reflectionflow_tpu.config import TTSConfig

REF_CONFIGS = sorted(glob.glob("/root/reference/tts/configs/*.json"))

pytestmark = pytest.mark.skipif(not REF_CONFIGS, reason="reference snapshot not present")


@pytest.mark.parametrize("path", REF_CONFIGS, ids=[os.path.basename(p) for p in REF_CONFIGS])
def test_reference_config_loads_drop_in(path):
    cfg = TTSConfig.load(path, {})
    pa = cfg.pipeline_args
    assert pa.height == pa.width == 1024
    assert pa.condition_size == 512
    assert pa.num_inference_steps == 30
    assert pa.guidance_scale == 3.5
    assert pa.max_sequence_length == 512
    assert cfg.search_args.search_branch >= 1
    assert cfg.search_args.search_rounds >= 1
    assert cfg.verifier_args.name in {"openai", "nvila", "nvila_jax", "qwen_rm", "fake"}


def test_reference_train_yaml_loads_drop_in():
    """The reference's ACTUAL train_flux/config.yaml (not a transcription)
    maps onto TrainConfig: LoRA r/alpha, Prodigy hyperparams, stage-scheduled
    split ratios, batch/save settings."""
    path = "/root/reference/train_flux/config.yaml"
    if not os.path.exists(path):
        pytest.skip("reference train config not present")
    from reflectionflow_tpu.config import TrainConfig

    cfg = TrainConfig.load(path)
    assert cfg.lora.r == 32 and cfg.lora.alpha == 32 and cfg.lora.init == "gaussian"
    assert cfg.optimizer.name == "prodigy"
    assert cfg.optimizer.lr == 1 and cfg.optimizer.weight_decay == 0.01
    assert cfg.optimizer.grad_accum == 1
    assert cfg.data.batch_size == 8
    assert cfg.data.training_stages == (0, 5000)
    assert set(cfg.split_ratios) == {"general", "length", "rule", "editing"}
    assert cfg.split_ratios["editing"] == [0.7, 0.0]
    assert cfg.save_interval == 2000 and cfg.sample_interval == 2000
    assert cfg.dtype == "bf16"
    # max_steps: -1 in the yaml means "run the practical budget" (ckpt/16000
    # per /root/reference/train_flux/sample.sh:9)
    assert cfg.max_steps == 16000
    # the wds pipe URL rides through as the shard source
    assert any("genref" in s for s in cfg.data.shards)


def test_reference_gptscore_specifics():
    cfg = TTSConfig.load("/root/reference/tts/configs/flux.1_dev_gptscore.json", {})
    assert cfg.verifier_args.name == "openai"
    assert cfg.search_args.search_branch == 2
    assert cfg.search_args.search_rounds == 16
    assert cfg.model.union_cond_attn is True
    assert cfg.model.add_cond_attn is False
    assert cfg.model.latent_lora is False
