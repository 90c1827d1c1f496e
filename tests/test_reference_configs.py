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


def test_reference_gptscore_specifics():
    cfg = TTSConfig.load("/root/reference/tts/configs/flux.1_dev_gptscore.json", {})
    assert cfg.verifier_args.name == "openai"
    assert cfg.search_args.search_branch == 2
    assert cfg.search_args.search_rounds == 16
    assert cfg.model.union_cond_attn is True
    assert cfg.model.add_cond_attn is False
    assert cfg.model.latent_lora is False
