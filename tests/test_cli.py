"""CLI smoke tests: the public `tts_*.py`-equivalent surface, hermetic via
--synthetic_weights + fake verifier config."""

import glob
import json
import os

import pytest


def write_tiny_config(path, rounds=1, branch=2, verifier="fake", overrides=None):
    cfg = {
        "pipeline_args": {
            "torch_dtype": "fp32",
            "height": 16,
            "width": 16,
            "condition_size": 8,
            "max_sequence_length": 16,
            "guidance_scale": 3.5,
            "num_inference_steps": 2,
            **(overrides or {}),
        },
        "verifier_args": {"name": verifier, "choice_of_metric": "overall_score"},
        "search_args": {"search_branch": branch, "search_rounds": rounds},
        "model": {"union_cond_attn": True, "add_cond_attn": False, "latent_lora": False},
        "reflection_args": {"run_reflection": True, "name": "fake"},
        "prompt_refiner_args": {"run_refinement": True, "name": "fake"},
        "batch_size_for_img_gen": branch,
    }
    with open(path, "w") as f:
        json.dump(cfg, f)
    return path


def write_meta(path, prompts):
    with open(path, "w") as f:
        for p in prompts:
            f.write(json.dumps({"prompt": p, "tag": "colors"}) + "\n")
    return path


def test_noise_scaling_cli(tmp_path):
    from reflectionflow_tpu.cli.tts_t2i_noise_scaling import main

    cfg = write_tiny_config(str(tmp_path / "cfg.json"))
    meta = write_meta(str(tmp_path / "meta.jsonl"), ["a red dot"])
    out = str(tmp_path / "out")
    main([
        "--pipeline_config_path", cfg, "--meta_path", meta, "--output_dir", out,
        "--synthetic_weights",
    ])
    assert len(glob.glob(os.path.join(out, "00000", "samples", "*.png"))) == 2


def test_reflectionflow_cli_and_filter(tmp_path):
    from reflectionflow_tpu.cli.tts_reflectionflow import main as rf_main
    from reflectionflow_tpu.cli.verifier_filter import main as vf_main

    cfg = write_tiny_config(str(tmp_path / "cfg.json"), rounds=2)
    meta = write_meta(str(tmp_path / "meta.jsonl"), ["a blue dot"])
    out = str(tmp_path / "out")
    rf_main([
        "--pipeline_config_path", cfg, "--meta_path", meta, "--output_dir", out,
        "--synthetic_weights",
    ])
    # round-0 bootstrap (2) + 2 rounds x 2
    assert len(glob.glob(os.path.join(out, "00000", "midimg", "*.png"))) == 6
    assert os.path.exists(os.path.join(out, "00000", "samples_best", "00000.png"))

    curve = str(tmp_path / "curve")
    vf_main([
        "--pipeline_config_path", cfg, "--meta_path", meta, "--output_dir", curve,
        "--imgpath", out, "--nfes", "1", "2", "4", "--synthetic_weights",
    ])
    assert os.path.exists(os.path.join(curve, "nfe4", "00000.png"))


def test_noise_prompt_scaling_cli(tmp_path):
    from reflectionflow_tpu.cli.tts_t2i_noise_prompt_scaling import main

    cfg = write_tiny_config(str(tmp_path / "cfg.json"), rounds=2)
    meta = write_meta(str(tmp_path / "meta.jsonl"), ["a dot"])
    out = str(tmp_path / "out")
    main([
        "--pipeline_config_path", cfg, "--meta_path", meta, "--output_dir", out,
        "--synthetic_weights",
    ])
    assert len(glob.glob(os.path.join(out, "00000", "samples", "*.png"))) == 4


def test_train_cli_synthetic(tmp_path):
    from reflectionflow_tpu.cli.train import main

    ckpt = str(tmp_path / "ckpt")
    cfg = {
        "max_steps": 2,
        "save_interval": 2,
        "checkpoint_dir": ckpt,
        "lora": {"r": 2, "alpha": 2},
        "optimizer": {"name": "adamw", "lr": 0.001},
        "data": {"batch_size": 2, "target_size": 16, "condition_size": 8},
    }
    cfg_path = str(tmp_path / "train.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    main(["--config", cfg_path, "--synthetic_data", "--synthetic_weights"])
    assert os.path.exists(os.path.join(ckpt, "latest"))


def test_serving_profile_validation(tmp_path):
    """Bad t5_quant/dit_quant values and the incompatible int8-T5 +
    int4-MLP-co-residency combination fail loudly at load time."""
    import json as _json
    from argparse import Namespace

    from reflectionflow_tpu.cli.common import load_config, load_pipeline

    def args_for(cfg_path):
        return Namespace(
            pipeline_config_path=str(cfg_path), output_dir=None, synthetic_weights=True,
            attn_impl=None, quantize="int8", phase_swap=False, act_quant_exclude=[],
        )

    def cfg_with(pipeline_overrides):
        p = tmp_path / f"cfg{len(list(tmp_path.iterdir()))}.json"
        write_tiny_config(p)
        raw = _json.loads(p.read_text())
        raw["pipeline_args"].update(pipeline_overrides)
        p.write_text(_json.dumps(raw))
        return p

    with pytest.raises(ValueError, match="t5_quant"):
        load_pipeline(load_config(args_for(cfg_with({"t5_quant": "nf4"}))), args_for("x"))
    with pytest.raises(ValueError, match="dit_quant"):
        load_pipeline(load_config(args_for(cfg_with({"dit_quant": "int4"}))), args_for("x"))
    with pytest.raises(ValueError, match="co-reside"):
        load_pipeline(
            load_config(args_for(cfg_with({"t5_quant": "int8", "dit_quant": "int8_int4mlp"}))),
            args_for("x"),
        )
    # the valid co-residency profile loads, resolves T5 to NF4, and does
    # NOT enable phase swap (but does cache prompt embeddings)
    pipe = load_pipeline(
        load_config(args_for(cfg_with({"dit_quant": "int8_int4mlp"}))), args_for("x")
    )
    assert getattr(pipe, "_swap", ()) == ()
    assert getattr(pipe, "_embed_cache", None) is not None
    # quant fields without quantization enabled = misconfigured profile (raise)
    def args_noquant(cfg_path, quantize=None):
        a = args_for(cfg_path)
        a.quantize = quantize
        return a

    p_bad = cfg_with({"t5_quant": "int8"})
    with pytest.raises(ValueError, match="quantization\\s+is disabled"):
        load_pipeline(load_config(args_noquant(p_bad)), args_noquant("x"))
    # ... but an explicit --quantize none override is the user's call
    load_pipeline(load_config(args_noquant(p_bad, "none")), args_noquant("x", "none"))


def test_shipped_presets_parse():
    """Every shipped config preset parses into a TTSConfig with a known
    verifier backend (reference ships gptscore + nvilascore:
    /root/reference/tts/configs/)."""
    from reflectionflow_tpu.config import TTSConfig

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = sorted(glob.glob(os.path.join(repo, "configs", "flux*.json")))
    assert len(paths) >= 6
    known = {"fake", "openai", "qwen_rm", "nvila", "nvila_jax", "image_verifier"}
    names = {}
    for p in paths:
        cfg = TTSConfig.load(p)
        assert cfg.verifier_args.name in known, p
        assert cfg.search_args.search_branch >= 2, p
        names[os.path.basename(p)] = cfg.verifier_args.name
    # reference parity: gptscore -> openai verifier, nvilascore -> NVILA verifier
    assert names["flux.1_dev_gptscore.json"] == "openai"
    assert names["flux.1_dev_nvilascore.json"] == "nvila_jax"
    # the v5e serving presets quantize and use micro-batch 1 (measured)
    for k in ("flux.1_dev_qwenscore_v5e.json", "flux.1_dev_qwenscore_v5e_co.json",
              "flux.1_dev_nvilascore.json"):
        cfg = TTSConfig.load(os.path.join(repo, "configs", k))
        assert cfg.pipeline_args.quantize == "int8", k
        assert cfg.batch_size_for_img_gen == 1, k


def test_sample_cli_corrector_standalone(tmp_path):
    """Working equivalent of the reference's broken train_flux/sample.py:
    (bad image, prompt, reflection) -> corrected sheet via the cot
    Condition + prompt/prompt_2 tower split."""
    import numpy as np

    from reflectionflow_tpu.cli.sample import main
    from reflectionflow_tpu.search.artifacts import save_image

    cfg_path = write_tiny_config(str(tmp_path / "cfg.json"))
    rng = np.random.default_rng(0)
    save_image(str(tmp_path / "bad.png"), rng.integers(0, 255, (20, 24, 3), dtype=np.uint8))
    save_image(str(tmp_path / "good.png"), rng.integers(0, 255, (24, 28, 3), dtype=np.uint8))
    meta = [
        {"prompt": "a cat", "bad_image": "bad.png", "good_image": "good.png",
         "reflection": "make it fluffier", "image_id": "pair0"},
        {"prompt": "a dog", "bad_image": "bad.png", "instruction": "fix the ears"},
    ]
    with open(tmp_path / "pairs.json", "w") as f:
        json.dump(meta, f)
    out = str(tmp_path / "out")
    main([
        "--pipeline_config_path", cfg_path, "--meta_path", str(tmp_path / "pairs.json"),
        "--output_dir", out, "--root_dir", str(tmp_path), "--synthetic_weights",
    ])
    import PIL.Image

    sheet0 = np.asarray(PIL.Image.open(os.path.join(out, "pair0.png")))
    sheet1 = np.asarray(PIL.Image.open(os.path.join(out, "result_1.png")))
    # tiny config: target 16, cond 8 -> [cond|good|result] = 48 wide, no-good item 32
    assert sheet0.shape == (16, 48, 3)
    assert sheet1.shape == (16, 32, 3)
    # a condition panel taller than the sheet must fail up front, before any
    # generation runs (the sheet column is height-sized)
    cfg_bad = write_tiny_config(str(tmp_path / "cfg_bad.json"),
                                overrides={"condition_size": 32})
    with pytest.raises(SystemExit, match="condition_size"):
        main([
            "--pipeline_config_path", cfg_bad, "--meta_path", str(tmp_path / "pairs.json"),
            "--output_dir", out, "--root_dir", str(tmp_path), "--synthetic_weights",
        ])


def test_compilation_cache_plumbing(tmp_path):
    """--compilation_cache / pipeline_args.compilation_cache /
    $REFLECTIONFLOW_COMPILE_CACHE set the persistent XLA cache dir before
    the first compile (precedence: CLI > config > env)."""
    import types

    import jax

    from reflectionflow_tpu.cli.common import setup_compilation_cache
    from reflectionflow_tpu.config import TTSConfig

    cfg = TTSConfig()
    prev = jax.config.jax_compilation_cache_dir
    try:
        cfg.pipeline_args.compilation_cache = str(tmp_path / "from_cfg")
        setup_compilation_cache(cfg, types.SimpleNamespace(compilation_cache=None))
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "from_cfg")
        # CLI wins over config
        setup_compilation_cache(
            cfg, types.SimpleNamespace(compilation_cache=str(tmp_path / "from_cli")))
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "from_cli")
        assert jax.config.jax_persistent_cache_min_compile_time_secs == 10.0
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_phase_swap_refined_prompt_advice(tmp_path, capsys):
    """A prompt-rewriting loop on the phase-swap profile gets the measured
    profile recommendation (BENCH_NOTES reflection_round_profiles_v5e);
    fixed-prompt loops and the co-resident profile stay silent."""
    import json as _json
    from argparse import Namespace

    from reflectionflow_tpu.cli.common import load_config, load_pipeline

    def args_for(cfg_path):
        return Namespace(
            pipeline_config_path=str(cfg_path), output_dir=None, synthetic_weights=True,
            attn_impl=None, quantize="int8", phase_swap=False, act_quant_exclude=[],
        )

    def cfg_with(pipeline_overrides, name):
        p = tmp_path / f"{name}.json"
        write_tiny_config(p)
        raw = _json.loads(p.read_text())
        raw["pipeline_args"].update(pipeline_overrides)
        p.write_text(_json.dumps(raw))
        return p

    # phase-swap W8A8 + per-round prompt rewrites -> loud recommendation
    load_pipeline(load_config(args_for(cfg_with({}, "swap"))), args_for("x"),
                  rewrites_prompts=True)
    assert "int8_int4mlp" in capsys.readouterr().err
    # same profile, fixed prompts -> silent
    load_pipeline(load_config(args_for(cfg_with({}, "swap2"))), args_for("x"))
    assert "int8_int4mlp" not in capsys.readouterr().err
    # co-resident profile, rewritten prompts -> silent (no swap to warn about)
    load_pipeline(
        load_config(args_for(cfg_with({"dit_quant": "int8_int4mlp"}, "co"))),
        args_for("x"), rewrites_prompts=True,
    )
    assert "int8_int4mlp" not in capsys.readouterr().err
