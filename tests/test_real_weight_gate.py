"""The weights-day turn-key path, hermetically: a tiny HF-layout snapshot
on disk drives `FluxPipeline.from_pretrained` and the whole
`tools/parity_real_weights.py` gate chain (convert -> goldens -> seeded
image hash -> qwen -> GenEval plan) exactly as the real command will.
"""

import json
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tools"))


@pytest.fixture(scope="module")
def snapshot(tmp_path_factory):
    from snapshot_fixture import write_tiny_flux_snapshot

    root = tmp_path_factory.mktemp("flux_snap")
    cfgs = write_tiny_flux_snapshot(str(root))
    return str(root), cfgs


def test_from_pretrained_loads_snapshot(snapshot):
    import jax.numpy as jnp

    from reflectionflow_tpu.sampler.pipeline import FluxPipeline

    root, (dit_cfg, vae_cfg, t5_cfg, clip_cfg) = snapshot
    pipe = FluxPipeline.from_pretrained(root, dtype=jnp.float32)
    assert pipe.dit_cfg == dit_cfg
    assert pipe.vae_cfg == vae_cfg
    assert pipe.t5_cfg.d_model == t5_cfg.d_model
    assert pipe.clip_cfg.hidden_size == clip_cfg.hidden_size
    imgs = pipe.generate(["a red cube"], height=16, width=16,
                         num_inference_steps=2, seed=0)
    assert imgs.shape == (1, 16, 16, 3) and imgs.dtype == np.uint8


def test_parity_gate_chain_on_snapshot(snapshot, tmp_path):
    """The exact command for weights day, on the tiny snapshot: convert
    PASSes, goldens SKIPs (no dumps, no diffusers), the seeded image stage
    PASSes with a reproducible hash, qwen SKIPs, the plan prints, report
    lands on disk, exit code 0 (SKIPs are not failures)."""
    import parity_real_weights as gate

    root, _ = snapshot
    out_dir = str(tmp_path / "gate_out")
    rc = gate.main(["--model_dir", root, "--out_dir", out_dir,
                    "--image_size", "16"])
    assert rc == 0
    report = json.load(open(os.path.join(out_dir, "report.json")))
    by = {r["stage"]: r for r in report}
    assert by["convert"]["status"] == "PASS", by["convert"]
    assert by["goldens"]["status"] == "SKIP"
    assert by["image"]["status"] == "PASS", by["image"]
    assert "sha256=" in by["image"]["detail"]
    assert by["qwen"]["status"] == "SKIP"
    # all three serving verifier backends are gate-covered: the NVILA
    # bundle stage is in the chain and SKIPs without NVILA_MODEL_DIR
    assert by["nvila"]["status"] == "SKIP"
    assert "NVILA_MODEL_DIR" in by["nvila"]["detail"]
    assert os.path.exists(os.path.join(out_dir, "seeded_512px.png"))

    # determinism contract: the same command reproduces the same hash
    rc2 = gate.main(["--model_dir", root, "--out_dir", str(tmp_path / "g2"),
                     "--image_size", "16"])
    assert rc2 == 0
    report2 = json.load(open(os.path.join(tmp_path / "g2", "report.json")))
    h1 = by["image"]["detail"].split("sha256=")[1].split()[0]
    h2 = next(r for r in report2 if r["stage"] == "image")["detail"].split("sha256=")[1].split()[0]
    assert h1 == h2


def test_plan_only_is_hermetic(capsys):
    import parity_real_weights as gate

    assert gate.main(["--plan_only"]) == 0
    out = capsys.readouterr().out
    assert "GenEval reproduction plan" in out
    assert "tts_reflectionflow" in out and "verifier_filter" in out
    assert "1 2 4 8 16 32" in out
