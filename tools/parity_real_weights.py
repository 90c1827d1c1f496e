"""Turn-key real-weight validation gate (VERDICT r3 item 5).

The day FLUX / Qwen checkpoints land, ONE command chains everything that
until then stays skipped:

  FLUX_MODEL_DIR=/ckpts/flux [QWEN_MODEL_DIR=/ckpts/qwen-verifier] \
      python tools/parity_real_weights.py

Stages (each prints PASS / FAIL / SKIP(reason) and the chain continues so
one report covers the lot; exit code is nonzero if anything FAILS):

  1. convert   — load + convert every FLUX component through
                 utils/hf_convert (shape-validated against the configs);
  2. goldens   — dump reference activations with diffusers if available
                 (tools/dump_goldens.py), then run the golden parity tests
                 (tests/test_goldens.py) — the activation-level gate of
                 SURVEY.md §7.3 item 1;
  3. image     — seeded injected-latents 512px generation; prints the
                 image SHA256 (the determinism contract: same latents ->
                 same image, reference latent layout at
                 /root/reference/tts/utils.py:71-87) and saves the PNG;
  4. qwen      — convert + load the Image-Verifier if QWEN_MODEL_DIR is
                 set (first-logits finite-ness; full parity lives in
                 tests/test_qwen_parity.py against transformers);
  5. nvila     — convert + load the NVILA-Lite-2B verifier bundle if
                 NVILA_MODEL_DIR is set (a VILA dir: llm/ + vision_tower/
                 + mm_projector/ — the bundle the reference loads at
                 /root/reference/tts/verifiers/nvila_verifier.py:4-10);
                 scores one dummy image through the full SigLIP->proj->LM
                 graph and checks yes/no logits are finite, so ALL THREE
                 serving verifier backends are gate-covered;
  6. plan      — prints the GenEval reproduction plan: the 553-prompt
                 runs for BASELINE configs #1-#4 and the NFE curve points
                 {1,2,4,8,16,32} via cli.verifier_filter.

`--plan_only` prints stage 5 without weights (hermetic; used by tests).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _report(results: list[tuple[str, str, str]]) -> int:
    print("\n=== real-weight gate report ===")
    rc = 0
    for stage, status, detail in results:
        print(f"{stage:10s} {status:6s} {detail}")
        if status == "FAIL":
            rc = 1
    return rc


def stage_convert(model_dir: str) -> tuple[str, str]:
    import jax.numpy as jnp

    from reflectionflow_tpu.sampler.pipeline import FluxPipeline

    pipe = FluxPipeline.from_pretrained(model_dir, dtype=jnp.bfloat16)
    import jax

    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(pipe.params))
    return "PASS", f"all components converted ({n_params/1e9:.2f}B params)"


def stage_goldens(model_dir: str) -> tuple[str, str]:
    goldens = os.path.join(REPO, "tests", "goldens")
    have = os.path.isdir(goldens) and any(f.endswith(".npz") for f in os.listdir(goldens))
    if not have:
        try:
            import diffusers  # noqa: F401
        except ImportError:
            return "SKIP", ("no tests/goldens/*.npz and diffusers not importable here — "
                            "run tools/dump_goldens.py in a diffusers env, then re-run")
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "dump_goldens.py"),
             "--model_dir", model_dir, "--out", goldens],
            capture_output=True, text=True, timeout=3600,
        )
        if proc.returncode != 0:
            return "FAIL", f"dump_goldens failed: {proc.stderr[-500:]}"
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_goldens.py", "-q", "--no-header"],
        capture_output=True, text=True, timeout=3600, cwd=REPO,
        env=dict(os.environ, FLUX_MODEL_DIR=model_dir),
    )
    tail = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
    if proc.returncode != 0:
        return "FAIL", f"golden parity: {tail}"
    if "skipped" in tail and "passed" not in tail:
        return "SKIP", f"golden parity still skipped: {tail}"
    return "PASS", f"golden parity: {tail}"


def stage_image(model_dir: str, out_dir: str, size: int = 512) -> tuple[str, str]:
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from reflectionflow_tpu.models.flux.latents import draw_packed_noise
    from reflectionflow_tpu.sampler.pipeline import FluxPipeline

    pipe = FluxPipeline.from_pretrained(model_dir, dtype=jnp.bfloat16)
    # 16 GB chips need the int8 serving profile for the full DiT; CPU/big
    # devices can run bf16 — quantize only when the chip is small
    dev = jax.devices()[0]
    hbm = getattr(dev, "memory_stats", lambda: None)()
    if dev.platform == "tpu" and (hbm or {}).get("bytes_limit", 1 << 62) < 32 << 30:
        pipe = pipe.quantize()  # W8A8 DiT + NF4 T5 — the 16 GB serving profile
    pipe = pipe.to_device()
    latents = draw_packed_noise(jax.random.PRNGKey(0), 1, size, size,
                                pipe.vae_cfg.latent_channels, pipe.dtype,
                                vae_downscale=pipe.vae_cfg.downscale)
    steps = 30 if size >= 256 else 2
    img = pipe.generate(
        ["a photo of a red cube on a white table"], height=size, width=size,
        num_inference_steps=steps, guidance_scale=3.5, latents=latents,
    )[0]
    digest = hashlib.sha256(np.ascontiguousarray(img).tobytes()).hexdigest()
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "seeded_512px.png")
    Image.fromarray(img).save(path)
    return "PASS", f"sha256={digest} saved={path} (same latents must reproduce this)"


def stage_qwen(qwen_dir: str | None) -> tuple[str, str]:
    if not qwen_dir:
        return "SKIP", "QWEN_MODEL_DIR not set"
    from reflectionflow_tpu.utils.hf_loader import load_qwen_vl

    model, _tok = load_qwen_vl(qwen_dir)
    img = np.zeros((56, 56, 3), np.uint8)
    ids = np.asarray(
        [model.tokens.vision_start]
        + [model.tokens.image_pad] * ((56 // model.vis_cfg.patch_size) ** 2
                                      // model.vis_cfg.spatial_merge_size ** 2)
        + [model.tokens.vision_end, 100, 101], np.int64,
    )
    logits = np.asarray(model.forward_logits(ids, [img]))
    if not np.isfinite(logits).all():
        return "FAIL", "non-finite logits from the converted Image-Verifier base"
    return "PASS", f"Qwen2.5-VL converted; first-logits finite (shape {logits.shape})"


def stage_nvila(nvila_dir: str | None) -> tuple[str, str]:
    if not nvila_dir:
        return "SKIP", "NVILA_MODEL_DIR not set"
    from reflectionflow_tpu.verifiers.nvila import NvilaJaxVerifier

    v = NvilaJaxVerifier(model_path=nvila_dir)
    img = np.zeros((384, 384, 3), np.uint8)
    out = v.score([img], ["a red cube on a white table"])
    score = out[0]["score"]
    if not np.isfinite(score):
        return "FAIL", "non-finite yes/no logit from the converted NVILA bundle"
    return "PASS", (f"NVILA bundle converted; {out[0]['label']!r} logit finite "
                    f"({score:.3f}) through SigLIP->projector->LM")


def print_plan() -> None:
    print("""
=== GenEval reproduction plan (BASELINE.md curves) ===
Budget: branch=2 x rounds=16 = 32 NFE over the 553 GenEval prompts;
curve points at NFE in {1,2,4,8,16,32} (reference teaser.jpg curves:
0.67 baseline -> ~0.85 noise / ~0.87 +prompt / ~0.91 full reflection).

1. noise scaling (config #1, expect ~0.85 @32):
   python -m reflectionflow_tpu.cli.tts_t2i_noise_scaling \\
     --pipeline_config_path configs/flux.1_dev_gptscore.json \\
     --meta_path configs/geneval_metadata.jsonl --output_dir out/noise
2. NFE curve points (post-hoc NVILA filter):
   python -m reflectionflow_tpu.cli.verifier_filter \\
     --imgpath out/noise --nfes 1 2 4 8 16 32
3. + prompt scaling (config #3, expect ~0.87 @32):
   python -m reflectionflow_tpu.cli.tts_t2i_noise_prompt_scaling \\
     --pipeline_config_path configs/flux.1_dev_gptscore.json \\
     --meta_path configs/geneval_metadata.jsonl --output_dir out/prompt
4. full ReflectionFlow (config #4, expect ~0.91 @32):
   python -m reflectionflow_tpu.cli.tts_reflectionflow \\
     --pipeline_config_path configs/flux.1_dev_gptscore.json \\
     --meta_path configs/geneval_metadata.jsonl \\
     --imgpath out/noise --output_dir out/reflection
   (corrector LoRA via pipeline_args.lora_path; verifier_args.name one of
    openai / nvila_jax / qwen_rm per configs/*.json presets)
5. score with the official GenEval evaluator over samples_best/ and plot
   best-of-NFE; multi-chip: --prompt_block N shards candidates over the
   mesh data axis (docs/DEPLOYMENT.md).
""")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_dir", default=os.environ.get("FLUX_MODEL_DIR"))
    p.add_argument("--qwen_dir", default=os.environ.get("QWEN_MODEL_DIR"))
    p.add_argument("--nvila_dir", default=os.environ.get("NVILA_MODEL_DIR"))
    p.add_argument("--out_dir", default=os.path.join(REPO, "output", "real_weight_gate"))
    p.add_argument("--image_size", type=int, default=512,
                   help="seeded-image stage resolution (tiny snapshots use 16)")
    p.add_argument("--plan_only", action="store_true",
                   help="print the GenEval plan and exit (no weights needed)")
    args = p.parse_args(argv)

    if args.plan_only:
        print_plan()
        return 0
    if not args.model_dir:
        raise SystemExit("set FLUX_MODEL_DIR (or --model_dir); --plan_only works without")

    results = []
    for name, fn in (
        ("convert", lambda: stage_convert(args.model_dir)),
        ("goldens", lambda: stage_goldens(args.model_dir)),
        ("image", lambda: stage_image(args.model_dir, args.out_dir, args.image_size)),
        ("qwen", lambda: stage_qwen(args.qwen_dir)),
        ("nvila", lambda: stage_nvila(args.nvila_dir)),
    ):
        try:
            status, detail = fn()
        except Exception as e:  # keep the chain going; report at the end
            status, detail = "FAIL", f"{type(e).__name__}: {e}"
        print(f"[{name}] {status}: {detail}", file=sys.stderr)
        results.append((name, status, detail))
    print_plan()
    rc = _report(results)
    with open(os.path.join(args.out_dir, "report.json"), "w") as f:
        json.dump([{"stage": s, "status": st, "detail": d} for s, st, d in results], f, indent=1)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
