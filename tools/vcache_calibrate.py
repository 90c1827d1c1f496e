"""Turn-key velocity-cache calibration (VERDICT r3 item 1).

Sweeps skip schedules against the dense trajectory and writes the
selection + evidence to a calibration JSON (default
docs/VCACHE_CALIBRATION.json), which `bench.py --stage e2e_swap_vcache`
and serving configs (`pipeline_args.vcache`) consume.

Modes:
  * hermetic (--synthetic_weights): tiny random pipeline + fake verifier
    on CPU — validates the error-bound math and selection logic (the
    weights_kind="synthetic" tag keeps it out of headline eligibility);
  * real weights: point --model_dir (or $FLUX_MODEL_DIR) at a converted
    FLUX checkpoint and pick --verifier nvila_jax/qwen_rm with
    --verifier_model_path — the day weights exist this one command
    produces the headline-eligible calibration (weights_kind="real").

Usage:
  python tools/vcache_calibrate.py --synthetic_weights [--out PATH]
  python tools/vcache_calibrate.py --model_dir /ckpts/flux --quantize int8 \
      --verifier nvila_jax --verifier_model_path /ckpts/nvila \
      --prompts 8 --eps_score 0.25
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs", "VCACHE_CALIBRATION.json"
)


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--synthetic_weights", action="store_true",
                   help="tiny random pipeline + fake verifier on CPU (harness check)")
    p.add_argument("--synthetic_scale", default="tiny", choices=["tiny", "full"],
                   help="with --synthetic_weights: 'full' builds the FLUX-dev-scale "
                        "W8A8 DiT + int4 T5 on the real chip (serving formats) — "
                        "mechanics + wall-clock at scale, quality still synthetic-tagged")
    p.add_argument("--model_dir", default=os.environ.get("FLUX_MODEL_DIR"))
    p.add_argument("--quantize", default="none", choices=["none", "int8"],
                   help="int8 = the 16 GB single-chip serving profile")
    p.add_argument("--verifier", default="fake",
                   choices=["fake", "nvila_jax", "qwen_rm", "openai", "none"])
    p.add_argument("--verifier_model_path", default=None)
    p.add_argument("--prompts", type=int, default=4,
                   help="number of GenEval prompts to calibrate on")
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--guidance_scale", type=float, default=3.5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--eps_score", type=float, default=0.25,
                   help="max allowed mean-score drop (verifier scale)")
    p.add_argument("--max_latent_rel_err", type=float, default=0.35)
    p.add_argument("--out", default=DEFAULT_OUT)
    return p


def geneval_prompts(n: int) -> list[str]:
    path = os.path.join(os.path.dirname(DEFAULT_OUT), "..", "configs", "geneval_metadata.jsonl")
    prompts = []
    with open(os.path.normpath(path)) as f:
        for line in f:
            prompts.append(json.loads(line)["prompt"])
            if len(prompts) >= n:
                break
    return prompts


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax
    import jax.numpy as jnp

    if args.synthetic_weights and args.quantize == "none":
        jax.config.update("jax_platforms", "cpu")

    from reflectionflow_tpu.config import (
        CLIPTextConfig, FluxDiTConfig, FluxVAEConfig, T5Config,
    )
    from reflectionflow_tpu.sampler.pipeline import FluxPipeline
    from reflectionflow_tpu.sampler.vcache_calibrate import calibrate, save_calibration
    from reflectionflow_tpu.verifiers import load_verifier

    if args.synthetic_weights and args.synthetic_scale == "full":
        # FLUX-dev-scale serving formats on the real chip (the serve_smoke
        # swap profile: W8A8 DiT ~11.9 GB + NF4 T5, pallas flash attention)
        import bench
        from reflectionflow_tpu.models.flux.text import clip_text_init
        from reflectionflow_tpu.models.flux.vae import vae_init
        from reflectionflow_tpu.utils.tokenizers import load_tokenizer

        dit_cfg, vae_cfg, t5_cfg, clip_cfg = (
            FluxDiTConfig(), FluxVAEConfig(), T5Config(), CLIPTextConfig())
        params = {
            "dit": bench.init_int8_on_device(dit_cfg),
            "t5": bench.init_int4_t5(t5_cfg),
            "clip": clip_text_init(jax.random.PRNGKey(3), clip_cfg, jnp.bfloat16),
            "vae": vae_init(jax.random.PRNGKey(4), vae_cfg, jnp.bfloat16),
        }
        pipe = FluxPipeline(
            dit_cfg=dit_cfg, vae_cfg=vae_cfg, t5_cfg=t5_cfg, clip_cfg=clip_cfg,
            params=params,
            t5_tokenizer=load_tokenizer(None, "t5", t5_cfg.vocab_size, 1),
            clip_tokenizer=load_tokenizer(
                None, "clip", clip_cfg.vocab_size, clip_cfg.eos_token_id),
            dtype=jnp.bfloat16, attn_impl="pallas", rope_layout="split",
        )
        # the one encode happens up front; offload the 2.4 GB NF4 T5 after
        # it so the sweep's denoises + per-image decodes have headroom
        pipe.enable_phase_swap(offload=("t5",))
        height = args.height or 1024
        width = args.width or 1024
        steps = args.steps or 30
        weights_kind = "synthetic"
    elif args.synthetic_weights:
        pipe = FluxPipeline.random_init(
            jax.random.PRNGKey(args.seed),
            dit_cfg=FluxDiTConfig.tiny(), vae_cfg=FluxVAEConfig.tiny(),
            t5_cfg=T5Config.tiny(), clip_cfg=CLIPTextConfig.tiny(), dtype=jnp.float32,
        )
        height = args.height or 16
        width = args.width or 16
        steps = args.steps or 8
        weights_kind = "synthetic"
    else:
        if not args.model_dir:
            raise SystemExit("--model_dir (or $FLUX_MODEL_DIR) required without --synthetic_weights")
        pipe = FluxPipeline.from_pretrained(args.model_dir)
        if args.quantize == "int8":
            pipe = pipe.quantize("int8")
        pipe = pipe.to_device()
        height = args.height or 1024
        width = args.width or 1024
        steps = args.steps or 30
        weights_kind = "real"

    verifier = None
    verifier_name = None
    if args.verifier != "none":
        kw = {}
        if args.verifier_model_path:
            kw["model_path"] = args.verifier_model_path
        verifier = load_verifier(args.verifier, **kw)
        verifier_name = args.verifier

    prompts = geneval_prompts(args.prompts)
    result = calibrate(
        pipe, prompts, verifier=verifier, height=height, width=width,
        num_steps=steps, guidance_scale=args.guidance_scale, seed=args.seed,
        eps_score=args.eps_score, max_latent_rel_err=args.max_latent_rel_err,
    )
    save_calibration(args.out, result, weights_kind, verifier_name)
    print(json.dumps({"selected": result["selected"],
                      "selected_vcache": result["selected_vcache"],
                      "weights_kind": weights_kind,
                      "results": result["results"], "out": args.out}))
    return result


if __name__ == "__main__":
    main()
