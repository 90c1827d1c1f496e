"""Shared CLI plumbing for the tts_* entry points.

Flag surface mirrors `/root/reference/tts/utils.py:24-67`
(--pipeline_config_path / --start_index / --end_index / --imgpath /
--output_dir / --meta_path) plus TPU-framework extras (--synthetic_weights
for hermetic smoke runs, --seed, --mesh).
"""

from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp

from ..config import TTSConfig
from ..reflect import load_reflector, load_refiner
from ..sampler.pipeline import FluxPipeline
from ..verifiers import load_verifier


def build_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--pipeline_config_path", type=str, required=True)
    p.add_argument("--start_index", type=int, default=0)
    p.add_argument("--end_index", type=int, default=-1)
    p.add_argument("--imgpath", type=str, default="")
    p.add_argument("--output_dir", type=str, default=None)
    p.add_argument("--meta_path", type=str, default="meta.jsonl", help="GenEval-style prompt metadata jsonl")
    p.add_argument("--prompt", type=str, default=None, help="single prompt override (skips meta_path)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--synthetic_weights", action="store_true", help="random tiny weights (smoke runs, no model files)")
    p.add_argument(
        "--attn_impl", type=str, default=None,
        choices=["xla", "pallas", "pallas_interpret", "pallas_nr", "pallas_nr_interpret",
                 "pallas_int8", "pallas_int8_interpret"],
        help="unset -> the config's pipeline_args.attn_impl (default xla); "
        "an explicit value always overrides the config",
    )
    p.add_argument(
        "--quantize", type=str, default=None, choices=["none", "int8"],
        help="int8 (W8A8) DiT + int4 T5 quantization; implies --phase_swap "
        "(the single-chip 16 GB profile keeps text encoders host-side between "
        "encode phases). 'none' disables quantization even if the config sets it; "
        "unset -> the config's pipeline_args.quantize",
    )
    p.add_argument(
        "--phase_swap", action="store_true",
        help="offload text encoders between encode phases + cache prompt embeddings",
    )
    p.add_argument(
        "--act_quant_exclude", type=str, nargs="*", default=[],
        help="path substrings kept int8 weight-only inside the W8A8 DiT "
        "(quality knob, e.g. '_mod' for the AdaLN modulation projections)",
    )
    p.add_argument(
        "--compilation_cache", type=str, default=None,
        help="persistent XLA compilation cache dir (full-depth TPU compiles "
        "cost 20-60s per signature; restarts reuse them). Unset -> the "
        "config's pipeline_args.compilation_cache or "
        "$REFLECTIONFLOW_COMPILE_CACHE",
    )
    return p


def load_config(args) -> TTSConfig:
    overrides = {}
    if args.output_dir:
        overrides["output_dir"] = args.output_dir
    return TTSConfig.load(args.pipeline_config_path, overrides)


def slice_rows(rows: list, args) -> list:
    """--start_index/--end_index window (end_index < 0 means "to the end")."""
    end = args.end_index if args.end_index >= 0 else len(rows)
    return rows[args.start_index : end]


def load_prompts(args) -> list[dict]:
    if args.prompt is not None:
        return [{"prompt": args.prompt, "tag": None}]
    rows = []
    with open(args.meta_path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return slice_rows(rows, args)


def setup_compilation_cache(cfg: TTSConfig | None = None, args=None) -> None:
    """Persistent XLA compile cache: CLI flag > config > env var. Applied
    before the first compile; only modules worth >=10s of compile time are
    persisted (the denoise/train-step graphs — per-call jits stay out).
    Standalone CLIs (train/score/train_reward) call this with no cfg —
    the $REFLECTIONFLOW_COMPILE_CACHE env var still applies."""
    import os

    cache_dir = (
        getattr(args, "compilation_cache", None)
        or (getattr(cfg.pipeline_args, "compilation_cache", None) if cfg else None)
        or os.environ.get("REFLECTIONFLOW_COMPILE_CACHE")
    )
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def print_throughput(timer, pipe) -> None:
    """SURVEY §5 structured metric: candidate images per second per chip
    (generate-phase wall time; the data mesh axis is the chip count).
    With --parallel_blocks > 1 generate spans from different block threads
    overlap, so the span-sum exceeds wall-clock and this reads as a LOWER
    bound on true throughput."""
    rate = timer.rate("candidates", "generate")
    if rate == rate:  # skip when no generate spans ran (resume no-op)
        n_chips = pipe.mesh.shape["data"] if pipe.mesh is not None else 1
        print(
            f"candidates/sec/chip: {rate / n_chips:.4f} "
            f"({timer.counts['candidates']} candidates, {n_chips} chip(s))"
        )


def load_pipeline(cfg: TTSConfig, args, rewrites_prompts: bool = False) -> FluxPipeline:
    """`rewrites_prompts`: the calling loop re-encodes changed prompts every
    round (prompt refinement and/or reflection suffixes) — used to flag a
    serving profile whose measured round latency collapses under that."""
    setup_compilation_cache(cfg, args)
    if args.synthetic_weights:
        from ..config import CLIPTextConfig, FluxDiTConfig, FluxVAEConfig, T5Config

        pipe = FluxPipeline.random_init(
            jax.random.PRNGKey(0),
            dit_cfg=FluxDiTConfig.tiny(),
            vae_cfg=FluxVAEConfig.tiny(),
            t5_cfg=T5Config.tiny(),
            clip_cfg=CLIPTextConfig.tiny(),
            dtype=jnp.float32,
        )
    else:
        pipe = FluxPipeline.from_pretrained(cfg.pretrained_model_name_or_path, dtype=cfg.pipeline_args.dtype)
    pipe.model_flags = {
        "union_cond_attn": cfg.model.union_cond_attn,
        "add_cond_attn": cfg.model.add_cond_attn,
    }
    # serving profile: an explicitly-given CLI flag always wins; an unset
    # flag (None) falls back to the config. --quantize none turns config
    # quantization OFF (there is no other way to express that on the CLI).
    cli_quant = getattr(args, "quantize", None)
    if cli_quant is None:
        quantize = cfg.pipeline_args.quantize
    else:
        quantize = None if cli_quant == "none" else cli_quant
    attn_impl = args.attn_impl or cfg.pipeline_args.attn_impl or "xla"
    pipe.attn_impl = attn_impl
    pipe.vae_tiling = getattr(cfg.pipeline_args, "vae_tiling", False)
    pipe.vcache = getattr(cfg.pipeline_args, "vcache", None)
    if cfg.pipeline_args.lora_path and not args.synthetic_weights:
        from safetensors.numpy import load_file

        from ..lora.lora import convert_diffusers_lora

        sd = load_file(cfg.pipeline_args.lora_path)
        lora = convert_diffusers_lora(
            sd, pipe.dit_cfg.num_double_blocks, pipe.dit_cfg.num_single_blocks
        )
        from ..lora.lora import make_dit_param_views

        main, cond_view = make_dit_param_views(pipe.params["dit"], lora, latent_lora=False)
        pipe.params["dit"] = main
        pipe.cond_dit_params = cond_view
    dit_mode = getattr(cfg.pipeline_args, "dit_quant", "int8")
    if quantize == "int8":
        t5_mode = getattr(cfg.pipeline_args, "t5_quant", None)
        if t5_mode not in (None, "int4", "int8"):
            raise ValueError(
                f"pipeline_args.t5_quant={t5_mode!r}: expected 'int8' (w8a16, "
                "phase-swap fast encode) or 'int4' (packed NF4, co-residency)"
            )
        if dit_mode not in ("int8", "int8_int4mlp"):
            raise ValueError(
                f"pipeline_args.dit_quant={dit_mode!r}: expected 'int8' (full "
                "W8A8 + phase swap) or 'int8_int4mlp' (NF4 MLP co-residency)"
            )
        int4mlp = dit_mode == "int8_int4mlp"
        if t5_mode is None:
            # profile default: fast w8a16 encode under phase swap; NF4 when
            # everything must co-reside
            t5_mode = "int4" if int4mlp else "int8"
        elif int4mlp and t5_mode == "int8":
            raise ValueError(
                "pipeline_args.t5_quant='int8' cannot combine with "
                "dit_quant='int8_int4mlp': the 4.8 GB w8a16 T5 does not "
                "co-reside with the DiT on 16 GB — use t5_quant='int4' or "
                "leave it unset"
            )
        pipe.quantize(
            act_quant_exclude=tuple(getattr(args, "act_quant_exclude", []) or ()),
            int4=("t5",) if t5_mode == "int4" else (),
            weight_only=("t5",) if t5_mode == "int8" else (),
            dit_int4_mlp=int4mlp,
        )
    elif cli_quant is None and (
        getattr(cfg.pipeline_args, "t5_quant", None)
        or getattr(cfg.pipeline_args, "dit_quant", "int8") != "int8"
    ):
        # t5_quant/dit_quant only take effect under quantize="int8"; a config
        # that sets them while quantization is off is a misconfigured serving
        # profile, not a request for a bf16 run. An explicit `--quantize none`
        # override is the user turning the profile off on purpose — allowed.
        raise ValueError(
            f"pipeline_args sets t5_quant={getattr(cfg.pipeline_args, 't5_quant', None)!r} / "
            f"dit_quant={getattr(cfg.pipeline_args, 'dit_quant', 'int8')!r} but quantization "
            f"is disabled (quantize={quantize!r}) — set pipeline_args.quantize='int8' or "
            "remove the quant fields (use --quantize none to force a bf16 run)"
        )
    # phase swap is implied by the FULL-W8A8 int8 profile: its co-residency
    # (~15 GB + transients) measured-OOMs on a 16 GB v5e (docs/DEPLOYMENT.md).
    # The int8_int4mlp profile co-resides (~12.8 GB) and needs no swap.
    # Enable BEFORE to_device so the T5 tree is never uploaded just to be
    # pulled back to host.
    if getattr(args, "phase_swap", False) or (
        quantize == "int8" and dit_mode != "int8_int4mlp"
    ):
        pipe.enable_phase_swap()
        if rewrites_prompts:
            # measured on one v5e (docs/BENCH_NOTES.json
            # reflection_round_profiles_v5e): refined-prompt rounds under
            # phase swap p50 141.7 s (per-round T5 re-upload) vs 37.1 s
            # co-resident — recommend the profile built for this workload
            print(
                "NOTE: this loop rewrites prompts every round, and the "
                "phase-swap profile re-uploads the T5 encoder each time. "
                "On a SLOW host link (dev tunnel) that upload dominates "
                "(measured p50 141.7 s/round vs 37.1 s co-resident on a "
                "16 GB v5e) — there, set pipeline_args.dit_quant="
                "'int8_int4mlp' (configs/flux.1_dev_qwenscore_v5e_co.json). "
                "On production PCIe the upload is ~0.1-0.3 s and phase-swap "
                "remains the faster profile (~27 s/round vs ~37 s "
                "co-resident; docs/BENCH_NOTES.json "
                "reflection_round_profiles_v5e.recommendation).",
                file=sys.stderr,
            )
    elif quantize == "int8":
        # co-resident profile: no swap, but fixed-prompt loops should still
        # encode each prompt once
        pipe.enable_prompt_cache()
    if not args.synthetic_weights:
        pipe.to_device()
    return pipe


def build_verifier(cfg: TTSConfig):
    va = cfg.verifier_args
    kw = {}
    if va.name == "openai":
        kw = dict(
            verifier_prompt=va.verifier_prompt_relpath,
            refine_prompt=va.refine_prompt_relpath,
            reflexion_prompt=va.reflexion_prompt_relpath,
            max_workers=va.max_workers,
        )
        if va.model_name:
            kw["model_name"] = va.model_name
        if getattr(va, "base_url", None):
            kw["base_url"] = va.base_url
    elif va.name in ("qwen_rm", "image_verifier"):
        kw = dict(model_path=va.model_path)
        if va.cache_dir:
            kw["cache_dir"] = va.cache_dir
        if va.quantize:
            kw["quantize"] = va.quantize
        if va.device_index is not None:
            kw["device_index"] = va.device_index
    elif va.name == "nvila":
        if va.model_name:
            kw["model_name"] = va.model_name
        if va.cache_dir:
            kw["cache_dir"] = va.cache_dir
    elif va.name == "nvila_jax":
        kw = dict(model_path=va.model_path)
        if va.quantize:
            kw["quantize"] = va.quantize
        if va.device_index is not None:
            kw["device_index"] = va.device_index
    return load_verifier(va.name, **kw)


def build_reflector(cfg: TTSConfig):
    ra = cfg.reflection_args
    if not ra.run_reflection:
        return None
    if ra.backend == "openai":
        kw = {"max_retries": ra.max_retries, "retry_delay_s": ra.retry_delay_s}
        if ra.base_url:
            kw["base_url"] = ra.base_url
        if ra.model_name:
            kw["model_name"] = ra.model_name
        return load_reflector("openai", **kw)
    if ra.backend == "local_qwen":
        from ..models.qwen_vl import load_generator

        return load_reflector(
            "local_qwen",
            model=load_generator(
                ra.model_path or cfg.verifier_args.model_path, quantize=ra.quantize,
                device_index=ra.device_index,
            ),
            template=ra.template,
            system=ra.system_prompt,
        )
    return load_reflector("fake")


def build_refiner(cfg: TTSConfig):
    pr = cfg.prompt_refiner_args
    if not pr.run_refinement:
        return None
    if pr.backend == "openai":
        kw = {}
        if pr.base_url:
            kw["base_url"] = pr.base_url
        if pr.model_name:
            kw["model_name"] = pr.model_name
        return load_refiner("openai", **kw)
    return load_refiner("fake")
