"""Corrector training CLI (config #5 of BASELINE.json).

Replaces `accelerate launch -m train.train` + `XFL_CONFIG` env plumbing
(`/root/reference/train_flux/train.sh`, `train/train.py:22-27`) with:
  python -m reflectionflow_tpu.cli.train --config train.yaml \
      [--shards genref_000.tar ...] [--synthetic_data]
Multi-host runs initialize `jax.distributed` automatically when the
JAX coordinator env vars are present; shards split by host.
"""

from __future__ import annotations

import argparse
import glob
import os

import jax
import jax.numpy as jnp

from ..config import TrainConfig
from ..parallel.mesh import make_mesh
from ..train.data import GenRefDataset, StageSchedule, write_synthetic_shard
from ..train.train_loop import train


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--shards", type=str, nargs="*", default=None, help="tar shard paths or globs")
    p.add_argument("--synthetic_data", action="store_true")
    p.add_argument("--synthetic_weights", action="store_true")
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--attn_impl", type=str, default=None,
                   choices=["xla", "pallas", "pallas_interpret"],
                   help="override TrainConfig.attn_impl (pallas = flash fwd+bwd at FLUX scale)")
    args = p.parse_args(argv)

    cfg = TrainConfig.load(args.config) if args.config else TrainConfig()
    if args.synthetic_weights and args.config is None:
        # the tiny synthetic model with the full-scale 512px data defaults
        # allocates hundreds of GB of attention — shrink to smoke sizes
        cfg.data.batch_size = min(cfg.data.batch_size, 2)
        cfg.data.target_size = min(cfg.data.target_size, 16)
        cfg.data.condition_size = min(cfg.data.condition_size, 8)
    if args.max_steps is not None:
        cfg.max_steps = args.max_steps
    if args.attn_impl is not None:
        cfg.attn_impl = args.attn_impl

    from .common import setup_compilation_cache

    setup_compilation_cache()  # $REFLECTIONFLOW_COMPILE_CACHE

    if os.environ.get("COORDINATOR_ADDRESS"):
        jax.distributed.initialize()

    shards = []
    for pat in args.shards or list(cfg.data.shards):
        shards.extend(sorted(glob.glob(pat)) or [pat])
    if args.synthetic_data and not shards:
        path = os.path.join(cfg.checkpoint_dir, "synthetic_000.tar")
        write_synthetic_shard(path, n=16, size=cfg.data.target_size)
        shards = [path]

    schedule = None
    if cfg.data.training_stages:
        stages = [s if isinstance(s, int) else s[0] for s in cfg.data.training_stages]
        ratios = getattr(cfg, "split_ratios", None) or {
            # GenRef defaults (reference config.yaml:25-31)
            "general": [0.1, 0.3], "length": [0.1, 0.3], "rule": [0.1, 0.4], "editing": [0.7, 0.0],
        }
        schedule = StageSchedule(split_ratios=ratios, training_stages=stages)

    ds = GenRefDataset(
        shards=shards,
        batch_size=cfg.data.batch_size,
        target_size=cfg.data.target_size,
        condition_size=cfg.data.condition_size,
        drop_text_prob=cfg.data.drop_text_prob,
        drop_image_prob=cfg.data.drop_image_prob,
        drop_reflection_prob=cfg.data.drop_reflection_prob,
        schedule=schedule,
        seed=cfg.seed,
        host_index=jax.process_index(),
        host_count=jax.process_count(),
    )

    if args.synthetic_weights:
        from ..config import CLIPTextConfig, FluxDiTConfig, FluxVAEConfig, T5Config
        from ..sampler.pipeline import FluxPipeline

        pipe = FluxPipeline.random_init(
            jax.random.PRNGKey(0),
            dit_cfg=FluxDiTConfig.tiny(), vae_cfg=FluxVAEConfig.tiny(),
            t5_cfg=T5Config.tiny(), clip_cfg=CLIPTextConfig.tiny(), dtype=jnp.float32,
        )
    else:
        from ..sampler.pipeline import FluxPipeline

        pipe = FluxPipeline.from_pretrained(os.environ.get("FLUX_MODEL_DIR", "."), dtype=jnp.bfloat16)

    mesh = make_mesh() if len(jax.devices()) > 1 else None
    out = train(pipe, cfg, ds, mesh=mesh)
    print({"final_metrics": out["metrics"]})


if __name__ == "__main__":
    main()
