"""Corrector training loop: pjit data-parallel LoRA rectified-flow tuning.

Capability parity with the Lightning loop
(`/root/reference/train_flux/train/train.py:45-185` + `callbacks.py:17-73`):
streaming GenRef batches, stage-ratio advancement per step, grad-norm
metrics, periodic LoRA checkpoints, resume from the latest checkpoint.

TPU-native: orbax checkpoints (adapters + optimizer state + data step),
metrics as JSONL (wandb-compatible keys), one jitted train step.
"""

from __future__ import annotations

import json
import os
import time

import jax
import numpy as np

from ..config import TrainConfig
from ..lora.lora import lora_init
from ..utils.jsonl import append_jsonl
from .rectified_flow import make_optimizer, make_train_step, prepare_batch_tensors


def save_checkpoint(ckpt_dir: str, step: int, adapters, opt_state) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, str(step)))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"adapters": adapters, "opt_state": opt_state})
    ckptr.wait_until_finished()
    with open(os.path.join(ckpt_dir, "latest"), "w") as f:
        f.write(str(step))


def latest_checkpoint(ckpt_dir: str) -> int | None:
    marker = os.path.join(ckpt_dir, "latest")
    if not os.path.exists(marker):
        return None
    with open(marker) as f:
        return int(f.read().strip())


def restore_checkpoint(ckpt_dir: str, step: int, like) -> dict:
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, str(step)))
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, like)


def train(
    pipeline,
    cfg: TrainConfig,
    dataset,
    mesh=None,
    position_delta: tuple[int, int] | None = None,
    log_path: str | None = None,
    hooks: list | None = None,
) -> dict:
    """Run (or resume) training; returns final {adapters, metrics}."""
    key = jax.random.PRNGKey(cfg.seed)
    k_init, key = jax.random.split(key)
    lora = lora_init(k_init, pipeline.params["dit"], r=cfg.lora.r, alpha=cfg.lora.alpha, init=cfg.lora.init)
    adapters = lora["adapters"]
    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(adapters)

    step_fn = make_train_step(
        pipeline.params["dit"],
        pipeline.dit_cfg,
        optimizer,
        alpha=cfg.lora.alpha,
        r=cfg.lora.r,
        latent_lora=False,
        mesh=mesh,
        attn_impl=cfg.attn_impl,
    )

    start_step = 0
    last = latest_checkpoint(cfg.checkpoint_dir) if os.path.isdir(cfg.checkpoint_dir) else None
    if last is not None:
        restored = restore_checkpoint(cfg.checkpoint_dir, last, {"adapters": adapters, "opt_state": opt_state})
        adapters, opt_state = restored["adapters"], restored["opt_state"]
        start_step = last

    if position_delta is None:
        position_delta = (0, -cfg.data.condition_size // 16)
    log_path = log_path or os.path.join(cfg.checkpoint_dir, "metrics.jsonl")
    os.makedirs(cfg.checkpoint_dir, exist_ok=True)

    data_iter = iter(dataset)
    metrics = {}
    ema_loss = None
    for step in range(start_step, cfg.max_steps):
        if hasattr(dataset, "set_step"):
            dataset.set_step(step)
        t0 = time.perf_counter()
        raw = next(data_iter)
        batch = prepare_batch_tensors(pipeline, raw, position_delta)
        key, k_step = jax.random.split(key)
        adapters, opt_state, metrics = step_fn(adapters, opt_state, batch, k_step)
        metrics = {k: float(v) for k, v in metrics.items()}
        ema_loss = metrics["loss"] if ema_loss is None else 0.95 * ema_loss + 0.05 * metrics["loss"]
        row = dict(metrics, step=step, ema_loss=ema_loss, step_time_s=time.perf_counter() - t0)
        append_jsonl(log_path, row)
        for hook in hooks or []:
            hook(step, adapters, row)
        if (step + 1) % cfg.save_interval == 0 or step + 1 == cfg.max_steps:
            save_checkpoint(cfg.checkpoint_dir, step + 1, adapters, opt_state)
    return {"adapters": adapters, "metrics": metrics}


def export_diffusers_lora(adapters: dict, path: str, alpha: float, num_double: int, num_single: int) -> None:
    """Write a diffusers/peft-compatible FLUX LoRA safetensors file (the
    inverse of `lora.convert_diffusers_lora`) for interop with the
    reference's `load_lora_weights` consumers."""
    from safetensors.numpy import save_file

    from ..lora.lora import _DIFFUSERS_TO_PATH

    path_to_diffusers = {v: k for k, v in _DIFFUSERS_TO_PATH.items()}
    out: dict[str, np.ndarray] = {}
    for p, ab in adapters.items():
        if p.startswith("double_blocks/") or p.startswith("single_blocks/"):
            family, sub = p.split("/", 1)
            hf_family = "transformer_blocks" if family == "double_blocks" else "single_transformer_blocks"
            module = path_to_diffusers[sub]
            A, B = np.asarray(ab["A"]), np.asarray(ab["B"])
            for i in range(A.shape[0]):
                # safetensors writes the raw buffer: transposes must be materialized
                out[f"transformer.{hf_family}.{i}.{module}.lora_A.weight"] = np.ascontiguousarray(A[i].T)
                out[f"transformer.{hf_family}.{i}.{module}.lora_B.weight"] = np.ascontiguousarray(B[i].T)
        else:
            module = path_to_diffusers[p]
            out[f"transformer.{module}.lora_A.weight"] = np.ascontiguousarray(np.asarray(ab["A"]).T)
            out[f"transformer.{module}.lora_B.weight"] = np.ascontiguousarray(np.asarray(ab["B"]).T)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    save_file(out, path)


def make_validation_hook(pipeline, cfg: TrainConfig, val_samples: list[dict], out_dir: str):
    """Periodic validation sampling (capability of `OminiModel.validation_step`,
    /root/reference/train_flux/train/model.py:121-153): every
    `sample_interval` steps, fold the current adapter and run the full
    conditioned generate() on the val conditions, saving images.

    val_samples rows: {"prompt": str, "condition": (H, W, 3) uint8}.
    """
    from ..lora.lora import make_dit_param_views
    from ..sampler.condition import Condition, cot_position_delta
    from ..search.artifacts import save_image

    def hook(step: int, adapters, metrics_row: dict) -> None:
        if (step + 1) % cfg.sample_interval != 0:
            return
        lora = {"_alpha": cfg.lora.alpha, "_r": cfg.lora.r, "adapters": adapters}
        _, cond_view = make_dit_param_views(pipeline.params["dit"], lora, latent_lora=False)
        prev_cond, prev_mesh = pipeline.cond_dit_params, pipeline.mesh
        pipeline.cond_dit_params = cond_view
        pipeline.mesh = None  # validation runs unsharded
        try:
            size = cfg.data.condition_size
            conds = [
                Condition("cot", s["condition"], position_delta=cot_position_delta(size))
                for s in val_samples
            ]
            images = pipeline.generate(
                [s["prompt"] for s in val_samples],
                height=cfg.data.target_size,
                width=cfg.data.target_size,
                num_inference_steps=20,
                conditions=conds,
            )
            for i, img in enumerate(images):
                save_image(os.path.join(out_dir, f"step{step + 1}_{i:02d}.png"), img)
        finally:
            pipeline.cond_dit_params, pipeline.mesh = prev_cond, prev_mesh

    return hook
