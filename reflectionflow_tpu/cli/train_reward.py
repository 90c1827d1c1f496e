"""Image-Verifier (reward model) training CLI.

The driver the reference ships as `reward_modeling/train_reward.py:162-294`:
args -> GSB comparison dataset -> pairwise A/B train loop -> periodic +
final checkpoints reconstructable by the inference wrapper. Flag names
mirror the reference's HfArgumentParser dataclasses (DataConfig /
TrainingConfig / ModelConfig / PEFTLoraConfig); the checkpoint layout is
`rm_train.train.save_rm_checkpoint`'s `model_config.json` +
`rm_head.safetensors` + `rm_lora.safetensors`, consumed directly by
`verifiers.qwen_verifier.QwenRewardVerifier`.

TPU-native differences: the step is one jitted pure function over the
trainable {lora, rm_head, special} tree; per-group learning rates via
optax.multi_transform; eval = pairwise accuracy on a held-out slice
(semantics of `compute_multi_attr_accuracy`, trainer.py:602-641).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    # DataConfig
    p.add_argument("--meta_data", type=str, required=True, help="GSB csv or jsonl of comparison rows")
    p.add_argument("--data_dir", type=str, default="", help="image root prefix")
    p.add_argument("--max_pixels", type=int, default=448 * 448)
    p.add_argument("--use_tied_data", action="store_true", default=True)
    p.add_argument("--no_tied_data", dest="use_tied_data", action="store_false")
    # ModelConfig
    p.add_argument("--model_name_or_path", type=str, default=None)
    p.add_argument("--output_dim", type=int, default=1)
    p.add_argument("--reward_token", type=str, default="special", choices=["last", "mean", "special"])
    p.add_argument("--use_special_tokens", action="store_true", default=True)
    p.add_argument("--loss_type", type=str, default="btt",
                   choices=["bt", "reg", "btt", "margin", "constant_margin", "scaled"])
    # PEFTLoraConfig
    p.add_argument("--lora_r", type=int, default=16)
    p.add_argument("--lora_alpha", type=float, default=32.0)
    p.add_argument("--quantize_base", type=str, default=None, choices=["int8", "nf4"],
                   help="store the frozen base blocks quantized (weight-only, "
                        "dequant-in-matmul — the reference's bitsandbytes "
                        "load_in_8bit/nf4 path, train_reward.py:69-139); "
                        "fits a 7B RM LoRA step on one 16 GB chip")
    p.add_argument("--vision_lora", action="store_true",
                   help="also LoRA the vision tower (reference train_reward.py:43-63; "
                        "trains on raw patches at one fixed square grid per run)")
    # TrainingConfig
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--learning_rate", type=float, default=1e-5)
    p.add_argument("--special_token_lr", type=float, default=None)
    p.add_argument("--head_lr", type=float, default=None)
    p.add_argument("--vision_lr", type=float, default=None,
                   help="LR for the vision-tower adapters (trainer.py:335-336)")
    p.add_argument("--merger_lr", type=float, default=None,
                   help="LR for the patch-merger adapters (trainer.py:338-339)")
    p.add_argument("--fsdp_devices", type=int, default=0,
                   help=">0: shard the frozen base over an N-device 'data' mesh "
                        "(FSDP-style) with the pair batch on the same axis")
    p.add_argument("--num_train_epochs", type=float, default=1.0)
    p.add_argument("--per_device_train_batch_size", type=int, default=2)
    p.add_argument("--save_epochs", type=float, default=1.0)
    p.add_argument("--conduct_eval", action="store_true", default=True)
    p.add_argument("--eval_fraction", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume_from", type=str, default=None,
                   help="checkpoint dir (checkpoint-N/final_model) to resume weights + optimizer from")
    p.add_argument("--synthetic_weights", action="store_true",
                   help="tiny random base model (hermetic smoke runs)")
    return p


def load_rows(meta_data: str, data_dir: str) -> list[dict]:
    from ..rm_train.data import convert_gsb_csv
    from ..utils.jsonl import read_jsonl

    if meta_data.endswith(".csv"):
        return convert_gsb_csv(meta_data, data_dir)
    rows = read_jsonl(meta_data) if meta_data.endswith(".jsonl") else json.load(open(meta_data))
    for r in rows:
        for side in ("image_A", "image_B"):
            if data_dir and isinstance(r.get(side), str):
                r[side] = os.path.join(data_dir, r[side])
    return rows


def pairwise_accuracy(rw_A: np.ndarray, rw_B: np.ndarray, labels: np.ndarray) -> float:
    """Fraction of untied pairs ranked consistently with the GSB label."""
    untied = np.abs(labels) == 1
    if not untied.any():
        return float("nan")
    pred_a_better = (rw_A > rw_B)[untied]
    return float(np.mean(pred_a_better == (labels[untied] == 1)))


def main(argv=None):
    args = build_parser().parse_args(argv)

    from .common import setup_compilation_cache

    setup_compilation_cache()  # $REFLECTIONFLOW_COMPILE_CACHE

    import jax
    import jax.numpy as jnp

    from ..models.qwen_vl.model import QwenVLModel
    from ..rm_train.data import collate_rm_batch, vision_train_geometry
    from ..rm_train.train import (
        make_rm_optimizer, make_rm_train_step, rm_lora_init, rm_vision_lora_init,
        save_rm_checkpoint,
    )
    from ..utils.jsonl import append_jsonl

    rng = np.random.default_rng(args.seed)
    tokenizer = None
    if args.synthetic_weights:
        model = QwenVLModel.random_init(jax.random.PRNGKey(args.seed), dtype=jnp.float32)
    else:
        from ..utils.hf_loader import load_qwen_vl

        model, tokenizer = load_qwen_vl(args.model_name_or_path)

    rows = load_rows(args.meta_data, args.data_dir)
    if not args.use_tied_data:
        rows = [r for r in rows if r.get("gsb", "S") in ("G", "B") or r.get("chosen_label") in (1, -1)]
    order = rng.permutation(len(rows))
    n_eval = int(len(rows) * args.eval_fraction) if args.conduct_eval else 0
    eval_rows = [rows[i] for i in order[:n_eval]]
    train_rows = [rows[i] for i in order[n_eval:]]
    if not train_rows:
        raise SystemExit("no training rows after split")

    if args.resume_from:
        # the checkpoint's LoRA geometry wins — a mismatched alpha/r would
        # silently rescale the adapter contribution
        with open(os.path.join(args.resume_from, "model_config.json")) as f:
            ck = json.load(f)
        if (ck.get("lora_r"), ck.get("lora_alpha")) != (args.lora_r, args.lora_alpha):
            print(f"resume: overriding lora_r/alpha {args.lora_r}/{args.lora_alpha} "
                  f"-> checkpoint {ck['lora_r']}/{ck['lora_alpha']}")
            args.lora_r = int(ck["lora_r"])
            args.lora_alpha = float(ck["lora_alpha"])

    H = model.lm_cfg.hidden_size
    special_token_id = model.lm_cfg.vocab_size - 1 if args.use_special_tokens else None
    pooling = args.reward_token if args.reward_token != "special" or special_token_id is not None else "last"
    key = jax.random.PRNGKey(args.seed)
    trainable = {
        "lora": rm_lora_init(key, model.lm_params, r=args.lora_r, alpha=args.lora_alpha)["adapters"],
        "rm_head": jax.random.normal(jax.random.fold_in(key, 1), (H, args.output_dim)) * 0.02,
        "special": jax.random.normal(jax.random.fold_in(key, 2), (H,)) * 0.02,
    }
    if args.vision_lora:
        trainable["vision_lora"] = rm_vision_lora_init(
            jax.random.fold_in(key, 3), model.vision_params,
            r=args.lora_r, alpha=args.lora_alpha,
        )["adapters"]
    optimizer = make_rm_optimizer(
        lr=args.learning_rate, head_lr=args.head_lr, special_lr=args.special_token_lr,
        vision_lr=args.vision_lr, merger_lr=args.merger_lr,
    )
    opt_state = optimizer.init(trainable)
    start_step = 0
    if args.resume_from:
        import re

        from ..rm_train.train import load_rm_checkpoint, load_rm_opt_state

        resumed, _cfg = load_rm_checkpoint(args.resume_from)
        trainable = jax.tree.map(jnp.asarray, {**trainable, **resumed})
        opt_state = load_rm_opt_state(args.resume_from, opt_state)
        m = re.search(r"checkpoint-(\d+)", args.resume_from)
        start_step = int(m.group(1)) if m else 0
        # continue the data stream, don't replay it: fold the resume point
        # into the permutation stream so early batches are not re-trained
        rng = np.random.default_rng(args.seed + start_step)
        print(f"resumed from {args.resume_from} at step {start_step}")
    mesh = None
    if args.fsdp_devices > 0:
        from jax.sharding import Mesh

        devices = jax.devices()
        if len(devices) < args.fsdp_devices:
            raise SystemExit(
                f"--fsdp_devices {args.fsdp_devices} but only {len(devices)} devices visible"
            )
        mesh = Mesh(np.asarray(devices[: args.fsdp_devices]), ("data",))
    grid_thw = vision_train_geometry(model.vis_cfg, args.max_pixels)[1] if args.vision_lora else None
    step_fn = make_rm_train_step(
        model.lm_params, model.lm_cfg, optimizer,
        loss_type=args.loss_type, pooling=pooling,
        special_token_id=special_token_id, alpha=args.lora_alpha, r=args.lora_r,
        vision_params=model.vision_params if args.vision_lora else None,
        vis_cfg=model.vis_cfg if args.vision_lora else None,
        grid_thw=grid_thw, mesh=mesh, quantize_base=args.quantize_base,
    )

    os.makedirs(args.output_dir, exist_ok=True)
    metrics_path = os.path.join(args.output_dir, "metrics.jsonl")
    bs = args.per_device_train_batch_size
    steps_per_epoch = max(1, len(train_rows) // bs)
    total_steps = max(1, int(args.num_train_epochs * steps_per_epoch))
    save_every = max(1, int(args.save_epochs * steps_per_epoch))

    def collate(rows_chunk):
        return collate_rm_batch(
            model, rows_chunk, tokenizer=tokenizer,
            max_pixels=args.max_pixels, special_token_id=special_token_id,
            train_vision=args.vision_lora,
        )

    all_rewards: list[float] = []
    # resume FINISHES the original schedule (HF Trainer semantics): steps
    # already done count toward total_steps
    step = start_step
    t0 = time.time()
    while step < total_steps:
        epoch_order = rng.permutation(len(train_rows))
        for b0 in range(0, steps_per_epoch * bs, bs):
            if step >= total_steps:
                break
            chunk = [train_rows[i] for i in epoch_order[b0 : b0 + bs]]
            batch = collate(chunk)
            trainable, opt_state, aux = step_fn(trainable, opt_state, batch)
            step += 1
            all_rewards.extend(np.asarray(aux["rewards_A"]).ravel().tolist())
            all_rewards.extend(np.asarray(aux["rewards_B"]).ravel().tolist())
            rec = {"step": step, "loss": float(aux["loss"]), "elapsed_s": round(time.time() - t0, 2)}
            append_jsonl(metrics_path, rec)
            print(f"step {step}/{total_steps} loss={rec['loss']:.4f}")
            if step % save_every == 0 or step == total_steps:
                from ..rm_train.train import save_rm_opt_state

                ckpt = os.path.join(args.output_dir, f"checkpoint-{step}")
                save_rm_checkpoint(
                    ckpt, trainable, pooling, special_token_id,
                    lora_alpha=args.lora_alpha, lora_r=args.lora_r,
                )
                save_rm_opt_state(ckpt, opt_state)

    # eval: pairwise accuracy on the held-out slice (trainer.py:602-641)
    eval_acc = None
    if eval_rows:
        accs = []
        for b0 in range(0, len(eval_rows), bs):
            chunk = eval_rows[b0 : b0 + bs]
            batch = collate(chunk)
            from ..rm_train.train import apply_vision_lora_embeds, rm_forward_rewards

            kw = dict(pooling=pooling, special_token_id=special_token_id,
                      alpha=args.lora_alpha, r=args.lora_r)
            emb = {}
            for side in ("A", "B"):
                emb[side] = batch[f"embeds_{side}"]
                if args.vision_lora:
                    emb[side] = apply_vision_lora_embeds(
                        trainable, model.vision_params, model.vis_cfg, emb[side],
                        batch[f"patches_{side}"], grid_thw,
                        args.lora_alpha, args.lora_r,
                    )
            rw_A = rm_forward_rewards(trainable, model.lm_params, model.lm_cfg,
                                      emb["A"], batch["pos_A"], batch["mask_A"],
                                      batch["ids_A"], **kw)
            rw_B = rm_forward_rewards(trainable, model.lm_params, model.lm_cfg,
                                      emb["B"], batch["pos_B"], batch["mask_B"],
                                      batch["ids_B"], **kw)
            acc = pairwise_accuracy(
                np.asarray(rw_A)[:, 0], np.asarray(rw_B)[:, 0], np.asarray(batch["chosen_label"])[:, 0]
            )
            if not np.isnan(acc):
                accs.append(acc)
        eval_acc = float(np.mean(accs)) if accs else None
        append_jsonl(metrics_path, {"eval_pairwise_accuracy": eval_acc})
        print(f"eval pairwise accuracy: {eval_acc}")

    # final_model with VQ z-norm stats over the training rewards — the
    # inference-side normalization contract (test_reward.py:74-79)
    vq_mean = float(np.mean(all_rewards)) if all_rewards else 0.0
    vq_std = float(np.std(all_rewards) + 1e-6) if all_rewards else 1.0
    final = os.path.join(args.output_dir, "final_model")
    save_rm_checkpoint(
        final, trainable, pooling, special_token_id,
        vq_mean=vq_mean, vq_std=vq_std, lora_alpha=args.lora_alpha, lora_r=args.lora_r,
    )
    print(f"saved {final} (VQ_mean={vq_mean:.4f}, VQ_std={vq_std:.4f})")
    return final


if __name__ == "__main__":
    main()
