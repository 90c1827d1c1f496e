"""Image-Verifier (reward model) LoRA training.

Capability parity with `ImageVLMRewardTrainer` + `train_reward.py`
(`/root/reference/reward_modeling/trainer.py:243-600`,
`train_reward.py:69-294`): pairwise A/B forward through the VL model,
BT-family loss, LoRA on the language model, optional LoRA on the vision
tower (`vision_lora`, train_reward.py:43-63,178-204), trainable `rm_head`
and `<|VQ_reward|>` special-token embedding row, and per-group learning
rates incl. `vision_lr`/`merger_lr` (optax.multi_transform replaces the
reference's optimizer param groups at trainer.py:317-417; freezing all
non-special embedding rows replaces `PartialEmbeddingUpdateCallback`).

The trainable tree is {"lora": adapters, "rm_head": (H, out), "special":
(H,)} plus optional {"vision_lora": adapters} over the tower; the frozen
base (LM blocks, vision tower, embeddings) is passed as jit ARGUMENTS
every call — never closed over (a closure would embed the 7B tree as HLO
constants). Without vision training, vision embeds are precomputed
host-side per pair; with it, the tower runs inside the step on raw
patches. `mesh=` shards the frozen base FSDP-style over "data" (the
ZeRO-3 role of the reference's 8-GPU DDP+DeepSpeed setup,
`reward_modeling/utils.py:94-137`) and the pair batch over the same axis.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import QwenLMConfig
from ..lora.lora import attach_lora, lora_init
from ..models.qwen_vl.lm import qwen_lm_apply
from ..models.qwen_vl.reward import pool_hidden
from .losses import reward_loss

RM_LORA_TARGETS = ("blocks/q/w", "blocks/k/w", "blocks/v/w", "blocks/o/w",
                   "blocks/gate/w", "blocks/up/w", "blocks/down/w")
# the reference's vision_lora targets every Linear under `visual`
# (find_target_linear_names with lora_namespan_exclude=[] —
# train_reward.py:43-63): window-attention qkv/proj, the MLP, and the
# patch-merger projections
RM_VISION_LORA_TARGETS = ("blocks/qkv/w", "blocks/proj/w", "blocks/gate/w",
                          "blocks/up/w", "blocks/down/w",
                          "merger/fc1/w", "merger/fc2/w")


def rm_lora_init(key, lm_params, r: int = 16, alpha: float = 16.0):
    return lora_init(key, lm_params, r=r, alpha=alpha, targets=RM_LORA_TARGETS)


def rm_vision_lora_init(key, vision_params, r: int = 16, alpha: float = 16.0):
    return lora_init(key, vision_params, r=r, alpha=alpha, targets=RM_VISION_LORA_TARGETS)


def apply_vision_lora_embeds(
    trainable: dict,
    vision_params,
    vis_cfg,
    embeds: jnp.ndarray,  # (B, L, H) token embeds (image rows overwritten)
    patches: jnp.ndarray,  # (B, Lp, pd) raw pixel patches, one grid per batch
    grid_thw: tuple[int, int, int],
    alpha: float,
    r: int,
    img_token_start: int = 1,
) -> jnp.ndarray:
    """Run the vision tower with the trainable adapters folded in and write
    its embeds over the image-pad rows. The collator lays sequences out as
    [vision_start, image_pad * n, vision_end, text...] so the image rows
    are a static slice starting at `img_token_start` — a TPU-friendly
    static update instead of a masked scatter."""
    from ..models.qwen_vl.vision import qwen_vision_apply

    # ATTACH, not fold: the low-rank add costs only the rank-r factors per
    # step (folding copies the full tower per step) and composes with a
    # quantized frozen base (there is no float `w` leaf to fold into)
    folded = attach_lora(
        vision_params, {"_alpha": alpha, "_r": r, "adapters": trainable["vision_lora"]}
    )
    vis = jax.vmap(lambda p: qwen_vision_apply(folded, vis_cfg, p, grid_thw, remat=True))(
        patches.astype(embeds.dtype)
    )  # (B, n_img, H)
    n_img = vis.shape[1]
    return embeds.at[:, img_token_start : img_token_start + n_img, :].set(
        vis.astype(embeds.dtype)
    )


def rm_forward_rewards(
    trainable: dict,
    lm_params,
    lm_cfg: QwenLMConfig,
    embeds: jnp.ndarray,  # (B, L, H) precomputed (token+vision) embeds
    position_ids: jnp.ndarray,  # (3, B, L)
    attention_mask: jnp.ndarray,  # (B, L)
    input_ids: jnp.ndarray,  # (B, L) for special-token pooling
    pooling: str,
    special_token_id: int | None,
    alpha: float,
    r: int,
) -> jnp.ndarray:
    """-> (B, out_dim) reward logits."""
    # attach (low-rank add): per-step cost is the rank-r factors only, and
    # the base may be a quantized tree (w_q/w_p4p leaves) — see linear()
    folded = attach_lora(lm_params, {"_alpha": alpha, "_r": r, "adapters": trainable["lora"]})
    if special_token_id is not None:
        is_sp = (input_ids == special_token_id)[:, :, None]
        embeds = jnp.where(is_sp, trainable["special"][None, None, :].astype(embeds.dtype), embeds)
    # remat: under value_and_grad the per-block carry is the only saved
    # residual — without it the dequantized bf16 weights of a quantized
    # base (and every attention intermediate) are saved per block
    hidden, _ = qwen_lm_apply(folded, lm_cfg, embeds, position_ids,
                              attention_mask=attention_mask, return_hidden=True,
                              remat=True)
    pooled = pool_hidden(hidden, attention_mask, pooling, input_ids=input_ids,
                         special_token_id=special_token_id)
    return pooled @ trainable["rm_head"].astype(pooled.dtype)


def quantize_rm_base(params, mode: str, min_size: int = 1 << 18):
    """Quantize a frozen RM base tree for LoRA finetuning on a memory-bound
    chip — the analogue of the reference's bitsandbytes-quantized base
    (`/root/reference/reward_modeling/train_reward.py:69-139`,
    `utils.py:16-47`: load_in_8bit / nf4 via BitsAndBytesConfig).

    TRAINING-SAFE recipe: WEIGHT-ONLY quantization of the stacked block
    leaves (int8 rows or NF4 split-plane int4), dequantized inside the
    matmul read — the matmul itself stays float, so d(out)/dx is exact and
    gradients flow through the frozen blocks to upstream adapters and the
    special-token embedding. (The W8A8 serving path's dynamic activation
    rounding has zero gradient — it must never be used under value_and_grad.
    QLoRA trains the same way: quantized storage, float compute —
    arXiv 2305.14314.) Embeddings, norms, and the patch merger stay bf16."""
    from ..ops.quant import quantize_dit_params, quantize_params_int4

    if mode == "int8":
        blocks = quantize_dit_params(
            {"b": params["blocks"]}, min_size=min_size, act_quant=False)["b"]
    elif mode == "nf4":
        blocks = quantize_params_int4(
            {"b": params["blocks"]}, min_size=min_size, layout="plane")["b"]
    else:
        raise ValueError(f"quantize_base must be int8|nf4 (got {mode!r})")
    return dict(params, blocks=blocks)


def make_rm_train_step(
    lm_params,
    lm_cfg: QwenLMConfig,
    optimizer: optax.GradientTransformation,
    loss_type: str = "btt",
    pooling: str = "special",
    special_token_id: int | None = None,
    alpha: float = 16.0,
    r: int = 16,
    vision_params=None,
    vis_cfg=None,
    grid_thw: tuple[int, int, int] | None = None,
    img_token_start: int = 1,
    mesh=None,
    quantize_base: str | None = None,
    quantize_min_size: int = 1 << 18,
):
    """jitted step(trainable, opt_state, batch, ...) over pairwise batches.

    batch: {embeds_A, pos_A, mask_A, ids_A, embeds_B, pos_B, mask_B, ids_B,
            scores_A (B,N), scores_B, chosen_label (B,N)}; with vision
    training also {patches_A, patches_B} (B, Lp, pd) on one shared
    `grid_thw` (the collator's `train_vision` layout).

    `vision_params`/`vis_cfg`/`grid_thw` enable the vision_lora path: the
    tower runs inside the step with `trainable["vision_lora"]` folded in.
    `mesh` shards the frozen base FSDP-style over "data" and constrains the
    pair batch to the same axis; trainable/optimizer state replicate and
    the gradient allreduce comes from sharding propagation.

    `quantize_base` ("int8"|"nf4") stores the frozen LM/vision block
    weights quantized (see `quantize_rm_base` — the reference's bnb
    quantized-base finetuning) so a 7B RM LoRA step fits a single 16 GB
    chip; composes with `mesh` (the quantized leaves shard FSDP-style)."""
    train_vision = vision_params is not None
    if train_vision and (vis_cfg is None or grid_thw is None):
        raise ValueError("vision training needs vis_cfg and grid_thw (one grid per batch)")

    if quantize_base is not None:
        lm_params = quantize_rm_base(lm_params, quantize_base, quantize_min_size)
        if train_vision:
            vision_params = quantize_rm_base(vision_params, quantize_base, quantize_min_size)

    if mesh is not None:
        from ..parallel.specs import shard_fsdp_params

        lm_params = shard_fsdp_params(lm_params, mesh)
        if train_vision:
            vision_params = shard_fsdp_params(vision_params, mesh)

    def side_rewards(trainable, batch, base_lm, base_vis, side: str):
        embeds = batch[f"embeds_{side}"]
        if train_vision:
            embeds = apply_vision_lora_embeds(
                trainable, base_vis, vis_cfg, embeds, batch[f"patches_{side}"],
                grid_thw, alpha, r, img_token_start,
            )
        return rm_forward_rewards(
            trainable, base_lm, lm_cfg, embeds, batch[f"pos_{side}"],
            batch[f"mask_{side}"], batch[f"ids_{side}"], pooling, special_token_id,
            alpha, r,
        )

    def loss_fn(trainable, batch, base_lm, base_vis):
        rw_A = side_rewards(trainable, batch, base_lm, base_vis, "A")
        rw_B = side_rewards(trainable, batch, base_lm, base_vis, "B")
        loss = reward_loss(rw_A, rw_B, batch["scores_A"], batch["scores_B"],
                           batch["chosen_label"], loss_type)
        return loss, {"loss": loss, "rewards_A": rw_A, "rewards_B": rw_B}

    def _constrain_batch(batch):
        from jax.sharding import NamedSharding, PartitionSpec as P

        data = NamedSharding(mesh, P("data"))
        pos = NamedSharding(mesh, P(None, "data"))
        return {
            k: jax.lax.with_sharding_constraint(v, pos if k.startswith("pos_") else data)
            for k, v in batch.items()
        }

    # the frozen 7B LM is a jit ARGUMENT, not a closure — a closure would
    # embed it as HLO constants (trace/compile blowup + doubled HBM)
    @jax.jit
    def jitted(trainable, opt_state, batch, base_lm, base_vis):
        if mesh is not None:
            batch = _constrain_batch(batch)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, batch, base_lm, base_vis
        )
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, aux

    def step(trainable, opt_state, batch):
        return jitted(trainable, opt_state, batch, lm_params, vision_params)

    return step


def make_rm_optimizer(lr: float = 1e-5, vision_lr: float | None = None,
                      head_lr: float | None = None, special_lr: float | None = None,
                      merger_lr: float | None = None,
                      weight_decay: float = 0.0) -> optax.GradientTransformation:
    """Per-group learning rates (trainer.py:317-417 semantics): `vision_lr`
    drives the vision_lora adapters (lr_mapper["visual"], trainer.py:335-336)
    and `merger_lr` the patch-merger adapters within them (trainer.py:338-339);
    both default to `lr` like the reference's base group."""
    head_lr = head_lr if head_lr is not None else lr
    special_lr = special_lr if special_lr is not None else lr
    vision_lr = vision_lr if vision_lr is not None else lr
    merger_lr = merger_lr if merger_lr is not None else vision_lr

    def label_fn(tree):
        labels = {}
        for k, v in tree.items():
            if k == "rm_head":
                labels[k] = "head"
            elif k == "special":
                labels[k] = "special"
            elif k == "vision_lora":
                labels[k] = {
                    path: jax.tree.map(
                        lambda _, p=path: "merger" if p.startswith("merger/") else "vision", ab
                    )
                    for path, ab in v.items()
                }
            else:
                labels[k] = jax.tree.map(lambda _: "lora", v)
        return labels

    return optax.multi_transform(
        {
            "lora": optax.adamw(lr, weight_decay=weight_decay),
            "head": optax.adamw(head_lr, weight_decay=weight_decay),
            "special": optax.adamw(special_lr, weight_decay=0.0),
            "vision": optax.adamw(vision_lr, weight_decay=weight_decay),
            "merger": optax.adamw(merger_lr, weight_decay=weight_decay),
        },
        label_fn,
    )


def save_rm_checkpoint(path: str, trainable: dict, pooling: str, special_token_id: int | None,
                       vq_mean: float = 0.0, vq_std: float = 1.0, lora_alpha: float = 16.0,
                       lora_r: int = 16) -> None:
    """Write the inference-reconstruction bundle consumed by
    `verifiers.qwen_verifier.QwenRewardVerifier._load_head` — the analogue of
    the reference's `model_config.json` + adapter/`final_model.pth` contract
    (`/root/reference/reward_modeling/train_reward.py:21-41,262-291`)."""
    import json
    import os

    import numpy as np
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    save_file(
        {"rm_head.weight": np.ascontiguousarray(np.asarray(trainable["rm_head"], np.float32).T)},
        os.path.join(path, "rm_head.safetensors"),
    )
    flat = {}
    for p, ab in trainable["lora"].items():
        safe = p.replace("/", "__")
        flat[f"{safe}.A"] = np.asarray(ab["A"], np.float32)
        flat[f"{safe}.B"] = np.asarray(ab["B"], np.float32)
    for p, ab in trainable.get("vision_lora", {}).items():
        safe = p.replace("/", "__")
        flat[f"vision.{safe}.A"] = np.asarray(ab["A"], np.float32)
        flat[f"vision.{safe}.B"] = np.asarray(ab["B"], np.float32)
    if "special" in trainable:
        flat["special_token_embedding"] = np.asarray(trainable["special"], np.float32)
    save_file(flat, os.path.join(path, "rm_lora.safetensors"))
    with open(os.path.join(path, "model_config.json"), "w") as f:
        json.dump(
            {
                "logits_processing": pooling,
                "special_token_id": special_token_id,
                "VQ_mean": vq_mean,
                "VQ_std": vq_std,
                "lora_alpha": lora_alpha,
                "lora_r": lora_r,
                "output_dim": int(np.asarray(trainable["rm_head"]).shape[1]),
            },
            f,
        )


def save_rm_opt_state(path: str, opt_state) -> None:
    """Persist the optimizer pytree next to the adapter weights so training
    resumes exactly (the reference's HF Trainer checkpoints do the same,
    trainer.py:528-556)."""
    import os

    leaves = jax.tree.leaves(opt_state)
    np.savez(os.path.join(path, "opt_state.npz"), *[np.asarray(x) for x in leaves])


def load_rm_opt_state(path: str, opt_state_template):
    """-> opt_state restored into the template's tree structure, or the
    template unchanged when no saved state exists."""
    import os

    fp = os.path.join(path, "opt_state.npz")
    if not os.path.exists(fp):
        return opt_state_template
    data = np.load(fp)
    leaves = [data[f"arr_{i}"] for i in range(len(data.files))]
    treedef = jax.tree.structure(opt_state_template)
    template_leaves = jax.tree.leaves(opt_state_template)
    assert len(leaves) == len(template_leaves), "optimizer state shape mismatch"
    leaves = [jnp.asarray(x, getattr(t, "dtype", None)) for x, t in zip(leaves, template_leaves)]
    return jax.tree.unflatten(treedef, leaves)


def load_rm_checkpoint(path: str) -> tuple[dict, dict]:
    """-> (trainable tree, model_config dict)."""
    import json
    import os

    from safetensors.numpy import load_file

    with open(os.path.join(path, "model_config.json")) as f:
        cfg = json.load(f)
    head = load_file(os.path.join(path, "rm_head.safetensors"))["rm_head.weight"].T
    flat = load_file(os.path.join(path, "rm_lora.safetensors"))
    lora: dict = {}
    vision_lora: dict = {}
    special = None
    for k, v in flat.items():
        if k == "special_token_embedding":
            special = v
            continue
        dest = lora
        if k.startswith("vision."):
            dest = vision_lora
            k = k[len("vision."):]
        p, which = k.rsplit(".", 1)
        dest.setdefault(p.replace("__", "/"), {})[which] = v
    trainable = {"lora": lora, "rm_head": head}
    if vision_lora:
        trainable["vision_lora"] = vision_lora
    if special is not None:
        trainable["special"] = special
    return trainable, cfg
