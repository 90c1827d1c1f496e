"""Image-Verifier (reward model) LoRA training.

Capability parity with `ImageVLMRewardTrainer` + `train_reward.py`
(`/root/reference/reward_modeling/trainer.py:243-600`,
`train_reward.py:69-294`): pairwise A/B forward through the VL model,
BT-family loss, LoRA on the language model (vision tower frozen by
default), trainable `rm_head` and `<|VQ_reward|>` special-token embedding
row, and per-group learning rates (optax.multi_transform replaces the
reference's optimizer param groups at trainer.py:317-417; freezing all
non-special embedding rows replaces `PartialEmbeddingUpdateCallback`).

The trainable tree is {"lora": adapters, "rm_head": (H, out), "special":
(H,)}; the frozen base (LM blocks, vision tower, embeddings) is closed
over. Vision embeds are precomputed host-side per pair.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import QwenLMConfig
from ..lora.lora import fold_lora, lora_init
from ..models.qwen_vl.lm import qwen_lm_apply
from ..models.qwen_vl.reward import pool_hidden
from .losses import reward_loss

RM_LORA_TARGETS = ("blocks/q/w", "blocks/k/w", "blocks/v/w", "blocks/o/w",
                   "blocks/gate/w", "blocks/up/w", "blocks/down/w")


def rm_lora_init(key, lm_params, r: int = 16, alpha: float = 16.0):
    return lora_init(key, lm_params, r=r, alpha=alpha, targets=RM_LORA_TARGETS)


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
    folded = fold_lora(lm_params, {"_alpha": alpha, "_r": r, "adapters": trainable["lora"]})
    if special_token_id is not None:
        is_sp = (input_ids == special_token_id)[:, :, None]
        embeds = jnp.where(is_sp, trainable["special"][None, None, :].astype(embeds.dtype), embeds)
    hidden, _ = qwen_lm_apply(folded, lm_cfg, embeds, position_ids,
                              attention_mask=attention_mask, return_hidden=True)
    pooled = pool_hidden(hidden, attention_mask, pooling, input_ids=input_ids,
                         special_token_id=special_token_id)
    return pooled @ trainable["rm_head"].astype(pooled.dtype)


def make_rm_train_step(
    lm_params,
    lm_cfg: QwenLMConfig,
    optimizer: optax.GradientTransformation,
    loss_type: str = "btt",
    pooling: str = "special",
    special_token_id: int | None = None,
    alpha: float = 16.0,
    r: int = 16,
):
    """jitted step(trainable, opt_state, batch, ...) over pairwise batches.

    batch: {embeds_A, pos_A, mask_A, ids_A, embeds_B, pos_B, mask_B, ids_B,
            scores_A (B,N), scores_B, chosen_label (B,N)}."""

    def loss_fn(trainable, batch, base_lm):
        rw_A = rm_forward_rewards(
            trainable, base_lm, lm_cfg, batch["embeds_A"], batch["pos_A"],
            batch["mask_A"], batch["ids_A"], pooling, special_token_id, alpha, r,
        )
        rw_B = rm_forward_rewards(
            trainable, base_lm, lm_cfg, batch["embeds_B"], batch["pos_B"],
            batch["mask_B"], batch["ids_B"], pooling, special_token_id, alpha, r,
        )
        loss = reward_loss(rw_A, rw_B, batch["scores_A"], batch["scores_B"],
                           batch["chosen_label"], loss_type)
        return loss, {"loss": loss, "rewards_A": rw_A, "rewards_B": rw_B}

    # the frozen 7B LM is a jit ARGUMENT, not a closure — a closure would
    # embed it as HLO constants (trace/compile blowup + doubled HBM)
    @jax.jit
    def jitted(trainable, opt_state, batch, base_lm):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable, batch, base_lm)
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, aux

    def step(trainable, opt_state, batch):
        return jitted(trainable, opt_state, batch, lm_params)

    return step


def make_rm_optimizer(lr: float = 1e-5, vision_lr: float | None = None,
                      head_lr: float | None = None, special_lr: float | None = None,
                      weight_decay: float = 0.0) -> optax.GradientTransformation:
    """Per-group learning rates (trainer.py:317-417 semantics)."""
    head_lr = head_lr if head_lr is not None else lr
    special_lr = special_lr if special_lr is not None else lr

    def label_fn(tree):
        return {
            "lora": jax.tree.map(lambda _: "lora", tree["lora"]),
            "rm_head": "head",
            "special": "special",
        }

    return optax.multi_transform(
        {
            "lora": optax.adamw(lr, weight_decay=weight_decay),
            "head": optax.adamw(head_lr, weight_decay=weight_decay),
            "special": optax.adamw(special_lr, weight_decay=0.0),
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
    special = None
    for k, v in flat.items():
        if k == "special_token_embedding":
            special = v
            continue
        p, which = k.rsplit(".", 1)
        lora.setdefault(p.replace("__", "/"), {})[which] = v
    trainable = {"lora": lora, "rm_head": head}
    if special is not None:
        trainable["special"] = special
    return trainable, cfg
