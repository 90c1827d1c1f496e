"""Reward-model pairwise losses (Bradley-Terry family).

Semantics of `ImageVLMRewardTrainer.compute_loss` and
`_convert_A_B_to_chosen_rejected`
(`/root/reference/reward_modeling/trainer.py:175-214,423-498`):

  * chosen_label per (pair, dim): 1 = A chosen, -1 = B chosen, 0 = tied,
    22 = invalid;
  * losses: bt, margin (MOS-score margin), constant_margin (0.57), scaled,
    reg (MSE to score-3), btt (Bradley-Terry-with-ties, k=5);
  * tied pairs masked out except in btt/reg which use their own masks.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

INVALID_LABEL = 22


def convert_A_B_to_chosen_rejected(rewards_A, rewards_B, scores_A, scores_B, chosen_label):
    """All inputs (B, N). Returns (chosen, rejected, s_chosen, s_rejected,
    nontied_mask, valid_mask)."""
    chosen_mask = chosen_label == 1
    rewards_chosen = jnp.where(chosen_mask, rewards_A, rewards_B)
    rewards_rejected = jnp.where(chosen_mask, rewards_B, rewards_A)
    scores_chosen = jnp.where(chosen_mask, scores_A, scores_B)
    scores_rejected = jnp.where(chosen_mask, scores_B, scores_A)
    nontied = ((chosen_label == 1) | (chosen_label == -1)).astype(jnp.float32)
    valid = (chosen_label != INVALID_LABEL).astype(jnp.float32)
    return rewards_chosen, rewards_rejected, scores_chosen, scores_rejected, nontied, valid


def reward_loss(
    rewards_A: jnp.ndarray,  # (B, N)
    rewards_B: jnp.ndarray,
    scores_A: jnp.ndarray,
    scores_B: jnp.ndarray,
    chosen_label: jnp.ndarray,
    loss_type: str = "bt",
) -> jnp.ndarray:
    rc, rr, sc, sr, nontied, valid = convert_A_B_to_chosen_rejected(
        rewards_A, rewards_B, scores_A, scores_B, chosen_label
    )
    margin = sc - sr
    logsig = jax.nn.log_sigmoid

    if loss_type == "bt":
        loss, mask = -logsig(rc - rr), nontied
    elif loss_type == "margin":
        loss, mask = -logsig(rc - rr - margin), nontied
    elif loss_type == "constant_margin":
        loss, mask = -logsig(rc - rr - 0.57), nontied
    elif loss_type == "scaled":
        loss, mask = -margin * logsig(rc - rr), nontied
    elif loss_type == "reg":
        rewards = jnp.stack([rewards_A, rewards_B], axis=1)
        scores = jnp.stack([scores_A, scores_B], axis=1)
        mask = (scores != 0.0).astype(jnp.float32)
        loss = (rewards - (scores - 3.0)) ** 2
    elif loss_type == "btt":
        k = 5.0
        log_k = math.log(k)
        log_k2_sub_1 = math.log(k**2 - 1)
        bt = -logsig(rc - rr - log_k)
        same = -logsig(rc - rr - log_k) - logsig(rr - rc - log_k) - log_k2_sub_1
        loss, mask = bt * nontied + same * (1 - nontied), valid
    else:
        raise NotImplementedError(f"loss type {loss_type}")
    return jnp.mean(loss * mask)


def pairwise_accuracy(rewards_A, rewards_B, chosen_label) -> jnp.ndarray:
    """Per-dim accuracy over non-tied valid pairs
    (`compute_multi_attr_accuracy`, trainer.py:602-641)."""
    nontied = (chosen_label == 1) | (chosen_label == -1)
    pred_A = rewards_A > rewards_B
    correct = jnp.where(chosen_label == 1, pred_A, ~pred_A)
    denom = jnp.maximum(nontied.sum(axis=0), 1)
    return (correct & nontied).sum(axis=0) / denom


def convert_gsb_labels(gsb: str) -> int:
    """Good/Same/Bad CSV label -> chosen_label (data.py:30-121 semantics)."""
    table = {"G": 1, "A": 1, "good": 1, "B": -1, "bad": -1, "S": 0, "same": 0}
    return table.get(gsb, INVALID_LABEL)
