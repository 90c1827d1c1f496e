"""Reward-model training tests: loss semantics + end-to-end step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reflectionflow_tpu.config import QwenLMConfig
from reflectionflow_tpu.models.qwen_vl.lm import qwen_lm_init
from reflectionflow_tpu.rm_train.losses import (
    convert_A_B_to_chosen_rejected,
    pairwise_accuracy,
    reward_loss,
)
from reflectionflow_tpu.rm_train.train import (
    make_rm_optimizer,
    make_rm_train_step,
    rm_lora_init,
)

CFG = QwenLMConfig.tiny()


def test_convert_chosen_rejected():
    rA = jnp.asarray([[1.0], [5.0], [2.0]])
    rB = jnp.asarray([[3.0], [4.0], [6.0]])
    label = jnp.asarray([[1], [-1], [22]])
    rc, rr, _, _, nontied, valid = convert_A_B_to_chosen_rejected(rA, rB, rA, rB, label)
    np.testing.assert_array_equal(np.asarray(rc[:, 0]), [1.0, 4.0, 6.0])
    np.testing.assert_array_equal(np.asarray(rr[:, 0]), [3.0, 5.0, 2.0])
    np.testing.assert_array_equal(np.asarray(nontied[:, 0]), [1, 1, 0])
    np.testing.assert_array_equal(np.asarray(valid[:, 0]), [1, 1, 0])


@pytest.mark.parametrize("loss_type", ["bt", "margin", "constant_margin", "scaled", "reg", "btt"])
def test_losses_finite_and_ordered(loss_type):
    rng = np.random.default_rng(0)
    rA = jnp.asarray(rng.normal(size=(4, 1)).astype(np.float32))
    rB = jnp.asarray(rng.normal(size=(4, 1)).astype(np.float32))
    sA = jnp.asarray(rng.uniform(1, 5, (4, 1)).astype(np.float32))
    sB = jnp.asarray(rng.uniform(1, 5, (4, 1)).astype(np.float32))
    label = jnp.asarray([[1], [-1], [0], [1]])
    loss = reward_loss(rA, rB, sA, sB, label, loss_type)
    assert np.isfinite(float(loss))
    if loss_type == "bt":
        # perfectly ordered rewards -> lower loss than anti-ordered
        good = reward_loss(jnp.full((2, 1), 5.0), jnp.zeros((2, 1)), sA[:2], sB[:2], jnp.ones((2, 1), jnp.int32), "bt")
        bad = reward_loss(jnp.zeros((2, 1)), jnp.full((2, 1), 5.0), sA[:2], sB[:2], jnp.ones((2, 1), jnp.int32), "bt")
        assert float(good) < float(bad)


def test_pairwise_accuracy():
    rA = jnp.asarray([[2.0], [1.0], [9.0]])
    rB = jnp.asarray([[1.0], [2.0], [0.0]])
    label = jnp.asarray([[1], [1], [0]])  # third tied -> excluded
    acc = pairwise_accuracy(rA, rB, label)
    assert float(acc[0]) == 0.5


def test_rm_train_step_learns():
    lm_params = qwen_lm_init(jax.random.PRNGKey(0), CFG)
    lora = rm_lora_init(jax.random.PRNGKey(1), lm_params, r=2, alpha=2)
    B, L, H = 2, 6, CFG.hidden_size
    trainable = {
        "lora": lora["adapters"],
        "rm_head": jax.random.normal(jax.random.PRNGKey(2), (H, 1)) * 0.1,
        "special": jax.random.normal(jax.random.PRNGKey(3), (H,)) * 0.02,
    }
    opt = make_rm_optimizer(lr=1e-2, head_lr=5e-2)
    opt_state = opt.init(trainable)
    step = make_rm_train_step(
        lm_params, CFG, opt, loss_type="bt", pooling="special", special_token_id=9, r=2, alpha=2,
    )
    rng = np.random.default_rng(0)
    ids = np.full((B, L), 5, np.int64)
    ids[:, -1] = 9  # special token last
    pos = np.broadcast_to(np.arange(L)[None, None, :], (3, B, L)).copy()
    embed_matrix = np.asarray(lm_params["embed"])
    batch = {
        "embeds_A": jnp.asarray(embed_matrix[ids] + rng.normal(size=(B, L, H)) * 0.1, jnp.float32),
        "embeds_B": jnp.asarray(embed_matrix[ids] - rng.normal(size=(B, L, H)) * 0.1, jnp.float32),
        "pos_A": jnp.asarray(pos), "pos_B": jnp.asarray(pos),
        "mask_A": jnp.ones((B, L), jnp.int32), "mask_B": jnp.ones((B, L), jnp.int32),
        "ids_A": jnp.asarray(ids), "ids_B": jnp.asarray(ids),
        "scores_A": jnp.full((B, 1), 4.0), "scores_B": jnp.full((B, 1), 2.0),
        "chosen_label": jnp.ones((B, 1), jnp.int32),
    }
    losses = []
    for _ in range(8):
        trainable, opt_state, aux = step(trainable, opt_state, batch)
        losses.append(float(aux["loss"]))
    assert losses[-1] < losses[0], losses
    # rewards A should now exceed rewards B (A is always chosen)
    assert float(aux["rewards_A"].mean()) > float(aux["rewards_B"].mean())
