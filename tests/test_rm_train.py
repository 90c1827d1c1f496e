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


def test_train_reward_cli_end_to_end(tmp_path):
    """The CLI driver (reference train_reward.py:162-294 surface): GSB rows
    -> train loop -> final_model checkpoint that scores images through
    QwenRewardVerifier, LoRA + special-token row applied."""
    import json
    import os

    from PIL import Image

    from reflectionflow_tpu.cli.train_reward import main as train_reward_main
    from reflectionflow_tpu.models.qwen_vl.model import QwenVLModel
    from reflectionflow_tpu.verifiers.qwen_verifier import QwenRewardVerifier

    rng = np.random.default_rng(0)
    rows = []
    for i in range(6):
        pa, pb = tmp_path / f"a{i}.png", tmp_path / f"b{i}.png"
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)).save(pa)
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)).save(pb)
        rows.append(
            {"image_A": str(pa), "image_B": str(pb), "prompt": f"prompt {i}",
             "gsb": ["G", "B", "S"][i % 3], "score_A": 4.0, "score_B": 3.0}
        )
    meta = tmp_path / "meta.jsonl"
    meta.write_text("".join(json.dumps(r) + "\n" for r in rows))
    out = str(tmp_path / "rm_out")

    final = train_reward_main(
        ["--meta_data", str(meta), "--output_dir", out, "--synthetic_weights",
         "--per_device_train_batch_size", "2", "--num_train_epochs", "1",
         "--eval_fraction", "0.34", "--max_pixels", "1024", "--lora_r", "2",
         "--loss_type", "btt"]
    )
    assert os.path.exists(os.path.join(final, "model_config.json"))
    assert os.path.exists(os.path.join(final, "rm_head.safetensors"))
    assert os.path.exists(os.path.join(final, "rm_lora.safetensors"))
    cfg = json.load(open(os.path.join(final, "model_config.json")))
    assert cfg["logits_processing"] == "special"
    metrics = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    assert any("loss" in m for m in metrics)
    assert any("eval_pairwise_accuracy" in m for m in metrics)

    # the checkpoint scores images (same base seed as the CLI's random init)
    model = QwenVLModel.random_init(jax.random.PRNGKey(0), dtype=jnp.float32)
    verifier = QwenRewardVerifier(model=model, model_path=final, max_pixels=1024)
    img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    scored = verifier.reward([img], ["a test prompt"])
    assert np.isfinite(scored[0]["VQ"])


def test_rm_opt_state_roundtrip(tmp_path):
    from reflectionflow_tpu.models.qwen_vl.lm import qwen_lm_init
    from reflectionflow_tpu.config import QwenLMConfig
    from reflectionflow_tpu.rm_train.train import (
        load_rm_opt_state, make_rm_optimizer, rm_lora_init, save_rm_opt_state,
    )

    cfg = QwenLMConfig.tiny()
    lm = qwen_lm_init(jax.random.PRNGKey(0), cfg)
    trainable = {
        "lora": rm_lora_init(jax.random.PRNGKey(1), lm, r=2, alpha=2)["adapters"],
        "rm_head": jnp.ones((cfg.hidden_size, 1)),
        "special": jnp.ones((cfg.hidden_size,)),
    }
    opt = make_rm_optimizer(lr=1e-3)
    state = opt.init(trainable)
    # perturb one step so the state is nontrivial
    grads = jax.tree.map(jnp.ones_like, trainable)
    updates, state = opt.update(grads, state, trainable)
    save_rm_opt_state(str(tmp_path), state)
    restored = load_rm_opt_state(str(tmp_path), opt.init(trainable))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)), restored, state
    )
    # missing file -> template unchanged
    fresh = opt.init(trainable)
    assert load_rm_opt_state(str(tmp_path / "nope"), fresh) is fresh
