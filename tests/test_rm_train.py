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


def _tiny_vl_rows_and_batch(train_vision=True, B=2, special_token_id=9):
    """tiny QwenVLModel + a collated pairwise batch over real images."""
    from reflectionflow_tpu.models.qwen_vl.model import QwenVLModel
    from reflectionflow_tpu.rm_train.data import collate_rm_batch

    model = QwenVLModel.random_init(jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    rows = [
        {"image_A": rng.integers(0, 255, (24, 24, 3), dtype=np.uint8),
         "image_B": rng.integers(0, 255, (24, 24, 3), dtype=np.uint8),
         "prompt": f"p{i}", "gsb": "G", "score_A": 4.0, "score_B": 2.0}
        for i in range(B)
    ]
    batch = collate_rm_batch(model, rows, max_pixels=256,
                             special_token_id=special_token_id,
                             train_vision=train_vision)
    return model, batch


def test_rm_vision_lora_trains_tower_adapters():
    """vision_lora=true (reference train_reward.py:43-63,178-204): the
    tower runs inside the step on raw patches, its adapters update under
    vision_lr, and vision_lr=0 freezes exactly the vision group while the
    LM LoRA keeps training."""
    from reflectionflow_tpu.rm_train.data import vision_train_geometry
    from reflectionflow_tpu.rm_train.train import rm_vision_lora_init

    model, batch = _tiny_vl_rows_and_batch(train_vision=True)
    assert "patches_A" in batch and batch["patches_A"].ndim == 3
    H = model.lm_cfg.hidden_size
    grid = vision_train_geometry(model.vis_cfg, 256)[1]

    def build(vision_lr):
        trainable = {
            "lora": rm_lora_init(jax.random.PRNGKey(1), model.lm_params, r=2, alpha=2)["adapters"],
            "rm_head": jax.random.normal(jax.random.PRNGKey(2), (H, 1)) * 0.1,
            "special": jax.random.normal(jax.random.PRNGKey(3), (H,)) * 0.02,
            "vision_lora": rm_vision_lora_init(
                jax.random.PRNGKey(4), model.vision_params, r=2, alpha=2)["adapters"],
        }
        opt = make_rm_optimizer(lr=1e-2, vision_lr=vision_lr)
        step = make_rm_train_step(
            model.lm_params, model.lm_cfg, opt, loss_type="bt", pooling="special",
            special_token_id=9, r=2, alpha=2,
            vision_params=model.vision_params, vis_cfg=model.vis_cfg, grid_thw=grid,
        )
        return trainable, opt.init(trainable), step

    # the vision adapters cover the reference target set
    trainable, opt_state, step = build(vision_lr=1e-2)
    paths = set(trainable["vision_lora"])
    assert any(p.startswith("merger/") for p in paths)
    assert any(p.startswith("blocks/qkv") for p in paths)

    before = jax.tree.map(np.asarray, trainable["vision_lora"])
    losses = []
    for _ in range(4):
        trainable, opt_state, aux = step(trainable, opt_state, batch)
        losses.append(float(aux["loss"]))
    assert losses[-1] < losses[0], losses
    moved = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()), trainable["vision_lora"], before
    )
    assert max(jax.tree.leaves(moved)) > 0, "vision adapters never updated"

    # vision_lr=0 -> the vision group is frozen, the LM LoRA still moves
    trainable, opt_state, step = build(vision_lr=0.0)
    v_before = jax.tree.map(np.asarray, trainable["vision_lora"])
    l_before = jax.tree.map(np.asarray, trainable["lora"])
    trainable, opt_state, _ = step(trainable, opt_state, batch)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        trainable["vision_lora"], v_before,
    )
    l_moved = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()), trainable["lora"], l_before
    )
    assert max(jax.tree.leaves(l_moved)) > 0


@pytest.mark.parametrize("mode", ["int8", "nf4"])
def test_rm_quantized_base_trains(mode):
    """Quantized frozen base (the reference's bitsandbytes path,
    train_reward.py:69-139): weight-only int8/NF4 block storage with
    dequant-in-matmul keeps gradients flowing to EVERY trainable group —
    LM LoRA (upstream-of-downstream-blocks, the gradient path that
    W8A8's activation rounding would sever), vision LoRA, head, special
    row — and the step still learns."""
    from reflectionflow_tpu.rm_train.data import vision_train_geometry
    from reflectionflow_tpu.rm_train.train import quantize_rm_base, rm_vision_lora_init

    model, batch = _tiny_vl_rows_and_batch(train_vision=True)
    H = model.lm_cfg.hidden_size
    grid = vision_train_geometry(model.vis_cfg, 256)[1]
    trainable = {
        "lora": rm_lora_init(jax.random.PRNGKey(1), model.lm_params, r=2, alpha=2)["adapters"],
        "rm_head": jax.random.normal(jax.random.PRNGKey(2), (H, 1)) * 0.1,
        "special": jax.random.normal(jax.random.PRNGKey(3), (H,)) * 0.02,
        "vision_lora": rm_vision_lora_init(
            jax.random.PRNGKey(4), model.vision_params, r=2, alpha=2)["adapters"],
    }
    opt = make_rm_optimizer(lr=1e-2)
    opt_state = opt.init(trainable)
    step = make_rm_train_step(
        model.lm_params, model.lm_cfg, opt, loss_type="bt", pooling="special",
        special_token_id=9, r=2, alpha=2,
        vision_params=model.vision_params, vis_cfg=model.vis_cfg, grid_thw=grid,
        quantize_base=mode, quantize_min_size=16,
    )
    # the base actually got quantized (storage leaves, not a no-op);
    # tiny dims fall back down the packing chain (plane -> pair -> int8),
    # so check the no-float-w invariant here and the NF4 plane layout on a
    # group-sized tree below
    q = quantize_rm_base(model.lm_params, mode, 16)
    leaf_keys = set()
    jax.tree.map_with_path(lambda p, _: leaf_keys.add(str(p[-1])), q["blocks"])
    keys = str(leaf_keys)
    assert "'w_q'" in keys or "'w_p4'" in keys or "'w_p4p'" in keys
    big = {"blocks": {"q": {"w": jnp.zeros((2, 256, 32))}}, "embed": jnp.zeros((4, 8))}
    bk = set()
    jax.tree.map_with_path(lambda p, _: bk.add(str(p[-1])),
                           quantize_rm_base(big, mode, 16)["blocks"])
    assert ("'w_q'" if mode == "int8" else "'w_p4p'") in str(bk)

    before = jax.tree.map(np.asarray, trainable)
    losses = []
    for _ in range(6):
        trainable, opt_state, aux = step(trainable, opt_state, batch)
        losses.append(float(aux["loss"]))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses
    moved = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()), trainable, before)
    # every group moved: head, special, LM lora, vision lora
    assert min(float(np.max(np.asarray(jax.tree.leaves(moved[g])))) if isinstance(moved[g], dict)
               else moved[g] for g in ("lora", "vision_lora", "rm_head", "special")) > 0

    with pytest.raises(ValueError):
        make_rm_train_step(model.lm_params, model.lm_cfg, opt, quantize_base="fp8")


def test_rm_train_step_fsdp_mesh_matches_single_device():
    """mesh= shards the frozen base FSDP-style over "data" and the pair
    batch over the same axis; one step must match the unsharded step."""
    from jax.sharding import Mesh
    from reflectionflow_tpu.rm_train.data import vision_train_geometry
    from reflectionflow_tpu.rm_train.train import rm_vision_lora_init

    model, batch = _tiny_vl_rows_and_batch(train_vision=True, B=8)
    H = model.lm_cfg.hidden_size
    grid = vision_train_geometry(model.vis_cfg, 256)[1]
    trainable = {
        "lora": rm_lora_init(jax.random.PRNGKey(1), model.lm_params, r=2, alpha=2)["adapters"],
        "rm_head": jax.random.normal(jax.random.PRNGKey(2), (H, 1)) * 0.1,
        "special": jax.random.normal(jax.random.PRNGKey(3), (H,)) * 0.02,
        "vision_lora": rm_vision_lora_init(
            jax.random.PRNGKey(4), model.vision_params, r=2, alpha=2)["adapters"],
    }
    opt = make_rm_optimizer(lr=1e-2)
    results = {}
    for name, mesh in (
        ("single", None),
        ("mesh", Mesh(np.asarray(jax.devices()[:8]), ("data",))),
    ):
        step = make_rm_train_step(
            model.lm_params, model.lm_cfg, opt, loss_type="bt", pooling="special",
            special_token_id=9, r=2, alpha=2,
            vision_params=model.vision_params, vis_cfg=model.vis_cfg, grid_thw=grid,
            mesh=mesh,
        )
        results[name] = step(trainable, opt.init(trainable), batch)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5),
        results["single"][:2], results["mesh"][:2],
    )
    np.testing.assert_allclose(
        float(results["single"][2]["loss"]), float(results["mesh"][2]["loss"]), atol=1e-5
    )


def test_rm_quantized_base_composes_with_fsdp_mesh():
    """quantize_base + mesh: the int8 storage leaves shard FSDP-style and
    the sharded step matches the unsharded quantized step (same
    quantization, so results agree to float tolerance)."""
    from jax.sharding import Mesh

    model, batch = _tiny_vl_rows_and_batch(train_vision=False, B=8)
    H = model.lm_cfg.hidden_size
    trainable = {
        "lora": rm_lora_init(jax.random.PRNGKey(1), model.lm_params, r=2, alpha=2)["adapters"],
        "rm_head": jax.random.normal(jax.random.PRNGKey(2), (H, 1)) * 0.1,
        "special": jax.random.normal(jax.random.PRNGKey(3), (H,)) * 0.02,
    }
    opt = make_rm_optimizer(lr=1e-2)
    results = {}
    for name, mesh in (
        ("single", None),
        ("mesh", Mesh(np.asarray(jax.devices()[:8]), ("data",))),
    ):
        step = make_rm_train_step(
            model.lm_params, model.lm_cfg, opt, loss_type="bt", pooling="special",
            special_token_id=9, r=2, alpha=2, mesh=mesh,
            quantize_base="int8", quantize_min_size=16,
        )
        results[name] = step(trainable, opt.init(trainable), batch)
    np.testing.assert_allclose(
        float(results["single"][2]["loss"]), float(results["mesh"][2]["loss"]), atol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5),
        results["single"][0], results["mesh"][0],
    )


def test_rm_checkpoint_vision_lora_roundtrip(tmp_path):
    from reflectionflow_tpu.models.qwen_vl.vision import qwen_vision_init
    from reflectionflow_tpu.config import QwenVLVisionConfig
    from reflectionflow_tpu.rm_train.train import (
        load_rm_checkpoint, rm_vision_lora_init, save_rm_checkpoint,
    )

    lm = qwen_lm_init(jax.random.PRNGKey(0), CFG)
    vis = qwen_vision_init(jax.random.PRNGKey(1), QwenVLVisionConfig.tiny())
    trainable = {
        "lora": rm_lora_init(jax.random.PRNGKey(2), lm, r=2, alpha=2)["adapters"],
        "rm_head": jnp.ones((CFG.hidden_size, 1)),
        "special": jnp.ones((CFG.hidden_size,)),
        "vision_lora": rm_vision_lora_init(jax.random.PRNGKey(3), vis, r=2, alpha=2)["adapters"],
    }
    save_rm_checkpoint(str(tmp_path), trainable, "special", 9)
    restored, cfg = load_rm_checkpoint(str(tmp_path))
    assert set(restored["vision_lora"]) == set(trainable["vision_lora"])
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6),
        restored["vision_lora"], jax.tree.map(np.asarray, trainable["vision_lora"]),
    )


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


def test_train_reward_cli_vision_lora(tmp_path):
    """--vision_lora trains tower adapters end-to-end: the final checkpoint
    carries vision.* entries and reloads into a vision_lora tree."""
    import json
    import os

    from PIL import Image

    from reflectionflow_tpu.cli.train_reward import main as train_reward_main
    from reflectionflow_tpu.rm_train.train import load_rm_checkpoint

    rng = np.random.default_rng(0)
    rows = []
    for i in range(4):
        pa, pb = tmp_path / f"a{i}.png", tmp_path / f"b{i}.png"
        Image.fromarray(rng.integers(0, 255, (24, 24, 3), dtype=np.uint8)).save(pa)
        Image.fromarray(rng.integers(0, 255, (24, 24, 3), dtype=np.uint8)).save(pb)
        rows.append({"image_A": str(pa), "image_B": str(pb), "prompt": f"p{i}",
                     "gsb": "G", "score_A": 4.0, "score_B": 3.0})
    meta = tmp_path / "meta.jsonl"
    meta.write_text("".join(json.dumps(r) + "\n" for r in rows))
    out = str(tmp_path / "rm_vis_out")
    final = train_reward_main(
        ["--meta_data", str(meta), "--output_dir", out, "--synthetic_weights",
         "--per_device_train_batch_size", "2", "--num_train_epochs", "1",
         "--eval_fraction", "0.25", "--max_pixels", "256", "--lora_r", "2",
         "--loss_type", "bt", "--vision_lora", "--vision_lr", "1e-3"]
    )
    assert os.path.exists(os.path.join(final, "rm_lora.safetensors"))
    restored, _ = load_rm_checkpoint(final)
    assert restored.get("vision_lora"), "vision adapters missing from the checkpoint"
    # B factors must have moved off their zero init (the adapters trained)
    bmax = max(float(np.abs(np.asarray(ab["B"])).max()) for ab in restored["vision_lora"].values())
    assert bmax > 0.0


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
