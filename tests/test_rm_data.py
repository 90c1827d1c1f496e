"""RM data collation: GSB rows -> A/B multimodal batches, end-to-end with
the train step."""

import jax
import jax.numpy as jnp
import numpy as np

from reflectionflow_tpu.models.qwen_vl.model import QwenVLModel
from reflectionflow_tpu.rm_train.data import collate_rm_batch, convert_gsb_csv
from reflectionflow_tpu.rm_train.train import (
    make_rm_optimizer,
    make_rm_train_step,
    rm_lora_init,
)


def test_collate_and_step(tmp_path):
    model = QwenVLModel.random_init(jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    rows = [
        {
            "image_A": rng.integers(0, 255, (16, 16, 3), dtype=np.uint8),
            "image_B": rng.integers(0, 255, (16, 16, 3), dtype=np.uint8),
            "prompt": f"prompt {i}",
            "gsb": "G" if i % 2 == 0 else "B",
            "score_A": 4.0,
            "score_B": 2.0,
        }
        for i in range(2)
    ]
    batch = collate_rm_batch(model, rows, special_token_id=9)
    assert batch["embeds_A"].shape[0] == 2
    assert batch["ids_A"].shape == batch["mask_A"].shape
    assert int(batch["chosen_label"][0, 0]) == 1 and int(batch["chosen_label"][1, 0]) == -1
    # feed straight into the train step
    lora = rm_lora_init(jax.random.PRNGKey(1), model.lm_params, r=2, alpha=2)
    trainable = {
        "lora": lora["adapters"],
        "rm_head": jax.random.normal(jax.random.PRNGKey(2), (model.lm_cfg.hidden_size, 1)) * 0.1,
        "special": jnp.zeros((model.lm_cfg.hidden_size,)),
    }
    opt = make_rm_optimizer(lr=1e-3)
    step = make_rm_train_step(
        model.lm_params, model.lm_cfg, opt, loss_type="bt", pooling="special",
        special_token_id=9, r=2, alpha=2,
    )
    trainable, _, aux = step(trainable, opt.init(trainable), batch)
    assert np.isfinite(float(aux["loss"]))


def test_convert_gsb_csv(tmp_path):
    csv_path = tmp_path / "gsb.csv"
    csv_path.write_text(
        "image_A,image_B,prompt,gsb,score_A,score_B\n"
        "a.png,b.png,a cat,G,4.5,2.0\n"
        "c.png,d.png,a dog,S,,\n"
    )
    rows = convert_gsb_csv(str(csv_path), image_root="/imgs")
    assert rows[0]["image_A"] == "/imgs/a.png"
    assert rows[0]["gsb"] == "G" and rows[0]["score_A"] == 4.5
    assert rows[1]["gsb"] == "S" and rows[1]["score_A"] == 0.0


def test_rm_checkpoint_roundtrip(tmp_path):
    from reflectionflow_tpu.rm_train.train import load_rm_checkpoint, save_rm_checkpoint

    rng = np.random.default_rng(0)
    trainable = {
        "lora": {"blocks/q/w": {"A": rng.normal(size=(2, 8, 2)).astype(np.float32),
                                 "B": rng.normal(size=(2, 2, 8)).astype(np.float32)}},
        "rm_head": rng.normal(size=(16, 1)).astype(np.float32),
        "special": rng.normal(size=(16,)).astype(np.float32),
    }
    save_rm_checkpoint(str(tmp_path / "ckpt"), trainable, pooling="special", special_token_id=9,
                       vq_mean=0.2, vq_std=1.5)
    back, cfg = load_rm_checkpoint(str(tmp_path / "ckpt"))
    assert cfg["VQ_mean"] == 0.2 and cfg["special_token_id"] == 9
    np.testing.assert_allclose(back["rm_head"], trainable["rm_head"], atol=1e-6)
    np.testing.assert_allclose(back["lora"]["blocks/q/w"]["A"], trainable["lora"]["blocks/q/w"]["A"], atol=1e-6)
    np.testing.assert_allclose(back["special"], trainable["special"], atol=1e-6)


def test_prompt_template():
    from reflectionflow_tpu.rm_train.prompt_template import SPECIAL_TOKEN, build_prompt

    assert build_prompt("a cat", template_type="none") == "a cat"
    detailed = build_prompt("a cat", dims=["VQ", "TA"], template_type="detailed")
    assert "VQ" in detailed and "a cat" in detailed
    special = build_prompt("a cat", template_type="detailed_special")
    assert special.endswith(SPECIAL_TOKEN)
