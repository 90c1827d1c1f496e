"""Qwen reward-verifier scoring path, hermetic (random tiny weights)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reflectionflow_tpu.config import QwenLMConfig, QwenVLVisionConfig
from reflectionflow_tpu.models.qwen_vl.model import QwenVLModel
from reflectionflow_tpu.models.qwen_vl.reward import RewardHead
from reflectionflow_tpu.verifiers.qwen_verifier import QwenRewardVerifier


@pytest.fixture(scope="module")
def verifier():
    model = QwenVLModel.random_init(jax.random.PRNGKey(0), dtype=jnp.float32)
    head = RewardHead.random_init(jax.random.PRNGKey(1), model.lm_cfg.hidden_size, pooling="last")
    head.vq_mean, head.vq_std = 0.5, 2.0
    return QwenRewardVerifier(model=model, head=head, max_pixels=16 * 16)


def test_reward_api(verifier):
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (32, 24, 3), dtype=np.uint8) for _ in range(2)]
    out = verifier.reward(imgs, ["a cat", "a dog"])
    assert len(out) == 2 and all("VQ" in o for o in out)
    raw = verifier.reward(imgs, ["a cat", "a dog"], use_norm=False)
    # z-norm applied: (raw - 0.5) / 2
    np.testing.assert_allclose(
        [o["VQ"] for o in out], [(o["VQ"] - 0.5) / 2.0 for o in raw], atol=1e-5
    )
    # deterministic
    out2 = verifier.reward(imgs, ["a cat", "a dog"])
    np.testing.assert_allclose([o["VQ"] for o in out], [o["VQ"] for o in out2], atol=1e-6)


def test_score_interface_and_sensitivity(verifier):
    rng = np.random.default_rng(1)
    img_a = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    img_b = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    outs = verifier.score([img_a, img_b], ["x", "x"])
    assert all("overall_score" in o for o in outs)
    assert outs[0]["overall_score"]["score"] != outs[1]["overall_score"]["score"]


def test_special_pooling_appends_token():
    model = QwenVLModel.random_init(jax.random.PRNGKey(0), dtype=jnp.float32)
    head = RewardHead.random_init(
        jax.random.PRNGKey(1), model.lm_cfg.hidden_size, pooling="special", special_token_id=77
    )
    v = QwenRewardVerifier(model=model, head=head, max_pixels=16 * 16)
    ids, _patches, _grid = v._prepare_ids(np.zeros((16, 16, 3), np.uint8), "p")
    assert ids[-1] == 77


def test_qwen_verifier_int8_serving():
    """quantize='int8' (the 16 GB colocated-serving profile) still scores."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from reflectionflow_tpu.models.qwen_vl.model import QwenVLModel
    from reflectionflow_tpu.models.qwen_vl.reward import RewardHead
    from reflectionflow_tpu.verifiers.qwen_verifier import QwenRewardVerifier

    model = QwenVLModel.random_init(jax.random.PRNGKey(0), dtype=jnp.float32)
    head = RewardHead.random_init(jax.random.PRNGKey(1), model.lm_cfg.hidden_size)
    base = QwenRewardVerifier(model=model, head=head, max_pixels=1024)
    img = np.random.default_rng(0).integers(0, 255, (32, 32, 3), dtype=np.uint8)
    ref = base.raw_scores([img], ["a prompt"])[0]

    model_q = QwenVLModel.random_init(jax.random.PRNGKey(0), dtype=jnp.float32)
    vq = QwenRewardVerifier(model=model_q, head=head, max_pixels=1024, quantize="int8", quantize_min_size=16)
    assert "w_q" in vq.rm.model.lm_params["blocks"]["q"]
    out = vq.raw_scores([img], ["a prompt"])[0]
    assert np.isfinite(out)
    # int8 stays in the same scoring regime as fp32 (tiny model, loose tol)
    assert abs(out - ref) < max(1.0, abs(ref)), (out, ref)


def test_device_index_places_verifier_on_secondary_chip():
    """Second-chip deployment (docs/DEPLOYMENT.md): device_index pins the
    verifier's weights to another device of the slice; scoring runs there
    (jit follows operand placement) while chip 0 keeps the DiT."""
    import jax

    model = QwenVLModel.random_init(jax.random.PRNGKey(0), dtype=jnp.float32)
    head = RewardHead.random_init(jax.random.PRNGKey(1), model.lm_cfg.hidden_size, pooling="last")
    v = QwenRewardVerifier(model=model, head=head, max_pixels=16 * 16, device_index=1)
    dev1 = jax.devices()[1]
    leaves = jax.tree.leaves(v.rm.model.lm_params) + jax.tree.leaves(v.rm.model.vision_params)
    assert all(leaf.devices() == {dev1} for leaf in leaves)
    out = v.reward([np.zeros((16, 16, 3), np.uint8)], ["p"])
    assert np.isfinite(out[0]["VQ"])


def test_device_index_quantizes_on_target_chip():
    """quantize='int8' + device_index: the int8 blocks are BUILT under
    default_device(target), so no intermediate materializes on chip 0
    (the generator's chip) during construction."""
    import jax

    model = QwenVLModel.random_init(jax.random.PRNGKey(0), dtype=jnp.float32)
    head = RewardHead.random_init(jax.random.PRNGKey(1), model.lm_cfg.hidden_size, pooling="last")
    v = QwenRewardVerifier(
        model=model, head=head, max_pixels=16 * 16,
        quantize="int8", quantize_min_size=16, device_index=2,
    )
    dev = jax.devices()[2]
    assert "w_q" in v.rm.model.lm_params["blocks"]["q"]
    assert v.rm.model.lm_params["blocks"]["q"]["w_q"].devices() == {dev}
    assert np.isfinite(v.reward([np.zeros((16, 16, 3), np.uint8)], ["p"])[0]["VQ"])
