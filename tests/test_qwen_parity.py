"""Golden parity of the JAX Qwen2.5-VL (LM + vision + multimodal) against
transformers (torch CPU) on tiny random configs — SURVEY.md §7.3 item 2."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reflectionflow_tpu.config import QwenLMConfig, QwenVLVisionConfig
from reflectionflow_tpu.models.qwen_vl.lm import qwen_lm_apply
from reflectionflow_tpu.models.qwen_vl.model import QwenVLModel, QwenVLSpecialTokens, get_rope_index
from reflectionflow_tpu.models.qwen_vl.vision import image_to_patches, qwen_vision_apply
from reflectionflow_tpu.utils.hf_convert import convert_qwen_lm_state, convert_qwen_vision_state

LM_CFG = QwenLMConfig.tiny()
VIS_CFG = QwenVLVisionConfig(
    depth=2, hidden_size=32, intermediate_size=64, num_heads=4,
    patch_size=4, temporal_patch_size=2, spatial_merge_size=2,
    window_size=16, fullatt_block_indexes=(1,), out_hidden_size=32,
)
IMAGE_PAD = 151655


@pytest.fixture(scope="module")
def hf_model():
    from transformers import Qwen2_5_VLConfig
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VLForConditionalGeneration,
    )

    cfg = Qwen2_5_VLConfig(
        text_config=dict(
            vocab_size=LM_CFG.vocab_size,
            hidden_size=LM_CFG.hidden_size,
            intermediate_size=LM_CFG.intermediate_size,
            num_hidden_layers=LM_CFG.num_layers,
            num_attention_heads=LM_CFG.num_heads,
            num_key_value_heads=LM_CFG.num_kv_heads,
            rope_theta=LM_CFG.rope_theta,
            rms_norm_eps=LM_CFG.rms_norm_eps,
            tie_word_embeddings=False,
            rope_scaling={"type": "mrope", "mrope_section": list(LM_CFG.mrope_section)},
        ),
        vision_config=dict(
            depth=VIS_CFG.depth,
            hidden_size=VIS_CFG.hidden_size,
            intermediate_size=VIS_CFG.intermediate_size,
            num_heads=VIS_CFG.num_heads,
            patch_size=VIS_CFG.patch_size,
            temporal_patch_size=VIS_CFG.temporal_patch_size,
            spatial_merge_size=VIS_CFG.spatial_merge_size,
            window_size=VIS_CFG.window_size,
            fullatt_block_indexes=list(VIS_CFG.fullatt_block_indexes),
            out_hidden_size=VIS_CFG.out_hidden_size,
        ),
    )
    torch.manual_seed(0)
    model = Qwen2_5_VLForConditionalGeneration(cfg).eval()
    return model


@pytest.fixture(scope="module")
def jax_params(hf_model):
    sd = {k: v.float().numpy() for k, v in hf_model.state_dict().items()}
    return convert_qwen_lm_state(sd, LM_CFG), convert_qwen_vision_state(sd, VIS_CFG)


def test_lm_text_parity(hf_model, jax_params):
    lm_params, _ = jax_params
    ids = np.array([[3, 1005, 7, 420, 11, 99, 5, 2]], np.int64)
    L = ids.shape[1]
    with torch.no_grad():
        ref = hf_model(input_ids=torch.tensor(ids)).logits.numpy()
    pos = np.broadcast_to(np.arange(L)[None, None, :], (3, 1, L))
    ours, _ = qwen_lm_apply(lm_params, LM_CFG, lm_params["embed"][jnp.asarray(ids)], jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-4, rtol=3e-3)


def test_vision_parity(hf_model, jax_params):
    _, vis_params = jax_params
    # 24x16 px image: patch 4 -> grid 6x4; merge 2 -> llm grid 3x2;
    # window 16px -> 1 unit/window edge (stress window partition + padding)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (24, 16, 3), dtype=np.uint8)
    patches, grid = image_to_patches(img, VIS_CFG)
    with torch.no_grad():
        ref = hf_model.visual(
            torch.tensor(patches, dtype=torch.float32),
            grid_thw=torch.tensor([list(grid)]),
        ).numpy()
    ours = qwen_vision_apply(vis_params, VIS_CFG, jnp.asarray(patches), grid)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-4, rtol=3e-3)


def test_multimodal_parity(hf_model, jax_params):
    lm_params, vis_params = jax_params
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
    patches, grid = image_to_patches(img, VIS_CFG)
    n_img_tokens = (grid[1] // 2) * (grid[2] // 2)
    ids = np.concatenate(
        [
            np.array([5, 151652]),
            np.full(n_img_tokens, IMAGE_PAD),
            np.array([151653, 17, 23]),
        ]
    ).astype(np.int64)
    with torch.no_grad():
        ref = hf_model(
            input_ids=torch.tensor(ids[None]),
            pixel_values=torch.tensor(patches, dtype=torch.float32),
            image_grid_thw=torch.tensor([list(grid)]),
        ).logits.numpy()
    model = QwenVLModel(lm_params, vis_params, LM_CFG, VIS_CFG, dtype=jnp.float32)
    ours = model.forward_logits(ids, [img])
    np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-4, rtol=5e-3)


def test_rope_index_matches_hf(hf_model):
    rng = np.random.default_rng(1)
    grid = (1, 4, 4)
    n_img = 4  # (4//2)*(4//2)
    ids = np.concatenate(
        [np.array([5, 151652]), np.full(n_img, IMAGE_PAD), np.array([151653, 17, 23])]
    ).astype(np.int64)
    ref_pos, _ = hf_model.model.get_rope_index(
        input_ids=torch.tensor(ids[None]), image_grid_thw=torch.tensor([list(grid)])
    )
    ours = get_rope_index(ids, [grid], spatial_merge_size=2, image_pad_id=IMAGE_PAD)
    np.testing.assert_array_equal(ours, ref_pos[:, 0].numpy())


def test_kv_cache_decode_matches_full(jax_params):
    from reflectionflow_tpu.models.qwen_vl.lm import init_kv_cache

    lm_params, _ = jax_params
    ids = np.array([[3, 1005, 7, 420, 11]], np.int64)
    L = ids.shape[1]
    pos = np.broadcast_to(np.arange(L)[None, None, :], (3, 1, L))
    full, _ = qwen_lm_apply(lm_params, LM_CFG, lm_params["embed"][jnp.asarray(ids)], jnp.asarray(pos))
    # prefill 3, then decode 2 one-by-one
    cache = init_kv_cache(LM_CFG, 1, L, dtype=jnp.float32)
    out1, cache = qwen_lm_apply(
        lm_params, LM_CFG, lm_params["embed"][jnp.asarray(ids[:, :3])],
        jnp.asarray(pos[:, :, :3]), kv_cache=cache,
    )
    np.testing.assert_allclose(np.asarray(out1), np.asarray(full[:, :3]), atol=2e-4, rtol=2e-3)
    for i in range(3, L):
        out_i, cache = qwen_lm_apply(
            lm_params, LM_CFG, lm_params["embed"][jnp.asarray(ids[:, i : i + 1])],
            jnp.asarray(pos[:, :, i : i + 1]), kv_cache=cache,
        )
        np.testing.assert_allclose(
            np.asarray(out_i[:, 0]), np.asarray(full[:, i]), atol=2e-4, rtol=2e-3
        )


def test_video_mrope_index_parity(hf_model):
    """Video M-RoPE positions == transformers' `get_rope_index` for a mixed
    image+video sequence (temporal stream scaled by seconds-per-grid x
    tokens_per_second; spatial walks; text resumption after each visual)."""
    from reflectionflow_tpu.models.qwen_vl.model import get_rope_index

    hf = hf_model.model  # Qwen2_5_VLModel carries get_rope_index
    cfg = hf_model.config
    merge = VIS_CFG.spatial_merge_size
    img_grid = (1, 4, 4)   # 1*2*2 = 4 merged tokens
    vid_grid = (2, 4, 4)   # 2*2*2 = 8 merged tokens
    n_img = (img_grid[1] // merge) * (img_grid[2] // merge)
    n_vid = vid_grid[0] * (vid_grid[1] // merge) * (vid_grid[2] // merge)
    vs, ve = 151652, 151653
    ids = np.array(
        [5, 9, vs] + [cfg.image_token_id] * n_img + [ve, 11, vs]
        + [cfg.video_token_id] * n_vid + [ve, 7],
        np.int64,
    )
    spg = 1.5
    with torch.no_grad():
        ref_pos, _ = hf.get_rope_index(
            input_ids=torch.tensor(ids[None]),
            image_grid_thw=torch.tensor([list(img_grid)]),
            video_grid_thw=torch.tensor([list(vid_grid)]),
            second_per_grid_ts=torch.tensor([spg]),
        )
    got = get_rope_index(
        ids, [img_grid, vid_grid], merge, cfg.image_token_id,
        video_pad_id=cfg.video_token_id,
        tokens_per_second=cfg.vision_config.tokens_per_second,
        seconds_per_grid=[spg],  # per-VIDEO list (transformers second_per_grid_ts)
    )
    np.testing.assert_array_equal(got, ref_pos[:, 0].numpy())
