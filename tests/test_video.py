"""Video path of the reward stack (VERDICT round 2, missing #4).

Frame-count policy, uniform/multi-point sampling, decoded-source readers,
the per-frame pixel budget, temporal patching, video M-RoPE positions, and
an end-to-end score of a synthetic 4-frame clip through the Qwen reward
verifier — parity with the reference's vendored video helpers
(`/root/reference/reward_modeling/vision_process.py:129-310`) and its
`video_score` prompt template (`prompt_template.py:2-10,98-101`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reflectionflow_tpu.config import QwenVLVisionConfig
from reflectionflow_tpu.models.qwen_vl.model import QwenVLModel, QwenVLSpecialTokens, get_rope_index
from reflectionflow_tpu.models.qwen_vl.reward import RewardHead
from reflectionflow_tpu.models.qwen_vl.video import (
    FRAME_FACTOR,
    fetch_video,
    sample_frame_indices,
    smart_nframes,
    video_to_patches,
)
from reflectionflow_tpu.models.qwen_vl.vision import image_to_patches
from reflectionflow_tpu.verifiers.qwen_verifier import QwenRewardVerifier


def _clip(T=4, H=32, W=32, seed=0):
    return np.random.default_rng(seed).integers(0, 255, (T, H, W, 3), dtype=np.uint8)


# --- frame-count policy -----------------------------------------------------


def test_smart_nframes_explicit_rounds_to_factor():
    assert smart_nframes(100, 30.0, nframes=5) == round(5 / FRAME_FACTOR) * FRAME_FACTOR
    assert smart_nframes(100, 30.0, nframes=8) == 8


def test_smart_nframes_fps_clamps():
    # 10 s of 30 fps at 2 fps target -> 20 frames
    assert smart_nframes(300, 30.0) == 20
    # short clip: clamped to min_frames (4)
    assert smart_nframes(30, 30.0) == 4
    # never more than total_frames
    assert smart_nframes(6, 1.0, fps=10.0) == 6


def test_smart_nframes_rejects_degenerate():
    with pytest.raises(ValueError):
        smart_nframes(1, 30.0, nframes=2)  # total_frames < FRAME_FACTOR
    with pytest.raises(ValueError):
        smart_nframes(100, 30.0, nframes=4, fps=2.0)  # both given


# --- samplers ---------------------------------------------------------------


def test_uniform_sampling_spans_clip():
    idx = sample_frame_indices(300, 30.0)
    assert len(idx) == 20 and idx[0] == 0 and idx[-1] == 299
    assert idx == sorted(idx)


def test_multi_pts_sampling_shape():
    # 10 s @ 30 fps -> 80 working frames @ 8 fps; 4 pts x 6 frames = 24
    idx = sample_frame_indices(300, 30.0, sample_type="multi_pts")
    assert len(idx) == 24
    assert all(0 <= i < 300 for i in idx)


# --- readers + budget -------------------------------------------------------


def test_fetch_video_from_array_and_files(tmp_path):
    kw = dict(nframes=4, min_pixels=28 * 28)  # disable the upscale floor at test sizes
    clip = _clip(T=4, H=28, W=28)
    out = fetch_video(clip, **kw)
    assert out.shape == (4, 28, 28, 3)
    np.testing.assert_array_equal(out, clip)

    np.save(tmp_path / "clip.npy", clip)
    np.testing.assert_array_equal(fetch_video(str(tmp_path / "clip.npy"), **kw), clip)

    from PIL import Image

    d = tmp_path / "frames"
    d.mkdir()
    for i, f in enumerate(clip):
        Image.fromarray(f).save(d / f"{i:03d}.png")
    np.testing.assert_array_equal(fetch_video(str(d), **kw), clip)

    with pytest.raises(ValueError, match="codec"):
        fetch_video("/tmp/nonexistent.mp4")


def test_fetch_video_min_pixels_floor_upscales():
    """Default policy: frames below VIDEO_MIN_PIXELS are upscaled (the
    reference's floor, vision_process.py:31)."""
    out = fetch_video(_clip(T=4, H=28, W=28), nframes=4)
    assert out.shape[1] * out.shape[2] >= 128 * 28 * 28


def test_fetch_video_budget_shrinks_long_clips():
    """The per-frame pixel cap amortizes the total budget over frames:
    more frames -> smaller frames."""
    big = np.zeros((8, 560, 560, 3), np.uint8)
    kw = dict(total_pixels=2 * 128 * 28 * 28, min_pixels=28 * 28)
    few = fetch_video(big, nframes=2, **kw)
    many = fetch_video(big, nframes=8, **kw)
    assert few.shape[1] * few.shape[2] > many.shape[1] * many.shape[2]
    assert many.shape[1] * many.shape[2] <= kw["total_pixels"] / 8 * FRAME_FACTOR


# --- patching ---------------------------------------------------------------


def test_video_to_patches_matches_image_at_tp_frames():
    """A clip of temporal_patch_size identical frames produces exactly the
    patches of the single image (the image path temporal-duplicates)."""
    cfg = QwenVLVisionConfig.tiny()
    img = _clip(T=1)[0]
    clip = np.stack([img] * cfg.temporal_patch_size)
    p_img, grid_img = image_to_patches(img, cfg)
    p_vid, grid_vid = video_to_patches(clip, cfg)
    assert grid_vid == grid_img
    np.testing.assert_array_equal(p_vid, p_img)


def test_video_to_patches_grid_and_padding():
    cfg = QwenVLVisionConfig.tiny()
    tp = cfg.temporal_patch_size
    clip = _clip(T=2 * tp, H=32, W=32)
    p, (gt, gh, gw) = video_to_patches(clip, cfg)
    assert (gt, gh, gw) == (2, 32 // cfg.patch_size, 32 // cfg.patch_size)
    assert p.shape == (gt * gh * gw, 3 * tp * cfg.patch_size ** 2)
    # odd frame count pads by repeating the last frame
    p_odd, (gt_odd, _, _) = video_to_patches(clip[: tp + 1], cfg)
    assert gt_odd == 2
    rep = np.concatenate([clip[: tp + 1], np.repeat(clip[tp : tp + 1], tp - 1, axis=0)])
    np.testing.assert_array_equal(p_odd, video_to_patches(rep, cfg)[0])


# --- M-RoPE -----------------------------------------------------------------


def test_get_rope_index_video_temporal_scaling():
    toks = QwenVLSpecialTokens()
    grid = (2, 4, 4)  # gt=2, merged 2x2 grid at merge=2 -> 2*2*2=8 tokens
    n = 2 * 2 * 2
    ids = np.asarray([1, toks.vision_start] + [toks.video_pad] * n + [toks.vision_end, 5])
    pos = get_rope_index(
        ids, [grid], 2, toks.image_pad, video_pad_id=toks.video_pad,
        tokens_per_second=2.0, seconds_per_grid=3.0,
    )
    vid = slice(2, 2 + n)
    t_pos = pos[0, vid] - pos[0, vid].min()
    # second frame group sits 3 s later: t advances 3 * 2 = 6
    assert set(t_pos.tolist()) == {0, 6}
    # text resumes after the max temporal index
    assert pos[0, -1] > pos[0, vid].max()
    # image pads are unscaled (regression: images keep t step 1)
    ids_img = np.asarray([1, toks.vision_start] + [toks.image_pad] * n + [toks.vision_end, 5])
    pos_img = get_rope_index(
        ids_img, [grid], 2, toks.image_pad, video_pad_id=toks.video_pad,
        tokens_per_second=2.0, seconds_per_grid=3.0,
    )
    t_img = pos_img[0, vid] - pos_img[0, vid].min()
    assert set(t_img.tolist()) == {0, 1}


# --- end-to-end -------------------------------------------------------------


@pytest.fixture(scope="module")
def verifier():
    model = QwenVLModel.random_init(jax.random.PRNGKey(0), dtype=jnp.float32)
    head = RewardHead.random_init(jax.random.PRNGKey(1), model.lm_cfg.hidden_size, pooling="last")
    return QwenRewardVerifier(model=model, head=head, max_pixels=16 * 16)


def test_verifier_scores_synthetic_clip(verifier):
    """The Image-Verifier API accepts a 4-frame clip like the reference's
    video path: finite deterministic score, distinct from a same-prompt
    image score (different pads + video_score template)."""
    clip = _clip(T=4, H=32, W=32)
    out = verifier.reward([clip], ["a rotating cube"])
    assert len(out) == 1 and np.isfinite(out[0]["VQ"])
    again = verifier.reward([clip], ["a rotating cube"])
    assert out[0]["VQ"] == again[0]["VQ"]
    img_out = verifier.reward([clip[0]], ["a rotating cube"])
    assert out[0]["VQ"] != img_out[0]["VQ"]


def test_verifier_scores_mixed_batch(verifier):
    """Images and clips in one call: grid-keyed grouping keeps the batched
    tower paths separate."""
    clip = _clip(T=4, H=32, W=32, seed=3)
    img = _clip(T=1, H=32, W=32, seed=4)[0]
    out = verifier.reward([img, clip, img], ["a", "b", "a"])
    assert len(out) == 3 and all(np.isfinite(o["VQ"]) for o in out)
    assert out[0]["VQ"] == out[2]["VQ"]


def test_video_score_template():
    from reflectionflow_tpu.rm_train.prompt_template import build_prompt

    p = build_prompt("a cat runs", dims=["MQ"], template_type="video_score")
    assert "a cat runs" in p and "1.0" in p and "5.0" in p
    assert "motion quality" in p.lower() or "MQ" in p
