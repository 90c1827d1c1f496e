"""End-to-end tiny-pipeline tests: determinism (same latents -> same images)
and the conditioned/image-CFG paths — BASELINE config #1's hermetic analogue."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reflectionflow_tpu.config import CLIPTextConfig, FluxDiTConfig, FluxVAEConfig, T5Config
from reflectionflow_tpu.sampler.condition import Condition, cot_position_delta
from reflectionflow_tpu.sampler.pipeline import FluxPipeline


@pytest.fixture(scope="module")
def pipe():
    return FluxPipeline.random_init(
        jax.random.PRNGKey(0),
        dit_cfg=FluxDiTConfig.tiny(),
        vae_cfg=FluxVAEConfig.tiny(),
        t5_cfg=T5Config.tiny(),
        clip_cfg=CLIPTextConfig.tiny(),
        dtype=jnp.float32,
    )


SIZE = 16  # tiny VAE downscale=2, so 16px -> 8x8 latent -> 4x4=16 tokens


def test_generate_shapes_and_determinism(pipe):
    imgs1 = pipe.generate(["a cat", "a dog"], height=SIZE, width=SIZE, num_inference_steps=2, seed=7)
    imgs2 = pipe.generate(["a cat", "a dog"], height=SIZE, width=SIZE, num_inference_steps=2, seed=7)
    assert imgs1.shape == (2, SIZE, SIZE, 3)
    assert imgs1.dtype == np.uint8
    np.testing.assert_array_equal(imgs1, imgs2)
    imgs3 = pipe.generate(["a cat", "a dog"], height=SIZE, width=SIZE, num_inference_steps=2, seed=8)
    assert not np.array_equal(imgs1, imgs3)


def test_injected_latents_contract(pipe):
    lat = pipe.generate(["x"], height=SIZE, width=SIZE, num_inference_steps=2, seed=3, output_type="latent")
    assert lat.shape == (1, 16, 4 * pipe.vae_cfg.latent_channels)
    from reflectionflow_tpu.models.flux.latents import draw_packed_noise

    noise = draw_packed_noise(
        jax.random.PRNGKey(3), 1, SIZE, SIZE, pipe.vae_cfg.latent_channels, jnp.float32,
        vae_downscale=pipe.vae_cfg.downscale,
    )
    lat2 = pipe.generate(["x"], height=SIZE, width=SIZE, num_inference_steps=2, latents=noise, output_type="latent")
    np.testing.assert_array_equal(np.asarray(lat), np.asarray(lat2))


def test_conditioned_generation(pipe):
    cond_img = (np.random.default_rng(0).random((8, 8, 3)) * 255).astype(np.uint8)
    conds = [Condition("cot", cond_img, position_delta=cot_position_delta(8))]
    base = pipe.generate(["x"], height=SIZE, width=SIZE, num_inference_steps=2, seed=1)
    out = pipe.generate(["x"], height=SIZE, width=SIZE, num_inference_steps=2, seed=1, conditions=conds)
    assert out.shape == base.shape
    assert not np.array_equal(base, out)


def test_image_cfg_path(pipe):
    cond_img = (np.random.default_rng(0).random((8, 8, 3)) * 255).astype(np.uint8)
    conds = [Condition("cot", cond_img, position_delta=cot_position_delta(8))]
    out1 = pipe.generate(["x"], height=SIZE, width=SIZE, num_inference_steps=2, seed=1, conditions=conds)
    out2 = pipe.generate(
        ["x"], height=SIZE, width=SIZE, num_inference_steps=2, seed=1, conditions=conds,
        image_guidance_scale=1.5,
    )
    assert not np.array_equal(out1, out2)
    # igs -> 1.0 in the doubled-batch path must reduce to the conditional pred
    out3 = pipe.generate(
        ["x"], height=SIZE, width=SIZE, num_inference_steps=2, seed=1, conditions=conds,
        image_guidance_scale=1.0 + 1e-9,
    )
    np.testing.assert_allclose(out1.astype(np.int32), out3.astype(np.int32), atol=1)


def test_condition_scale_c_factor(pipe):
    cond_img = (np.random.default_rng(0).random((8, 8, 3)) * 255).astype(np.uint8)
    conds = [Condition("cot", cond_img, position_delta=cot_position_delta(8))]
    out1 = pipe.generate(["x"], height=SIZE, width=SIZE, num_inference_steps=2, seed=1, conditions=conds)
    out2 = pipe.generate(
        ["x"], height=SIZE, width=SIZE, num_inference_steps=2, seed=1, conditions=conds, condition_scale=2.0
    )
    assert not np.array_equal(out1, out2)


def test_phase_swap_cache_and_offload():
    """enable_phase_swap: encode once, text encoders freed between phases,
    cached embeddings reproduce the non-swapped images exactly."""
    pipe2 = FluxPipeline.random_init(
        jax.random.PRNGKey(0),
        dit_cfg=FluxDiTConfig.tiny(),
        vae_cfg=FluxVAEConfig.tiny(),
        t5_cfg=T5Config.tiny(),
        clip_cfg=CLIPTextConfig.tiny(),
        dtype=jnp.float32,
    )
    base = pipe2.generate(["a cat"], height=SIZE, width=SIZE, num_inference_steps=2, seed=7)
    pipe2.enable_phase_swap(offload=("t5",))
    assert pipe2.params["t5"] is None  # freed until first encode
    out = pipe2.generate(["a cat"], height=SIZE, width=SIZE, num_inference_steps=2, seed=7)
    np.testing.assert_array_equal(base, out)
    assert pipe2.params["t5"] is None  # offloaded again after the miss batch
    assert len(pipe2._embed_cache) == 1
    # cache hit: no T5 upload needed at all
    out2 = pipe2.generate(["a cat"], height=SIZE, width=SIZE, num_inference_steps=2, seed=7)
    np.testing.assert_array_equal(base, out2)
    # warm_prompt_cache covers new prompts in one phase
    pipe2.warm_prompt_cache(["a dog", "a bird", "a cat"], max_sequence_length=16)
    assert len(pipe2._embed_cache) >= 3
    assert pipe2.params["t5"] is None


def test_generate_accepts_precomputed_embeddings():
    pipe2 = FluxPipeline.random_init(
        jax.random.PRNGKey(0),
        dit_cfg=FluxDiTConfig.tiny(),
        vae_cfg=FluxVAEConfig.tiny(),
        t5_cfg=T5Config.tiny(),
        clip_cfg=CLIPTextConfig.tiny(),
        dtype=jnp.float32,
    )
    base = pipe2.generate(["a cat"], height=SIZE, width=SIZE, num_inference_steps=2, seed=7)
    txt, pooled = pipe2.encode_prompts(["a cat"], max_sequence_length=512)
    out = pipe2.generate(
        ["a cat"], height=SIZE, width=SIZE, num_inference_steps=2, seed=7, txt=txt, pooled=pooled
    )
    np.testing.assert_array_equal(base, out)


def test_phase_swap_cache_eviction_and_hold():
    pipe2 = FluxPipeline.random_init(
        jax.random.PRNGKey(0),
        dit_cfg=FluxDiTConfig.tiny(),
        vae_cfg=FluxVAEConfig.tiny(),
        t5_cfg=T5Config.tiny(),
        clip_cfg=CLIPTextConfig.tiny(),
        dtype=jnp.float32,
    )
    pipe2.enable_phase_swap(offload=("t5",))
    pipe2._embed_cache_cap = 3
    # warm uploads the encoders once for all batches, then offloads
    uploads = {"n": 0}
    orig = pipe2._ensure_on_device

    def counting(name):
        if pipe2.params.get(name) is None:
            uploads["n"] += 1
        orig(name)

    pipe2._ensure_on_device = counting
    pipe2.warm_prompt_cache([f"prompt {i}" for i in range(5)], max_sequence_length=16, batch=2)
    assert uploads["n"] == 1, uploads
    assert pipe2.params["t5"] is None
    # FIFO eviction keeps the cache bounded
    assert len(pipe2._embed_cache) == 3


def test_enable_prompt_cache_without_phase_swap(key):
    """The co-resident profile's prompt cache: repeated prompts encode once,
    no tree is offloaded (enable_prompt_cache, cli co-res path)."""
    import jax

    from reflectionflow_tpu.config import CLIPTextConfig, FluxVAEConfig, T5Config
    from reflectionflow_tpu.sampler.pipeline import FluxPipeline

    pipe = FluxPipeline.random_init(
        jax.random.PRNGKey(0),
        dit_cfg=FluxDiTConfig.tiny(),
        vae_cfg=FluxVAEConfig.tiny(),
        t5_cfg=T5Config.tiny(),
        clip_cfg=CLIPTextConfig.tiny(),
        dtype=jnp.float32,
    )
    pipe.enable_prompt_cache()
    calls = []
    orig = pipe._encode_raw

    def counting(prompts, L):
        calls.append(list(prompts))
        return orig(prompts, L)

    pipe._encode_raw = counting
    t1, p1 = pipe.encode_prompts(["a", "b"], 16)
    t2, p2 = pipe.encode_prompts(["a", "b"], 16)  # pure cache hit
    assert len(calls) == 1, calls
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2))
    # T5 never offloaded (no phase swap)
    assert pipe.params["t5"] is not None
    # warm_prompt_cache works and only encodes the new prompt
    pipe.warm_prompt_cache(["a", "c"], 16)
    # _encode_raw receives (clip_prompt, t5_prompt) pairs since prompts_2
    assert len(calls) == 2 and calls[1] == [("c", "c")]


def test_vae_tiling_pipeline_path(pipe):
    # tiny 8x8 latent with the default 64-latent tile takes the exact
    # single-tile path, so tiled serving must reproduce the untiled images
    base = pipe.generate(["x"], height=SIZE, width=SIZE, num_inference_steps=2, seed=5)
    pipe.vae_tiling = True
    try:
        tiled = pipe.generate(["x"], height=SIZE, width=SIZE, num_inference_steps=2, seed=5)
    finally:
        pipe.vae_tiling = False
    np.testing.assert_array_equal(base, tiled)


def test_prompts_2_splits_the_towers(pipe):
    """diffusers prompt_2 semantics (reference sample.py:158-170): CLIP
    pools `prompts`, T5 encodes `prompts_2`."""
    txt_a, pooled_a = pipe.encode_prompts(["a cat"], 16)
    txt_b, pooled_b = pipe.encode_prompts(["a reflected dog"], 16)
    txt_s, pooled_s = pipe.encode_prompts(["a cat"], 16, prompts_2=["a reflected dog"])
    # T5 stream follows prompts_2, pooled follows prompts
    np.testing.assert_allclose(np.asarray(txt_s), np.asarray(txt_b), atol=1e-6)
    np.testing.assert_allclose(np.asarray(pooled_s), np.asarray(pooled_a), atol=1e-6)
    assert not np.allclose(np.asarray(txt_s), np.asarray(txt_a))
    assert not np.allclose(np.asarray(pooled_s), np.asarray(pooled_b))
    # and generate() accepts the split without disturbing determinism
    i1 = pipe.generate(["a cat"], prompts_2=["a reflected dog"], height=SIZE, width=SIZE,
                       num_inference_steps=2, seed=7)
    i2 = pipe.generate(["a cat"], prompts_2=["a reflected dog"], height=SIZE, width=SIZE,
                       num_inference_steps=2, seed=7)
    np.testing.assert_array_equal(i1, i2)


def test_prompts_2_length_mismatch_raises(pipe):
    """A mispaired prompts_2 must fail at the API boundary, not zip-truncate
    into a wrong-batch encode."""
    import pytest

    with pytest.raises(ValueError, match="prompts_2"):
        pipe.encode_prompts(["a", "b"], 16, prompts_2=["x"])
    with pytest.raises(ValueError, match="prompts_2"):
        pipe.encode_prompts(["a"], 16, prompts_2=["x", "y"])
