import jax
import jax.numpy as jnp
import numpy as np

from reflectionflow_tpu.models.flux.latents import (
    draw_packed_noise,
    latent_tokens,
    pack_latents,
    unpack_latents,
)
from reflectionflow_tpu.models.flux.rope import make_image_ids, make_text_ids


def test_pack_unpack_roundtrip(key):
    lat = jax.random.normal(key, (2, 8, 12, 16))
    packed = pack_latents(lat)
    assert packed.shape == (2, 4 * 6, 64)
    assert jnp.allclose(unpack_latents(packed, 4, 6), lat)


def test_pack_channel_major_layout():
    # token features must be channel-major over the 2x2 patch
    lat = np.zeros((1, 2, 2, 3), np.float32)
    for c in range(3):
        lat[0, :, :, c] = np.array([[0, 1], [2, 3]]) + 10 * c
    packed = np.asarray(pack_latents(jnp.asarray(lat)))[0, 0]
    # first 3 entries: all channels at patch pos (0,0)... wait, layout is
    # (C, py, px): c0@(0,0), c0@(0,1), c0@(1,0), c0@(1,1), c1@(0,0)...
    expected = np.concatenate([np.array([0, 1, 2, 3]) + 10 * c for c in range(3)])
    assert np.allclose(packed, expected)


def test_latent_tokens_1024():
    assert latent_tokens(1024, 1024) == (64, 64)
    assert latent_tokens(512, 512) == (32, 32)


def test_draw_packed_noise_deterministic(key):
    a = draw_packed_noise(key, 2, 64, 64, 16, jnp.float32)
    b = draw_packed_noise(key, 2, 64, 64, 16, jnp.float32)
    assert a.shape == (2, 4 * 4, 64)
    assert jnp.array_equal(a, b)


def test_image_ids_grid_and_delta():
    ids = make_image_ids(2, 3)
    assert ids.shape == (6, 3)
    assert np.array_equal(ids[:, 0], np.zeros(6))
    assert np.array_equal(ids[:, 1], [0, 0, 0, 1, 1, 1])
    assert np.array_equal(ids[:, 2], [0, 1, 2, 0, 1, 2])
    ids_d = make_image_ids(2, 3, position_delta=(0, -32))
    assert np.array_equal(ids_d[:, 2], np.array([0, 1, 2, 0, 1, 2]) - 32)
    assert np.array_equal(make_text_ids(5), np.zeros((5, 3)))


def test_latent_registry():
    from reflectionflow_tpu.models.registry import family_for_model, get_latent_spec

    assert family_for_model("black-forest-labs/FLUX.1-dev") == "flux"
    assert family_for_model("stabilityai/stable-diffusion-3-medium") == "sd3"
    assert family_for_model("stabilityai/stable-diffusion-xl-base-1.0") == "sdxl"
    flux = get_latent_spec("flux")
    lat = flux.prepare(jax.random.PRNGKey(0), 2, 64, 64, jnp.float32)
    assert lat.shape == (2, 16, 64)  # packed tokens
    assert flux.seq_len(1024, 1024) == 4096
    sd = get_latent_spec("sd")
    lat = sd.prepare(jax.random.PRNGKey(0), 1, 64, 64, jnp.float32)
    assert lat.shape == (1, 8, 8, 4)
