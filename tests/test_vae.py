import jax
import jax.numpy as jnp
import numpy as np

from reflectionflow_tpu.config import FluxVAEConfig
from reflectionflow_tpu.models.flux.vae import (
    group_norm,
    vae_decode,
    vae_encode,
    vae_init,
)

CFG = FluxVAEConfig.tiny()  # downscale 2


def test_group_norm_matches_numpy(key):
    x = jax.random.normal(key, (2, 4, 4, 8))
    p = {"scale": jnp.full((8,), 2.0), "bias": jnp.full((8,), 0.5)}
    out = group_norm(x, p, num_groups=4)
    xn = np.asarray(x).reshape(2, 4, 4, 4, 2)
    mu = xn.mean(axis=(1, 2, 4), keepdims=True)
    var = xn.var(axis=(1, 2, 4), keepdims=True)
    expected = ((xn - mu) / np.sqrt(var + 1e-6)).reshape(2, 4, 4, 8) * 2.0 + 0.5
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_encode_decode_shapes(key):
    params = vae_init(key, CFG)
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3), minval=-1, maxval=1)
    lat = vae_encode(params["encoder"], CFG, img)
    assert lat.shape == (2, 8, 8, CFG.latent_channels)
    out = vae_decode(params["decoder"], CFG, lat)
    assert out.shape == (2, 16, 16, 3)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_encode_deterministic_mode_vs_sample(key):
    params = vae_init(key, CFG)
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 8, 8, 3))
    a = vae_encode(params["encoder"], CFG, img)
    b = vae_encode(params["encoder"], CFG, img)
    assert jnp.array_equal(a, b)  # mode is deterministic
    c = vae_encode(params["encoder"], CFG, img, key=jax.random.PRNGKey(2))
    assert not jnp.array_equal(a, c)  # sampling differs


def test_scaling_shift_applied(key):
    cfg = FluxVAEConfig(
        latent_channels=4, block_out_channels=(8, 16), layers_per_block=1,
        norm_num_groups=4, scaling_factor=0.5, shift_factor=0.25,
    )
    params = vae_init(key, cfg)
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 8, 8, 3))
    lat_scaled = vae_encode(params["encoder"], cfg, img)
    cfg_id = FluxVAEConfig(
        latent_channels=4, block_out_channels=(8, 16), layers_per_block=1,
        norm_num_groups=4, scaling_factor=1.0, shift_factor=0.0,
    )
    lat_raw = vae_encode(params["encoder"], cfg_id, img)
    np.testing.assert_allclose(
        np.asarray(lat_scaled), (np.asarray(lat_raw) - 0.25) * 0.5, atol=1e-5
    )
