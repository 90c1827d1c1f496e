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


# --- tiled encode/decode (diffusers enable_vae_tiling parity) --------------

from reflectionflow_tpu.models.flux.vae import (  # noqa: E402
    vae_decode_tiled,
    vae_encode_moments,
    vae_encode_tiled,
)


def test_decode_tiled_single_tile_is_exact(key):
    params = vae_init(key, CFG)
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, CFG.latent_channels))
    np.testing.assert_array_equal(
        np.asarray(vae_decode_tiled(params["decoder"], CFG, lat, tile_latent=8)),
        np.asarray(vae_decode(params["decoder"], CFG, lat)),
    )


def test_decode_tiled_stitch_exact_with_shift_invariant_decoder(key):
    # a purely local decoder (nearest x2 upsample + channel mix) produces
    # IDENTICAL values in every overlap, so the linear cross-fade must
    # reconstruct the full-image decode bit-exactly — this pins the tile /
    # stride / blend / crop arithmetic (incl. clipped edge tiles: 12 is not
    # a multiple of the stride 6)
    s = CFG.downscale
    mix = jax.random.normal(key, (CFG.latent_channels, 3))

    def local_decode(z):
        up = jnp.repeat(jnp.repeat(z, s, axis=1), s, axis=2)
        return up @ mix

    lat = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 20, CFG.latent_channels))
    tiled = vae_decode_tiled(None, CFG, lat, tile_latent=8, decode_fn=local_decode)
    full = local_decode(lat)
    assert tiled.shape == full.shape == (2, 12 * s, 20 * s, 3)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(full), atol=1e-6)


def test_decode_tiled_real_vae_shape_and_seam_tolerance(key):
    params = vae_init(key, CFG)
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 12, 12, CFG.latent_channels)) * 0.1
    tiled = vae_decode_tiled(params["decoder"], CFG, lat, tile_latent=8)
    full = vae_decode(params["decoder"], CFG, lat)
    assert tiled.shape == full.shape
    assert bool(jnp.all(jnp.isfinite(tiled)))
    # NOTE: no closeness bound vs the untiled decode — per-tile GroupNorm
    # statistics make tiled != untiled by construction (diffusers' tiled
    # decode has the same property), and with random weights at 8-latent
    # tiles the gap is large. The stitch arithmetic itself is pinned
    # bit-exactly by the shift-invariant-decoder test above.
    again = vae_decode_tiled(params["decoder"], CFG, lat, tile_latent=8)
    np.testing.assert_array_equal(np.asarray(tiled), np.asarray(again))


def test_encode_tiled_single_tile_is_exact(key):
    params = vae_init(key, CFG)
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 16, 3), minval=-1, maxval=1)
    np.testing.assert_array_equal(
        np.asarray(vae_encode_tiled(params["encoder"], CFG, img, tile_sample=16)),
        np.asarray(vae_encode(params["encoder"], CFG, img)),
    )


def test_encode_tiled_stitch_exact_with_shift_invariant_encoder(key):
    # local "encoder": average-pool by the VAE scale + channel mix to
    # mean|logvar — overlap values identical, so moment blending + the
    # shared sampling path must match the untiled encode exactly
    s = CFG.downscale
    mix = jax.random.normal(key, (3, 2 * CFG.latent_channels))

    def local_moments(img):
        B, H, W, C = img.shape
        pooled = img.reshape(B, H // s, s, W // s, s, C).mean(axis=(2, 4))
        return pooled @ mix

    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 24, 40, 3), minval=-1, maxval=1)
    tiled = vae_encode_tiled(
        None, CFG, img, tile_sample=16, overlap_factor=0.25, moments_fn=local_moments
    )
    full = _moments_to_latents_ref(local_moments(img), CFG)
    assert tiled.shape == full.shape == (1, 12, 20, CFG.latent_channels)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(full), atol=1e-6)


def _moments_to_latents_ref(moments, cfg):
    mean, _ = jnp.split(moments, 2, axis=-1)
    return (mean - cfg.shift_factor) * cfg.scaling_factor


def test_encode_tiled_rejects_misaligned_tiles(key):
    import pytest

    img = jnp.zeros((1, 24, 24, 3))
    with pytest.raises(AssertionError):
        # stride 16*(1-0.3)=11 is not a multiple of the VAE scale 2
        vae_encode_tiled(None, CFG, img, tile_sample=16, overlap_factor=0.3)


def test_decode_tiled_rejects_misaligned_overlap(key):
    import pytest

    lat = jnp.zeros((1, 12, 12, CFG.latent_channels))
    with pytest.raises(AssertionError, match="misalign"):
        # kept extent int(8*s) - int(8*s*0.3) != int(8*0.7)*s -> silent
        # mis-stitch without the guard
        vae_decode_tiled(None, CFG, lat, tile_latent=8, overlap_factor=0.3,
                         decode_fn=lambda z: jnp.repeat(jnp.repeat(z[..., :3], CFG.downscale, 1),
                                                        CFG.downscale, 2))


def test_encode_conditions_tiled_matches_untiled(key):
    """pipeline vae_tiling now covers the condition encode: at a >tile-size
    condition the tiled and untiled encodes agree on the blended interior."""
    from reflectionflow_tpu.sampler.condition import Condition, encode_conditions

    params = vae_init(key, CFG)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    conds = [Condition("cot", img, position_delta=(0, -1))]
    t0, ids0 = encode_conditions(conds, params, CFG, jnp.float32, tiled=False)
    t1, ids1 = encode_conditions(conds, params, CFG, jnp.float32, tiled=True)
    assert t0.shape == t1.shape and ids0.shape == ids1.shape
    np.testing.assert_array_equal(np.asarray(ids0), np.asarray(ids1))
    # 32px > the VAE's 512px default tile? no — the default tile covers it, so
    # tiled must take the exact untiled path and match bit-for-bit
    np.testing.assert_allclose(np.asarray(t0), np.asarray(t1), atol=1e-6)
