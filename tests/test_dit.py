import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reflectionflow_tpu.config import FluxDiTConfig
from reflectionflow_tpu.models.flux.dit import flux_dit_apply, flux_dit_init
from reflectionflow_tpu.models.flux.rope import make_image_ids, make_text_ids

CFG = FluxDiTConfig.tiny()


@pytest.fixture(scope="module")
def setup():
    params = flux_dit_init(jax.random.PRNGKey(0), CFG)
    B, Lt = 2, 8
    inputs = dict(
        img=jax.random.normal(jax.random.PRNGKey(1), (B, 16, CFG.in_channels)),
        txt=jax.random.normal(jax.random.PRNGKey(2), (B, Lt, CFG.text_dim)),
        pooled=jax.random.normal(jax.random.PRNGKey(3), (B, CFG.pooled_dim)),
        timestep=jnp.array([0.5, 0.9]),
        img_ids=jnp.asarray(make_image_ids(4, 4)),
        txt_ids=jnp.asarray(make_text_ids(Lt)),
        guidance=jnp.array([3.5, 3.5]),
    )
    cond = jax.random.normal(jax.random.PRNGKey(4), (B, 4, CFG.in_channels))
    cond_ids = jnp.asarray(make_image_ids(2, 2, position_delta=(0, -2)))
    return params, inputs, cond, cond_ids


def test_output_shape_and_finite(setup):
    params, inputs, _, _ = setup
    out = flux_dit_apply(params, CFG, **inputs)
    assert out.shape == (2, 16, CFG.in_channels)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_cond_stream_changes_output(setup):
    params, inputs, cond, cond_ids = setup
    base = flux_dit_apply(params, CFG, **inputs)
    with_cond = flux_dit_apply(params, CFG, **inputs, cond=cond, cond_ids=cond_ids)
    assert not np.allclose(base, with_cond, atol=1e-4)


def test_union_cond_attn_false_blocks_cross_talk(setup):
    """With the cross-blocks masked AND add_cond_attn off, the img stream
    must be independent of the condition content."""
    params, inputs, cond, cond_ids = setup
    out_a = flux_dit_apply(
        params, CFG, **inputs, cond=cond, cond_ids=cond_ids, union_cond_attn=False
    )
    out_b = flux_dit_apply(
        params, CFG, **inputs, cond=cond * 3.0 + 1.0, cond_ids=cond_ids, union_cond_attn=False
    )
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-5)
    # ... and differ from the no-cond forward only via... actually the cond
    # stream contributes nothing to img when masked, so outputs match no-cond
    base = flux_dit_apply(params, CFG, **inputs)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(base), atol=1e-5)


def test_c_factor_biases_attention(setup):
    params, inputs, cond, cond_ids = setup
    out1 = flux_dit_apply(params, CFG, **inputs, cond=cond, cond_ids=cond_ids)
    out2 = flux_dit_apply(params, CFG, **inputs, cond=cond, cond_ids=cond_ids, c_factor=4.0)
    assert not np.allclose(out1, out2, atol=1e-4)
    # c_factor=1 -> log bias 0 -> identical to no bias
    out3 = flux_dit_apply(params, CFG, **inputs, cond=cond, cond_ids=cond_ids, c_factor=1.0)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out3), atol=1e-5)


def test_add_cond_attn(setup):
    # add_cond_attn requires a cond grid matching the image grid
    params, inputs, _, _ = setup
    cond = jax.random.normal(jax.random.PRNGKey(9), (2, 16, CFG.in_channels))
    cond_ids = jnp.asarray(make_image_ids(4, 4, position_delta=(0, -4)))
    out1 = flux_dit_apply(params, CFG, **inputs, cond=cond, cond_ids=cond_ids)
    out2 = flux_dit_apply(params, CFG, **inputs, cond=cond, cond_ids=cond_ids, add_cond_attn=True)
    assert not np.allclose(out1, out2, atol=1e-4)


def test_remat_matches(setup):
    params, inputs, cond, cond_ids = setup
    a = flux_dit_apply(params, CFG, **inputs, cond=cond, cond_ids=cond_ids)
    b = flux_dit_apply(params, CFG, **inputs, cond=cond, cond_ids=cond_ids, remat=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_timestep_sensitivity(setup):
    params, inputs, _, _ = setup
    mod = dict(inputs)
    mod["timestep"] = jnp.array([0.1, 0.1])
    out1 = flux_dit_apply(params, CFG, **inputs)
    out2 = flux_dit_apply(params, CFG, **mod)
    assert not np.allclose(out1, out2, atol=1e-4)


def test_schnell_no_guidance():
    cfg = FluxDiTConfig.tiny()
    cfg = type(cfg)(**{**cfg.__dict__, "guidance_embeds": False})
    params = flux_dit_init(jax.random.PRNGKey(0), cfg)
    out = flux_dit_apply(
        params,
        cfg,
        jax.random.normal(jax.random.PRNGKey(1), (1, 16, cfg.in_channels)),
        jax.random.normal(jax.random.PRNGKey(2), (1, 4, cfg.text_dim)),
        jax.random.normal(jax.random.PRNGKey(3), (1, cfg.pooled_dim)),
        jnp.array([0.5]),
        jnp.asarray(make_image_ids(4, 4)),
        jnp.asarray(make_text_ids(4)),
    )
    assert out.shape == (1, 16, cfg.in_channels)
