"""Golden-activation parity against real-weight reference dumps.

These run only when `tests/goldens/*.npz` exist (produced by
`tools/dump_goldens.py` in a diffusers-equipped environment with the real
FLUX snapshot). Hermetic CI covers the same code paths with tiny random
weights; this file is the real-weight gate.

Turn-key: `FLUX_MODEL_DIR=... python tools/parity_real_weights.py` chains
convert -> golden dumps -> these tests -> a seeded 512px image hash -> the
GenEval run plan in one command (hermetically exercised end-to-end on a
tiny HF-layout snapshot by tests/test_real_weight_gate.py).
"""

import os

import numpy as np
import pytest

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")


def _load(name):
    path = os.path.join(GOLDENS, name)
    if not os.path.exists(path):
        pytest.skip(f"golden {name} not present (run tools/dump_goldens.py)")
    return np.load(path)


def test_dit_golden():
    import jax.numpy as jnp

    from reflectionflow_tpu.config import FluxDiTConfig
    from reflectionflow_tpu.models.flux.dit import flux_dit_apply
    from reflectionflow_tpu.utils.hf_convert import convert_flux_dit_state
    from reflectionflow_tpu.utils.hf_loader import load_safetensors_dir

    g = _load("flux_dit.npz")
    model_dir = os.environ.get("FLUX_MODEL_DIR")
    if not model_dir:
        pytest.skip("set FLUX_MODEL_DIR to the local FLUX snapshot")
    cfg = FluxDiTConfig()
    params = convert_flux_dit_state(load_safetensors_dir(os.path.join(model_dir, "transformer")), cfg)
    out = flux_dit_apply(
        params, cfg,
        jnp.asarray(g["hidden"]), jnp.asarray(g["txt"]), jnp.asarray(g["pooled"]),
        jnp.asarray(g["timestep"]), jnp.asarray(g["img_ids"]), jnp.asarray(g["txt_ids"]),
        guidance=jnp.asarray(g["guidance"]),
    )
    np.testing.assert_allclose(np.asarray(out), g["expected"], atol=2e-3, rtol=2e-2)


def test_vae_golden():
    import jax.numpy as jnp

    from reflectionflow_tpu.config import FluxVAEConfig
    from reflectionflow_tpu.models.flux.vae import vae_decode
    from reflectionflow_tpu.utils.hf_convert import convert_flux_vae_state
    from reflectionflow_tpu.utils.hf_loader import load_safetensors_dir

    g = _load("flux_vae_decode.npz")
    model_dir = os.environ.get("FLUX_MODEL_DIR")
    if not model_dir:
        pytest.skip("set FLUX_MODEL_DIR to the local FLUX snapshot")
    cfg = FluxVAEConfig()
    params = convert_flux_vae_state(load_safetensors_dir(os.path.join(model_dir, "vae")), cfg)
    lat_nhwc = jnp.asarray(g["latents"].transpose(0, 2, 3, 1))
    out = vae_decode(params["decoder"], cfg, lat_nhwc)
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), g["expected"], atol=2e-3, rtol=2e-2
    )
