"""Mesh/sharding tests on the virtual 8-device CPU platform."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reflectionflow_tpu.config import (
    CLIPTextConfig,
    FluxDiTConfig,
    FluxVAEConfig,
    T5Config,
)
from reflectionflow_tpu.parallel.mesh import (
    candidate_sharding,
    make_mesh,
    pad_candidates,
    replicate_params,
    shard_batch,
)
from reflectionflow_tpu.parallel.specs import dit_param_spec, shard_dit_params
from reflectionflow_tpu.sampler.pipeline import FluxPipeline


def test_devices_available():
    assert len(jax.devices()) == 8


def test_make_mesh_and_helpers():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8
    assert pad_candidates(3, mesh) == 8
    assert pad_candidates(8, mesh) == 8
    assert pad_candidates(9, mesh) == 16
    x = jnp.zeros((8, 4))
    sharded = shard_batch({"x": x}, mesh)
    assert sharded["x"].sharding.spec == candidate_sharding(mesh).spec


def test_dit_param_specs():
    from jax.sharding import PartitionSpec as P

    assert dit_param_spec("double_blocks/attn/q/w", 3) == P(None, None, "model")
    assert dit_param_spec("double_blocks/attn/out/w", 3) == P(None, "model", None)
    assert dit_param_spec("img_in/w", 2) == P()
    assert dit_param_spec("single_blocks/mlp_in/w", 3) == P(None, None, "model")


def test_tp_sharded_forward_matches_replicated():
    """DiT forward with TP-sharded weights == single-device forward."""
    from jax.sharding import Mesh

    from reflectionflow_tpu.models.flux.dit import flux_dit_apply, flux_dit_init
    from reflectionflow_tpu.models.flux.rope import make_image_ids, make_text_ids

    cfg = FluxDiTConfig.tiny()  # heads=4 divisible by model axis 2
    params = flux_dit_init(jax.random.PRNGKey(0), cfg)
    inputs = dict(
        img=jax.random.normal(jax.random.PRNGKey(1), (2, 16, cfg.in_channels)),
        txt=jax.random.normal(jax.random.PRNGKey(2), (2, 8, cfg.text_dim)),
        pooled=jax.random.normal(jax.random.PRNGKey(3), (2, cfg.pooled_dim)),
        timestep=jnp.array([0.5, 0.7]),
        img_ids=jnp.asarray(make_image_ids(4, 4)),
        txt_ids=jnp.asarray(make_text_ids(8)),
        guidance=jnp.array([3.5, 3.5]),
    )
    ref = flux_dit_apply(params, cfg, **inputs)
    mesh = Mesh(np.asarray(jax.devices()).reshape(4, 2), ("data", "model"))
    with mesh:
        sharded = shard_dit_params(params, mesh)
        out = flux_dit_apply(sharded, cfg, **inputs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pipeline_mesh_sharded_generation_matches_single():
    """Candidate-sharded generation == unsharded generation (bitwise on CPU)."""
    pipe = FluxPipeline.random_init(
        jax.random.PRNGKey(0),
        dit_cfg=FluxDiTConfig.tiny(),
        vae_cfg=FluxVAEConfig.tiny(),
        t5_cfg=T5Config.tiny(),
        clip_cfg=CLIPTextConfig.tiny(),
        dtype=jnp.float32,
    )
    prompts = [f"prompt {i}" for i in range(8)]
    base = pipe.generate(prompts, height=16, width=16, num_inference_steps=2, seed=0)
    mesh = make_mesh()
    pipe.mesh = mesh
    pipe.params = replicate_params(pipe.params, mesh)
    sharded = pipe.generate(prompts, height=16, width=16, num_inference_steps=2, seed=0)
    pipe.mesh = None
    np.testing.assert_allclose(
        base.astype(np.int32), sharded.astype(np.int32), atol=1
    )


def test_reflectionflow_block_on_mesh(tmp_path):
    """Full reflection loop with (block x branch) candidates sharded over the
    8-device mesh — the headline TPU-native configuration."""
    import jax.numpy as jnp

    from reflectionflow_tpu.config import TTSConfig
    from reflectionflow_tpu.reflect import FakeReflector, FakeRefiner
    from reflectionflow_tpu.search.reflectionflow import run_reflectionflow_block
    from reflectionflow_tpu.verifiers import FakeVerifier

    pipe = FluxPipeline.random_init(
        jax.random.PRNGKey(0),
        dit_cfg=FluxDiTConfig.tiny(),
        vae_cfg=FluxVAEConfig.tiny(),
        t5_cfg=T5Config.tiny(),
        clip_cfg=CLIPTextConfig.tiny(),
        dtype=jnp.float32,
    )
    cfg = TTSConfig()
    cfg.pipeline_args.height = cfg.pipeline_args.width = 16
    cfg.pipeline_args.num_inference_steps = 2
    cfg.pipeline_args.condition_size = 8
    cfg.search_args.search_rounds = 1
    cfg.search_args.search_branch = 2
    rows = [{"prompt": f"p{i}", "tag": None} for i in range(4)]  # 4 x 2 = 8 candidates

    # unsharded baseline
    run_reflectionflow_block(
        pipe, FakeVerifier(), FakeReflector(), FakeRefiner(), cfg, rows,
        str(tmp_path / "base"), run_seed=5,
    )
    # mesh-sharded
    mesh = make_mesh()
    pipe.mesh = mesh
    pipe.params = replicate_params(pipe.params, mesh)
    run_reflectionflow_block(
        pipe, FakeVerifier(), FakeReflector(), FakeRefiner(), cfg, rows,
        str(tmp_path / "mesh"), run_seed=5,
    )
    pipe.mesh = None
    # identical artifacts (same candidate filenames, same best selections)
    import glob
    import os

    for i in range(4):
        a = sorted(os.path.basename(p) for p in glob.glob(str(tmp_path / "base" / f"{i:05d}" / "midimg" / "*.png")))
        b = sorted(os.path.basename(p) for p in glob.glob(str(tmp_path / "mesh" / f"{i:05d}" / "midimg" / "*.png")))
        assert a == b and len(a) == 4  # round0 bootstrap + round 1
