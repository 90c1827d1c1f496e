"""Training subsystem tests: data pipeline semantics, rectified-flow step,
checkpoint/resume, diffusers LoRA export roundtrip."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from reflectionflow_tpu.config import (
    CLIPTextConfig,
    FluxDiTConfig,
    FluxVAEConfig,
    T5Config,
    TrainConfig,
)
from reflectionflow_tpu.lora.lora import convert_diffusers_lora, lora_init
from reflectionflow_tpu.sampler.pipeline import FluxPipeline
from reflectionflow_tpu.train.data import (
    GenRefDataset,
    StageSchedule,
    iter_tar_samples,
    write_synthetic_shard,
)
from reflectionflow_tpu.train.rectified_flow import (
    make_train_step,
    prepare_batch_tensors,
    rf_loss,
)
from reflectionflow_tpu.train.train_loop import export_diffusers_lora, train


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


@pytest.fixture(scope="module")
def shard(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("shards") / "genref_000.tar")
    write_synthetic_shard(path, n=8, size=24)
    return path


def test_tar_reader(shard):
    samples = list(iter_tar_samples(shard))
    assert len(samples) == 8
    s = samples[0]
    assert s.good.shape == (24, 24, 3)
    assert s.prompt.startswith("prompt")
    assert s.subset in ("general", "editing")


def test_stage_schedule_interpolation():
    sched = StageSchedule(
        split_ratios={"general": [0.1, 0.3], "editing": [0.7, 0.0], "rule": [0.2, 0.7]},
        training_stages=[0, 100],
    )
    r0 = sched.ratios_at(0)
    assert np.isclose(r0["editing"], 0.7)
    r50 = sched.ratios_at(50)
    assert np.isclose(r50["editing"], 0.35, atol=1e-6)
    r_end = sched.ratios_at(1000)
    assert np.isclose(r_end["editing"], 0.0)
    assert np.isclose(sum(r50.values()), 1.0)


def test_dataset_batches_and_drops(shard):
    ds = GenRefDataset(
        shards=[shard], batch_size=4, target_size=16, condition_size=8,
        drop_text_prob=1.0, drop_image_prob=0.0, drop_reflection_prob=0.0,
        schedule=StageSchedule({"general": [1.0], "editing": [0.0]}, [0]),
    )
    batch = next(iter(ds))
    assert batch["image"].shape == (4, 16, 16, 3)
    assert batch["condition"].shape == (4, 8, 8, 3)
    assert batch["image"].min() >= -1.0 and batch["image"].max() <= 1.0
    # drop_text=1 -> all prompts empty, description falls back to reflection format
    assert all(p == "" for p in batch["original_prompt"])
    assert all(d.startswith(" [Reflexion]") or d == "" for d in batch["description"])

    ds2 = GenRefDataset(
        shards=[shard], batch_size=4, target_size=16, condition_size=8,
        drop_text_prob=0.0, drop_image_prob=1.0, drop_reflection_prob=1.0,
        schedule=StageSchedule({"general": [1.0]}, [0]),
    )
    b2 = next(iter(ds2))
    # black condition = -1 everywhere (except editing subset, excluded here)
    assert np.allclose(b2["condition"], -1.0)
    assert all("[Reflexion]" not in d for d in b2["description"])


def test_rf_loss_and_grads(pipe, shard):
    ds = GenRefDataset(
        shards=[shard], batch_size=2, target_size=16, condition_size=8,
        schedule=StageSchedule({"general": [0.5], "editing": [0.5]}, [0]),
    )
    raw = next(iter(ds))
    batch = prepare_batch_tensors(pipe, raw, position_delta=(0, -1))
    assert batch["x0"].shape[0] == 2
    lora = lora_init(jax.random.PRNGKey(1), pipe.params["dit"], r=2, alpha=2)
    loss, metrics = rf_loss(
        lora["adapters"], pipe.params["dit"], pipe.dit_cfg, batch, jax.random.PRNGKey(2),
        alpha=2, r=2,
    )
    assert np.isfinite(float(loss))
    grads = jax.grad(lambda a: rf_loss(a, pipe.params["dit"], pipe.dit_cfg, batch, jax.random.PRNGKey(2), alpha=2, r=2)[0])(lora["adapters"])
    gnorm = optax.global_norm(grads)
    assert float(gnorm) > 0  # the adapter receives gradient through the cond stream


def test_train_loop_runs_and_resumes(pipe, shard, tmp_path):
    cfg = TrainConfig(max_steps=3, save_interval=2, checkpoint_dir=str(tmp_path / "ckpt"))
    cfg.lora.r = 2
    cfg.lora.alpha = 2
    cfg.optimizer.name = "adamw"
    cfg.optimizer.lr = 1e-3
    cfg.data.condition_size = 8
    ds = GenRefDataset(
        shards=[shard], batch_size=2, target_size=16, condition_size=8,
        schedule=StageSchedule({"general": [1.0]}, [0]),
    )
    out = train(pipe, cfg, ds)
    assert "loss" in out["metrics"]
    assert os.path.exists(tmp_path / "ckpt" / "latest")
    log = open(tmp_path / "ckpt" / "metrics.jsonl").read().strip().splitlines()
    assert len(log) == 3
    # resume: bump max_steps, should continue from step 3 (2 more rows)
    cfg.max_steps = 5
    train(pipe, cfg, ds)
    log = open(tmp_path / "ckpt" / "metrics.jsonl").read().strip().splitlines()
    assert len(log) == 5


def test_prodigy_optimizer_available(pipe):
    from reflectionflow_tpu.train.rectified_flow import make_optimizer

    cfg = TrainConfig()
    opt = make_optimizer(cfg)  # prodigy by default
    lora = lora_init(jax.random.PRNGKey(1), pipe.params["dit"], r=2, alpha=2)
    state = opt.init(lora["adapters"])
    g = jax.tree.map(jnp.ones_like, lora["adapters"])
    updates, _ = opt.update(g, state, lora["adapters"])
    assert np.isfinite(float(optax.global_norm(updates)))


def test_export_diffusers_lora_roundtrip(pipe, tmp_path):
    from safetensors.numpy import load_file

    cfg = pipe.dit_cfg
    lora = lora_init(jax.random.PRNGKey(1), pipe.params["dit"], r=2, alpha=2)
    # make B nonzero so the roundtrip is meaningful
    lora["adapters"] = jax.tree.map(lambda x: x + 1.0, lora["adapters"])
    path = str(tmp_path / "lora.safetensors")
    export_diffusers_lora(lora["adapters"], path, alpha=2, num_double=cfg.num_double_blocks, num_single=cfg.num_single_blocks)
    sd = load_file(path)
    back = convert_diffusers_lora(sd, cfg.num_double_blocks, cfg.num_single_blocks, alpha=2)
    assert back["_r"] == 2
    for p, ab in lora["adapters"].items():
        np.testing.assert_allclose(np.asarray(ab["A"], np.float32), back["adapters"][p]["A"], atol=1e-6)


def test_grad_accumulation(pipe, shard, tmp_path):
    """optax.MultiSteps: params only move every grad_accum steps."""
    from reflectionflow_tpu.config import TrainConfig
    from reflectionflow_tpu.lora.lora import lora_init
    from reflectionflow_tpu.train.data import GenRefDataset, StageSchedule
    from reflectionflow_tpu.train.rectified_flow import (
        make_optimizer,
        make_train_step,
        prepare_batch_tensors,
    )

    cfg = TrainConfig()
    cfg.optimizer.name = "adamw"
    cfg.optimizer.lr = 1e-3
    cfg.optimizer.grad_accum = 2
    opt = make_optimizer(cfg)
    lora = lora_init(jax.random.PRNGKey(1), pipe.params["dit"], r=2, alpha=2)
    adapters = lora["adapters"]
    opt_state = opt.init(adapters)
    step = make_train_step(pipe.params["dit"], pipe.dit_cfg, opt, alpha=2, r=2)
    ds = GenRefDataset(
        shards=[shard], batch_size=2, target_size=16, condition_size=8,
        schedule=StageSchedule({"general": [1.0]}, [0]),
    )
    batch = prepare_batch_tensors(pipe, next(iter(ds)), (0, -1))
    a0 = np.asarray(adapters["img_in/w"]["B"])
    adapters, opt_state, _ = step(adapters, opt_state, batch, jax.random.PRNGKey(0))
    # first micro-step: accumulation only, no param change
    np.testing.assert_array_equal(np.asarray(adapters["img_in/w"]["B"]), a0)
    adapters, opt_state, _ = step(adapters, opt_state, batch, jax.random.PRNGKey(1))
    assert not np.array_equal(np.asarray(adapters["img_in/w"]["B"]), a0)


def test_rf_loss_grads_match_across_attn_impls(pipe, shard):
    """Gradients through the pallas custom_vjp backward == XLA autodiff in
    the full rectified-flow loss (the train path TrainConfig.attn_impl
    selects)."""
    ds = GenRefDataset(
        shards=[shard], batch_size=1, target_size=16, condition_size=8,
        schedule=StageSchedule({"general": [1.0]}, [0]),
    )
    raw = next(iter(ds))
    batch = prepare_batch_tensors(pipe, raw, position_delta=(0, -1))
    lora = lora_init(jax.random.PRNGKey(1), pipe.params["dit"], r=2, alpha=2)

    def grads_with(impl):
        return jax.grad(
            lambda a: rf_loss(
                a, pipe.params["dit"], pipe.dit_cfg, batch, jax.random.PRNGKey(2),
                alpha=2, r=2, attn_impl=impl,
            )[0]
        )(lora["adapters"])

    g_xla = grads_with("xla")
    g_pallas = grads_with("pallas_interpret")
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-3
        ),
        g_pallas,
        g_xla,
    )
