"""Rectified-flow LoRA training for the FLUX-Corrector.

Capability parity with `OminiModel.step`
(`/root/reference/train_flux/train/model.py:164-238`):

  * x_0 = VAE-encoded good image (packed tokens), x_1 ~ N(0, I);
  * t = sigmoid(N(0,1)) per sample; x_t = (1-t) x_0 + t x_1;
  * condition = VAE-encoded bad image + position delta, cond timestep 0;
  * text: T5 encodes `description` ("{prompt} [Reflexion] {reflection}"),
    CLIP pools the original prompt; guidance = 1.0;
  * loss = MSE(v_pred, x_1 - x_0).

TPU-native: the train step is ONE jitted pure function — LoRA params are
the only trainable leaves; the frozen base DiT is passed as a jit ARGUMENT
every call (never closed over — a closure would embed the multi-GB tree as
HLO constants); the LoRA is attached as per-layer low-rank adds (gradients
flow through the adds), reproducing the `latent_lora=False` gating exactly
(only the condition stream sees the adapter). Batch is sharded over the
"data" mesh axis; gradient allreduce is inserted by XLA from sharding
propagation.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax

from ..config import FluxDiTConfig, TrainConfig
from ..lora.lora import attach_lora
from ..models.flux.dit import flux_dit_apply
from ..models.flux.latents import pack_latents
from ..models.flux.rope import make_image_ids, make_text_ids
from ..models.flux.text import clip_text_encode, t5_encode
from ..models.flux.vae import vae_encode


def rf_loss(
    adapters: dict,
    base_dit_params,
    dit_cfg: FluxDiTConfig,
    batch: dict,
    key: jax.Array,
    alpha: float = 32.0,
    r: int = 32,
    latent_lora: bool = False,
    model_flags: dict | None = None,
    attn_impl: str = "xla",
) -> tuple[jnp.ndarray, dict]:
    """batch: {x0 (B,L,C), cond (B,Lc,C), txt (B,Lt,D), pooled (B,P),
    img_ids (L,3), txt_ids (Lt,3), cond_ids (Lc,3)}.

    `adapters` is the trainable tree ({path: {A, B}}); alpha/r are static."""
    model_flags = model_flags or {}
    x0 = batch["x0"].astype(jnp.float32)
    B = x0.shape[0]
    k_t, k_noise = jax.random.split(key)
    t = jax.nn.sigmoid(jax.random.normal(k_t, (B,)))
    x1 = jax.random.normal(k_noise, x0.shape)
    x_t = ((1.0 - t[:, None, None]) * x0 + t[:, None, None] * x1).astype(batch["x0"].dtype)

    # per-layer low-rank adds — never materialize the folded 11.9 GB tree
    lora = {"_alpha": alpha, "_r": r, "adapters": adapters}
    attached = attach_lora(base_dit_params, lora)
    main = attached if latent_lora else base_dit_params

    guidance = jnp.ones((B,), x_t.dtype) if dit_cfg.guidance_embeds else None
    pred = flux_dit_apply(
        main,
        dit_cfg,
        x_t,
        batch["txt"],
        batch["pooled"],
        t,
        batch["img_ids"],
        batch["txt_ids"],
        guidance=guidance,
        cond=batch["cond"],
        cond_ids=batch["cond_ids"],
        cond_params=attached,
        union_cond_attn=model_flags.get("union_cond_attn", True),
        add_cond_attn=model_flags.get("add_cond_attn", False),
        attn_impl=attn_impl,
        remat=True,
    )
    target = (x1 - x0).astype(jnp.float32)
    loss = jnp.mean((pred.astype(jnp.float32) - target) ** 2)
    return loss, {"loss": loss, "t_mean": jnp.mean(t)}


def make_train_step(
    base_dit_params,
    dit_cfg: FluxDiTConfig,
    optimizer: optax.GradientTransformation,
    alpha: float = 32.0,
    r: int = 32,
    latent_lora: bool = False,
    model_flags: dict | None = None,
    mesh=None,
    attn_impl: str = "xla",
):
    """Returns jitted `step(adapters, opt_state, batch, key) ->
    (adapters, opt_state, metrics)` over the trainable adapter tree.

    The frozen base weights are passed as a jit ARGUMENT every call (free —
    they already live on device): closing the jit over them would embed the
    multi-GB tree as HLO constants, exploding trace/compile time and
    doubling device memory (the zero-arg-closure pitfall).

    NOTE: `optimizer` must be the SAME transformation whose `.init` produced
    `opt_state` — use `make_optimizer`, which already chains gradient
    clipping (`TrainConfig.optimizer.grad_clip`)."""
    # int8-QK^T attention is serving-only (no custom_vjp): fail HERE with a
    # clear message rather than deep inside jax.grad's trace of the scan.
    # ring* = sequence-parallel ring attention (ops.ring_attention): needs
    # ops.attention.set_ring_context(mesh, axis) first; union_cond_attn only.
    trainable = ("xla", "pallas", "pallas_interpret", "ring", "ring_pallas", "ring_pallas_interpret")
    if attn_impl not in trainable:
        raise ValueError(
            f"attn_impl={attn_impl!r} has no backward pass; training supports {trainable}"
        )

    def step(adapters, opt_state, batch, key, base_params):
        (loss, metrics), grads = jax.value_and_grad(rf_loss, has_aux=True)(
            adapters, base_params, dit_cfg, batch, key,
            alpha=alpha, r=r, latent_lora=latent_lora, model_flags=model_flags,
            attn_impl=attn_impl,
        )
        gnorm = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, opt_state, adapters)
        adapters = optax.apply_updates(adapters, updates)
        metrics = dict(metrics, grad_norm=gnorm)
        return adapters, opt_state, metrics

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))

        def sharded_step(lora_params, opt_state, batch, key, base_params):
            batch = {
                k: jax.lax.with_sharding_constraint(v, data if k in ("x0", "cond", "txt", "pooled") else repl)
                for k, v in batch.items()
            }
            return step(lora_params, opt_state, batch, key, base_params)

        jitted = jax.jit(sharded_step)
    else:
        jitted = jax.jit(step)

    def run(adapters, opt_state, batch, key):
        return jitted(adapters, opt_state, batch, key, base_dit_params)

    return run


# ---------------------------------------------------------------------------
# host-side batch preparation (frozen encoders, no grad)
# ---------------------------------------------------------------------------


def prepare_batch_tensors(pipeline, batch: dict[str, Any], position_delta: tuple[int, int]):
    """Raw sample dict -> device tensors for `rf_loss`.

    batch: {"image": (B,H,W,3) float in [-1,1], "condition": (B,Hc,Wc,3),
    "original_prompt": [str], "description": [str]} — the collated output of
    `train.data` (semantics of model.py:173-204)."""
    vae_p = pipeline.params["vae"]["encoder"]
    x0_grid = vae_encode(vae_p, pipeline.vae_cfg, jnp.asarray(batch["image"], pipeline.dtype))
    x0 = pack_latents(x0_grid)
    cond_grid = vae_encode(vae_p, pipeline.vae_cfg, jnp.asarray(batch["condition"], pipeline.dtype))
    cond = pack_latents(cond_grid)

    t5_in = pipeline.t5_tokenizer(list(batch["description"]), max_length=512)
    txt = t5_encode(pipeline.params["t5"], pipeline.t5_cfg, jnp.asarray(t5_in["input_ids"]))
    clip_in = pipeline.clip_tokenizer(
        list(batch["original_prompt"]), max_length=pipeline.clip_cfg.max_position_embeddings
    )
    _, pooled = clip_text_encode(pipeline.params["clip"], pipeline.clip_cfg, jnp.asarray(clip_in["input_ids"]))

    img_ids = jnp.asarray(make_image_ids(x0_grid.shape[1] // 2, x0_grid.shape[2] // 2))
    cond_ids = jnp.asarray(
        make_image_ids(cond_grid.shape[1] // 2, cond_grid.shape[2] // 2, position_delta=position_delta)
    )
    return {
        "x0": x0.astype(pipeline.dtype),
        "cond": cond.astype(pipeline.dtype),
        "txt": txt.astype(pipeline.dtype),
        "pooled": pooled.astype(pipeline.dtype),
        "img_ids": img_ids,
        "txt_ids": jnp.asarray(make_text_ids(txt.shape[1])),
        "cond_ids": cond_ids,
    }


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """Optimizer incl. grad clipping (Prodigy lr=1 is the reference default,
    `/root/reference/train_flux/config.yaml:62-68`)."""
    o = cfg.optimizer
    if o.name == "prodigy":
        import optax.contrib as contrib

        base = contrib.prodigy(learning_rate=o.lr, weight_decay=o.weight_decay, safeguard_warmup=True)
    elif o.name == "adamw":
        base = optax.adamw(o.lr, weight_decay=o.weight_decay)
    elif o.name == "sgd":
        base = optax.sgd(o.lr)
    else:
        raise ValueError(f"unknown optimizer {o.name}")
    if o.grad_clip and o.grad_clip > 0:
        base = optax.chain(optax.clip_by_global_norm(o.grad_clip), base)
    if o.grad_accum and o.grad_accum > 1:
        # accumulate_grad_batches parity (reference train.py grad accumulation)
        base = optax.MultiSteps(base, every_k_schedule=o.grad_accum)
    return base
