"""The jitted FLUX sampling core + user-facing pipeline.

Re-design of the reference's conditioned Euler pipeline
(`/root/reference/train_flux/flux/generate.py:75-320`) as pure jitted
functions:

  * the denoise loop is a `lax.scan` over the precomputed sigma schedule —
    zero host round-trips between steps;
  * image CFG runs the conditional and black-condition branches as one
    doubled batch through the DiT (the reference does two serial forwards);
  * candidate parallelism is the batch axis: the search loops shard it over
    the mesh (`parallel.sharding`), not a serial micro-batch loop.

Everything here takes explicit params/config — state lives in
`pipeline.FluxPipeline`, which owns weights and tokenizers.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FluxDiTConfig
from ..models.flux.dit import flux_dit_apply
from .scheduler import FlowMatchSchedule


@partial(
    jax.jit,
    static_argnames=(
        "cfg",
        "union_cond_attn",
        "add_cond_attn",
        "attn_impl",
        "rope_layout",
        "num_steps",
        "c_factor",  # static so the Pallas path can burn log(c) into the kernel
    ),
)
def denoise(
    dit_params,
    cfg: FluxDiTConfig,
    latents: jnp.ndarray,  # (B, L_img, C) packed noise
    txt: jnp.ndarray,  # (B, L_txt, text_dim)
    pooled: jnp.ndarray,  # (B, pooled_dim)
    img_ids: jnp.ndarray,  # (L_img, 3)
    txt_ids: jnp.ndarray,  # (L_txt, 3)
    sigmas: jnp.ndarray,  # (num_steps + 1,)
    guidance_scale: jnp.ndarray,  # scalar
    num_steps: int,
    cond: jnp.ndarray | None = None,  # (B, L_c, C)
    cond_ids: jnp.ndarray | None = None,
    cond_empty: jnp.ndarray | None = None,  # (B, L_c, C) black-image tokens
    cond_dit_params=None,  # LoRA-folded weights for the cond stream
    image_guidance_scale: float | jnp.ndarray = 1.0,
    c_factor: float | None = None,
    union_cond_attn: bool = True,
    add_cond_attn: bool = False,
    attn_impl: str = "xla",
    rope_layout: str = "pair",
) -> jnp.ndarray:
    """Run the full Euler loop; returns final packed latents (B, L_img, C)."""
    B = latents.shape[0]
    guidance = jnp.broadcast_to(jnp.asarray(guidance_scale, latents.dtype), (B,))
    use_image_cfg = cond_empty is not None

    def velocity(lat, t_scalar):
        timestep = jnp.broadcast_to(t_scalar, (B,)).astype(lat.dtype)
        if use_image_cfg:
            # one doubled-batch forward: [conditional | black-condition]
            lat2 = jnp.concatenate([lat, lat], axis=0)
            t2 = jnp.concatenate([timestep, timestep], axis=0)
            g2 = jnp.concatenate([guidance, jnp.ones_like(guidance)], axis=0)
            cond2 = jnp.concatenate([cond, cond_empty], axis=0)
            txt2 = jnp.concatenate([txt, txt], axis=0)
            pooled2 = jnp.concatenate([pooled, pooled], axis=0)
            v2 = flux_dit_apply(
                dit_params, cfg, lat2, txt2, pooled2, t2, img_ids, txt_ids,
                guidance=g2 if cfg.guidance_embeds else None,
                cond=cond2, cond_ids=cond_ids, c_factor=c_factor,
                union_cond_attn=union_cond_attn, add_cond_attn=add_cond_attn,
                attn_impl=attn_impl, cond_params=cond_dit_params,
                rope_layout=rope_layout,
            )
            v_cond, v_unc = v2[:B], v2[B:]
            return v_unc + jnp.asarray(image_guidance_scale, v2.dtype) * (v_cond - v_unc)
        return flux_dit_apply(
            dit_params, cfg, lat, txt, pooled, timestep, img_ids, txt_ids,
            guidance=guidance if cfg.guidance_embeds else None,
            cond=cond, cond_ids=cond_ids, c_factor=c_factor,
            union_cond_attn=union_cond_attn, add_cond_attn=add_cond_attn,
            attn_impl=attn_impl, cond_params=cond_dit_params,
            rope_layout=rope_layout,
        )

    def euler_step(lat, step_inputs):
        sigma, sigma_next = step_inputs
        v = velocity(lat, sigma)
        # fp32 state update to avoid bf16 drift over 30 steps
        lat = (lat.astype(jnp.float32) + (sigma_next - sigma) * v.astype(jnp.float32)).astype(lat.dtype)
        return lat, None

    steps = (sigmas[:num_steps], sigmas[1 : num_steps + 1])
    latents, _ = jax.lax.scan(euler_step, latents, steps)
    return latents


def make_schedule(num_steps: int, image_seq_len: int) -> jnp.ndarray:
    """Dynamic-shifted sigma array (host-precomputed, fp32)."""
    return jnp.asarray(FlowMatchSchedule.create(num_steps, image_seq_len).sigmas)
