"""AOT memory analysis of the 1024px corrector train step on TPU.

Compiles (without executing — shape-only inputs, no HBM) the full
rectified-flow LoRA train step at FLUX-dev scale, 1024px + 512px cond +
512 text tokens, for both attention impls, and prints argument/temp/total
HBM from XLA's memory analysis. This is the evidence that the Pallas
backward + per-layer LoRA attach keep training activations inside a 16 GB
budget where the XLA path materializes 4608^2 logits per layer.

Usage: python tools/train_memory_analysis.py [batch]
"""

import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import optax

from reflectionflow_tpu.config import FluxDiTConfig, TrainConfig  # noqa: E402
from reflectionflow_tpu.lora.lora import lora_init  # noqa: E402
from reflectionflow_tpu.models.flux.dit import flux_dit_init  # noqa: E402
from reflectionflow_tpu.train.rectified_flow import make_optimizer, rf_loss  # noqa: E402


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    cfg = FluxDiTConfig()
    key_s = jax.ShapeDtypeStruct((2,), jnp.uint32)
    base_s = jax.eval_shape(lambda k: flux_dit_init(k, cfg, jnp.bfloat16), key_s)
    adapters_s = jax.eval_shape(
        lambda k: lora_init(k, base_s, r=32, alpha=32.0, dtype=jnp.float32)["adapters"], key_s
    )
    optimizer = make_optimizer(TrainConfig())
    opt_s = jax.eval_shape(optimizer.init, adapters_s)

    L_img, L_cond, L_txt = 4096, 1024, 512
    batch_s = {
        "x0": jax.ShapeDtypeStruct((B, L_img, cfg.in_channels), jnp.bfloat16),
        "cond": jax.ShapeDtypeStruct((B, L_cond, cfg.in_channels), jnp.bfloat16),
        "txt": jax.ShapeDtypeStruct((B, L_txt, cfg.text_dim), jnp.bfloat16),
        "pooled": jax.ShapeDtypeStruct((B, cfg.pooled_dim), jnp.bfloat16),
        "img_ids": jax.ShapeDtypeStruct((L_img, 3), jnp.float32),
        "txt_ids": jax.ShapeDtypeStruct((L_txt, 3), jnp.float32),
        "cond_ids": jax.ShapeDtypeStruct((L_cond, 3), jnp.float32),
    }

    grad_only = len(sys.argv) > 2 and sys.argv[2] == "grad_only"
    out = {"batch": B, "shapes": f"img {L_img} + cond {L_cond} + txt {L_txt} tokens, FLUX-dev scale",
           "mode": "grad_only" if grad_only else "full_step"}
    for attn in ("pallas", "xla"):
        def grad_step(adapters, base, batch, key, _attn=attn):
            (loss, metrics), grads = jax.value_and_grad(rf_loss, has_aux=True)(
                adapters, base, cfg, batch, key, alpha=32.0, r=32, attn_impl=_attn
            )
            return grads, metrics

        def full_step(adapters, base, opt_state, batch, key, _attn=attn):
            grads, metrics = grad_step(adapters, base, batch, key, _attn)
            updates, opt_state = optimizer.update(grads, opt_state, adapters)
            return optax.apply_updates(adapters, updates), opt_state, metrics

        try:
            if grad_only:
                lowered = jax.jit(grad_step).lower(adapters_s, base_s, batch_s, key_s)
            else:
                lowered = jax.jit(full_step).lower(adapters_s, base_s, opt_s, batch_s, key_s)
            m = lowered.compile().memory_analysis()
            gb = 1024**3
            out[attn] = {
                "argument_gb": round(m.argument_size_in_bytes / gb, 2),
                "output_gb": round(m.output_size_in_bytes / gb, 2),
                "temp_gb": round(m.temp_size_in_bytes / gb, 2),
                "total_gb": round(
                    (m.argument_size_in_bytes + m.temp_size_in_bytes + m.output_size_in_bytes) / gb, 2
                ),
            }
        except Exception as e:
            out[attn] = f"failed: {type(e).__name__}: {str(e)[:160]}"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
