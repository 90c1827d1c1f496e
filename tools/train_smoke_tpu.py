"""On-TPU training smoke: a REAL corrector train step at 1024px shapes.

Full FLUX widths (hidden 3072, 24 heads, mlp 12288), reduced depth
(default 4 double + 8 single ~= 1/4.5 of FLUX-dev, 2.6B params — bf16 full
depth cannot fit one 16 GB v5e, that is a TP workload), full 1024px + 512px
cond + 512 txt token shapes, LoRA r=32, remat on. Runs one optimizer step
with the PALLAS attention (exercising the flash backward kernel on real
hardware) and, if memory allows, the XLA attention for comparison.

Prints one JSON line with per-step times and the loss.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from reflectionflow_tpu.config import FluxDiTConfig, TrainConfig  # noqa: E402
from reflectionflow_tpu.lora.lora import lora_init  # noqa: E402
from reflectionflow_tpu.models.flux.dit import flux_dit_init  # noqa: E402
from reflectionflow_tpu.models.flux.rope import make_image_ids, make_text_ids  # noqa: E402
from reflectionflow_tpu.train.rectified_flow import make_optimizer, make_train_step  # noqa: E402


def main():
    nd = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    ns = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    cfg = FluxDiTConfig(num_double_blocks=nd, num_single_blocks=ns)
    params = flux_dit_init(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    lora = lora_init(jax.random.PRNGKey(1), params, r=32, alpha=32.0)
    adapters = lora["adapters"]
    optimizer = make_optimizer(TrainConfig())
    opt_state = optimizer.init(adapters)

    L_img, L_cond, L_txt = 4096, 1024, 512
    rng = np.random.default_rng(0)
    batch = {
        "x0": jnp.asarray(rng.standard_normal((B, L_img, cfg.in_channels)), jnp.bfloat16),
        "cond": jnp.asarray(rng.standard_normal((B, L_cond, cfg.in_channels)), jnp.bfloat16),
        "txt": jnp.asarray(rng.standard_normal((B, L_txt, cfg.text_dim)), jnp.bfloat16),
        "pooled": jnp.asarray(rng.standard_normal((B, cfg.pooled_dim)), jnp.bfloat16),
        "img_ids": jnp.asarray(make_image_ids(64, 64)),
        "txt_ids": jnp.asarray(make_text_ids(L_txt)),
        "cond_ids": jnp.asarray(make_image_ids(32, 32, position_delta=(0, -32))),
    }
    out = {"depth": f"{nd}/{ns} (full widths)", "batch": B,
           "param_count_b": round(sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params)) / 1e9, 2)}
    for attn in ("pallas", "xla"):
        try:
            step = make_train_step(params, cfg, optimizer, alpha=32.0, r=32, attn_impl=attn)
            t0 = time.time()
            a2, o2, metrics = step(adapters, opt_state, batch, jax.random.PRNGKey(2))
            loss = float(metrics["loss"])  # forces execution
            t_first = time.time() - t0
            t0 = time.time()
            _, _, metrics = step(a2, o2, batch, jax.random.PRNGKey(3))
            loss2 = float(metrics["loss"])
            t_step = time.time() - t0
            out[attn] = {"loss": round(loss, 4), "loss2": round(loss2, 4),
                         "compile_plus_first_s": round(t_first, 1), "step_s": round(t_step, 2)}
            assert np.isfinite(loss) and np.isfinite(loss2)
        except Exception as e:
            out[attn] = f"failed: {type(e).__name__}: {str(e)[:120]}"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
